"""Statistical multi-bounce image parity: SHARDED portal vs single-device
(VERDICT r4 #2 — the portal analog of
tests/test_parallel.py::test_sharded_statistically_matches_single_device).

The CPU interpreter's PRNG stub returns all-zero uniform draws, so a
statistical comparison is only meaningful with the hardware PRNG — and
only one chip is reachable, so the sharded arm runs the full shard_map
stack on Mesh(dp=1, sp=1). That exercises every sharded-specific code
path (per-device pool layout, quota split, flush_pix keying, sharded
compaction ladder + redistribution, dp-sharded accum scatter) with real
randomness; >= 2-device slot accounting is covered exactly by the CPU
tests (depth-1 conservation + zero-stub determinism).

Protocol mirrors scripts/parity_report.py: RMSE between the two arms at
equal spp with independent RNG schedules ~ the MC noise floor estimated
from two independent single-device renders; a sharded-pipeline bias
would exceed it.

Usage: python scripts/compare_sharded_portal_image.py [spp] [height]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import numpy as np


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.ops.tonemap import quantize_np
    from path_tracer_tpu.parallel.mesh import render_sharded
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    scene = pt.load_scene("mesh", "scenes")
    cfg = RenderConfig(samples_per_pixel=spp,
                       resolution=Resolution.from_height(height))
    kw = dict(out_dir=None, verbose=False, progress_snapshots=False)

    plain = pt.render(scene, cfg.with_(seed=0), **kw)
    plain2 = pt.render(scene, cfg.with_(seed=13), **kw)
    sharded = render_sharded(scene, cfg.with_(seed=7), num_devices=1,
                             sample_parallel=1, **kw)

    q_p = quantize_np(plain.image.pixels) / 255.0
    q_p2 = quantize_np(plain2.image.pixels) / 255.0
    q_s = quantize_np(sharded.image.pixels) / 255.0
    rmse = float(np.sqrt(((q_s - q_p) ** 2).mean()))
    noise = float(np.sqrt(((q_p2 - q_p) ** 2).mean()))
    mean_gap = abs(q_s.mean() - q_p.mean())
    print(f"mesh {cfg.resolution.width}x{height}@{spp} multi-bounce "
          f"(max_depth={cfg.max_depth}):")
    print(f"  RMSE(sharded, plain) = {rmse:.4f}")
    print(f"  MC noise floor       = {noise:.4f}  (two independent plain)")
    print(f"  mean brightness gap  = {mean_gap:.5f}")
    verdict = "OK" if rmse <= noise * 1.10 else "BIAS SUSPECTED"
    print(f"  -> {verdict} (threshold: noise * 1.10)")


if __name__ == "__main__":
    main()
