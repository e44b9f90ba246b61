"""Sweep the portal cheap-kernel step budget on hardware (mesh 1024x768).

The step cap is a runtime SMEM scalar (no recompile between values), read
from PT_TPU_STEP_CAP at drive time, so one warm process sweeps every value.
Re-run after resolve-cost changes: a cheaper resolve shifts the optimum
toward more frequent resolve rounds (smaller caps) and vice versa.

Usage: python scripts/sweep_step_cap.py [spp] [cap ...]   (default 64 spp,
caps 32 48 64 96 128)
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    os.chdir(_ROOT)
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    caps = [int(a) for a in sys.argv[2:]] or [32, 48, 64, 96, 128]

    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode, render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    cfg = RenderConfig(samples_per_pixel=spp, resolution=res)
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, res)
    print(f"mode = {mode}, spp = {spp}")

    def once(tag):
        t0 = time.time()
        done = render(scene, cfg, out_dir=None, device_buffers=bufs,
                      device_mode=mode, verbose=False)
        wall = time.time() - t0
        mrays = done.stats.num_rays / wall / 1e6
        print(f"  {tag}: wall {wall:.2f}s  {mrays:.1f} Mray/s", flush=True)
        return mrays

    results = {}
    for cap in caps:
        os.environ["PT_TPU_STEP_CAP"] = str(cap)
        print(f"[cap={cap}]", flush=True)
        once("warmup")
        vals = [once(f"rep{i}") for i in range(4)]
        results[cap] = sorted(vals)[-2]
        print(f"[cap={cap}] 2nd-best: {results[cap]:.1f} Mray/s")

    print("\n== summary ==")
    for cap, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  cap={cap}: {v:.1f} Mray/s")


if __name__ == "__main__":
    main()
