"""Hardware A/B of the round-3 small-scene fusions that shipped untimed:

- fused hookless full passes (one device dispatch for all full passes,
  integrator.render_passes_fused, commit 2bc59be) vs the per-pass loop
  (PT_TPU_NO_FUSE=1), and implicitly the fused final fetch / cached pixel
  orders (a9064de) which both arms share.

Protocol: warm once, then 2nd-best of 4 end-to-end renders per arm
(tunnel noise is +-3-5%; the first rep after any compile reads 2-6x slow).

Usage: python scripts/ab_fused_dispatch.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

CONFIGS = [
    ("single-sphere", 256, 256, 4096),
    ("cartesian", 384, 256, 2048),
    ("two-spheres", 384, 256, 2048),
]


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    for sid, w, h, spp in CONFIGS:
        scene = pt.load_scene(sid, "scenes")
        cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(h, w))
        bufs, mode = prepare_scene_and_mode(scene, cfg.backend, cfg.resolution)
        kw = dict(out_dir=None, verbose=False, progress_snapshots=False,
                  device_buffers=bufs, device_mode=mode)
        for arm, env in (("fused", None), ("unfused", "1")):
            if env is None:
                os.environ.pop("PT_TPU_NO_FUSE", None)
            else:
                os.environ["PT_TPU_NO_FUSE"] = env
            pt.render(scene, cfg, **kw)  # warm this arm's program
            reps = [pt.render(scene, cfg, **kw) for _ in range(4)]
            done = sorted(reps, key=lambda d: d.duration)[1]
            s = done.stats
            print(
                f"{sid} {w}x{h}@{spp} [{arm:7s}]: {done.duration:.3f}s  "
                f"{s.msamples_per_sec:.0f} Msam/s  "
                f"{s.mrays_per_sec:.0f} Mray/s  "
                f"(reps {' '.join(f'{r.duration:.3f}' for r in reps)})",
                flush=True,
            )
        os.environ.pop("PT_TPU_NO_FUSE", None)


if __name__ == "__main__":
    main()
