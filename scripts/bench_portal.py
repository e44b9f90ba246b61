"""Benchmark the portal path on the mesh scene (1024x768) vs the prim-major
regen baseline. Steady-state: one warmup render, then timed reps.

Usage: python scripts/bench_portal.py [spp] [mode]
  mode: portal (default) | pallasr | both
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def run(which: str, spp: int):
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode, render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    if which == "pallasr":
        os.environ["PT_TPU_NO_PORTAL"] = "1"
    else:
        os.environ.pop("PT_TPU_NO_PORTAL", None)

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    cfg = RenderConfig(samples_per_pixel=spp, resolution=res)
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, res)
    print(f"[{which}] mode = {mode}")

    def once(tag):
        t0 = time.time()
        done = render(scene, cfg, out_dir=None, device_buffers=bufs,
                      device_mode=mode, verbose=False)
        wall = time.time() - t0
        mrays = done.stats.num_rays / wall / 1e6
        print(f"[{which}] {tag}: wall {wall:.2f}s  rays {done.stats.num_rays}"
              f"  {mrays:.1f} Mray/s")
        return mrays

    once("warmup")
    vals = [once(f"rep{i}") for i in range(4)]
    best2 = sorted(vals)[-2]
    print(f"[{which}] 2nd-best: {best2:.1f} Mray/s")
    return best2


if __name__ == "__main__":
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    which = sys.argv[2] if len(sys.argv) > 2 else "portal"
    if which == "both":
        run("portal", spp)
        run("pallasr", spp)
    else:
        run(which, spp)
