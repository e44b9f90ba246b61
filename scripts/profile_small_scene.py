"""Where does the wall go for small open scenes? (VERDICT r1 weak #7:
cartesian/two-spheres at ~1 Gray/s vs cornell's 4.) Separates the
render() wall into dispatch, device compute, and image postprocess.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_small_scene.py [scene] [spp]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render import integrator
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.render.raygen import camera_arrays
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    sid = sys.argv[1] if len(sys.argv) > 1 else "cartesian"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    w, h = 384, 256
    npix = w * h

    scene = pt.load_scene(sid, "scenes")
    cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(h, w))
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, cfg.resolution)
    print(f"{sid} mode={mode}")
    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}
    base_key = rng.root_key(0)

    from path_tracer_tpu.ops.pallas.trace_kernel import QUOTA_CAP_STATIC
    k = min(spp, QUOTA_CAP_STATIC)
    n_passes = spp // k

    def run_pass(accum, i):
        return integrator.render_pass(
            bufs, cam, accum, jnp.int32(i), base_key,
            sample_base=jnp.int32(i * k), width=w, height=h,
            samples_in_pass=k, max_depth=cfg.max_depth,
            rr_start_depth=cfg.rr_start_depth, mode=mode)

    # warm
    accum = jnp.zeros((npix, 3), jnp.float32)
    accum, r = run_pass(accum, 0)
    np.asarray(r)

    for _ in range(3):
        accum = jnp.zeros((npix, 3), jnp.float32)
        np.asarray(accum[0])
        t0 = time.perf_counter()
        handles = []
        for i in range(n_passes):
            accum, r = run_pass(accum, i)
            handles.append(r)
        t_dispatch = time.perf_counter() - t0
        counts = np.asarray(jnp.stack(handles))
        t_compute = time.perf_counter() - t0
        total_rays = int(counts.astype(np.int64).sum())

        # image postprocess as the pipeline does it
        t2 = time.perf_counter()
        img = integrator.finalize_image(accum, spp) if hasattr(
            integrator, "finalize_image") else None
        host = np.asarray(accum)
        t_post = time.perf_counter() - t2

        wall = time.perf_counter() - t0
        print(f"passes={n_passes} dispatch {t_dispatch*1e3:7.1f} ms | "
              f"compute-drain {t_compute*1e3:7.1f} ms | "
              f"accum-fetch+post {t_post*1e3:7.1f} ms | wall {wall*1e3:7.1f} "
              f"ms | {total_rays/ (t_compute)/1e6:7.1f} Mray/s kernel-side",
              flush=True)

    # full pipeline for comparison
    kw = dict(out_dir=None, verbose=False, progress_snapshots=False,
              device_buffers=bufs, device_mode=mode)
    pt.render(scene, cfg, **kw)
    done = pt.render(scene, cfg, **kw)
    print(f"pt.render wall {done.duration:.3f}s  "
          f"{done.stats.mrays_per_sec:.1f} Mray/s")


if __name__ == "__main__":
    main()
