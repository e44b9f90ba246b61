"""Trace the drive-loop trajectory of the plain vs sharded portal runner.

profile_sharded_cycle showed the shard_map'd CYCLE is exactly as fast as
the plain one (76.3 vs 76.4 ms full-width), so the 8.7x end-to-end gap
(bench_sharded_portal, 2026-08-21) lives in the drive: poll cadence,
ladder walk, or tail dispatch. This renders mesh 1024x768 at one pass
with an on_check hook recording (wall t, cycle, pool width, unfinished)
per poll, then prints both trajectories side by side with per-window
cycle rates.

Usage: python scripts/trace_drive.py [spp]
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
    import jax.numpy as jnp

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.parallel.mesh import make_mesh
    from path_tracer_tpu.parallel.portal import make_sharded_portal_runner
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.render.portal import make_portal_pass_runner_v2
    from path_tracer_tpu.render.raygen import camera_arrays
    from path_tracer_tpu.utils.config import Resolution
    import jax

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(768, 1024)
    npix = res.num_pixels
    bufs, mode = prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}

    def run(tag, make_runner):
        log = []
        t0 = [0.0]

        def hook(cycle, w, u):
            log.append((time.perf_counter() - t0[0], cycle, w, u))
            return False

        runner = make_runner(hook)
        accum = jnp.zeros((npix, 3), jnp.float32)
        t0[0] = time.perf_counter()
        accum, rays = runner(bufs, cam, accum, 0, spp, rng.root_key(0))
        jax.block_until_ready(accum)
        total = time.perf_counter() - t0[0]
        print(f"\n=== {tag}: {total:.1f}s total, {len(log)} polls ===")
        prev_t, prev_c = 0.0, 0
        # compress: print every poll while width changes, else every 10th
        last_w = None
        for i, (t, c, w, u) in enumerate(log):
            dt, dc = t - prev_t, c - prev_c
            if w != last_w or i % 10 == 0 or i == len(log) - 1:
                rate = dc / dt if dt > 0 else 0.0
                print(f"  t={t:7.2f}s cyc={c:5d} w={w:7d} u={u:7d} "
                      f"(+{dc} cyc in {dt:5.2f}s = {rate:5.1f} cyc/s)",
                      flush=True)
            last_w = w
            prev_t, prev_c = t, c
        return total

    run("plain", lambda hook: make_portal_pass_runner_v2(
        portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        width=res.width, height=res.height, on_check=hook,
    ))
    run("sharded dp1", lambda hook: make_sharded_portal_runner(
        make_mesh(1, sample_parallel=1), portal_key=pkey, cam_key=cam_key,
        npix=npix, k_full=spp, on_check=hook,
    ))


if __name__ == "__main__":
    main()
