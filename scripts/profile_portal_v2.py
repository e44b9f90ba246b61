"""Per-cycle trajectory of the v2 portal scheduler on the mesh scene:
cycle wall time, unfinished-slot count, frozen count — shows where the
pass's time goes and how the tail decays.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_portal_v2.py [quota]
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
    from path_tracer_tpu.render import pipeline
    from path_tracer_tpu.utils.config import Resolution
    from path_tracer_tpu.ops.pallas.portal import (
        V2_ROWS, V2_ROW_DONE, V2_ROW_PIX, ROW_ALIVE, ROW_PREV,
    )
    from path_tracer_tpu.render.portal import drive_pool_v2, _round_block

    quota = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    bufs, mode = pipeline.prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    npix = res.num_pixels
    n_pad = _round_block(npix)

    from path_tracer_tpu.render.portal import make_pool_v2

    pool = make_pool_v2(npix, n_pad, quota)

    t_all = time.perf_counter()
    last = [time.perf_counter()]

    def on_check(cycle, width, unfin):
        now = time.perf_counter()
        print(f"cycle {cycle:4d} (w={width:7d}): {(now-last[0])*1e3:8.1f} ms "
              f"since last check  unfin {unfin:9d}", flush=True)
        last[0] = now

    stages, rays = drive_pool_v2(
        pool, quota, 0, jnp.int32(1), bufs["kernel"],
        portal_key=pkey, cam_key=cam_key, max_depth=12, rr_start_depth=5,
        check_every=4, on_check=on_check)
    rays = float(np.asarray(rays))
    wall = time.perf_counter() - t_all
    print(f"stages: {[int(s.shape[1]) for s in stages]}")
    print(f"total {wall:.2f}s  {rays/wall/1e6:.1f} Mray/s "
          f"({rays:.3g} rays)")


if __name__ == "__main__":
    main()
