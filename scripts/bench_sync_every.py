"""Cornell headline vs trace_v2.SYNC_EVERY_V3 (all-done sync amortization).

Usage: python scripts/bench_sync_every.py [sync_every] [spp]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/root/repo")

import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
import path_tracer_tpu.ops.pallas.trace_v2 as tv2
from path_tracer_tpu.ops import rng
from path_tracer_tpu.render import integrator
from path_tracer_tpu.render.pipeline import (
    morton_pixel_order, prepare_scene_and_mode,
)
from path_tracer_tpu.render.raygen import camera_arrays
from path_tracer_tpu.utils.config import Resolution


def main():
    if len(sys.argv) > 1:  # no arg = bench the shipped default
        tv2.SYNC_EVERY_V3 = int(sys.argv[1])
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    scene = pt.load_scene("cornell", "scenes")
    res = Resolution(768, 1024)
    bufs, mode = prepare_scene_and_mode(scene, "auto", res)
    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}
    base_key = rng.root_key(0)
    perm_np, _ = morton_pixel_order(res.width, res.height)
    perm = jnp.asarray(perm_np)
    npix = res.num_pixels
    k = min(spp, 256)
    n_passes = -(-spp // k)

    def run():
        accum = jnp.zeros((npix, 3), jnp.float32)
        rays = jnp.zeros((), jnp.float32)
        for i in range(n_passes):
            accum, r = integrator.render_pass(
                bufs, cam, accum, jnp.int32(i), base_key,
                sample_base=jnp.int32(i * k), width=res.width, height=res.height, samples_in_pass=k,
                mode=mode, pixel_perm=perm,
            )
            rays = rays + r
        return accum, rays

    t0 = time.perf_counter()
    accum, rays = run()
    r = float(np.asarray(rays))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s "
          f"(SYNC_EVERY={tv2.SYNC_EVERY_V3}, spp={spp})")
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        accum, rays = run()
        r = float(np.asarray(rays))
        _ = np.asarray(accum[:8])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {rep}: {dt*1e3:.1f} ms  {r/dt/1e6:.1f} Mray/s")
    best2 = sorted(times)[1]
    print(f"RESULT SYNC_EVERY={tv2.SYNC_EVERY_V3}: {best2*1e3:.1f} ms  "
          f"{r/best2/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()
