"""Open-scene throughput vs trace_kernel.WHILE_UNROLL (exit-check cadence).

The while-style regen loop (picked for scenes with <= 8 prims, where most
paths die in 1-2 bounces) checks the all-done scalar every WHILE_UNROLL
steps. Sweeps the knob on single-sphere 256x256.

Usage: python scripts/bench_while_unroll.py [unroll] [spp] [scene]
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
import path_tracer_tpu.ops.pallas.trace_kernel as tk
from path_tracer_tpu.ops import rng
from path_tracer_tpu.render import integrator
from path_tracer_tpu.render.pipeline import (
    morton_pixel_order, prepare_scene_and_mode,
)
from path_tracer_tpu.render.raygen import camera_arrays
from path_tracer_tpu.utils.config import Resolution


def main():
    if len(sys.argv) > 1:  # no arg = bench the shipped default
        tk.WHILE_UNROLL = int(sys.argv[1])
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    sid = sys.argv[3] if len(sys.argv) > 3 else "single-sphere"

    scene = pt.load_scene(sid, "scenes")
    res = Resolution(256, 256)
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
    nsam = n_passes * k * npix
    print(f"compile+run: {time.perf_counter()-t0:.1f}s "
          f"(WHILE_UNROLL={tk.WHILE_UNROLL}, scene={sid}, spp={spp})")
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        accum, rays = run()
        r = float(np.asarray(rays))
        _ = np.asarray(accum[:8])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {rep}: {dt*1e3:.1f} ms  {r/dt/1e6:.1f} Mray/s  "
              f"{nsam/dt/1e6:.1f} Msam/s")
    best2 = sorted(times)[1]
    print(f"RESULT WHILE_UNROLL={tk.WHILE_UNROLL} scene={sid}: "
          f"{best2*1e3:.1f} ms  {r/best2/1e6:.1f} Mray/s  "
          f"{nsam/best2/1e6:.1f} Msam/s")


if __name__ == "__main__":
    main()
