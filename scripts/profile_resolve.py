"""Isolate the portal resolver's per-segment cost: full-occupancy
trace_pallas_resolve on the mesh scene at several block sizes, vs the
brute-force regen kernel's ~27.8 ns/segment (36 Mray/s).

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_resolve.py
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
    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        kernel_scene_buffers, trace_pallas_resolve,
    )

    scene = pt.load_scene("mesh", "scenes")
    packed = pack_scene(scene)
    kscene = kernel_scene_buffers(packed)
    n = 786432

    key = jax.random.PRNGKey(0)
    ko, kd = jax.random.split(key)
    # rays scattered inside the room, random directions — the resolver's
    # actual bulk-phase workload shape (incoherent mid-path segments)
    o = jax.random.uniform(ko, (3, n), minval=-0.8, maxval=0.8)
    o = o.at[2].add(2.2)
    d = jax.random.normal(kd, (3, n))
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    thr = jnp.ones((3, n), jnp.float32)
    acc = jnp.zeros((3, n), jnp.float32)
    alive = jnp.ones((1, n), jnp.float32)
    prev = jnp.full((1, n), -1.0, jnp.float32)
    depth = jnp.full((1, n), 3.0, jnp.float32)

    for block in (1024, 2048, 4096):
        args = (o, d, thr, acc, alive, prev, depth)

        def run(a, block=block):
            return trace_pallas_resolve(
                *a, kscene, jnp.int32(7), max_depth=12, rr_start_depth=5,
                block=block,
            )

        out = run(args)
        np.asarray(out[-1][0, :8])  # compile + drain
        reps = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = run(args)
            np.asarray(out[-1][0, :8])
            reps.append(time.perf_counter() - t0)
        dt = sorted(reps)[1]
        segs = float(np.asarray(jnp.sum(out[-1])))
        print(
            f"block {block:5d}: {dt*1e3:7.2f} ms  {segs:.0f} segs  "
            f"{dt/segs*1e9:6.1f} ns/seg  ({segs/dt/1e6:.1f} Mseg/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
