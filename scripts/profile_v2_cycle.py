"""Accurate production-cycle timing for the portal v2 scheduler.

Advances a real mesh-render pool to bulk steady state, then times N
chained portal_cycle_v2 calls with ONE fetch (a per-call fetch is a
~25 ms tunnel round-trip that swamps the kernel — see ablate_resolve).
Reports per-cycle wall, cheap/resolve segment counts, and the implied
cheap-phase cost after subtracting the resolve kernel's measured
22.6 ns/lane (ablate_resolve, full occupancy, conds never culling).

Usage: python scripts/profile_v2_cycle.py [quota] [warm_cycles] [timed]
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
    from path_tracer_tpu.render.portal import (
        PARK_K, portal_cycle_v2, make_pool_v2, _round_block,
    )
    from path_tracer_tpu.utils.config import Resolution

    quota = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    timed = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    bufs, mode = pipeline.prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    kscene = bufs["kernel"]
    npix = res.num_pixels
    n_pad = _round_block(npix)
    step_cap = int(os.environ.get("PT_TPU_STEP_CAP", "64"))

    def cycle(pool, i, skip=False):
        return portal_cycle_v2(
            pool, jnp.int32(quota), jnp.int32(0), jnp.int32(2 * i + 1),
            kscene, jnp.int32(step_cap),
            portal_key=pkey, cam_key=cam_key,
            max_depth=12, rr_start_depth=5, park_k=PARK_K,
            skip_kernel=skip,
        )

    pool = make_pool_v2(npix, n_pad, quota)
    c1s, c2s = [], []
    for i in range(warm):
        pool, r, unfin = cycle(pool, i)
        c1s.append(r)
    # sync, then time `timed` chained cycles with one fetch
    np.asarray(pool[0, :8])
    t0 = time.perf_counter()
    rays = []
    for i in range(warm, warm + timed):
        pool, r, unfin = cycle(pool, i)
        rays.append(r)
    total_rays = float(np.asarray(jnp.stack(rays)).sum())
    np.asarray(pool[0, :8])
    wall = time.perf_counter() - t0
    per_cycle = wall / timed

    # skip-kernel cycles: frozen paths flip to ready un-advanced and
    # re-freeze next cheap call, so the pool churns at bulk occupancy with
    # NO resolve kernel — cycle time there = cheap kernel + XLA glue
    skip_rays = []
    pool, r, _ = cycle(pool, warm + timed, skip=True)  # warm the program
    np.asarray(pool[0, :8])
    t0 = time.perf_counter()
    for i in range(timed):
        pool, r, _ = cycle(pool, warm + timed + 1 + i, skip=True)
        skip_rays.append(r)
    skip_segs = float(np.asarray(jnp.stack(skip_rays)).sum())
    np.asarray(pool[0, :8])
    skip_wall = time.perf_counter() - t0
    skip_cycle = skip_wall / timed

    n_resolve = (PARK_K + 1) * n_pad
    print(f"pool {n_pad} lanes, park_k={PARK_K}, step_cap={step_cap}, "
          f"quota {quota}")
    print(f"{timed} chained cycles: {wall*1e3:.1f} ms total, "
          f"{per_cycle*1e3:.2f} ms/cycle")
    print(f"segments/cycle: {total_rays/timed/1e6:.2f} M "
          f"({total_rays/wall/1e6:.1f} Mray/s during bulk)")
    print(f"skip-kernel cycles: {skip_cycle*1e3:.2f} ms/cycle "
          f"= cheap kernel + glue ({skip_segs/timed/1e6:.2f} M cheap segs)")
    print(f"-> resolve kernel in production = "
          f"{(per_cycle-skip_cycle)*1e3:.2f} ms/cycle "
          f"({(per_cycle-skip_cycle)/n_resolve*1e9:.1f} ns/lane x "
          f"{n_resolve/1e6:.2f} M lanes)")


if __name__ == "__main__":
    main()
