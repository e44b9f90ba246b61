"""Decompose portal-v2 bulk cycles: cheap-kernel vs resolve wall time on
the REAL render workload (each op synced separately; the ~25 ms fetch
round-trip inflates both equally, so read the difference/trend).

NOTE: measures the UNPARKED (park_k=0) flow — a baseline tool. The
production scheduler parks frozen paths K-deep (see render.portal) and
resolves active+parked in one concatenated sweep.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_cycle_decompose.py [quota] [cycles]
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
        ROW_ACC, ROW_ALIVE, ROW_D, ROW_DEPTH, ROW_O, ROW_PREV, ROW_THR,
        V2_ROWS, V2_ROW_DONE, V2_ROW_PIX, trace_cheap_regen,
    )
    from path_tracer_tpu.ops.pallas.trace_kernel import trace_pallas_resolve
    from path_tracer_tpu.render.portal import (
        CHEAP_BLOCK, RESOLVE_BLOCK, _round_block,
    )

    quota = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 24

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    bufs, mode = pipeline.prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    kscene = bufs["kernel"]
    npix = res.num_pixels
    n_pad = _round_block(npix)

    from path_tracer_tpu.ops.pallas.portal import V2_ROW_QUOTA

    pool = jnp.zeros((V2_ROWS, n_pad), jnp.float32)
    pool = pool.at[ROW_PREV].set(-1.0)
    pool = pool.at[V2_ROW_PIX].set(
        jnp.minimum(jnp.arange(n_pad, dtype=jnp.float32), float(npix - 1)))
    pool = pool.at[V2_ROW_QUOTA].set(float(quota))
    pool = pool.at[V2_ROW_DONE].set(
        jnp.where(jnp.arange(n_pad) < npix, 0.0, float(quota)).astype(
            jnp.float32))

    t_cheap_tot = t_res_tot = 0.0
    segs_cheap = segs_res = 0.0
    for cyc in range(n_cycles):
        t0 = time.perf_counter()
        pool, c1 = trace_cheap_regen(
            pool, pkey, cam_key, jnp.int32(2 * cyc + 1), jnp.int32(quota),
            jnp.int32(0), max_depth=12, rr_start_depth=5, block=CHEAP_BLOCK)
        c1h = float(np.asarray(c1))
        t1 = time.perf_counter()
        frozen = float(np.asarray(jnp.sum(pool[ROW_ALIVE] > 0)))
        t1b = time.perf_counter()
        o, d, thr, acc, alive, prev, depth, c2 = trace_pallas_resolve(
            pool[ROW_O:ROW_O + 3], pool[ROW_D:ROW_D + 3],
            pool[ROW_THR:ROW_THR + 3], pool[ROW_ACC:ROW_ACC + 3],
            pool[ROW_ALIVE:ROW_ALIVE + 1], pool[ROW_PREV:ROW_PREV + 1],
            pool[ROW_DEPTH:ROW_DEPTH + 1], kscene, jnp.int32(2 * cyc + 2),
            max_depth=12, rr_start_depth=5, block=RESOLVE_BLOCK)
        c2h = float(np.asarray(jnp.sum(c2)))
        t2 = time.perf_counter()
        ended = (pool[ROW_ALIVE] > 0.0) & (alive[0] <= 0.0)
        done = pool[V2_ROW_DONE] + ended.astype(jnp.float32)
        pool = jnp.concatenate(
            [o, d, thr, acc, alive, prev, depth, done[None],
             pool[V2_ROW_PIX:V2_ROW_PIX + 1],
             pool[V2_ROW_QUOTA:V2_ROW_QUOTA + 1]], axis=0)
        if cyc >= 4:  # skip warm-in
            t_cheap_tot += t1 - t0
            t_res_tot += t2 - t1b
            segs_cheap += c1h
            segs_res += c2h
        print(f"cyc {cyc:3d}: cheap {(t1-t0)*1e3:7.1f} ms ({c1h:9.0f} segs)"
              f"  resolve {(t2-t1b)*1e3:7.1f} ms ({c2h:9.0f} segs, "
              f"frozen {frozen:8.0f})", flush=True)

    print(f"\nsteady (cyc>=4): cheap {t_cheap_tot:.2f}s "
          f"({segs_cheap/max(t_cheap_tot,1e-9)/1e6:.0f} Mseg/s) | "
          f"resolve {t_res_tot:.2f}s "
          f"({t_res_tot/max(segs_res,1)*1e9:.0f} ns/frozen-seg, "
          f"{segs_res/max(t_res_tot,1e-9)/1e6:.1f} Mseg/s)")


if __name__ == "__main__":
    main()
