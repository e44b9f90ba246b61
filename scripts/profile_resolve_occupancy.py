"""Per-cycle cheap/resolve wall split + RESOLVE OCCUPANCY for the
production (parked) portal-v2 flow on the mesh scene.

The resolve sweeps (park_k+1)*n concatenated lanes per cycle; the kernel
skips blocks with zero alive lanes, so what matters is (a) the alive-lane
fraction (vector work that pays off) and (b) the fraction of
RESOLVE_BLOCK-sized blocks with at least one alive lane (vector work
actually executed). A big gap between the two = in-block occupancy waste
the block skip cannot recover.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_resolve_occupancy.py [quota] [cycles]
"""

import functools
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
    from path_tracer_tpu.ops.pallas import portal as pm
    from path_tracer_tpu.ops.pallas.portal import (
        BUF_STATE, ROW_ALIVE, buf_row, trace_cheap_regen,
    )
    from path_tracer_tpu.render.portal import (
        CHEAP_BLOCK, RESOLVE_BLOCK, _round_block, make_pool_v2,
        portal_resolve_phase,
    )

    quota = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    park_k = pm.PARK_K
    step_cap = jnp.int32(int(os.environ.get("PT_TPU_STEP_CAP", "64")))

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    bufs, mode = pipeline.prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    npix = res.num_pixels
    n_pad = _round_block(npix)
    pool = make_pool_v2(npix, n_pad, quota)

    @functools.partial(jax.jit, static_argnames=("park_k",))
    def occ_stats(pool, park_k):
        """(per-part alive fractions, live-block fraction) of the resolve
        input (part 0 = active path, part j = parked buffer j-1)."""
        parts = [pool[ROW_ALIVE] > 0.0]
        for j in range(park_k):
            st = pool[buf_row(j, BUF_STATE)]
            parts.append((st > 0.5) & (st < 1.5))
        fracs = jnp.stack(
            [jnp.mean(p.astype(jnp.float32)) for p in parts])
        alive = jnp.concatenate(parts)  # [(K+1)*n]
        blocks = alive.reshape(-1, RESOLVE_BLOCK)
        frac_blocks = jnp.mean(jnp.any(blocks, axis=1).astype(jnp.float32))
        return fracs, frac_blocks

    resolve = functools.partial(
        portal_resolve_phase, portal_key=pkey, max_depth=12,
        rr_start_depth=5, park_k=park_k)
    resolve = jax.jit(resolve, donate_argnums=(0,))

    q = jnp.int32(quota)
    tot_cheap = tot_res = 0.0
    tot_c1 = tot_c2 = 0.0
    for cycle in range(n_cycles):
        seed = jnp.int32(2 * cycle + 1)
        t0 = time.perf_counter()
        pool, c1 = trace_cheap_regen(
            pool, pkey, cam_key, seed, q, jnp.int32(0), step_cap,
            max_depth=12, rr_start_depth=5, block=CHEAP_BLOCK,
            park_k=park_k)
        c1 = float(np.asarray(c1.sum() if c1.ndim else c1))
        t1 = time.perf_counter()
        fa, fb = occ_stats(pool, park_k)
        fa, fb = np.asarray(fa), float(np.asarray(fb))
        t2 = time.perf_counter()
        pool, c2, unfin = resolve(pool, q, seed, bufs["kernel"])
        c2 = float(np.asarray(c2))
        unfin = int(np.asarray(unfin))
        t3 = time.perf_counter()
        tot_cheap += t1 - t0
        tot_res += t3 - t2
        tot_c1 += c1
        tot_c2 += c2
        if cycle >= 1:  # cycle 0 includes compiles
            parts = "/".join(f"{100*x:.0f}" for x in fa)
            print(f"cycle {cycle:3d}: cheap {1e3*(t1-t0):7.1f} ms "
                  f"({c1:.3g} seg) | resolve {1e3*(t3-t2):7.1f} ms "
                  f"({c2:.3g} seg) | alive act/buf% {parts} "
                  f"(mean {100*fa.mean():.0f}) live-blocks {100*fb:.0f}% | "
                  f"unfin {unfin}", flush=True)
        if unfin == 0:
            break
    print(f"\ntotals: cheap {tot_cheap:.2f}s ({tot_c1:.4g} seg, "
          f"{tot_c1/max(tot_cheap,1e-9)/1e6:.0f} Mseg/s) | "
          f"resolve {tot_res:.2f}s ({tot_c2:.4g} seg, "
          f"{tot_c2/max(tot_res,1e-9)/1e6:.0f} Mseg/s)")


if __name__ == "__main__":
    main()
