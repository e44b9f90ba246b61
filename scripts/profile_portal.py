"""Time the portal scheduler's cycle phases in isolation on the mesh scene
(realistic pool shapes) to find where the 7.4 s of a 64-spp render goes.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/profile_portal.py
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


def timeit(fn, *a, reps=6, **kw):
    fn(*a, **kw)  # compile
    outs = None
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = fn(*a, **kw)
        jax.block_until_ready(outs)
        times.append(time.perf_counter() - t0)
    return sorted(times)[1], outs  # 2nd-best


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.render.portal import (
        CHEAP_BLOCK, RESOLVE_BLOCK, ROWS, portal_cycle,
    )
    from path_tracer_tpu.ops.pallas.portal import (
        ROW_ACC, ROW_ALIVE, ROW_D, ROW_DEPTH, ROW_O, ROW_PIX, ROW_PREV,
        ROW_THR, trace_cheap_blocked,
    )
    from path_tracer_tpu.ops.pallas.trace_kernel import trace_pallas_resolve
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.utils.config import Resolution

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    bufs, mode = prepare_scene_and_mode(scene, "auto", res)
    assert mode.startswith("portal:"), mode
    kscene = bufs["kernel"]

    npix = res.num_pixels
    C = 1 << 20
    F_cap = C // 2
    print(f"pool C={C} F_cap={F_cap} mode={mode}")

    from path_tracer_tpu.render.raygen import camera_arrays, generate_rays

    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}
    base_key = rng.root_key(0)

    # fresh pool of camera rays
    @jax.jit
    def fresh_pool():
        pix = (jnp.arange(C, dtype=jnp.int32)) % npix
        u = rng.raygen_uniforms(base_key, (C,), 2)
        o0, d0 = generate_rays(pix, jnp.zeros((C,), jnp.int32), u, cam,
                               res.width, res.height)
        pool = jnp.zeros((ROWS, C), jnp.float32)
        pool = pool.at[ROW_O:ROW_O + 3].set(o0.T)
        pool = pool.at[ROW_D:ROW_D + 3].set(d0.T)
        pool = pool.at[ROW_THR:ROW_THR + 3].set(1.0)
        pool = pool.at[ROW_ALIVE].set(1.0)
        pool = pool.at[ROW_PREV].set(-1.0)
        pool = pool.at[ROW_PIX].set(pix.astype(jnp.float32))
        return pool

    pool0 = jax.block_until_ready(fresh_pool())

    # --- phase 1: cheap kernel (fresh pool -> quiescent) ---
    def cheap(p):
        return trace_cheap_blocked(p.copy(), mode, jnp.int32(1),
                                   block=CHEAP_BLOCK)

    t_cheap, (pool1, c1) = timeit(cheap, pool0)
    frozen = float(jnp.sum((pool1[ROW_ALIVE] > 0).astype(jnp.float32)))
    print(f"cheap kernel (fresh pool): {t_cheap*1e3:8.2f} ms  "
          f"segments={float(c1):.3g}  frozen={frozen:.0f} "
          f"({frozen/C*100:.1f}% of pool)")

    # --- phase 2: compaction (argsort + row gather) ---
    @jax.jit
    def compact(p):
        key = jnp.where(p[ROW_ALIVE] > 0.0, 0, 1).astype(jnp.int32)
        perm = jnp.argsort(key, stable=True)
        return p.T[perm].T

    t_comp, pool2 = timeit(compact, pool1)
    print(f"compaction (argsort+gather): {t_comp*1e3:8.2f} ms")

    # --- phase 3: resolve at F_cap ---
    def resolve(p, cap):
        fr = p[:, :cap]
        return trace_pallas_resolve(
            fr[ROW_O:ROW_O + 3], fr[ROW_D:ROW_D + 3],
            fr[ROW_THR:ROW_THR + 3], fr[ROW_ACC:ROW_ACC + 3],
            fr[ROW_ALIVE:ROW_ALIVE + 1], fr[ROW_PREV:ROW_PREV + 1],
            fr[ROW_DEPTH:ROW_DEPTH + 1],
            kscene, jnp.int32(2), block=RESOLVE_BLOCK,
        )

    t_res, _ = timeit(resolve, pool2, F_cap)
    print(f"resolve @ F_cap={F_cap}: {t_res*1e3:8.2f} ms")
    small = max(RESOLVE_BLOCK,
                (int(frozen) + RESOLVE_BLOCK - 1) // RESOLVE_BLOCK
                * RESOLVE_BLOCK)
    t_res2, _ = timeit(resolve, pool2, small)
    print(f"resolve @ frozen={small}: {t_res2*1e3:8.2f} ms")

    # --- phase 4: retire (scatter-add) ---
    accum = jnp.zeros((npix, 3), jnp.float32)

    @jax.jit
    def retire(p, acc):
        pix_row = p[ROW_PIX]
        dead = (p[ROW_ALIVE] <= 0.0) & (pix_row >= 0.0)
        pix_i = jnp.clip(pix_row.astype(jnp.int32), 0, acc.shape[0] - 1)
        contrib = jnp.where(dead[None, :], p[ROW_ACC:ROW_ACC + 3], 0.0)
        return acc.at[pix_i].add(contrib.T)

    t_ret, _ = timeit(retire, pool1, accum)
    print(f"retire (1M scatter-add): {t_ret*1e3:8.2f} ms")

    # --- phase 5: refill (raygen into free slots) ---
    @jax.jit
    def refill(p, issued):
        free = p[ROW_PIX] < 0.0
        rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        sid = issued + rank
        can = free & (sid < 10**9)
        pixel = (sid % npix).astype(jnp.int32)
        u = rng.raygen_uniforms(base_key, (C,), 2)
        o0, d0 = generate_rays(pixel, sid // npix, u, cam,
                               res.width, res.height)
        for k in range(3):
            p = p.at[ROW_O + k].set(jnp.where(can, o0[:, k], p[ROW_O + k]))
            p = p.at[ROW_D + k].set(jnp.where(can, d0[:, k], p[ROW_D + k]))
        return p

    t_ref, _ = timeit(refill, pool1, jnp.int32(0))
    print(f"refill (raygen+selects): {t_ref*1e3:8.2f} ms")

    # --- whole fused cycle for comparison ---
    def cycle(p, acc):
        # portal_cycle donates pool+accum — hand it fresh copies every rep
        return portal_cycle(
            p.copy(), acc.copy(), jnp.int32(0), jnp.int32(0), jnp.float32(0),
            jnp.int32(10**9), jnp.int32(0), jnp.int32(3), base_key,
            kscene, cam,
            portal_key=mode, npix=npix, width=res.width, height=res.height,
            max_depth=12, rr_start_depth=5, F_cap=F_cap,
        )

    t_cyc, _ = timeit(cycle, pool0, accum)
    print(f"full portal_cycle (fused): {t_cyc*1e3:8.2f} ms")
    print(f"sum of isolated phases:   "
          f"{(t_cheap+t_comp+t_res+t_ret+t_ref)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
