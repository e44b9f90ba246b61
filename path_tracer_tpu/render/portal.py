"""Persistent-pool scheduler for portal-deferred mesh tracing.

See ops.pallas.portal for the architecture. This module owns the host/XLA
side: a fixed-capacity pool of path slots cycles through

    K_cheap (advance until death/portal-freeze)
      → compact frozen lanes to the front (one row-gather)
      → K_full resolve on the first F_CAP lanes (full-scene bounce)
      → retire dead paths (scatter-add their radiance by pixel)
      → refill free slots with fresh camera samples (device-side raygen)

Every step is a fixed-shape jitted op; the host polls one scalar every few
cycles for termination only, so the device pipeline never stalls on the
remote-TPU tunnel. Sample accounting is exact: each issued sample id is
retired exactly once, wherever its path wandered.

The reference has no analog — its rayon pool work-steals whole pixels
(mod.rs:1020-1023); this is the ray-level equivalent a TPU needs to keep
every vector lane busy with useful work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.ops import rng
from path_tracer_tpu.ops.pallas.portal import (
    ROW_ACC, ROW_ALIVE, ROW_D, ROW_DEPTH, ROW_O, ROW_PIX, ROW_PREV, ROW_THR,
    ROWS, trace_cheap_blocked,
)
from path_tracer_tpu.ops.pallas.trace_kernel import trace_pallas_resolve

CHEAP_BLOCK = 2048
RESOLVE_BLOCK = 1024

# default pool capacity (lanes). 1M lanes = 64 MB of pool state; big enough
# to keep the resolver batches dense, small enough to cycle quickly.
DEFAULT_POOL = 1 << 20


@functools.partial(
    jax.jit,
    static_argnames=(
        "portal_key", "npix", "width", "height", "max_depth",
        "rr_start_depth", "F_cap",
    ),
    donate_argnums=(0, 1),
)
def portal_cycle(
    pool,
    accum,
    issued,
    retired,
    rays,
    limit,
    sample_base,
    cycle_tag,
    base_key,
    kscene: dict,
    cam: dict,
    *,
    portal_key: str,
    npix: int,
    width: int,
    height: int,
    max_depth: int,
    rr_start_depth: int,
    F_cap: int,
):
    """One scheduler cycle. pool [ROWS, C] f32; accum [npix_pad, 3];
    issued/retired i32 PASS-LOCAL sample counters (pass-local ids stay well
    inside i32 — global ids could overflow at res 2000 x spp 10000);
    limit = pass-local sample count; sample_base = global index of the
    pass's first sample (drives the 2x2 subpixel grid); cycle_tag i32
    (seeds/keys fold it in). Returns (pool', accum', issued', retired',
    rays')."""
    C = pool.shape[1]
    seed = jnp.asarray(cycle_tag, jnp.int32) * jnp.int32(9973) + jnp.int32(17)

    # 1. cheap bounces until every lane is dead or portal-frozen
    pool, c1 = trace_cheap_blocked(
        pool, portal_key, seed,
        max_depth=max_depth, rr_start_depth=rr_start_depth,
        block=CHEAP_BLOCK,
    )

    # 2. compact: frozen (alive) lanes first — one [C, ROWS] row-gather
    alive_key = jnp.where(pool[ROW_ALIVE] > 0.0, 0, 1).astype(jnp.int32)
    perm = jnp.argsort(alive_key, stable=True)
    pool = pool.T[perm].T

    # 3. full-scene resolve of the first F_cap lanes (the frozen ones;
    #    trailing dead lanes in the slice are inert)
    front = pool[:, :F_cap]
    o, d, thr, acc, alive, prev, depth, c2 = trace_pallas_resolve(
        front[ROW_O:ROW_O + 3], front[ROW_D:ROW_D + 3],
        front[ROW_THR:ROW_THR + 3], front[ROW_ACC:ROW_ACC + 3],
        front[ROW_ALIVE:ROW_ALIVE + 1], front[ROW_PREV:ROW_PREV + 1],
        front[ROW_DEPTH:ROW_DEPTH + 1],
        kscene, seed + jnp.int32(1),
        max_depth=max_depth, rr_start_depth=rr_start_depth,
        block=RESOLVE_BLOCK,
    )
    front = jnp.concatenate(
        [o, d, thr, acc, alive, prev, depth, front[ROW_PIX:ROW_PIX + 1]],
        axis=0,
    )
    pool = jnp.concatenate([front, pool[:, F_cap:]], axis=1)

    # 4. retire dead paths into the framebuffer (pix >= 0 marks an occupied
    #    slot; freed slots get pix = -1)
    pix_row = pool[ROW_PIX]
    dead = (pool[ROW_ALIVE] <= 0.0) & (pix_row >= 0.0)
    pix_i = jnp.clip(pix_row.astype(jnp.int32), 0, accum.shape[0] - 1)
    contrib = jnp.where(dead[None, :], pool[ROW_ACC:ROW_ACC + 3], 0.0)
    accum = accum.at[pix_i].add(contrib.T)
    retired = retired + jnp.sum(dead.astype(jnp.int32))
    pool = pool.at[ROW_PIX].set(jnp.where(dead, -1.0, pix_row))

    # 5. refill free slots with fresh camera samples (sid = s * npix + pix,
    #    pass-local)
    free = pool[ROW_PIX] < 0.0
    rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    sid = issued + rank
    can = free & (sid < limit)
    pixel = (sid % npix).astype(jnp.int32)
    samp = sample_base + sid // npix
    key = rng.chunk_key(base_key, cycle_tag)
    u = rng.raygen_uniforms(key, (C,), 2)
    from path_tracer_tpu.render.raygen import generate_rays

    o0, d0 = generate_rays(pixel, samp, u, cam, width, height)

    def put(row, vals):
        return pool.at[row].set(jnp.where(can, vals, pool[row]))

    for k in range(3):
        pool = put(ROW_O + k, o0[:, k])
        pool = put(ROW_D + k, d0[:, k])
        pool = put(ROW_THR + k, jnp.float32(1.0))
        pool = put(ROW_ACC + k, jnp.float32(0.0))
    pool = put(ROW_ALIVE, jnp.float32(1.0))
    pool = put(ROW_PREV, jnp.float32(-1.0))
    pool = put(ROW_DEPTH, jnp.float32(0.0))
    pool = put(ROW_PIX, pixel.astype(jnp.float32))
    issued = issued + jnp.sum(can.astype(jnp.int32))

    rays = rays + c1 + jnp.sum(c2)
    return pool, accum, issued, retired, rays


def make_portal_pass_runner(
    *,
    portal_key: str,
    npix: int,
    width: int,
    height: int,
    k_full: int,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    pool_capacity: int = DEFAULT_POOL,
    check_every: int = 4,
):
    """Build a pipeline pass_runner: each pass pushes npix*k_pass fresh
    samples through the pool and drains it, so passes stay atomic units for
    progress/cancel/checkpoint. k_full is the FULL pass size (global sample
    ids are pass_idx * k_full + [0, k_pass))."""
    C = min(pool_capacity, _round_block(npix * min(k_full, 4)))
    C = max(C, CHEAP_BLOCK)
    F_cap = max(RESOLVE_BLOCK, _round_resolve(C // 2))

    def pass_runner(scene_bufs, cam, accum, pass_idx, k_pass, base_key):
        total = npix * k_pass
        sample_base = pass_idx * k_full

        pool = jnp.zeros((ROWS, C), jnp.float32)
        pool = pool.at[ROW_PIX].set(-1.0)
        issued = jnp.int32(0)
        retired = jnp.int32(0)
        rays = jnp.float32(0.0)
        pass_key = rng.chunk_key(base_key, pass_idx)

        cycle_idx = 0
        hard_limit = 64 + (total * (max_depth + 2) * 4) // C
        while True:
            for _ in range(check_every):
                pool, accum, issued, retired, rays = portal_cycle(
                    pool, accum, issued, retired, rays,
                    jnp.int32(total),
                    jnp.int32(sample_base),
                    jnp.int32(cycle_idx),
                    pass_key, scene_bufs["kernel"], cam,
                    portal_key=portal_key, npix=npix,
                    width=width, height=height,
                    max_depth=max_depth, rr_start_depth=rr_start_depth,
                    F_cap=F_cap,
                )
                cycle_idx += 1
            if int(np.asarray(retired)) >= total:
                break
            if cycle_idx > hard_limit:
                raise RuntimeError(
                    f"portal scheduler stalled: {int(np.asarray(retired))}"
                    f"/{total} samples retired after {cycle_idx} cycles"
                )
        return accum, rays

    return pass_runner


def _round_block(n: int) -> int:
    return max(((n + CHEAP_BLOCK - 1) // CHEAP_BLOCK) * CHEAP_BLOCK,
               CHEAP_BLOCK)


def _round_resolve(n: int) -> int:
    return max(((n + RESOLVE_BLOCK - 1) // RESOLVE_BLOCK) * RESOLVE_BLOCK,
               RESOLVE_BLOCK)
