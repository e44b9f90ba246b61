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
import os

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.ops import rng
from path_tracer_tpu.ops.pallas.portal import (
    BUF_STATE, PARK_K, ROW_ACC, ROW_ALIVE, ROW_D, ROW_DEPTH, ROW_O, ROW_PIX,
    ROW_PREV, ROW_THR, ROWS, V2_ROW_DONE, V2_ROW_PIX, V2_ROW_QUOTA, V2_ROWS,
    V3_ROW_STARTED, buf_row, pool_rows, trace_cheap_blocked,
    trace_cheap_regen,
)
from path_tracer_tpu.ops.pallas.trace_kernel import BIG, trace_pallas_resolve

CHEAP_BLOCK = 2048
RESOLVE_BLOCK = 1024

# Read ONCE at import (like trace_kernel.CULL_CHUNK): the flag is consumed
# inside jitted drivers, so a post-compile env flip would silently keep the
# cached path anyway — a module constant makes the semantics unambiguous.
# Tests/ablations that need the fallback monkeypatch this attribute.
POOL_RESOLVE = os.environ.get("PT_TPU_POOL_RESOLVE", "1") != "0"

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


# ---------------------------------------------------------------------------
# v2: pixel-pinned pool — slot index IS the pixel. No compaction, no
# scatter-add, no refill op: regeneration happens in-kernel (the regen-loop
# discipline), retirement is one vectorized row-add at pass end. Profile of
# the v1 cycle that motivated this (scripts/profile_portal.py, 1M lanes):
# argsort-compaction 62 ms + scatter-retire 117 ms + cumsum-refill 27 ms per
# cycle — all three are gone here.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "portal_key", "cam_key", "max_depth", "rr_start_depth", "park_k",
        "resolve_bufs", "sort_lanes", "skip_kernel", "pool_resolve",
    ),
    donate_argnums=(0,),
)
def portal_cycle_v2(
    pool,
    quota,
    sample_base,
    cycle_seed,
    kscene: dict,
    step_cap=0,
    *,
    portal_key: str,
    cam_key: str,
    max_depth: int,
    rr_start_depth: int,
    park_k: int = 0,
    resolve_bufs: int | None = None,
    sort_lanes: int = 0,
    skip_kernel: bool = False,
    pool_resolve: bool | None = None,
):
    """One v2 cycle: cheap-advance-with-regen until every lane is frozen
    (park_k > 0: parked K-deep), quota-done, or step-capped, then ONE
    full-scene resolve bounce over the active path AND every parked buffer
    (concatenated along the lane axis — one sweep, (park_k+1)*n lanes).
    A capped-but-unfrozen lane simply has its next segment traced by the
    resolver (full scene ⊇ cheap scene — correct, it just pays a triangle
    sweep it would otherwise skip). Paths the resolver ends retire in
    place: the slot's done count bumps; surviving parked paths flip to
    BUF_STATE 2 (ready) for the next cheap call.
    Returns (pool', rays, unfinished)."""
    pool, c1 = trace_cheap_regen(
        pool, portal_key, cam_key, cycle_seed, quota, sample_base, step_cap,
        max_depth=max_depth, rr_start_depth=rr_start_depth,
        block=CHEAP_BLOCK, park_k=park_k,
    )
    pool, c2, unfinished = portal_resolve_phase(
        pool, quota, cycle_seed, kscene,
        portal_key=portal_key, max_depth=max_depth,
        rr_start_depth=rr_start_depth, park_k=park_k,
        resolve_bufs=resolve_bufs, sort_lanes=sort_lanes,
        skip_kernel=skip_kernel, pool_resolve=pool_resolve,
    )
    return pool, c1 + c2, unfinished


def _tile_slab_masks(o, d, kscene):
    """Per-lane candidate-tile data from slab tests: (poss [C, N] bool —
    the ray's t>=0 segment crosses tile c's AABB, t_en [C, N] entry
    distances). Pure vector math, ~6 ops per (tile, lane)."""
    lo = kscene["tile_lo"]  # [3, C]
    hi = kscene["tile_hi"]
    n_tiles = lo.shape[1]
    inv = [
        1.0 / jnp.where(jnp.abs(d[k]) < 1e-30, 1e-30, d[k])
        for k in range(3)
    ]
    t_en = jnp.zeros((n_tiles, o.shape[1]), jnp.float32)
    t_ex = jnp.full((n_tiles, o.shape[1]), BIG, jnp.float32)
    for k in range(3):
        ta = (lo[k][:, None] - o[k][None, :]) * inv[k][None, :]
        tb = (hi[k][:, None] - o[k][None, :]) * inv[k][None, :]
        t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
        t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
    poss = (t_ex >= t_en) & (t_ex >= 0.0)  # [C, N]
    return poss, t_en


def _counting_positions(key, n_buckets: int):
    """Stable counting-sort destination positions: pos[i] = where lane i
    lands when lanes are grouped by key (ascending), equal keys keeping
    their original order. K plain cumsums instead of an argsort — the
    argsort of the 3.1M-lane resolve input is what halved throughput in
    the round-2 sort experiment (PERF.md). Exact while n < 2^24 (f32
    0/1 cumsum; the pool is <= ~3.1M lanes)."""
    n = key.shape[0]
    pos = jnp.zeros(n, jnp.float32)
    total = jnp.float32(0.0)
    for k in range(n_buckets):
        m = key == k
        mf = m.astype(jnp.float32)
        r = jnp.cumsum(mf) - 1.0
        pos = jnp.where(m, total + r, pos)
        total = total + r[-1] + 1.0
    return pos.astype(jnp.int32)


def _resolve_sort_order(o, d, alive, kscene, mode: int):
    """(order, unsort) permutations grouping resolve lanes so
    RESOLVE_BLOCK-sized blocks become coherent: dead lanes cluster into
    blocks the kernel's all-dead skip eliminates outright, and alive
    lanes group so the kernel's per-tile conds can fire (the
    tile-candidacy study measured executed (block,tile) fraction
    100% -> 39% under a mask key — see PERF.md). All modes are stable
    (equal keys keep their original pixel-local order).

    modes 1/2 (argsort, measured 2x SLOWER end-to-end — kept as the
    baseline the counting modes are judged against):
      1 = dead-lane partition;  2 = + candidate-tile mask key.
    modes 3-6 (counting permutations — K cumsums, no sort network):
      3 = dead partition only (enables the all-dead block skip);
      4 = dead + direction octant (8 buckets of coherent directions);
      5 = dead + nearest-candidate-tile id (groups by spatial target);
      6 = dead + full candidate mask via LSB-first binary radix over the
          tile bits (the exact key the 39% measurement used)."""
    n = o.shape[1]
    dead_b = alive[0] <= 0.0
    if mode in (1, 2):
        key = dead_b.astype(jnp.int32) * jnp.int32(1 << 30)
        if mode >= 2 and "tile_lo" in kscene:
            poss, _ = _tile_slab_masks(o, d, kscene)
            n_tiles = poss.shape[0]
            # the key is only a grouping heuristic, so scenes with > 30
            # tiles just alias tiles onto the 30 bits below the dead flag
            # (OR, not sum — aliased sums could overflow into the dead
            # flag)
            mask = jnp.zeros(n, jnp.int32)
            for c in range(n_tiles):
                mask = mask | jnp.where(poss[c], jnp.int32(1 << (c % 30)), 0)
            key = key + mask
        order = jnp.argsort(key, stable=True)
        unsort = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        return order, unsort

    have_tiles = "tile_lo" in kscene
    if mode == 3 or not have_tiles:
        pos = _counting_positions(dead_b.astype(jnp.int32), 2)
    elif mode == 4:
        key = (
            (d[0] < 0.0).astype(jnp.int32)
            + 2 * (d[1] < 0.0).astype(jnp.int32)
            + 4 * (d[2] < 0.0).astype(jnp.int32)
        )
        pos = _counting_positions(jnp.where(dead_b, 8, key), 9)
    elif mode == 5:
        poss, t_en = _tile_slab_masks(o, d, kscene)
        n_tiles = poss.shape[0]
        nearest = jnp.argmin(
            jnp.where(poss, t_en, BIG), axis=0
        ).astype(jnp.int32)
        none = ~jnp.any(poss, axis=0)
        key = jnp.where(none, n_tiles, nearest)
        pos = _counting_positions(jnp.where(dead_b, n_tiles + 1, key),
                                  n_tiles + 2)
    else:  # mode 6: binary radix over the candidate-tile mask bits.
        # LSB-first stable passes sort by the full mask; compose each
        # pass's positions by gathering through the previous total. The
        # dead bit sorts last (most significant).
        poss, _ = _tile_slab_masks(o, d, kscene)
        n_tiles = poss.shape[0]
        bits = [poss[c].astype(jnp.int32) for c in range(n_tiles)]
        bits.append(dead_b.astype(jnp.int32) + 0 * bits[0])
        pos = None
        for b in bits:
            if pos is not None:
                # reorder this pass's key into the current ordering:
                # sorted_key[p] = key[lane at position p] → scatter
                b = jnp.zeros(n, jnp.int32).at[pos].set(
                    b, unique_indices=True)
            p_new = _counting_positions(b, 2)
            pos = p_new if pos is None else p_new[pos]
    order = jnp.zeros(n, jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return order, pos


def portal_resolve_phase(
    pool,
    quota,
    cycle_seed,
    kscene: dict,
    *,
    portal_key: str,
    max_depth: int,
    rr_start_depth: int,
    park_k: int = 0,
    resolve_bufs: int | None = None,
    sort_lanes: int = 0,
    skip_kernel: bool = False,
    pool_resolve: bool | None = None,
    uniforms=None,
):
    """The resolve half of a v2 cycle: one full-scene bounce over the
    active path and the first `resolve_bufs` parked buffers (default:
    all), then the pool bookkeeping (retire ended paths, flip surviving
    parked paths to ready). Buffers beyond `resolve_bufs` stay parked
    untouched (BUF_STATE 1) — lanes whose buffers are all frozen simply
    stall until a wider resolve runs, so a scheduler may alternate narrow
    and full resolves when the deeper buffers run mostly empty.
    Returns (pool', rays, unfinished).

    Production takes the POOL-NATIVE path: one kernel reads the pool rows
    directly, does the bounce AND the bookkeeping, and writes the pool
    back aliased (trace_pallas_resolve_pool) — bit-identical to the XLA
    composition below (same per-block PRNG streams), minus its ~15 ms of
    concat/select/reassemble glue per bulk cycle (PERF.md).
    pool_resolve=False (default: the import-time POOL_RESOLVE constant,
    i.e. PT_TPU_POOL_RESOLVE=0 in the environment) forces the old path;
    it is a static jit arg upstream, so an A/B in a live process retraces
    correctly. sort_lanes, skip_kernel and injected `uniforms` (testing)
    also use the old path."""
    from path_tracer_tpu.ops.pallas.portal import (
        BUF_DEPTH, BUF_O, BUF_PREV, BUF_ROWS, BUF_STATE, BUF_THR, buf_row,
        trace_pallas_resolve_pool,
    )
    from path_tracer_tpu.ops.pallas.trace_kernel import TILE_META

    nb = park_k if resolve_bufs is None else min(resolve_bufs, park_k)
    if pool_resolve is None:
        pool_resolve = POOL_RESOLVE
    if uniforms is None and not skip_kernel and not sort_lanes and pool_resolve:
        meta = TILE_META.get(portal_key, {})
        pool, c2 = trace_pallas_resolve_pool(
            pool, kscene, cycle_seed + jnp.int32(1), parts=nb + 1,
            max_depth=max_depth, rr_start_depth=rr_start_depth,
            block=RESOLVE_BLOCK,
            const_mat_tiles=meta.get("tile_uniform_mat"),
        )
        unfinished = jnp.sum(
            (pool[V2_ROW_DONE] < pool[V2_ROW_QUOTA]).astype(jnp.float32)
        )
        return pool, c2, unfinished
    n = pool.shape[1]
    zeros3 = jnp.zeros((3, n), jnp.float32)

    def buf(j, r, k=1):
        return pool[buf_row(j, r):buf_row(j, r) + k]

    def cat(parts):
        return jnp.concatenate(parts, axis=1)

    o_in = cat([pool[ROW_O:ROW_O + 3]]
               + [buf(j, BUF_O, 6)[:3] for j in range(nb)])
    d_in = cat([pool[ROW_D:ROW_D + 3]]
               + [buf(j, BUF_O, 6)[3:] for j in range(nb)])
    thr_in = cat([pool[ROW_THR:ROW_THR + 3]]
                 + [buf(j, BUF_THR, 3) for j in range(nb)])
    acc_in = cat([pool[ROW_ACC:ROW_ACC + 3]] + [zeros3] * nb)
    p_frozen = [buf(j, BUF_STATE) > 0.5 for j in range(nb)]
    p_frozen = [pf & (buf(j, BUF_STATE) < 1.5)
                for j, pf in enumerate(p_frozen)]
    alive_in = cat([pool[ROW_ALIVE:ROW_ALIVE + 1]]
                   + [pf.astype(jnp.float32) for pf in p_frozen])
    prev_in = cat([pool[ROW_PREV:ROW_PREV + 1]]
                  + [buf(j, BUF_PREV) for j in range(nb)])
    depth_in = cat([pool[ROW_DEPTH:ROW_DEPTH + 1]]
                   + [buf(j, BUF_DEPTH) for j in range(nb)])

    if sort_lanes:
        order, unsort = _resolve_sort_order(o_in, d_in, alive_in, kscene,
                                            sort_lanes)
        # one [15, N] gather in, one out — cheaper than 7 separate takes
        st = jnp.concatenate([o_in, d_in, thr_in, acc_in, alive_in,
                              prev_in, depth_in], axis=0)[:, order]
        (o_in, d_in, thr_in, acc_in) = (
            st[0:3], st[3:6], st[6:9], st[9:12])
        alive_in, prev_in, depth_in = st[12:13], st[13:14], st[14:15]

    # portal_key is static here, so this is a trace-time constant lookup
    meta = TILE_META.get(portal_key, {})
    if skip_kernel:
        # profiling-only (scripts/profile_v2_cycle.py): pass the resolve
        # input straight through so a timed cycle costs cheap + glue with
        # no resolve kernel. Frozen paths flip to ready un-advanced and
        # re-freeze next cheap call — the pool churns at bulk-like
        # occupancy forever, which is exactly the timing workload wanted.
        o, d, thr, acc, alive, prev, depth = (
            o_in, d_in, thr_in, acc_in, alive_in, prev_in, depth_in)
        c2 = jnp.zeros_like(alive_in)
    else:
        o, d, thr, acc, alive, prev, depth, c2 = trace_pallas_resolve(
            o_in, d_in, thr_in, acc_in, alive_in, prev_in, depth_in,
            kscene, cycle_seed + jnp.int32(1),
            max_depth=max_depth, rr_start_depth=rr_start_depth,
            block=RESOLVE_BLOCK, uniforms=uniforms,
            const_mat_tiles=meta.get("tile_uniform_mat"),
        )
    if sort_lanes:
        st = jnp.concatenate([o, d, thr, acc, alive, prev, depth],
                             axis=0)[:, unsort]
        o, d, thr, acc = st[0:3], st[3:6], st[6:9], st[9:12]
        alive, prev, depth = st[12:13], st[13:14], st[14:15]

    def part(x, j):  # part 0 = active path, part j>=1 = buffer j-1
        return x[:, j * n:(j + 1) * n]

    # active path: a resolver-ended path retires in place — the slot's
    # done count bumps and the lane regenerates in the next cheap call
    ended = (pool[ROW_ALIVE] > 0.0) & (part(alive, 0)[0] <= 0.0)
    done = pool[V2_ROW_DONE] + ended.astype(jnp.float32)
    rows = [part(o, 0), part(d, 0), part(thr, 0), part(acc, 0),
            part(alive, 0), part(prev, 0), part(depth, 0), done[None],
            pool[V2_ROW_PIX:V2_ROW_PIX + 1],
            pool[V2_ROW_QUOTA:V2_ROW_QUOTA + 1]]
    if park_k:
        rows.append(pool[V3_ROW_STARTED:V3_ROW_STARTED + 1])
        acc_extra = jnp.zeros((3, n), jnp.float32)
        for j in range(park_k):
            if j >= nb:  # untouched buffer: copy its 12 rows verbatim
                rows.append(pool[buf_row(j):buf_row(j) + BUF_ROWS])
                continue
            pj_alive = part(alive, j + 1)[0] > 0.0
            proc = p_frozen[j][0]
            # parked radiance lives in the slot acc (shared across the
            # slot's samples); the buffer sweep used a zero acc, so its
            # output is a pure delta
            acc_extra = acc_extra + part(acc, j + 1)
            done = done + (proc & ~pj_alive).astype(jnp.float32)
            ps_new = jnp.where(
                proc, jnp.where(pj_alive, 2.0, 0.0),
                pool[buf_row(j, BUF_STATE)],
            )
            rows += [
                jnp.where(proc, part(o, j + 1), buf(j, BUF_O, 3)),
                jnp.where(proc, part(d, j + 1), buf(j, BUF_O + 3, 3)),
                jnp.where(proc, part(thr, j + 1), buf(j, BUF_THR, 3)),
                jnp.where(proc, part(prev, j + 1), buf(j, BUF_PREV)),
                jnp.where(proc, part(depth, j + 1), buf(j, BUF_DEPTH)),
                ps_new[None],
            ]
        rows[3] = rows[3] + acc_extra  # slot acc
        rows[7] = done[None]
    pool = jnp.concatenate(rows, axis=0)
    unfinished = jnp.sum((done < pool[V2_ROW_QUOTA]).astype(jnp.float32))
    return pool, jnp.sum(c2), unfinished


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_cycles", "portal_key", "cam_key", "max_depth", "rr_start_depth",
        "park_k", "resolve_bufs", "sort_lanes", "pool_resolve",
    ),
    donate_argnums=(0,),
)
def portal_cycles_v2(
    pool,
    quota,
    sample_base,
    seed0,
    cycle0,
    kscene: dict,
    step_cap=0,
    *,
    n_cycles: int,
    portal_key: str,
    cam_key: str,
    max_depth: int,
    rr_start_depth: int,
    park_k: int = 0,
    resolve_bufs: int | None = None,
    sort_lanes: int = 0,
    pool_resolve: bool | None = None,
):
    """`n_cycles` v2 cycles in ONE dispatch (fori_loop over cheap+resolve).
    Small-pool cycles run in ~2 ms but each separate dispatch costs ~1.75 ms
    through the remote-TPU tunnel — the compacted tail pays hundreds of
    them. Seeds advance as if portal_cycle_v2 had been called per cycle
    with cycle index cycle0+i. Returns (pool', rays, unfinished).

    A per-cycle IN-LOOP redistribution variant was built and measured
    DEAD in r5 (mesh@64 spp): at full width it cost 96 vs 143 Mray/s
    (tiny adopted ranges churn + the cumsum/scatter sweep every cycle),
    and gated to the fused small-width drain it was neutral in all three
    short-render workloads — poll-cadence redistribution already
    re-tasks the drain as fast as laggards can donate."""

    def body(i, carry):
        pool, rays, _ = carry
        seed = seed0 + 2 * (cycle0 + i) + jnp.int32(1)
        pool, c1 = trace_cheap_regen(
            pool, portal_key, cam_key, seed, quota, sample_base, step_cap,
            max_depth=max_depth, rr_start_depth=rr_start_depth,
            block=CHEAP_BLOCK, park_k=park_k,
        )
        pool, c2, unfin = portal_resolve_phase(
            pool, quota, seed, kscene,
            portal_key=portal_key, max_depth=max_depth,
            rr_start_depth=rr_start_depth, park_k=park_k,
            resolve_bufs=resolve_bufs, sort_lanes=sort_lanes,
            pool_resolve=pool_resolve,
        )
        return pool, rays + c1 + c2, unfin

    return jax.lax.fori_loop(
        0, n_cycles, body,
        (pool, jnp.float32(0.0), jnp.float32(pool.shape[1])),
    )


def _redist_min(quota: int) -> int:
    """Minimum un-issued samples a redistribution split leaves on EACH
    half (PT_TPU_REDIST_MIN overrides). Scaled to the per-slot quota:
    the fixed 16 tuned at the 1024-spp headline makes the last 2*16
    samples of every laggard non-redistributable — 3% of a 1024-sample
    quota but HALF of a 64-sample one, which is exactly the short-render
    drain tail (VERDICT r5 #1). quota//16 keeps the non-distributable
    remainder at ~3% of any pass, floored at 2 (a split must move >= 2
    samples to be worth the slot re-tasking)."""
    env = os.environ.get("PT_TPU_REDIST_MIN")
    if env is not None:
        return int(env)
    return min(16, max(2, quota // 16))


# tail-compaction ladder: fixed pool widths (compile-once shapes) the
# unfinished tail is squeezed into once it fits. Measured need
# (scripts/profile_portal_v2.py, mesh 1024x768 quota 64): the pass spends
# 5 s retiring 99% of slots, then 467 more cycles x 55 ms sweeping the FULL
# 786K-lane pool for a dwindling <77K-slot tail — mesh-facing pixels freeze
# on every segment, so they need hundreds of cheap+resolve cycles. Squeezing
# them into 2048-65536-lane pools makes those cycles ~width-proportional.
# The 524288/393216/98304/32768 rungs came from the r5 short-render trace
# (scripts/trace_drive.py @64 spp): u sat at 550K..250K for 12 full-width
# cycles and at 19K for 8 cycles of a 65536 pool — each rung is one more
# compile-once shape that keeps cycle cost tracking the actual tail.
TAIL_LADDER = (524288, 393216, 262144, 131072, 98304, 65536, 32768,
               16384, 8192, 2048)


@functools.partial(jax.jit, static_argnames=("park_k",),
                   donate_argnums=(0, 1))
def redistribute_samples(pool, flush, min_rem: int = 64, *, park_k: int,
                         pix_offset=0):
    """Mid-pass work redistribution: finished slots adopt the upper half of
    the laggards' remaining sample ranges.

    The bulk phase decays to the mesh-facing slots' occupancy: wall-facing
    slots retire their whole quota early and their lanes ride dead while
    mesh-facing slots grind on (PERF.md 2026-08-19: the residual gap from
    183 to the 272 Mray/s full-occupancy bulk asymptote is exactly this
    within-pass raggedness). A DONOR (done >= quota, path dead, all park
    buffers empty) takes over a LAGGARD's un-issued upper range: donor gets
    (pix=laggard.pix, started=done=split, quota=laggard.quota) and the
    laggard's quota shrinks to split = quota - rem//2 — sample ids stay
    exactly partitioned, so per-pixel counts and the 2x2 subpixel
    stratification are preserved bit-for-bit in aggregate.

    The donor's own retired radiance is banked into `flush` ([n_flush, 4]:
    rgb + sample-count credit, scatter-add keyed by its OLD pixel) before
    its pix row changes; the drive surfaces `flush` as one synthetic stage
    at pass end. The count column keeps MID-pass per-pixel retired counts
    exact for progress snapshots: a donor's `done` row is a credit to its
    current pix that includes a phantom prefix of `split` adopted samples,
    so adoption banks +done at the old pixel and -split at the new one —
    summing raw `done` over stages + flush[:, 3] then equals the true
    per-pixel retired count at any instant. Matching is rank-k greedy
    (k-th donor <- k-th laggard, both in slot order) via two cumsums — no
    sort, no multi-row gather. Returns (pool', flush', n_pairs).

    pix_offset: subtracted from pixel ids when keying `flush` rows — the
    sharded runner passes each device's pixel-tile base so a LOCAL flush
    buffer serves global pixel ids (matching stays slot-local either
    way, so redistribution shards as-is)."""
    quota = pool[V2_ROW_QUOTA]
    done = pool[V2_ROW_DONE]
    started = pool[V3_ROW_STARTED] if park_k else done
    idx = jnp.arange(pool.shape[1], dtype=jnp.int32)

    rem = quota - started
    finished = (done >= quota) & (pool[ROW_ALIVE] <= 0.0)
    for j in range(park_k):
        finished &= pool[buf_row(j, BUF_STATE)] <= 0.5
    # both split halves must be worth a donor's warm-up (min_rem samples)
    lag = rem >= jnp.float32(2 * min_rem)

    don_rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
    lag_rank = jnp.cumsum(lag.astype(jnp.int32)) - 1
    n_don = don_rank[-1] + 1
    n_lag = lag_rank[-1] + 1
    n_pairs = jnp.minimum(n_don, n_lag)

    # laggards_at[r] = slot index of the r-th laggard (scatter; the +1
    # buffer absorbs non-laggard writes)
    C = pool.shape[1]
    laggards_at = jnp.zeros(C + 1, jnp.int32).at[
        jnp.where(lag, lag_rank, C)
    ].set(idx, mode="drop")[:C]

    split = quota - jnp.floor(rem * 0.5)  # laggard keeps the lower half
    new_quota = jnp.where(lag & (lag_rank < n_pairs), split, quota)

    take = finished & (don_rank < n_pairs)
    src = laggards_at[jnp.clip(don_rank, 0, C - 1)]
    pix = pool[V2_ROW_PIX]

    sp = split[src]
    # bank the donor's retired radiance + count credit under its OLD pixel
    # (non-take lanes scatter zeros at an arbitrary row), and cancel the
    # phantom `split` prefix the donor is about to credit to the NEW pixel
    off = jnp.asarray(pix_offset, jnp.float32)
    fpix = jnp.where(take, pix - off, jnp.float32(flush.shape[0] - 1))
    takef = take.astype(jnp.float32)
    contrib = jnp.concatenate([
        jnp.where(take[None], pool[ROW_ACC:ROW_ACC + 3], 0.0),
        (takef * done)[None],
    ])
    flush = flush.at[fpix.astype(jnp.int32)].add(contrib.T)
    npix_new = jnp.where(
        take, pix[src] - off, jnp.float32(flush.shape[0] - 1)
    )
    flush = flush.at[npix_new.astype(jnp.int32), 3].add(-takef * sp)

    pool = pool.at[V2_ROW_QUOTA].set(
        jnp.where(take, quota[src], new_quota))
    pool = pool.at[V2_ROW_PIX].set(jnp.where(take, pix[src], pix))
    pool = pool.at[V2_ROW_DONE].set(jnp.where(take, sp, done))
    if park_k:
        pool = pool.at[V3_ROW_STARTED].set(jnp.where(take, sp, started))
    for k in range(3):
        pool = pool.at[ROW_ACC + k].multiply(1.0 - take.astype(jnp.float32))
    return pool, flush, n_pairs


@jax.jit
def _flush_stage(flush, flush_pix=None):
    """Wrap the redistribution flush buffer ([n, 4] rgb+count keyed by row
    = pixel, or by the optional flush_pix [n] row->pixel map) as one
    synthetic stage so the pass runner's ordinary pix/acc scatter retires
    it (the count column is snapshot-only)."""
    n = flush.shape[0]
    st = jnp.zeros((V2_ROWS, n), jnp.float32)
    st = st.at[ROW_ACC:ROW_ACC + 3].set(flush[:, :3].T)
    pix = (jnp.arange(n, dtype=jnp.float32) if flush_pix is None
           else jnp.asarray(flush_pix, jnp.float32))
    st = st.at[V2_ROW_PIX].set(pix)
    return st


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _snapshot_stages(stages, flush, flush_pix=None, *, out_rows: int):
    """Mid-pass partial image: scatter every stage's retired radiance and
    sample counts by pixel id into [out_rows, 3] / [out_rows] buffers.

    `stages` is the drive's retired-pool tuple PLUS the live pool as the
    last element. Count ownership: a retired stage's slots with
    done < quota were compaction-moved (their state lives on in a later
    stage) so only done >= quota rows count there; the LIVE pool owns all
    its done counts. `flush` (may be None) adds the redistribution rgb +
    count credits. The live pool's acc rows include the in-flight sample's
    partial accumulation — a snapshot-only, preview-grade overshoot (the
    pass-end framebuffer merge is exact as ever)."""
    rad = jnp.zeros((out_rows, 3), jnp.float32)
    cnt = jnp.zeros((out_rows,), jnp.float32)
    for i, st in enumerate(stages):
        pix = st[V2_ROW_PIX].astype(jnp.int32)
        rad = rad.at[pix].add(st[ROW_ACC:ROW_ACC + 3].T)
        done = st[V2_ROW_DONE]
        if i + 1 < len(stages):
            done = jnp.where(done >= st[V2_ROW_QUOTA], done, 0.0)
        cnt = cnt.at[pix].add(done)
    if flush is not None:
        if flush_pix is None:
            rad = rad.at[: flush.shape[0]].add(flush[:, :3])
            cnt = cnt.at[: flush.shape[0]].add(flush[:, 3])
        else:
            fp = jnp.asarray(flush_pix, jnp.int32)
            rad = rad.at[fp].add(flush[:, :3])
            cnt = cnt.at[fp].add(flush[:, 3])
    return rad, cnt


def _with_cnt_base(rad_cnt, cnt_base):
    """Add a pass-local retired-count carry to a snapshot's counts.
    cnt_base holds the counts of stages merged-and-discarded at earlier
    PAUSEs of the same pass (their radiance already sits in accum, which
    previews add — without the carry those pixels normalize short and
    blow out). None = no pause happened yet."""
    if cnt_base is None:
        return rad_cnt
    rad, cnt = rad_cnt
    # cnt may be WIDER than cnt_base: single-device snapshots use
    # out_rows = max(pool_width, npix) while the carry is [npix]-shaped
    # (any npix that is not a CHEAP_BLOCK multiple, e.g. 450x300).
    # Scatter-add over the overlap instead of slice-adding.
    n = min(cnt.shape[0], cnt_base.shape[0])
    return rad, cnt.at[:n].add(cnt_base[:n])


@functools.partial(jax.jit, static_argnames=("out_rows",))
def _retired_counts(stages, flush, flush_pix=None, *, out_rows: int):
    """Per-pixel retired-sample counts of a drive's RETIRED stages (the
    compaction stages, NOT the final live pool) plus the flush credits —
    the counts that vanish when a PAUSE merges those stages into accum
    and discards them. Only done >= quota rows count (done < quota slots
    were compaction-moved and live on in a later stage); the live pool's
    done rows survive the thaw and are counted by the NEXT drive."""
    cnt = jnp.zeros((out_rows,), jnp.float32)
    for st in stages:
        pix = st[V2_ROW_PIX].astype(jnp.int32)
        done = jnp.where(st[V2_ROW_DONE] >= st[V2_ROW_QUOTA],
                         st[V2_ROW_DONE], 0.0)
        cnt = cnt.at[pix].add(done)
    if flush is not None:
        if flush_pix is None:
            cnt = cnt.at[: flush.shape[0]].add(flush[:, 3])
        else:
            cnt = cnt.at[jnp.asarray(flush_pix, jnp.int32)].add(flush[:, 3])
    return cnt


@functools.partial(jax.jit, donate_argnums=(0,))
def _compact_tail(pool, idx, valid):
    """Gather slots idx of `pool` into a smaller pool and zero their acc in
    the source, so radiance lives in exactly one pool at all times (every
    stage's acc rows scatter-add by pix at pass end). idx is padded to a
    fixed ladder width with arbitrary duplicates; `valid` masks real
    entries — padding lanes are fully zeroed (dead, no radiance, empty
    park buffers, done == quota == 0 so they are born retired and never
    issue), and the `.max` scatter ignores their duplicate column ids."""
    small = jnp.take(pool, idx, axis=1)
    v = valid.astype(jnp.float32)
    moved = jnp.zeros((pool.shape[1],), jnp.float32).at[idx].max(v)
    pool = pool.at[ROW_ACC:ROW_ACC + 3].multiply(1.0 - moved[None])
    small = small * v[None]
    return pool, small


@functools.partial(jax.jit, static_argnames=("target",), donate_argnums=(0,))
def _compact_tail_auto(pool, *, target: int):
    """_compact_tail with the gather indices computed ON DEVICE: stable-
    partition unfinished slots to the front (the same slot order as the
    host flatnonzero path it replaces — the sharded runner's per-device
    compact has always worked this way) and mask the padding tail.
    Avoids fetching two full pool rows ([2, W] f32 — 6 MB at the mesh
    headline width) through the tunnel at every ladder rung, a fixed
    per-render cost that matters on short low-spp renders."""
    unfin = pool[V2_ROW_DONE] < pool[V2_ROW_QUOTA]
    order = jnp.argsort(jnp.where(unfin, 0, 1).astype(jnp.int32),
                        stable=True)
    idx = order[:target].astype(jnp.int32)
    valid = jnp.arange(target) < jnp.sum(unfin.astype(jnp.int32))
    small = jnp.take(pool, idx, axis=1)
    v = valid.astype(jnp.float32)
    moved = jnp.zeros((pool.shape[1],), jnp.float32).at[idx].max(v)
    pool = pool.at[ROW_ACC:ROW_ACC + 3].multiply(1.0 - moved[None])
    small = small * v[None]
    return pool, small


@functools.lru_cache(maxsize=8)
def morton_pixel_order(width: int, height: int) -> np.ndarray:
    """[npix] i32: pixel id owned by each pool slot, in Morton (Z-curve)
    order over the image. RESOLVE_BLOCK consecutive slots then cover a
    ~32x32 pixel square instead of one raster stripe, so the lanes that
    freeze/park (mesh-facing pixels — spatially clustered in the image)
    land in the SAME resolve blocks and the non-facing blocks' parked
    buffers stay all-dead, which the kernel's block skip eliminates for
    free. This is the zero-cost form of the lane sort: the per-cycle
    permutation of the 3.1M-lane resolve input measured 2x SLOWER in
    every variant (argsort or counting — the 15-row column gather is the
    cost, see PERF.md); a static slot relabeling moves no data at all."""

    def part1by1(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    pix = np.arange(width * height, dtype=np.int64)
    x = (pix % width).astype(np.uint32)
    y = (pix // width).astype(np.uint32)
    key = part1by1(x) | (part1by1(y) << np.uint32(1))
    return np.argsort(key, kind="stable").astype(np.int32)


def freeze_pixel_order(portal_key: str, cam_key: str) -> np.ndarray:
    """[npix] i32 slot→pixel order partitioning pixels by whether their
    PRIMARY camera ray (center subpixel, no jitter) crosses the heavy-mesh
    AABB — freeze-prone pixels first, raster order within each group
    (PT_TPU_PIX_ORDER=freeze). CHEAP_BLOCK-sized pool blocks then hold
    behaviorally homogeneous lanes: blocks of non-crossing pixels never
    freeze on their primary segment and run the whole step budget
    productively, while fully freeze-prone blocks stall together and
    early-exit the cheap kernel's step loop instead of riding dead behind
    a few long wall-path runners. Bounce segments are classified by their
    PIXEL's primary behavior — approximate, but the mesh-facing set is
    what freezes every segment (see PERF.md cycle decomposition)."""
    from path_tracer_tpu.ops.pallas.trace_v2 import _SCENES

    _, _, (lo, hi) = _SCENES[portal_key]
    (sox, soy, soz), su, sv, lc, W, H = _SCENES[cam_key]
    pix = np.arange(W * H, dtype=np.int64)
    x = (pix % W).astype(np.float64)
    y = (H - 1) - (pix // W).astype(np.float64)
    sx = (x + 0.5) / W - 0.5
    sy = (y + 0.5) / H - 0.5
    so = (sox, soy, soz)
    sp = [so[k] + su[k] * sx + sv[k] * sy for k in range(3)]
    o = np.asarray(lc, np.float64)[:, None]
    d = np.stack([lc[k] - sp[k] for k in range(3)])
    inv = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
    ta = (np.asarray(lo, np.float64)[:, None] - o) * inv
    tb = (np.asarray(hi, np.float64)[:, None] - o) * inv
    t_en = np.minimum(ta, tb).max(0)
    t_ex = np.maximum(ta, tb).min(0)
    crosses = (t_ex >= t_en) & (t_ex > 0.0)
    return np.concatenate([pix[crosses], pix[~crosses]]).astype(np.int32)


def make_pool_v2(npix: int, n_pad: int, k_pass: int,
                 park_k: int | None = None, pix_order=None):
    """Fresh pixel-pinned pool: slot i owns pixel min(i, npix-1) — or
    pix_order[i] when a [npix] slot->pixel map is given (Morton order in
    production; see morton_pixel_order) — padding slots (i >= npix) are
    born fully retired so they never issue samples and contribute zero
    radiance. park_k defaults to the module's PARK_K at call time (tests
    lower it for the Pallas interpreter)."""
    if park_k is None:
        from path_tracer_tpu.ops.pallas import portal as _pm

        park_k = _pm.PARK_K
    pool = jnp.zeros((pool_rows(park_k), n_pad), jnp.float32)
    pool = pool.at[ROW_PREV].set(-1.0)
    if pix_order is None:
        pix = jnp.minimum(jnp.arange(n_pad, dtype=jnp.float32),
                          float(npix - 1))
    else:
        pix = jnp.concatenate([
            jnp.asarray(pix_order, jnp.int32).astype(jnp.float32),
            jnp.full((n_pad - npix,), float(int(pix_order[-1]))),
        ])
    pool = pool.at[V2_ROW_PIX].set(pix)
    # padding slots (i >= npix) are born retired as done == quota == 0 —
    # not done == k_pass — so they never issue (issued < quota is false)
    # AND contribute zero to per-pixel retired COUNTS (the mid-pass
    # snapshot normalizer scatters raw done by pix; a done=k_pass padding
    # slot would pile k_pass phantom samples onto the last pixel). Same
    # convention as _compact_tail's padding lanes.
    real = jnp.arange(n_pad) < npix
    pool = pool.at[V2_ROW_QUOTA].set(
        jnp.where(real, float(k_pass), 0.0).astype(jnp.float32)
    )
    return pool


def _pm_park_k() -> int:
    """The production parked-buffer depth, read at call time so tests can
    lower ops.pallas.portal.PARK_K for the interpreter."""
    from path_tracer_tpu.ops.pallas import portal as _pm

    return _pm.PARK_K


def _default_step_cap() -> int:
    """Cheap-kernel per-call step budget (PT_TPU_STEP_CAP, default 64 —
    swept on hardware, see PERF.md)."""
    return int(os.environ.get("PT_TPU_STEP_CAP", "64"))


def _stall_limits(k_pass, max_depth, check_every, full_every, *, narrow):
    """(stall_limit polls, hard_limit cycles) for drive_pool_v2's two
    runaway backstops. Under narrow resolves the unfinished count
    legitimately plateaus between periodic full resolves (parked samples
    only retire then), so both limits scale with how many polls a
    full-resolve period spans — otherwise a healthy narrow drive with
    full_every > 20*check_every would be misdiagnosed as stalled."""
    factor = max(1, -(-full_every // check_every)) if narrow else 1
    # the poll metric is the count of slots with done == quota; under a
    # big quota (the portal pass cap, up to 512) no slot retires until
    # deep into the bulk phase, so the no-progress patience scales with
    # the quota (neutral at the historical 64-spp pass size)
    quota_factor = max(1, k_pass // 64)
    return 20 * factor * quota_factor, \
        (256 + 4 * k_pass * (max_depth + 4)) * factor


def drive_pool_v2(
    pool,
    k_pass: int,
    sample_base: int,
    seed0,
    kscene: dict,
    *,
    portal_key: str,
    cam_key: str,
    max_depth: int,
    rr_start_depth: int,
    check_every: int = 4,
    ladder=TAIL_LADDER,
    step_cap: int | None = None,
    park_k: int | None = None,
    adaptive_polls: bool = True,
    on_check=None,
    narrow_bufs: int | None = None,
    full_every: int = 4,
    sort_lanes: int | None = None,
    cycle0: int = 0,
    return_result: bool = False,
    npix: int | None = None,
    cnt_base=None,
):
    """Cycle a pixel-pinned pool until every slot retires its quota,
    compacting the unfinished tail down the width `ladder` as it shrinks.

    The control loop (poll batching, stall/hard backstops, ladder walk,
    redistribution trigger, freeze-and-drain) is render.drive.drive_loop,
    shared with the sharded scheduler — this wrapper supplies the
    single-device cycle runner (dispatch fusion, narrow resolves) and the
    host-side tail compaction.

    Returns (stages, rays): `stages` is the list of finished pools (the
    original plus one per compaction, plus the redistribution flush as a
    synthetic final stage); summing every stage's acc rows keyed by its
    V2_ROW_PIX row reconstructs the retired radiance exactly.
    `on_check(cycle, width, unfin)` is called after each termination poll
    (progress/cancel/profiling hook); a truthy return stops the pass via
    FREEZE-AND-DRAIN (see render.drive): issuance stops, every started
    sample retires, and the stages hold exact retired state — nothing is
    discarded (reference parity: cancel keeps completed work,
    mod.rs:1002-1004). `return_result=True` returns the full
    drive.DriveResult (outcome CANCEL vs PAUSE, pre-freeze quota row for
    thaw/checkpoint) instead of the legacy tuple. A hook that declares a
    `snapshot` keyword (or **kwargs) receives a zero-arg callable
    computing the mid-pass partial image on device — (radiance [c0, 3],
    counts [c0]) keyed by pixel id, see _snapshot_stages — so progress
    renders can stream preview frames without 64-spp passes.

    narrow_bufs (requires park_k > 0): most cycles resolve only the active
    path + the first `narrow_bufs` parked buffers; every `full_every`-th
    cycle resolves everything (deeper buffers fill slowly — sweeping them
    every cycle is mostly dead vector work). None = always full.

    sort_lanes: permute the resolve input so blocks become coherent
    (1 = dead-lane partition, 2 = + candidate-tile mask grouping; see
    _resolve_sort_order). None reads PT_TPU_RESOLVE_SORT (default 0)."""
    from path_tracer_tpu.render import drive

    if sort_lanes is None:
        sort_lanes = int(os.environ.get("PT_TPU_RESOLVE_SORT", "0"))
    # bind the module constant per drive: a static jit arg, so an A/B that
    # flips portal.POOL_RESOLVE between drives retraces instead of silently
    # reusing the cached path (ADVICE r2)
    pool_resolve = POOL_RESOLVE
    if narrow_bufs is None:
        env_nb = os.environ.get("PT_TPU_NARROW_BUFS")
        if env_nb is not None:
            narrow_bufs = int(env_nb)
            full_every = int(os.environ.get("PT_TPU_FULL_EVERY", full_every))
            if narrow_bufs < 0:  # -1 disables via env
                narrow_bufs = None
    if step_cap is None:
        # swept on hardware with PARK_K=3: 32 -> 97.1, 64 -> 99.3 Mray/s,
        # 128 -> worse (fewer resolve rounds than parked work demands)
        step_cap = _default_step_cap()
    if park_k is None:  # infer the layout from the pool's row count
        from path_tracer_tpu.ops.pallas.portal import BUF_ROWS, V3_BUF_BASE

        park_k = (pool.shape[0] - V3_BUF_BASE) // BUF_ROWS \
            if pool.shape[0] > V2_ROWS else 0
    quota = jnp.int32(k_pass)
    sb = jnp.int32(sample_base)
    # mid-pass work redistribution (PT_TPU_REDIST=0 disables): finished
    # slots adopt the upper halves of laggards' remaining sample ranges at
    # poll cadence, holding bulk occupancy up (see redistribute_samples)
    redist = os.environ.get("PT_TPU_REDIST", "1") != "0"
    redist_min = _redist_min(k_pass)
    # a laggard needs >= 2*min_rem un-issued samples, so a small pass can
    # never redistribute — skip the branch (and its flush stage) entirely
    redist = redist and k_pass >= 2 * redist_min
    # flush/snapshot buffers are keyed by GLOBAL pixel id, so they must
    # cover npix even when the pool itself is narrower (a thawed pool
    # after a mid-pass pause, or a resume from a compacted checkpoint —
    # sized to the pool width, a redistribution credit for a high pixel
    # id would scatter out of bounds and corrupt/drop radiance)
    c0 = max(pool.shape[1], npix) if npix is not None else pool.shape[1]
    # stall = unfinished count not decreasing across polls (every cycle
    # advances every unfinished slot by >= 1 segment, so a healthy pool
    # strictly drains); an absolute ceiling backstops the backstop.
    stall_limit, hard_limit = _stall_limits(
        k_pass, max_depth, check_every, full_every,
        narrow=narrow_bufs is not None and bool(park_k))

    def run_cycles(pool, cycle, steps):
        # fusing cycles into one dispatch only pays where dispatch
        # overhead rivals the cycle (~1.75 ms through the remote-TPU
        # tunnel); on CPU (tests, interpreter) the fori-wrapped program
        # compiles pathologically slowly, so stay unfused there
        fuse = jax.default_backend() == "tpu"
        w = pool.shape[1]
        rays = jnp.float32(0.0)
        unfin = None
        done_steps = 0
        while done_steps < steps:
            rem = steps - done_steps
            rb = None
            if narrow_bufs is None or not park_k:
                n = rem
            else:
                pos = cycle % full_every
                if pos == full_every - 1:
                    n = 1  # this cycle is the periodic full resolve
                else:
                    n = min(full_every - 1 - pos, rem)
                    rb = narrow_bufs
            if w >= 131072 or not fuse:
                # big-pool cycles are ~50 ms — dispatch overhead is noise
                # there; one cycle per call keeps the XLA program count
                # down (scanning pays off only where the ~1.75 ms/dispatch
                # tunnel cost rivals the cycle itself)
                n = 1
            if n == 1:
                # unfused single cycle: skips the fori_loop wrapper (same
                # math; the wrapper's only job is amortizing dispatches)
                pool, r, unfin = portal_cycle_v2(
                    pool, quota, sb,
                    seed0 + jnp.int32(2 * cycle + 1), kscene,
                    jnp.int32(step_cap),
                    portal_key=portal_key, cam_key=cam_key,
                    max_depth=max_depth, rr_start_depth=rr_start_depth,
                    park_k=park_k, resolve_bufs=rb, sort_lanes=sort_lanes,
                    pool_resolve=pool_resolve,
                )
            else:
                pool, r, unfin = portal_cycles_v2(
                    pool, quota, sb, seed0, jnp.int32(cycle), kscene,
                    jnp.int32(step_cap), n_cycles=n,
                    portal_key=portal_key, cam_key=cam_key,
                    max_depth=max_depth, rr_start_depth=rr_start_depth,
                    park_k=park_k, resolve_bufs=rb, sort_lanes=sort_lanes,
                    pool_resolve=pool_resolve,
                )
            rays = rays + r
            cycle += n
            done_steps += n
        return pool, rays, unfin

    def poll(unfin):
        u = int(np.asarray(unfin))
        return u, u

    def compact_fn(pool, u):
        target = None
        for w in sorted(ladder, reverse=True):
            if u <= w < pool.shape[1]:
                target = w  # smallest ladder width that fits the tail
        if target is None:
            return None
        return _compact_tail_auto(pool, target=target)

    res = drive.drive_loop(
        pool,
        run_cycles=run_cycles,
        poll=poll,
        compact_fn=compact_fn,
        redistribute_fn=(
            (lambda p, fl: redistribute_samples(
                p, fl, redist_min, park_k=park_k)[:2])
            if redist else None
        ),
        new_flush=lambda: jnp.zeros((c0, 4), jnp.float32),
        snapshot_fn=lambda sts, fl: _with_cnt_base(
            _snapshot_stages(sts, fl, out_rows=c0), cnt_base
        ),
        k_pass=k_pass, max_depth=max_depth, step_cap=step_cap,
        park_k=park_k, check_every=check_every,
        batch_polls=adaptive_polls, stall_limit=stall_limit,
        hard_limit=hard_limit, on_check=on_check, cycle0=cycle0,
    )
    if return_result:
        return res
    stages = list(res.stages)
    if res.flush is not None:
        stages.append(_flush_stage(res.flush))
    return stages, res.rays


@functools.partial(jax.jit, static_argnames=("n_pad", "park_k"))
def _pool_from_rows(pix, done, quota, *, n_pad: int, park_k: int):
    """Pool whose first len(pix) slots continue the given per-slot sample
    ranges [done, quota) (resume from a mid-pass checkpoint / thaw after
    a pause); the remaining slots are born retired (done == quota == 0,
    pix 0 — they scatter zero radiance and zero counts)."""
    m = pix.shape[0]
    pool = jnp.zeros((pool_rows(park_k), n_pad), jnp.float32)
    pool = pool.at[ROW_PREV].set(-1.0)

    def row(vals):
        return jnp.concatenate(
            [jnp.asarray(vals, jnp.float32),
             jnp.zeros((n_pad - m,), jnp.float32)]
        )

    pool = pool.at[V2_ROW_PIX].set(row(pix))
    pool = pool.at[V2_ROW_DONE].set(row(done))
    pool = pool.at[V2_ROW_QUOTA].set(row(quota))
    if park_k:
        pool = pool.at[V3_ROW_STARTED].set(row(done))
    return pool


def make_portal_pass_runner_v2(
    *,
    portal_key: str,
    cam_key: str,
    npix: int,
    k_full: int,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    check_every: int | None = None,
    width: int | None = None,
    height: int | None = None,
    on_check=None,
    on_pause=None,
):
    """Build the v2 pipeline pass_runner. Each pass gives every pixel-slot a
    quota of k_pass samples; the pool cycles until every slot retires its
    quota (tail-compacting as slots finish), then every stage pool's acc
    rows scatter-add into the framebuffer keyed by V2_ROW_PIX. Per-pixel
    sample counts are exact by construction — the regen-loop discipline,
    portal-deferred. PT_TPU_PIX_ORDER=morton relabels slots along the
    image Z-curve (morton_pixel_order) — measured neutral on the mesh
    scene (see PERF.md), kept for sparser freeze patterns.

    on_check(cycle, width, unfin): forwarded to drive_pool_v2's poll —
    the pipeline's mid-pass progress/cancel/checkpoint hook (passes are
    up to the PORTAL pass cap spp, so pass boundaries are too coarse for
    any of them). Return False to continue, truthy to CANCEL, or the
    string "pause" to request a mid-pass checkpoint. Both stop via
    freeze-and-drain (render.drive), so every STARTED sample retires and
    merges exactly:

    - cancel: the retired radiance lands in the returned accum; the
      runner's .last_cancelled flips and .last_partial_counts holds the
      exact per-pixel retired counts [npix] for ragged normalization
      (reference parity: cancel keeps completed work, mod.rs:1002-1004
      — here at sample granularity, not pixel granularity).
    - pause: on_pause(accum_merged, (pix, done, quota) slot rows,
      pass_idx, k_pass) is called to persist the checkpoint; the pass
      then CONTINUES from the thawed pool in the same call.

    Resume: set .resume_slots = (pix, done, quota) host arrays before the
    pass call and the pool continues those exact per-slot sample ranges
    (every remaining sample id rendered exactly once — the finished
    render is scalar-normalizable as if never interrupted).

    .set_hooks(on_check=..., on_pause=...) rebinds either hook after
    construction — the pipeline attaches its progress/cancel/checkpoint
    closures this way, identically for this runner and the sharded one."""
    if check_every is None:
        check_every = int(os.environ.get("PT_TPU_CHECK_EVERY", "4"))
    n_pad = _round_block(npix)
    hooks = {"on_check": on_check, "on_pause": on_pause}

    def set_hooks(on_check=None, on_pause=None):
        if on_check is not None:
            hooks["on_check"] = on_check
        if on_pause is not None:
            hooks["on_pause"] = on_pause

    def pass_runner(scene_bufs, cam, accum, pass_idx, k_pass, base_key):
        from path_tracer_tpu.render import drive

        pass_runner.last_cancelled = False
        pass_runner.last_partial_counts = None
        sample_base = pass_idx * k_full
        pass_key = rng.chunk_key(base_key, pass_idx)
        seed0 = (
            jax.random.key_data(pass_key).reshape(-1)[-1].astype(jnp.int32)
        )
        park_k = _pm_park_k()

        resume = getattr(pass_runner, "resume_slots", None)
        pass_runner.resume_slots = None
        # checkpointed cycle counter (pipeline sets it from the npz): the
        # per-cycle seeds continue where the interrupted run stopped
        resume_cycle0 = int(getattr(pass_runner, "resume_cycle0", 0) or 0) \
            if resume is not None else 0
        pass_runner.resume_cycle0 = None
        if resume is not None:
            pix_r, done_r, quota_r = (np.asarray(a) for a in resume)
            w = _round_block(len(pix_r))
            pool = _pool_from_rows(
                jnp.asarray(pix_r, jnp.float32),
                jnp.asarray(done_r, jnp.float32),
                jnp.asarray(quota_r, jnp.float32),
                n_pad=w, park_k=park_k,
            )
        else:
            # default row: the Morton relabeling measured NEUTRAL on
            # hardware (93.6-98.5 vs 96.9 Mray/s, same session) — parked
            # buffers run 51-77% alive in the bulk phase, so no slot
            # order can produce all-dead resolve blocks there, and the
            # compaction ladder already handles the drain. Kept
            # selectable for scenes whose freeze pattern is sparser.
            order_env = os.environ.get("PT_TPU_PIX_ORDER", "row")
            use_morton = (width is not None and height is not None
                          and width * height == npix
                          and order_env == "morton")
            if use_morton:
                pix_order = morton_pixel_order(width, height)
            elif order_env == "freeze":
                pix_order = freeze_pixel_order(portal_key, cam_key)
            else:
                pix_order = None
            pool = make_pool_v2(npix, n_pad, k_pass, park_k=park_k,
                                pix_order=pix_order)

        rays = jnp.float32(0.0)
        # resume from a checkpoint continues the saved cycle counter so
        # the per-cycle PRNG seeds (seed0 + 2*cycle + 1) never replay the
        # schedule that generated the already-banked samples — replayed
        # seeds on the same lane layout would duplicate camera jitter and
        # path randoms of earlier samples (correlated, not independent)
        cycle0 = resume_cycle0
        # per-pixel retired counts of stages merged-and-discarded at
        # PAUSEs of this pass (their radiance is in accum; without this
        # carry a later cancel/preview normalizes those pixels short)
        cnt_pass = None
        while True:
            res = drive_pool_v2(
                pool, k_pass, sample_base, seed0, scene_bufs["kernel"],
                portal_key=portal_key, cam_key=cam_key,
                max_depth=max_depth, rr_start_depth=rr_start_depth,
                check_every=check_every, park_k=park_k,
                # poll batching is tunnel economics; on CPU (tests,
                # interpreter) a 16-cycle burst turns a 2-cycle render
                # into minutes and hides mid-pass polls entirely
                adaptive_polls=jax.default_backend() == "tpu",
                on_check=hooks["on_check"], cycle0=cycle0,
                return_result=True, npix=npix, cnt_base=cnt_pass,
            )
            rays = rays + res.rays
            # merge the retired radiance — every stage scatters by its
            # PIX row (slot position is not a pixel id once
            # redistribution or a resume has re-tasked slots)
            stages = list(res.stages)
            if res.flush is not None:
                stages.append(_flush_stage(res.flush))
            for st in stages:
                pix = st[V2_ROW_PIX].astype(jnp.int32)
                accum = accum.at[pix].add(st[ROW_ACC:ROW_ACC + 3].T)
            if res.outcome == drive.DONE:
                return accum, rays
            if res.outcome == drive.CANCEL:
                # exact per-pixel retired counts for the partial image
                # (acc holds ONLY retired radiance after a drain) — plus
                # the counts carried over earlier pauses of this pass
                _, cnt = _snapshot_stages(
                    tuple(res.stages), res.flush,
                    out_rows=max(npix, res.stages[0].shape[1]),
                )
                if cnt_pass is not None:
                    cnt = cnt.at[: npix].add(cnt_pass[:npix])
                pass_runner.last_cancelled = True
                pass_runner.last_partial_counts = cnt[:npix]
                return accum, rays
            # PAUSE: persist (radiance already merged into accum; the
            # remaining work is the slot rows), then continue the pass.
            # The final live pool's done rows survive the thaw (the next
            # drive counts them); only the discarded compaction stages'
            # counts and the flush credits need carrying.
            live = res.stages[-1]
            delta = _retired_counts(
                tuple(res.stages[:-1]), res.flush,
                out_rows=max(npix, live.shape[1]),
            )[:npix]
            cnt_pass = delta if cnt_pass is None else cnt_pass + delta
            if hooks["on_pause"] is not None:
                pass_runner.last_pause_cycles = res.cycles
                slot_rows = drive.drained_slot_state(live, res.frozen_quota)
                hooks["on_pause"](accum, slot_rows, pass_idx, k_pass)
            pool = drive.thaw_pool(live, res.frozen_quota, park_k=park_k)
            cycle0 = res.cycles

    pass_runner.last_cancelled = False
    pass_runner.last_partial_counts = None
    pass_runner.resume_slots = None
    pass_runner.resume_cycle0 = None
    pass_runner.last_pause_cycles = 0
    pass_runner.set_hooks = set_hooks
    # progress denominator: unfinished-slot polls count real slots (the
    # sharded runner has sp duplicates per pixel — see its total_slots)
    pass_runner.total_slots = npix
    # mid-pass checkpoints are POSITIONAL slot rows; the layout tag guards
    # a resume against a different pool topology (see pipeline resume)
    pass_runner.slot_layout = "single"
    return pass_runner


def _round_block(n: int) -> int:
    return max(((n + CHEAP_BLOCK - 1) // CHEAP_BLOCK) * CHEAP_BLOCK,
               CHEAP_BLOCK)


def _round_resolve(n: int) -> int:
    return max(((n + RESOLVE_BLOCK - 1) // RESOLVE_BLOCK) * RESOLVE_BLOCK,
               RESOLVE_BLOCK)
