"""Sharded portal-deferred rendering: the v2 pool over a device mesh.

The reference parallelizes EVERY scene across all cores
(/root/reference/src/render/mod.rs:1020-1023); this is the missing analog
for triangle-heavy (portal-mode) scenes — round 2 covered sphere/regen
scenes only and portal scenes silently fell off the sharded path.

Design: the pixel-pinned pool is embarrassingly parallel — slots never
communicate (each owns a pixel's samples; retirement is a pass-end
scatter-add). So the pool's lane axis is sharded over the WHOLE mesh:

- ``dp`` shards own disjoint pixel tiles (slot -> pixel maps are local),
- ``sp`` shards duplicate each tile with the pass quota SPLIT between them
  (shard j of sp traces samples [start_j, start_j+cnt_j) of each pixel's
  k_pass — the same runtime-quota split as parallel.mesh's regen path),

giving ndev independent pools that run their cheap/resolve Pallas kernels
under one ``shard_map`` per cycle. Cross-device traffic is exactly: the
per-poll ``psum`` of unfinished counts (a scalar), and the pass-end
framebuffer scatter-add (XLA collectives over ICI). Tail compaction is
per-device (each device argsort-partitions its OWN slots), so the ladder
needs no resharding.

RNG: per-device streams decorrelate via a device-index seed offset; images
are deterministic for a fixed (seed, mesh topology, pass schedule).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from path_tracer_tpu.ops.pallas.portal import (
    ROW_ACC, V2_ROW_DONE, V2_ROW_PIX, V2_ROW_QUOTA, V3_ROW_STARTED,
    pool_rows, trace_cheap_regen,
)
from path_tracer_tpu.render import portal as rportal

# per-device tail-compaction rungs (lanes/device); same rationale as
# render.portal.TAIL_LADDER, halved at the top because each device's pool
# is already 1/ndev of the frame
DEV_TAIL_LADDER = (131072, 65536, 16384, 8192, 2048)

_SEED_STRIDE = jnp.int32(1000003)  # decorrelate per-device PRNG streams


def _quota_split(k_pass, j, sp: int):
    """Shard j of sp gets cnt samples of each pixel's k_pass, starting at
    start (disjoint cover of [0, k_pass); same split as parallel.mesh)."""
    base = k_pass // sp
    rem = k_pass - base * sp
    cnt = base + (j < rem).astype(jnp.int32)
    start = j * base + jnp.minimum(j, rem)
    return cnt, start


def _pool_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, ("dp", "sp")))


def make_sharded_portal_runner(
    mesh: Mesh,
    *,
    portal_key: str,
    cam_key: str,
    npix: int,
    k_full: int,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    check_every: int = 4,
    on_check: Callable | None = None,
) -> Callable:
    """Build a pipeline pass_runner that drives one v2 pool per device.

    Signature matches pipeline.render's pass_runner:
    (scene_bufs, cam, accum, pass_idx, k_pass, base_key) -> (accum, rays);
    accum is [npix_pad, 3] sharded P("dp", None). k_full is the FULL pass
    size; any k_pass <= k_full (ragged remainders included) rides the same
    compiled programs as runtime quotas.

    on_check(cycle, width, unfin) is the mid-pass progress/cancel poll hook
    (see drive_pool_v2); a truthy return aborts the pass (whole passes
    only — the partial pool's ragged radiance is discarded).
    """
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    ndev = dp * sp
    park_k = rportal._pm_park_k()
    rows = pool_rows(park_k)
    npix_local = -(-npix // dp)
    n_local = rportal._round_block(npix_local)
    sharding = _pool_sharding(mesh)
    replicated = NamedSharding(mesh, P())
    dev_spec = P(("dp", "sp"))

    @functools.partial(jax.jit, static_argnames=())
    def make_pool(k_pass):
        def local(k_pass):
            i = lax.axis_index("dp")
            j = lax.axis_index("sp")
            cnt, _ = _quota_split(k_pass, j, sp)
            l = jnp.arange(n_local, dtype=jnp.int32)
            pixg = i * npix_local + l
            valid = (l < npix_local) & (pixg < npix)
            pool = jnp.zeros((rows, n_local), jnp.float32)
            pool = pool.at[rportal.ROW_PREV].set(-1.0)
            pool = pool.at[V2_ROW_PIX].set(
                jnp.minimum(pixg, npix - 1).astype(jnp.float32)
            )
            # padding slots are born retired as done == quota == 0 so
            # they never issue samples and contribute zero radiance AND
            # zero per-pixel counts (same convention as make_pool_v2)
            pool = pool.at[V2_ROW_QUOTA].set(
                jnp.where(valid, cnt, 0).astype(jnp.float32)
            )
            return pool

        return jax.shard_map(
            local, mesh=mesh, in_specs=(P(),), out_specs=P(None, ("dp", "sp")),
            check_vma=False,
        )(k_pass)

    @functools.partial(
        jax.jit,
        static_argnames=("pool_resolve",),
        donate_argnums=(0,),
    )
    def cycle(pool, k_pass, sample_base, seed, kscene, step_cap,
              *, pool_resolve: bool):
        """One sharded v2 cycle. Returns (pool', rays_total,
        unfin_per_device [ndev])."""

        def local(pool_loc, k_pass, sample_base, seed, kscene, step_cap):
            i = lax.axis_index("dp")
            j = lax.axis_index("sp")
            g = i * sp + j
            cnt, start = _quota_split(k_pass, j, sp)
            seed_loc = seed + (g + jnp.int32(1)) * _SEED_STRIDE
            pool_loc, c1 = trace_cheap_regen(
                pool_loc, portal_key, cam_key, seed_loc, cnt,
                sample_base + start, step_cap,
                max_depth=max_depth, rr_start_depth=rr_start_depth,
                block=rportal.CHEAP_BLOCK, park_k=park_k,
            )
            pool_loc, c2, unfin = rportal.portal_resolve_phase(
                pool_loc, cnt, seed_loc, kscene,
                portal_key=portal_key, max_depth=max_depth,
                rr_start_depth=rr_start_depth, park_k=park_k,
                pool_resolve=pool_resolve,
            )
            return (
                pool_loc,
                lax.psum(c1 + c2, ("dp", "sp")),
                unfin.reshape(1),
            )

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, ("dp", "sp")), P(), P(), P(), P(), P()),
            out_specs=(P(None, ("dp", "sp")), P(), dev_spec),
            check_vma=False,
        )(pool, k_pass, sample_base, seed, kscene, step_cap)

    @functools.partial(
        jax.jit, static_argnames=("target",), donate_argnums=(0,)
    )
    def compact(pool, *, target: int):
        """Per-device tail compaction: each device partitions its OWN slots
        (unfinished first, stable) and keeps the first `target`. Moved
        slots' acc is zeroed in the source so radiance lives in exactly one
        stage (same invariant as render.portal._compact_tail); padding
        lanes are fully zeroed and born retired."""

        def local(pool_loc):
            unfin = pool_loc[V2_ROW_DONE] < pool_loc[V2_ROW_QUOTA]
            order = jnp.argsort(
                jnp.where(unfin, 0, 1).astype(jnp.int32), stable=True
            )
            small = jnp.take(pool_loc, order[:target], axis=1)
            n_unfin = jnp.sum(unfin.astype(jnp.int32))
            valid = jnp.arange(target) < n_unfin
            # padding lanes are fully zeroed: done == quota == 0 means born
            # retired, no issuing, no radiance
            small = small * valid.astype(jnp.float32)[None]
            keep = 1.0 - unfin.astype(jnp.float32)
            pool_loc = pool_loc.at[ROW_ACC:ROW_ACC + 3].multiply(keep[None])
            return pool_loc, small

        return jax.shard_map(
            local, mesh=mesh, in_specs=(P(None, ("dp", "sp")),),
            out_specs=(P(None, ("dp", "sp")), P(None, ("dp", "sp"))),
            check_vma=False,
        )(pool)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_stage(accum, stage):
        """Scatter a finished stage's radiance into the dp-sharded accum.
        Slots only touch their own dp tile's rows, but the pix indices are
        global — GSPMD lowers the scatter (collectives over ICI as
        needed). Once per stage per pass, so off the hot path."""
        pix = stage[V2_ROW_PIX].astype(jnp.int32)
        return accum.at[pix].add(stage[ROW_ACC:ROW_ACC + 3].T)

    def pass_runner(scene_bufs, cam, accum, pass_idx, k_pass, base_key):
        from path_tracer_tpu.ops import rng

        pass_runner.last_cancelled = False
        kscene = scene_bufs["kernel"]
        pass_key = rng.chunk_key(base_key, pass_idx)
        seed0 = (
            jax.random.key_data(pass_key).reshape(-1)[-1].astype(jnp.int32)
        )
        sample_base = jnp.int32(pass_idx * k_full)
        kq = jnp.int32(k_pass)
        step_cap = jnp.int32(rportal._default_step_cap())
        pool_resolve = rportal.POOL_RESOLVE
        pool = make_pool(kq)

        ladder = tuple(w for w in DEV_TAIL_LADDER if w < n_local)
        stall_limit, hard_limit = rportal._stall_limits(
            k_pass, max_depth, check_every, 1, narrow=False
        )
        stages = []
        rays = jnp.float32(0.0)
        cycle_idx = 0
        stalled_polls = 0
        last_u = None
        cancelled = False
        # poll batching amortizes the ~25 ms queue-draining tunnel
        # round-trip per poll — a hardware economics; on CPU (tests,
        # interpreter) each cycle is SECONDS, so overshooting the drain by
        # a 32-cycle burst turns a 2-cycle test render into hours
        batch_polls = jax.default_backend() == "tpu"
        while True:
            unfin = None
            w = pool.shape[1]
            # poll batching: same economics as drive_pool_v2 (each poll is
            # a queue-draining host round-trip); per-device widths shrink
            # down the ladder
            if not batch_polls:
                steps = check_every
            elif w >= 131072:
                steps = (2 if k_pass >= 256 else 1) * check_every
            elif w >= 16384:
                steps = 2 * check_every
            elif w > 2048:
                steps = 4 * check_every
            else:
                steps = 8 * check_every
            if batch_polls and cycle_idx == 0:
                per_cycle = int(step_cap) + park_k + 1
                steps = max(
                    steps,
                    min(k_pass // max(per_cycle, 1), 16 * check_every),
                )
            for _ in range(steps):
                pool, r, unfin = cycle(
                    pool, kq, sample_base,
                    seed0 + jnp.int32(2 * cycle_idx + 1), kscene, step_cap,
                    pool_resolve=pool_resolve,
                )
                rays = rays + r
                cycle_idx += 1
            per_dev = np.asarray(unfin)
            u = int(per_dev.sum())
            if on_check is not None and on_check(cycle_idx, w, u):
                cancelled = True
                break
            if u == 0:
                stages.append(pool)
                break
            stalled_polls = stalled_polls + 1 if u == last_u else 0
            last_u = u
            if stalled_polls >= stall_limit or cycle_idx > hard_limit:
                raise RuntimeError(
                    f"sharded portal scheduler stalled: {u} slots "
                    f"unfinished after {cycle_idx} cycles"
                )
            u_max = int(per_dev.max())
            target = None
            for wl in sorted(ladder, reverse=True):
                if u_max <= wl < pool.shape[1]:
                    target = wl
            if target is not None:
                pool, small = compact(pool, target=target)
                stages.append(pool)
                pool = small

        if cancelled:
            # whole passes only: the partial pool's per-slot counts are
            # ragged and cannot merge into the framebuffer exactly
            pass_runner.last_cancelled = True
            return accum, jnp.float32(0.0)
        for st in stages:
            accum = scatter_stage(accum, st)
        return accum, rays

    pass_runner.last_cancelled = False
    return pass_runner
