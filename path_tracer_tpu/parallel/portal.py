"""Sharded portal-deferred rendering: the v2 pool over a device mesh.

The reference parallelizes EVERY scene across all cores
(/root/reference/src/render/mod.rs:1020-1023); this is the analog for
triangle-heavy (portal-mode) scenes.

Design: the pixel-pinned pool is embarrassingly parallel — slots never
communicate (each owns a pixel's samples; retirement is a pass-end
scatter-add). So the pool's lane axis is sharded over the WHOLE mesh:

- ``dp`` shards own disjoint pixel tiles (slot -> pixel maps are local),
- ``sp`` shards duplicate each tile with the pass quota SPLIT between them
  (shard j of sp traces samples [start_j, start_j+cnt_j) of each pixel's
  k_pass — the same runtime-quota split as parallel.mesh's regen path),

giving ndev independent pools that run their cheap/resolve Pallas kernels
under one ``shard_map`` per cycle. Cross-device traffic is exactly: the
per-poll fetch of per-device unfinished counts, and the pass-end
framebuffer scatter-add (XLA collectives over ICI). Tail compaction is
per-device (each device argsort-partitions its OWN slots), so the ladder
needs no resharding.

The drive loop — poll batching, stall backstops, ladder walk, mid-pass
sample REDISTRIBUTION, freeze-and-drain cancellation and mid-pass
checkpoints — is render.drive.drive_loop, shared verbatim with the
single-device scheduler; this module supplies only the shard_map'd cycle
/ compaction / redistribution callables. Redistribution is slot-local,
so each device re-tasks its own finished slots onto its own laggards
(same +28% occupancy mechanism as the single-device pool, PERF.md
2026-08-19); donors bank credits into a device-local flush buffer keyed
by the device's pixel tile.

RNG: per-device streams decorrelate via a device-index seed offset; images
are deterministic for a fixed (seed, mesh topology, pass schedule).
"""

from __future__ import annotations

import functools
import os
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


@functools.lru_cache(maxsize=32)
def _device_fns(
    mesh: Mesh,
    portal_key: str,
    cam_key: str,
    npix: int,
    max_depth: int,
    rr_start_depth: int,
    park_k: int,
):
    """The jitted device callables of the sharded portal runner, cached by
    (mesh, scene, shape) so repeated renders REUSE compiled programs.

    These were local defs of make_sharded_portal_runner until 2026-08-21:
    a fresh ``jax.jit`` object per render meant every pool width of the
    compaction ladder was re-traced and re-loaded from the persistent
    compile cache on EVERY render — measured 28 vs 244.8 Mray/s plain on
    the mesh headline (8.7x; scripts/trace_drive.py shows the identical
    cycle schedule with 12-36 s stalls at each width transition, and
    scripts/profile_sharded_cycle.py shows the shard_map'd cycle itself
    is byte-for-byte as fast as the plain one)."""
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    ndev = dp * sp
    rows = pool_rows(park_k)
    npix_local = -(-npix // dp)
    n_local = rportal._round_block(npix_local)
    sharding = _pool_sharding(mesh)
    dev_spec = P(("dp", "sp"))
    flush_sharding = NamedSharding(mesh, P(("dp", "sp"), None))

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

    @functools.partial(
        jax.jit, static_argnames=("min_rem",), donate_argnums=(0, 1)
    )
    def redistribute(pool, flush, *, min_rem: int):
        """Per-device mid-pass redistribution: each device's finished
        slots adopt its own laggards' remaining upper half-ranges
        (slot-local matching — render.portal.redistribute_samples runs
        unchanged per shard). Credits land in the device's slice of the
        flush buffer, keyed by pixel MINUS the device's tile base."""

        def local(pool_loc, flush_loc):
            i = lax.axis_index("dp")
            pool_loc, flush_loc, _ = rportal.redistribute_samples(
                pool_loc, flush_loc, min_rem, park_k=park_k,
                pix_offset=(i * npix_local).astype(jnp.float32),
            )
            return pool_loc, flush_loc

        return jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, ("dp", "sp")), P(("dp", "sp"), None)),
            out_specs=(P(None, ("dp", "sp")), P(("dp", "sp"), None)),
            check_vma=False,
        )(pool, flush)

    def _flush_pix_map(n_flush_local: int) -> np.ndarray:
        """Global row -> pixel id for the sharded flush buffer: device
        d = row // n_flush_local owns dp tile i = d // sp; local row r
        keys pixel i*npix_local + r (trash rows clip to npix-1 — they
        only ever accumulate zeros)."""
        r = np.arange(ndev * n_flush_local, dtype=np.int64)
        i = (r // n_flush_local) // sp
        pix = i * npix_local + (r % n_flush_local)
        return np.minimum(pix, npix - 1).astype(np.int32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scatter_stage(accum, stage):
        """Scatter a finished stage's radiance into the dp-sharded accum.
        Slots only touch their own dp tile's rows, but the pix indices are
        global — GSPMD lowers the scatter (collectives over ICI as
        needed). Once per stage per pass, so off the hot path."""
        pix = stage[V2_ROW_PIX].astype(jnp.int32)
        return accum.at[pix].add(stage[ROW_ACC:ROW_ACC + 3].T)

    import types

    return types.SimpleNamespace(
        dp=dp, sp=sp, ndev=ndev, rows=rows, npix_local=npix_local,
        n_local=n_local, sharding=sharding, flush_sharding=flush_sharding,
        make_pool=make_pool, cycle=cycle, compact=compact,
        redistribute=redistribute, scatter_stage=scatter_stage,
        flush_pix_map=_flush_pix_map,
    )


def make_sharded_portal_runner(
    mesh: Mesh,
    *,
    portal_key: str,
    cam_key: str,
    npix: int,
    k_full: int,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    check_every: int | None = None,
    on_check: Callable | None = None,
    on_pause: Callable | None = None,
) -> Callable:
    """Build a pipeline pass_runner that drives one v2 pool per device.

    Signature matches pipeline.render's pass_runner:
    (scene_bufs, cam, accum, pass_idx, k_pass, base_key) -> (accum, rays);
    accum is [npix_pad, 3] sharded P("dp", None). k_full is the FULL pass
    size; any k_pass <= k_full (ragged remainders included) rides the same
    compiled programs as runtime quotas.

    The device callables come from the lru-cached _device_fns, so
    repeated renders (and repeated runner constructions) reuse compiled
    programs — the runner itself only holds per-render mutable state
    (hooks, resume slots, cancel results).

    on_check(cycle, width, unfin) is the mid-pass progress/cancel poll
    hook (see render.drive): falsy continues, truthy CANCELs, "pause"
    requests a mid-pass checkpoint. Both stop via freeze-and-drain, so
    every started sample retires and merges exactly — .last_cancelled /
    .last_partial_counts / on_pause / .resume_slots behave exactly as in
    render.portal.make_portal_pass_runner_v2 (the slot rows are global,
    positionally device-mapped; a resume needs the same mesh shape)."""
    if check_every is None:
        check_every = int(os.environ.get("PT_TPU_CHECK_EVERY", "4"))
    park_k = rportal._pm_park_k()
    fns = _device_fns(
        mesh, portal_key, cam_key, npix, max_depth, rr_start_depth, park_k
    )
    dp, sp, ndev = fns.dp, fns.sp, fns.ndev
    rows, n_local = fns.rows, fns.n_local
    npix_local = fns.npix_local
    sharding, flush_sharding = fns.sharding, fns.flush_sharding
    make_pool, cycle, compact = fns.make_pool, fns.cycle, fns.compact
    redistribute, scatter_stage = fns.redistribute, fns.scatter_stage
    _flush_pix_map = fns.flush_pix_map

    hooks = {"on_check": on_check, "on_pause": on_pause}

    def set_hooks(on_check=None, on_pause=None):
        if on_check is not None:
            hooks["on_check"] = on_check
        if on_pause is not None:
            hooks["on_pause"] = on_pause

    def pass_runner(scene_bufs, cam, accum, pass_idx, k_pass, base_key):
        from path_tracer_tpu.ops import rng
        from path_tracer_tpu.render import drive

        pass_runner.last_cancelled = False
        pass_runner.last_partial_counts = None
        kscene = scene_bufs["kernel"]
        pass_key = rng.chunk_key(base_key, pass_idx)
        seed0 = (
            jax.random.key_data(pass_key).reshape(-1)[-1].astype(jnp.int32)
        )
        sample_base = jnp.int32(pass_idx * k_full)
        kq = jnp.int32(k_pass)
        step_cap = int(rportal._default_step_cap())
        pool_resolve = rportal.POOL_RESOLVE

        resume = getattr(pass_runner, "resume_slots", None)
        pass_runner.resume_slots = None
        # checkpointed cycle counter: continue the per-cycle PRNG seed
        # schedule instead of replaying the seeds that generated the
        # already-banked samples (see render.portal's resume_cycle0)
        resume_cycle0 = int(getattr(pass_runner, "resume_cycle0", 0) or 0) \
            if resume is not None else 0
        pass_runner.resume_cycle0 = None
        if resume is not None:
            pix_r, done_r, quota_r = (np.asarray(a) for a in resume)
            w = len(pix_r)
            if w % (ndev * rportal.CHEAP_BLOCK):
                raise ValueError(
                    f"resume slot width {w} does not tile a "
                    f"{ndev}-device mesh (mesh shape changed?)"
                )
            pool_np = np.zeros((rows, w), np.float32)
            pool_np[rportal.ROW_PREV] = -1.0
            pool_np[V2_ROW_PIX] = pix_r
            pool_np[V2_ROW_DONE] = done_r
            pool_np[V2_ROW_QUOTA] = quota_r
            if park_k:
                pool_np[V3_ROW_STARTED] = done_r
            pool = jax.device_put(pool_np, sharding)
        else:
            pool = make_pool(kq)

        # ndev == 1 (a Mesh(1,1) run on one chip): the halved-top rationale
        # of DEV_TAIL_LADDER does not apply — use the full single-device
        # ladder so the drain matches the plain runner's width tracking
        src_ladder = rportal.TAIL_LADDER if ndev == 1 else DEV_TAIL_LADDER
        ladder = tuple(w for w in src_ladder if w < n_local)
        stall_limit, hard_limit = rportal._stall_limits(
            k_pass, max_depth, check_every, 1, narrow=False
        )
        # poll batching amortizes the ~25 ms queue-draining tunnel
        # round-trip per poll — a hardware economics; on CPU (tests,
        # interpreter) each cycle is SECONDS, so overshooting the drain by
        # a 32-cycle burst turns a 2-cycle test render into hours
        batch_polls = jax.default_backend() == "tpu"
        redist = os.environ.get("PT_TPU_REDIST", "1") != "0"
        # per-shard quotas are ~k_pass/sp; a laggard needs >= 2*min_rem
        # un-issued samples for a split to be worth a donor's warm-up
        # (min scaled to the quota — see render.portal._redist_min)
        redist_min = rportal._redist_min(k_pass // max(sp, 1))
        redist = redist and (k_pass // max(sp, 1)) >= 2 * redist_min
        # flush credits are keyed by LOCAL pixel id (< npix_local), so
        # each device's flush slice must cover its full pixel tile even
        # when the pool is narrower (thawed after a pause, or a resume
        # from a compacted checkpoint) — sized to the pool width, a
        # credit for a high local pixel would scatter out of bounds
        nf_local = n_local
        flush_pix = jnp.asarray(_flush_pix_map(nf_local))

        def run_cycles(pool, cycle_idx, steps):
            rays = jnp.float32(0.0)
            unfin = None
            for s in range(steps):
                pool, r, unfin = cycle(
                    pool, kq, sample_base,
                    seed0 + jnp.int32(2 * (cycle_idx + s) + 1), kscene,
                    jnp.int32(step_cap), pool_resolve=pool_resolve,
                )
                rays = rays + r
            return pool, rays, unfin

        def poll(unfin):
            per_dev = np.asarray(unfin)
            return int(per_dev.sum()), int(per_dev.max())

        def compact_fn(pool, u_max):
            target = None
            w_loc = pool.shape[1] // ndev
            for wl in sorted(ladder, reverse=True):
                if u_max <= wl < w_loc:
                    target = wl
            if target is None:
                return None
            return compact(pool, target=target)

        rays = jnp.float32(0.0)
        cycle0 = resume_cycle0
        # counts of stages merged-and-discarded at PAUSEs of this pass
        # (same carry as the single-device runner — see render.portal)
        cnt_pass = None
        fp = flush_pix

        def snapshot_fn(sts, fl):
            return rportal._with_cnt_base(
                rportal._snapshot_stages(sts, fl, fp, out_rows=npix),
                cnt_pass,
            )

        while True:
            res = drive.drive_loop(
                pool,
                run_cycles=run_cycles,
                poll=poll,
                compact_fn=compact_fn,
                redistribute_fn=(
                    (lambda p, fl: redistribute(p, fl, min_rem=redist_min))
                    if redist else None
                ),
                new_flush=lambda: jax.device_put(
                    jnp.zeros((ndev * nf_local, 4), jnp.float32),
                    flush_sharding
                ),
                snapshot_fn=snapshot_fn,
                k_pass=k_pass, max_depth=max_depth, step_cap=step_cap,
                park_k=park_k, check_every=check_every,
                batch_polls=batch_polls, stall_limit=stall_limit,
                hard_limit=hard_limit, on_check=hooks["on_check"],
                cycle0=cycle0,
            )
            rays = rays + res.rays
            stages = list(res.stages)
            if res.flush is not None:
                stages.append(rportal._flush_stage(res.flush, fp))
            for st in stages:
                accum = scatter_stage(accum, st)
            if res.outcome == drive.DONE:
                return accum, rays
            if res.outcome == drive.CANCEL:
                _, cnt = rportal._snapshot_stages(
                    tuple(res.stages), res.flush, fp, out_rows=npix
                )
                if cnt_pass is not None:
                    cnt = cnt + cnt_pass[:npix]
                pass_runner.last_cancelled = True
                pass_runner.last_partial_counts = cnt[:npix]
                return accum, rays
            # PAUSE: persist (radiance already merged), thaw, continue.
            # Carry the discarded stages' retired counts (the live pool's
            # done rows survive the thaw and are counted next drive).
            live = res.stages[-1]
            delta = rportal._retired_counts(
                tuple(res.stages[:-1]), res.flush, fp, out_rows=npix
            )
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
    # progress denominator: sp shards duplicate every pixel's slot, so
    # the unfinished-slot poll counts sp*npix real slots at pass start
    pass_runner.total_slots = sp * npix
    # per-shard quotas/sample bases are positional in the slot rows: a
    # resume must happen on the SAME mesh topology (see pipeline resume)
    pass_runner.slot_layout = f"mesh:dp{dp}xsp{sp}:n{n_local}"
    return pass_runner
