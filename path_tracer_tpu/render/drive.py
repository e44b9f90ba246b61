"""Shared drive loop for portal pool scheduling.

One control loop serves both the single-device scheduler
(render.portal.drive_pool_v2) and the sharded one
(parallel.portal.make_sharded_portal_runner): poll batching tiers, the
first-poll futility skip, stall/hard runaway backstops, the
tail-compaction ladder walk, the mid-pass redistribution trigger, the
progress/cancel hook (with its optional ``snapshot`` callable), and the
freeze-and-drain protocol for near-lossless cancellation and mid-pass
checkpoints. The device-specific pieces — how a cycle runs, how the
unfinished metric is read, how a tail compacts — come in as callables.

The fork this replaces diverged once already (mid-pass sample
redistribution existed only in the single-device copy, VERDICT r3 #2);
with the loop shared, every scheduler improvement lands on both paths.

Freeze-and-drain (the reference keeps completed work on cancel,
``/root/reference/src/render/mod.rs:1002-1004,1025-1097``): when the poll
hook asks to stop, the drive does not discard the pass. It freezes
issuance (per-slot quota := samples already started — one elementwise
op), keeps cycling until every started sample retires (a few cycles:
in-flight paths have <= max_depth bounces left), and returns with exact
per-slot retired state. The caller merges all retired radiance — a
cancelled render keeps every started sample, and a checkpoint written at
a poll boundary is exact (remaining per-slot sample ranges are
[done, quota), resumable via ``thaw_pool``).
"""

from __future__ import annotations

import dataclasses
import functools
import inspect
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.ops.pallas.portal import (
    ROW_ALIVE, ROW_PREV, V2_ROW_DONE, V2_ROW_PIX, V2_ROW_QUOTA,
    V3_ROW_STARTED,
)

#: outcome values of a drive
DONE = "done"
CANCEL = "cancel"
PAUSE = "pause"


@dataclasses.dataclass
class DriveResult:
    """What a drive returns. ``stages`` always ends with the final pool;
    summing every stage's acc rows keyed by V2_ROW_PIX (plus the flush
    stage) reconstructs the retired radiance exactly. ``outcome`` is DONE,
    or CANCEL/PAUSE after a freeze-and-drain (everything *started* has
    retired; un-issued samples remain as per-slot [done, frozen_quota)
    ranges). ``frozen_quota`` is the final pool's pre-freeze quota row
    (positionally aligned — compaction is disabled while draining), None
    unless a freeze happened."""

    stages: list
    rays: Any
    flush: Any | None
    outcome: str
    cycles: int
    frozen_quota: Any | None = None


@functools.partial(jax.jit, static_argnames=("park_k",), donate_argnums=(0,))
def freeze_issuance(pool, *, park_k: int):
    """Stop sample issuance: per-slot quota := samples already started.
    Paths in flight (active or parked) still run to retirement, so a
    subsequent drain leaves done == started == quota for every slot that
    had issued work, and done == quota for the rest.

    park_k == 0 pools have no STARTED row, but the one possible in-flight
    sample is visible as ROW_ALIVE — it must count as started, or the
    post-freeze poll reads the slot as finished while its path (and its
    partial ROW_ACC accumulation) is still running: a cancel would merge
    that partial radiance with no matching count, and a thaw would
    re-render the sample on top of it."""
    if park_k:
        started = pool[V3_ROW_STARTED]
    else:
        started = pool[V2_ROW_DONE] + (pool[ROW_ALIVE] > 0.0).astype(
            jnp.float32
        )
    return pool.at[V2_ROW_QUOTA].set(
        jnp.minimum(pool[V2_ROW_QUOTA], started)
    )


@functools.partial(jax.jit, static_argnames=("park_k",), donate_argnums=(0,))
def thaw_pool(pool, frozen_quota, *, park_k: int):
    """Rebuild a drained pool to continue its unfinished sample ranges:
    keep (pix, done) per slot, restore the pre-freeze quota, zero
    everything else (radiance was merged by the caller; path state and
    park buffers are empty after a drain). started := done — the kernels
    then issue exactly the remaining ids [done, quota) per slot."""
    new = jnp.zeros_like(pool)
    new = new.at[V2_ROW_PIX].set(pool[V2_ROW_PIX])
    new = new.at[V2_ROW_DONE].set(pool[V2_ROW_DONE])
    new = new.at[V2_ROW_QUOTA].set(frozen_quota)
    new = new.at[ROW_PREV].set(-1.0)
    if park_k:
        new = new.at[V3_ROW_STARTED].set(pool[V2_ROW_DONE])
    return new


def hook_wants_snapshot(on_check) -> bool:
    """Does the poll hook opt into mid-pass partial images? (a 'snapshot'
    kwarg or **kwargs in its signature; legacy 3-arg hooks are untouched)"""
    if on_check is None:
        return False
    params = inspect.signature(on_check).parameters
    return "snapshot" in params or any(
        p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()
    )


def poll_steps(
    w: int,
    *,
    k_pass: int,
    check_every: int,
    first: bool,
    step_cap: int,
    park_k: int,
    max_depth: int,
    batch_polls: bool,
) -> int:
    """Cycles to run before the next termination poll. Each poll drains
    the dispatch queue and pays a ~25 ms tunnel round-trip, so small-pool
    cycles (~2 ms) batch up aggressively; the first window additionally
    skips the provably futile region (a slot's done count rises by at
    most step_cap + park_k + 1 per cycle), capped so the progress/cancel
    hook still fires early."""
    if not batch_polls:
        return check_every
    if w >= 131072:
        steps = (2 if k_pass >= 256 else 1) * check_every
    elif w >= 16384:
        steps = 2 * check_every
    elif w > 2048:
        steps = 4 * check_every
    else:
        steps = 8 * check_every
    if first:
        per_cycle = (step_cap if step_cap else k_pass * max_depth) \
            + park_k + 1
        steps = max(steps, min(k_pass // max(per_cycle, 1),
                               16 * check_every))
    return steps


def drive_loop(
    pool,
    *,
    run_cycles: Callable,
    poll: Callable,
    compact_fn: Callable,
    redistribute_fn: Callable | None = None,
    new_flush: Callable | None = None,
    snapshot_fn: Callable | None = None,
    k_pass: int,
    max_depth: int,
    step_cap: int,
    park_k: int,
    check_every: int = 4,
    batch_polls: bool = True,
    stall_limit: int,
    hard_limit: int,
    on_check: Callable | None = None,
    cycle0: int = 0,
) -> DriveResult:
    """Cycle a pool until every slot retires its quota (or a hook stops
    the pass), compacting the unfinished tail and re-tasking idle slots.

    Callables (the device-specific surface):
      run_cycles(pool, cycle_idx, steps) -> (pool, rays_delta, unfin_raw)
        runs `steps` scheduler cycles (fusing/narrowing as it likes).
      poll(unfin_raw) -> (u_total, u_ladder) host ints: the global
        unfinished-slot count and the per-shard max the ladder walks on
        (equal on a single device).
      compact_fn(pool, u_ladder) -> None | (retired_stage, smaller_pool)
        walks the tail ladder; None when no rung fits.
      redistribute_fn(pool, flush) -> (pool, flush): mid-pass work
        redistribution (None disables); `flush` is created lazily via
        new_flush() and returned in the result for the caller to merge.
      snapshot_fn(stages_tuple, flush) -> (radiance, counts): mid-pass
        partial image, forwarded to the hook as a zero-arg `snapshot`.

    on_check(cycle, width, u[, snapshot=...]) fires after each poll.
    Falsy -> continue. Truthy -> stop the pass: CANCEL for True/"cancel",
    PAUSE for "pause" (a checkpoint request). Both freeze issuance and
    drain — every started sample retires before the drive returns, so
    the caller's merge is exact (see module docstring)."""
    stages: list = []
    rays = jnp.float32(0.0)
    flush = None
    cycle = cycle0
    draining: str | None = None
    frozen_quota = None
    stalled_polls = 0
    last_u = None
    wants_snapshot = hook_wants_snapshot(on_check)
    first_poll = True
    # PIPELINED POLLS (batch_polls implies a remote device whose poll
    # fetch costs a ~25 ms round-trip): keep ONE un-polled cycle batch
    # enqueued beyond the batch being polled, so the device runs through
    # every poll RTT instead of idling on it. Safe because an unfinished
    # count is MONOTONE non-increasing: acting on a one-batch-stale u is
    # always conservative (a compaction rung that fits the stale count
    # fits the current one; the u == 0 exit implies the current pool is
    # also drained; cycles past the drain issue nothing and count zero
    # rays). A stop verdict freezes the LATEST pool — one batch more of
    # issuance, every started sample still retires and merges exactly.
    inflight: list = []  # un-polled unfinished-count handles, oldest first
    while True:
        want = 2 if (batch_polls and draining is None) else 1
        while len(inflight) < want:
            steps = poll_steps(
                pool.shape[1], k_pass=k_pass, check_every=check_every,
                first=first_poll, step_cap=step_cap, park_k=park_k,
                max_depth=max_depth, batch_polls=batch_polls,
            )
            first_poll = False
            pool, r, unfin_raw = run_cycles(pool, cycle, steps)
            rays = rays + r
            cycle += steps
            inflight.append(unfin_raw)
        u, u_ladder = poll(inflight.pop(0))
        if draining is None and on_check is not None:
            kw = {}
            if wants_snapshot and snapshot_fn is not None:
                sts, fl = tuple(stages) + (pool,), flush
                kw["snapshot"] = lambda: snapshot_fn(sts, fl)
            verdict = on_check(cycle, pool.shape[1], u, **kw)
            # a stop verdict with nothing unfinished is moot (the pass is
            # over — honoring a "pause" here would freeze-drain a drained
            # pool forever under an always-due checkpoint cadence)
            if verdict and u > 0:
                draining = PAUSE if verdict == PAUSE else CANCEL
                frozen_quota = pool[V2_ROW_QUOTA]
                pool = freeze_issuance(pool, park_k=park_k)
                # u is stale (pre-freeze); poll again after more cycles
                stalled_polls, last_u = 0, None
                continue
        if u == 0:
            stages.append(pool)
            return DriveResult(
                stages, rays, flush, draining or DONE, cycle, frozen_quota
            )
        stalled_polls = stalled_polls + 1 if u == last_u else 0
        last_u = u
        if stalled_polls >= stall_limit or cycle - cycle0 > hard_limit:
            raise RuntimeError(
                f"portal scheduler stalled: {u} slots unfinished after "
                f"{cycle - cycle0} cycles ({stalled_polls} polls without "
                f"progress)"
            )
        if draining is not None:
            # no compaction while draining: frozen_quota is positionally
            # aligned with the pool; the drain is a handful of cycles
            continue
        moved = compact_fn(pool, u_ladder)
        if moved is not None:
            stage, pool = moved
            stages.append(stage)
        elif redistribute_fn is not None and pool.shape[1] - u >= max(
            2048, pool.shape[1] // 16
        ):
            # enough idle lanes to matter and no compaction rung fits:
            # re-task them (a no-op when no laggard has enough samples
            # left — the dispatch is cheap at poll cadence)
            if flush is None:
                flush = new_flush()
            pool, flush = redistribute_fn(pool, flush)


def drained_slot_state(pool, frozen_quota):
    """(pix, done, quota) host arrays of a drained pool — the
    checkpointable remainder of the pass; each slot's un-issued range is
    [done, quota). ALL slots are kept, positionally: the sharded resume
    maps slot position -> device, and even the single-device resume must
    restore finished slots' done counts — a cancel DURING a resumed pass
    normalizes per-pixel counts from the live pool's done rows, so
    dropping done == quota rows would normalize those pixels short."""
    rows = np.asarray(
        jnp.stack([
            pool[V2_ROW_PIX], pool[V2_ROW_DONE],
            jnp.asarray(frozen_quota),
        ])
    )
    return rows[0], rows[1], rows[2]
