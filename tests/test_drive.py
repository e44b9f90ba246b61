"""Unit tests for the shared drive loop (render.drive) with a fake pool.

The real schedulers exercise drive_loop through Pallas kernels (slow,
interpreter-bound); these tests pin the CONTROL FLOW itself — poll
batching, ladder-vs-redistribution arbitration, freeze-and-drain for
cancel/pause, stall detection — against a pure-jnp fake cycle runner, so
a regression in the loop is caught in milliseconds, not minutes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from path_tracer_tpu.ops.pallas.portal import (
    V2_ROW_DONE, V2_ROW_PIX, V2_ROW_QUOTA, V2_ROWS,
)
from path_tracer_tpu.render import drive


def _fake_pool(n=8, quota=4):
    pool = jnp.zeros((V2_ROWS, n), jnp.float32)
    pool = pool.at[V2_ROW_PIX].set(jnp.arange(n, dtype=jnp.float32))
    pool = pool.at[V2_ROW_QUOTA].set(float(quota))
    return pool


def _fake_run_cycles(per_cycle=1.0):
    """Each cycle advances every unfinished slot's done count by
    per_cycle, clamped to its quota (the invariant the real kernels
    provide: issuance never exceeds quota)."""

    def run_cycles(pool, cycle, steps):
        for _ in range(steps):
            done = pool[V2_ROW_DONE]
            pool = pool.at[V2_ROW_DONE].set(
                jnp.minimum(done + per_cycle, pool[V2_ROW_QUOTA])
            )
        unfin = jnp.sum(
            (pool[V2_ROW_DONE] < pool[V2_ROW_QUOTA]).astype(jnp.float32)
        )
        return pool, jnp.float32(steps), unfin

    return run_cycles


def _poll(unfin):
    u = int(np.asarray(unfin))
    return u, u


def _drive(pool, run_cycles, **kw):
    args = dict(
        run_cycles=run_cycles, poll=_poll, compact_fn=lambda p, u: None,
        k_pass=int(np.asarray(pool[V2_ROW_QUOTA]).max()), max_depth=12,
        step_cap=0, park_k=0, check_every=1, batch_polls=False,
        stall_limit=10, hard_limit=1000,
    )
    args.update(kw)
    return drive.drive_loop(pool, **args)


def test_drive_completes():
    res = _drive(_fake_pool(), _fake_run_cycles())
    assert res.outcome == drive.DONE
    assert res.frozen_quota is None
    done = np.asarray(res.stages[-1][V2_ROW_DONE])
    assert np.all(done == 4)
    assert float(np.asarray(res.rays)) == res.cycles


def test_drive_cancel_freezes_and_drains():
    """A truthy hook verdict freezes issuance: the drive keeps cycling
    until everything STARTED retires (here done is already started, so
    quota snaps to done and the next poll sees zero unfinished), and the
    hook is not consulted again while draining."""
    calls = []

    def hook(cycle, w, u):
        calls.append(u)
        return True

    res = _drive(_fake_pool(quota=10), _fake_run_cycles(), on_check=hook)
    assert res.outcome == drive.CANCEL
    assert len(calls) == 1  # no hook calls during the drain
    # frozen quota preserved for checkpointing; the pool's own quota
    # snapped down to the started counts
    assert np.all(np.asarray(res.frozen_quota) == 10)
    pool = res.stages[-1]
    done = np.asarray(pool[V2_ROW_DONE])
    assert np.all(done == np.asarray(pool[V2_ROW_QUOTA]))
    assert np.all(done < 10)  # genuinely mid-pass


def test_drive_pause_verdict():
    res = _drive(
        _fake_pool(quota=10), _fake_run_cycles(),
        on_check=lambda c, w, u: "pause",
    )
    assert res.outcome == drive.PAUSE
    # thaw rebuilds a pool that continues the remaining ranges exactly
    pool2 = drive.thaw_pool(res.stages[-1], res.frozen_quota, park_k=0)
    assert np.all(np.asarray(pool2[V2_ROW_QUOTA]) == 10)
    rem = np.asarray(pool2[V2_ROW_QUOTA] - pool2[V2_ROW_DONE])
    assert np.all(rem > 0)
    res2 = _drive(pool2, _fake_run_cycles(), cycle0=res.cycles)
    assert res2.outcome == drive.DONE
    assert np.all(np.asarray(res2.stages[-1][V2_ROW_DONE]) == 10)


def test_drive_compaction_preferred_over_redistribution():
    """When a ladder rung fits, the drive compacts and does NOT
    redistribute at that poll; with no rung, redistribution fires once
    enough lanes are idle (the >= max(2048, w/16) trigger)."""
    events = []

    def compact_fn(pool, u):
        if pool.shape[1] > 4:
            events.append("compact")
            return pool, pool[:, :4]
        return None

    def redistribute_fn(pool, flush):
        events.append("redist")
        return pool, flush

    # rung fits: compaction wins, redistribution never fires (the
    # compacted 4-slot pool is below the 2048-idle-lane trigger)
    pool = _fake_pool(n=4096, quota=2)
    pool = pool.at[V2_ROW_QUOTA, :2].set(5.0)
    res = _drive(
        pool, _fake_run_cycles(),
        k_pass=5, compact_fn=compact_fn,
        redistribute_fn=redistribute_fn,
        new_flush=lambda: jnp.zeros((4096, 4), jnp.float32),
        hard_limit=10000, stall_limit=200,
    )
    assert res.outcome == drive.DONE
    assert events == ["compact"]

    # no rung: the idle-lane trigger fires redistribution instead
    events.clear()
    pool = _fake_pool(n=4096, quota=2)
    pool = pool.at[V2_ROW_QUOTA, :2].set(5.0)
    res = _drive(
        pool, _fake_run_cycles(),
        k_pass=5, compact_fn=lambda p, u: None,
        redistribute_fn=redistribute_fn,
        new_flush=lambda: jnp.zeros((4096, 4), jnp.float32),
        hard_limit=10000, stall_limit=200,
    )
    assert res.outcome == drive.DONE
    assert res.flush is not None
    assert "redist" in events


def test_drive_stall_detection():
    def stuck(pool, cycle, steps):
        return pool, jnp.float32(0.0), jnp.float32(1.0)

    with pytest.raises(RuntimeError, match="stalled"):
        _drive(_fake_pool(), stuck, stall_limit=3)


def test_freeze_issuance_counts_inflight_without_parking():
    """park_k == 0 pools have no STARTED row; the in-flight path is
    visible only as ROW_ALIVE. freeze_issuance must count it as started
    — freezing quota to DONE alone would report the slot finished while
    its partial ROW_ACC radiance is still accumulating (merged with no
    matching count on cancel; re-rendered on top after a thaw)."""
    from path_tracer_tpu.ops.pallas.portal import ROW_ALIVE

    pool = _fake_pool(n=4, quota=4)
    pool = pool.at[V2_ROW_DONE].set(jnp.asarray([1.0, 1.0, 4.0, 0.0]))
    pool = pool.at[ROW_ALIVE].set(jnp.asarray([1.0, 0.0, 0.0, 1.0]))
    frozen = drive.freeze_issuance(pool, park_k=0)
    # slot 0: 1 done + 1 in flight -> quota 2; slot 1: idle -> 1;
    # slot 2: already finished -> 4; slot 3: first sample in flight -> 1
    np.testing.assert_array_equal(
        np.asarray(frozen[V2_ROW_QUOTA]), [2.0, 1.0, 4.0, 1.0]
    )


def _scripted_runner(monkeypatch, results):
    """A portal pass runner whose drive_pool_v2 is a scripted fake:
    returns the given DriveResults in order, recording each call's
    cycle0. Pins the runner<->drive wiring (count carry across pauses,
    cycle-counter resume) without any kernel execution."""
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.render import portal as rportal

    monkeypatch.setattr(portal_mod, "PARK_K", 0)
    seen = {"cycle0": []}
    it = iter(results)

    def fake_drive(pool, *a, **kw):
        seen["cycle0"].append(kw.get("cycle0", 0))
        return next(it)

    monkeypatch.setattr(rportal, "drive_pool_v2", fake_drive)
    runner = rportal.make_portal_pass_runner_v2(
        portal_key="portal:fake", cam_key="portal:fake:cam", npix=8,
        k_full=4, max_depth=1,
    )
    return runner, seen


def _stage(pix, done, quota, acc=0.0, n=None):
    n = n or len(pix)
    st = jnp.zeros((V2_ROWS, n), jnp.float32)
    st = st.at[V2_ROW_PIX].set(jnp.asarray(pix, jnp.float32))
    st = st.at[V2_ROW_DONE].set(jnp.asarray(done, jnp.float32))
    st = st.at[V2_ROW_QUOTA].set(jnp.asarray(quota, jnp.float32))
    from path_tracer_tpu.ops.pallas.portal import ROW_ACC

    st = st.at[ROW_ACC].set(float(acc))
    return st


def test_cancel_after_pause_carries_discarded_stage_counts(monkeypatch):
    """A cancel AFTER a mid-pass pause must still count the samples whose
    stages were merged-and-discarded at the pause: their radiance is in
    accum, so dropping their counts would over-normalize those pixels
    into blow-out (review r4 finding #1). Scripted drive: pause with a
    retired compaction stage (pixels 0-3, 2 samples each) + live pool
    (pixels 4-7), then cancel with the continued live pool."""
    from path_tracer_tpu.ops import rng

    pause = drive.DriveResult(
        stages=[
            _stage([0, 1, 2, 3], [2] * 4, [2] * 4, acc=1.0),
            _stage([4, 5, 6, 7], [1] * 4, [1] * 4),
        ],
        rays=jnp.float32(12.0), flush=None, outcome=drive.PAUSE,
        cycles=7, frozen_quota=jnp.asarray([4.0] * 4),
    )
    cancel = drive.DriveResult(
        stages=[_stage([4, 5, 6, 7], [2] * 4, [2] * 4, acc=0.5)],
        rays=jnp.float32(4.0), flush=None, outcome=drive.CANCEL,
        cycles=11, frozen_quota=jnp.asarray([4.0] * 4),
    )
    runner, seen = _scripted_runner(monkeypatch, [pause, cancel])
    paused = {}
    runner.set_hooks(
        on_check=lambda c, w, u: False,
        on_pause=lambda acc, rows, pi, kp: paused.update(rows=rows),
    )
    accum = jnp.zeros((8, 3), jnp.float32)
    accum2, rays = runner({"kernel": {}}, None, accum, 0, 4,
                          rng.root_key(0))
    assert runner.last_cancelled
    cnt = np.asarray(runner.last_partial_counts)
    # pixels 0-3 retired 2 each BEFORE the pause (the discarded stage);
    # 4-7 retired 2 each by cancel time — ALL must be counted
    np.testing.assert_array_equal(cnt, [2.0] * 8)
    # both drives' radiance merged exactly once
    acc = np.asarray(accum2)
    np.testing.assert_allclose(acc[:4, 0], 1.0)
    np.testing.assert_allclose(acc[4:, 0], 0.5)
    assert float(np.asarray(rays)) == 16.0
    # the pause handed positional slot rows + cycle counter to on_pause
    assert runner.last_pause_cycles == 7
    assert len(paused["rows"]) == 3
    # the continuation threaded the drive's cycle counter forward
    assert seen["cycle0"] == [0, 7]


def test_resume_continues_cycle_counter(monkeypatch):
    """Resume from a mid-pass checkpoint must continue the saved cycle
    counter: cycle seeds are seed0 + 2*cycle + 1 and the kernels' PRNG
    draws are keyed by them, so restarting at 0 would replay the exact
    random schedule that produced the already-banked samples (review r4
    finding #3)."""
    from path_tracer_tpu.ops import rng

    done_res = drive.DriveResult(
        stages=[_stage([0, 1], [4, 4], [4, 4])],
        rays=jnp.float32(8.0), flush=None, outcome=drive.DONE,
        cycles=900, frozen_quota=None,
    )
    runner, seen = _scripted_runner(monkeypatch, [done_res])
    runner.resume_slots = (
        np.asarray([0.0, 1.0]), np.asarray([2.0, 2.0]),
        np.asarray([4.0, 4.0]),
    )
    runner.resume_cycle0 = 777
    accum = jnp.zeros((8, 3), jnp.float32)
    runner({"kernel": {}}, None, accum, 0, 4, rng.root_key(0))
    assert seen["cycle0"] == [777]
    assert runner.resume_cycle0 is None  # consumed, not sticky
