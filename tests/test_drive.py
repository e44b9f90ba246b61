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
