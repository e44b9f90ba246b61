"""Frozen-path rank census for the portal resolve (mesh scene, hardware).

The resolve kernel sweeps parts = (active path, K parked buffers) per
cycle; a part's dead lanes still pay the full 824-triangle Möller-Trumbore
sweep unless EVERY lane of a 1024-lane block is dead (the all-dead block
skip). This script measures, across the bulk phase at the production
config, the per-part alive fractions and the per-lane frozen-COUNT
histogram — the numbers that decide whether rank-packing (compacting each
lane's frozen paths into the lowest parts, then sweeping fewer parts per
cycle) has headroom:

  sweep-work  = parts * lanes                    (today)
  rank-packed = sum_p P(count > p) * lanes       (ideal truncation)

Counting only (no timing), so CPU contention is harmless.

Usage: python scripts/study_frozen_ranks.py [quota] [n_cycles]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/root/repo")

import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
from path_tracer_tpu.ops.pallas import portal as portal_mod
from path_tracer_tpu.render import portal as rportal
from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
from path_tracer_tpu.utils.config import Resolution


def main():
    quota = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 48

    res = Resolution.from_height(768)
    scene = pt.load_scene("mesh", "scenes")
    bufs, mode = prepare_scene_and_mode(scene, "pallas", res)
    assert mode.startswith("portal:"), mode
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    kscene = bufs["kernel"]

    park_k = portal_mod.PARK_K
    npix = res.num_pixels
    n_pad = rportal._round_block(npix)
    pool = rportal.make_pool_v2(npix, n_pad, quota, park_k=park_k)
    step_cap = rportal._default_step_cap()

    hist = np.zeros(park_k + 2, np.int64)  # frozen-count histogram
    part_alive = np.zeros(park_k + 1, np.float64)
    n_obs = 0
    print(f"mesh {res.width}x{res.height} quota={quota} park_k={park_k} "
          f"step_cap={step_cap} pool={n_pad}")
    for cyc in range(n_cycles):
        pool, c1 = portal_mod.trace_cheap_regen(
            pool, pkey, cam_key, jnp.int32(2 * cyc + 1), jnp.int32(quota),
            jnp.int32(0), jnp.int32(step_cap),
            max_depth=12, rr_start_depth=5,
            block=rportal.CHEAP_BLOCK, park_k=park_k,
        )
        rows = [pool[portal_mod.ROW_ALIVE]]
        rows += [pool[portal_mod.buf_row(j, portal_mod.BUF_STATE)]
                 for j in range(park_k)]
        st = np.asarray(jnp.stack(rows))
        frozen = np.zeros(st.shape[1], np.int32)
        frozen += (st[0] > 0.0).astype(np.int32)  # stalled active path
        part_alive[0] += (st[0] > 0.0).mean()
        for j in range(park_k):
            f = (st[1 + j] > 0.5) & (st[1 + j] < 1.5)
            frozen += f.astype(np.int32)
            part_alive[1 + j] += f.mean()
        hist[np.minimum(frozen, park_k + 1)] += 0  # keep dtype
        hist += np.bincount(frozen, minlength=park_k + 2)[: park_k + 2]
        n_obs += 1
        pool, c2, unfin = rportal.portal_resolve_phase(
            pool, jnp.int32(quota), jnp.int32(2 * cyc + 1), kscene,
            portal_key=pkey, max_depth=12, rr_start_depth=5, park_k=park_k,
        )
        u = float(np.asarray(unfin))
        if cyc % 8 == 0:
            print(f"  cycle {cyc}: unfinished slots {u:.0f}")
        if u == 0:
            break

    tot = hist.sum()
    print(f"\nobservations: {n_obs} cycles x {n_pad} lanes")
    print("frozen-count histogram (paths awaiting resolve per lane):")
    for c in range(park_k + 2):
        if hist[c]:
            print(f"  count={c}: {hist[c] / tot:6.1%}")
    pa = part_alive / max(n_obs, 1)
    print("per-part alive fraction at resolve input:")
    print(f"  part 0 (active): {pa[0]:6.1%}")
    for j in range(park_k):
        print(f"  part {j + 1} (buf {j}): {pa[1 + j]:6.1%}")
    counts = np.arange(park_k + 2)
    mean_frozen = (hist * counts).sum() / tot
    parts = park_k + 1
    print(f"\nmean frozen per lane: {mean_frozen:.2f} of {parts} parts "
          f"swept -> sweep utilization {mean_frozen / parts:6.1%}")
    # ideal rank-packed truncation: sweep only rank p if any lane needs it;
    # per-lane work = count (vs parts today). Savings bound:
    ideal = (hist * counts).sum() / (tot * parts)
    print(f"rank-packed ideal sweep work: {ideal:6.1%} of today's "
          f"(upper bound on the packing win, before packing overhead)")
    for R in range(1, parts):
        served = (hist * np.minimum(counts, R)).sum() / tot
        print(f"  truncate to R={R} parts: work {R / parts:6.1%}, "
              f"serves {served / max(mean_frozen, 1e-9):6.1%} of frozen "
              f"paths per cycle")


if __name__ == "__main__":
    main()
