"""Portal-deferred mesh tracing: the TPU answer to a per-ray BVH.

Problem: the `mesh` scene (810-triangle mctri + Cornell walls) is brute-force
bound — every bounce of every lane pays the whole triangle list, and all
block-granularity culling measurably never fires for incoherent bounce rays
(PERF.md). But only ~8% of ray segments can possibly hit the heavy mesh at
all (their ray enters its AABB closer than any wall hit — measured with
scripts/measure_mesh_fraction.py). A per-lane traversal stack would let each
lane skip its own far geometry, but per-lane divergent memory access
(gathers) is serial on TPU; the hardware-native way to "skip per lane" is to
COMPACT the few lanes that need the work and run them dense.

Architecture (three pieces, orchestrated by render.portal):

1. K_cheap (here): a static-scene stepped kernel over the CHEAP geometry
   (everything except the heavy mesh) in the ray-major (8,L) layout, plus a
   conservative slab test against the heavy mesh's AABB (the "portal").
   Each lane advances its path bounce by bounce until it dies — or until
   its next segment COULD involve the mesh (portal entry not beyond the
   cheap hit), in which case the lane FREEZES with its state intact.
2. K_full (trace_kernel.trace_pallas_resolve): one full-scene bounce with
   per-lane depth, run on the compacted frozen lanes only — the 810-triangle
   cost is paid exactly by the ~8% of segments that need it, at 100% lane
   occupancy.
3. A persistent-pool scheduler (render.portal) that compacts frozen lanes,
   resolves them, retires dead paths into the framebuffer, and refills free
   lanes with fresh camera samples — all in fixed shapes with no host syncs.

Correctness: the portal test is conservative (AABB padded; ties suspend), so
a non-suspended segment provably cannot hit the heavy mesh and the cheap hit
equals the full-scene hit (tested in tests/test_portal.py). Suspended
segments are resolved against the FULL scene, so their closest hit is exact.
Reference semantics (mod.rs:631-659 scan order, RR, BSDFs) ride the shared
shade_phase / make_prim_scan / kernel table machinery unchanged.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.models.scene import ScenePacked
from path_tracer_tpu.ops.pallas.trace_kernel import (
    TRI_TILE, _scene_keys, _uniform, make_isect, make_raygen, shade_phase,
)
from path_tracer_tpu.ops.pallas.trace_v2 import (
    SUB, _SCENES, f, build_scene_consts, make_prim_scan, register_scene,
)

BIG = 3.0e38

# a mesh this big (triangles) makes the scene portal-eligible; below it the
# plain prim-major kernel is already fast enough
PORTAL_MIN_TRIS = 65

# pool-state row layout (single [ROWS, n] f32 matrix so compaction is one
# row-gather): o, d, thr, acc, alive, prev, depth, pix
ROW_O = 0
ROW_D = 3
ROW_THR = 6
ROW_ACC = 9
ROW_ALIVE = 12
ROW_PREV = 13
ROW_DEPTH = 14
ROW_PIX = 15
ROWS = 16

# v2 (pixel-pinned) pool: same first 15 rows, plus the slot's completed-
# sample count. The pixel needs no row — slot index IS the pixel, which is
# what eliminates the v1 scheduler's argsort-compaction and scatter-add
# retirement (62 + 117 ms per 1M-lane cycle, scripts/profile_portal.py).
V2_ROW_DONE = 15
V2_ROW_PIX = 16  # still carried: per-block raygen needs lane-shaped indices
# per-SLOT sample quota (f32 row, not the SMEM scalar): lets the scheduler
# redistribute work mid-pass — a finished slot adopts the upper half of a
# laggard's remaining [started, quota) sample range by taking (pix, started=
# split, done=split, quota) while the laggard's quota shrinks to split.
# Without this every slot is pinned to its own pixel's k_pass and the bulk
# phase decays to the mesh-facing slots' occupancy (PERF.md: 183 vs the 272
# Mray/s full-occupancy bulk asymptote). The SMEM quota scalar remains the
# per-call LOOP BOUND (the pass-wide cap k_pass >= every slot's quota).
V2_ROW_QUOTA = 17
V2_ROWS = 18

# Parked-path extension (park_k > 0): a lane whose segment freezes at the
# portal PARKS the path in one of K per-lane buffers and immediately
# continues with its slot's next sample — without this, a freeze stalls
# the lane until the next resolve and the bulk phase runs at the mean/max
# run-length ratio (~10-25% occupancy). Buffers hold full mid-path state;
# BUF_STATE: 0 = empty, 1 = frozen (awaiting resolve), 2 = ready
# (resolved, awaiting cheap advancement). `started` counts samples issued
# (done counts completions; they differ while paths are parked — raygen
# indexes by `started` so in-flight samples get distinct indices).
PARK_K = int(_os.environ.get("PT_TPU_PARK_K", "3"))
V3_ROW_STARTED = 18
V3_BUF_BASE = 19
BUF_O = 0
BUF_D = 3
BUF_THR = 6
BUF_PREV = 9
BUF_DEPTH = 10
BUF_STATE = 11
BUF_ROWS = 12


def buf_row(j: int, r: int = 0) -> int:
    return V3_BUF_BASE + j * BUF_ROWS + r


def pool_rows(park_k: int) -> int:
    return V3_BUF_BASE + park_k * BUF_ROWS if park_k else V2_ROWS


def build_portal_consts(packed: ScenePacked):
    """Split a packed scene into (cheap static consts, heavy-mesh AABB).

    Returns (consts, heavy_mesh_idx) where consts = (prims, bnd, (lo, hi))
    for the K_cheap kernel, or None when the scene has no mesh above
    PORTAL_MIN_TRIS triangles or the cheap remainder is too big to bake.
    The AABB is padded (1e-4 relative + 1e-5 absolute) so the slab test is
    conservative under f32 rounding — a false positive costs a deferred
    resolve; a false negative would lose a hit.
    """
    nt = packed.num_triangles
    if nt == 0:
        return None
    tm = np.asarray(packed.tri_mesh[:nt])
    counts = np.bincount(tm, minlength=packed.num_meshes or 1)
    heavy = int(np.argmax(counts))
    if counts[heavy] < PORTAL_MIN_TRIS:
        return None
    sel = tm == heavy

    keep = ~sel
    n_keep = int(keep.sum())

    def filt(a, pad_shape):
        a = np.asarray(a)
        out = np.zeros((max(n_keep, 1),) + a.shape[1:], a.dtype)
        out[:n_keep] = a[:nt][keep]
        return out

    cheap = dataclasses.replace(
        packed,
        num_triangles=n_keep,
        tri_v=filt(packed.tri_v, None),
        tri_normal=filt(packed.tri_normal, None),
        tri_color=filt(packed.tri_color, None),
        tri_emis=filt(packed.tri_emis, None),
        tri_rtype=filt(packed.tri_rtype, None),
        tri_order=filt(packed.tri_order, None),
        tri_obj=filt(packed.tri_obj, None),
        tri_mesh=filt(packed.tri_mesh, None),
    )
    consts = build_scene_consts(cheap)
    if consts is None:
        return None

    verts = np.asarray(packed.tri_v[:nt], np.float64)[sel].reshape(-1, 3)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    slop = np.maximum(np.abs(verts).max(axis=0), hi - lo) * 1e-4 + 1e-5
    lo = tuple(map(f, lo - slop))
    hi = tuple(map(f, hi + slop))
    prims, bnd = consts
    return (prims, bnd, (lo, hi)), heavy


def _fold_lanes(x):
    """Fold a (SUB, L) mask down to (SUB, <=128) for a safe scalar reduce
    (Mosaic relayout bug on wider reductions — see _scalar_any_left)."""
    while x.shape[-1] > 128:
        h = x.shape[-1] // 2
        x = x[..., :h] + x[..., h:]
    return jnp.sum(x)


def _make_kernel_cheap(consts, L, max_depth, rr_start_depth):
    """Stepped cheap-scene kernel with portal freeze, (SUB, L) ray layout.

    State: one [ROWS, SUB, L] block (see row layout above). Each alive lane
    advances until it dies or its next segment needs the heavy mesh (then it
    freezes with state intact — alive stays 1). After the loop every alive
    lane is frozen; the scheduler compacts them for the full-scene resolver.
    """
    prims, bnd, (lo, hi) = consts
    prim_scan = make_prim_scan(prims, bnd)

    def kernel(seed_ref, state_ref, out_ref, count_ref):
        pltpu.prng_seed(
            seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531535)
        )

        o = [state_ref[ROW_O + k] for k in range(3)]
        d = [state_ref[ROW_D + k] for k in range(3)]
        thr = [state_ref[ROW_THR + k] for k in range(3)]
        acc = [state_ref[ROW_ACC + k] for k in range(3)]
        alive_f = state_ref[ROW_ALIVE]
        prev = state_ref[ROW_PREV]
        depth = state_ref[ROW_DEPTH]
        counts = jnp.zeros_like(alive_f)

        def portal_blocked(o, d, alive):
            """alive lanes whose segment could reach the heavy mesh: the
            padded AABB slab test, accepted on ties with the cheap hit
            (computed by the caller) — strictly conservative."""
            t_en = jnp.zeros_like(o[0])
            t_ex = jnp.full_like(o[0], BIG)
            for k in range(3):
                inv = 1.0 / jnp.where(jnp.abs(d[k]) < 1e-30, 1e-30, d[k])
                ta = (lo[k] - o[k]) * inv
                tb = (hi[k] - o[k]) * inv
                t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
                t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
            return (t_ex >= t_en) & (t_ex > 0.0) & alive, t_en

        def body(carry):
            o, d, thr, acc, alive_f, prev, depth, counts = carry
            alive = alive_f > 0.0

            hit_box, t_en = portal_blocked(o, d, alive)
            tmin, h_color, h_emis, h_aux, h_rtype, h_sph, h_prev = prim_scan(
                o, d, prev
            )
            needs = hit_box & (t_en <= tmin)  # ties suspend (conservative)
            proc = alive & ~needs
            counts = counts + proc.astype(jnp.float32)

            found = (tmin < BIG) & proc
            point = [o[k] + d[k] * tmin for k in range(3)]
            sn = [point[k] - h_aux[k] for k in range(3)]
            sl = jax.lax.rsqrt(
                jnp.maximum(sn[0] ** 2 + sn[1] ** 2 + sn[2] ** 2, 1e-30)
            )
            sph_w = h_sph > 0.5
            nrm = [jnp.where(sph_w, sn[k] * sl, h_aux[k]) for k in range(3)]
            new_prev = jnp.where(found, h_prev, -1.0)

            u4 = [_uniform((SUB, L)) for _ in range(4)]
            new_depth = depth + 1.0
            acc, thr_new, d_new, alive_new = shade_phase(
                d, nrm, h_color, h_emis, h_rtype, found, thr, acc, u4,
                new_depth, max_depth, rr_start_depth,
            )
            # alive_new ⊆ found ⊆ proc: frozen lanes keep o/d via the
            # alive_new selects; thr/prev/alive need explicit preservation
            am = alive_new.astype(jnp.float32)
            o = [jnp.where(alive_new, point[k], o[k]) for k in range(3)]
            d = [jnp.where(alive_new, d_new[k], d[k]) for k in range(3)]
            thr = [
                jnp.where(needs, thr[k], thr_new[k] * am) for k in range(3)
            ]
            prev = jnp.where(needs, prev, new_prev)
            alive_f = jnp.where(needs, alive_f, am)
            depth = depth + proc.astype(jnp.float32)
            return (o, d, thr, acc, alive_f, prev, depth, counts)

        def step(_, carry):
            # once no lane can advance (all dead or frozen), every later
            # step is a no-op — skip the body on one scalar branch
            o, d, thr, acc, alive_f, prev, depth, counts = carry
            alive = alive_f > 0.0
            blocked, t_en_chk = portal_blocked(o, d, alive)
            runnable = alive & ~blocked
            return jax.lax.cond(
                _fold_lanes(runnable.astype(jnp.float32)) > 0.0,
                body, lambda c: c, carry,
            )

        carry = jax.lax.fori_loop(
            0, max_depth, step,
            (o, d, thr, acc, alive_f, prev, depth, counts),
        )
        o, d, thr, acc, alive_f, prev, depth, counts = carry
        for k in range(3):
            out_ref[ROW_O + k] = o[k]
            out_ref[ROW_D + k] = d[k]
            out_ref[ROW_THR + k] = thr[k]
            out_ref[ROW_ACC + k] = acc[k]
        out_ref[ROW_ALIVE] = alive_f
        out_ref[ROW_PREV] = prev
        out_ref[ROW_DEPTH] = depth
        out_ref[ROW_PIX] = state_ref[ROW_PIX]
        count_ref[0] = counts

    return kernel


def _make_kernel_cheap_regen(
    consts, cam_consts, L, max_depth, rr_start_depth, unroll, park_k=0
):
    """v2 cheap kernel: portal freeze + IN-KERNEL REGENERATION on a
    pixel-pinned pool ([pool_rows, SUB, L] blocks; slot index == pixel).

    Each lane advances its slot's current path; when a path dies the lane
    immediately starts the slot's next sample (same raygen as regen_loop —
    shared make_raygen) until `quota` samples are started; when a segment
    could hit the heavy mesh the lane freezes with state intact (alive
    stays 1, the deterministic portal test re-marks it every later step).

    park_k > 0: a freezing lane PARKS the path in its first empty buffer
    (BUF_STATE 0→1) and continues with the next sample; at step start,
    dead lanes re-activate resolver-advanced buffers (BUF_STATE 2→0)
    before regenerating fresh samples. The lane only stalls when its
    active path is frozen AND every buffer holds a frozen path. The kernel
    exits when no lane can advance. acc/done accumulate IN THE POOL across
    calls — the scheduler never scatters or compacts (see render.portal).
    """
    prims, bnd, (lo, hi) = consts
    prim_scan = make_prim_scan(prims, bnd)

    def kernel(seed_ref, state_ref, out_ref, count_ref):
        pltpu.prng_seed(
            seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531535)
        )
        # SMEM quota = the pass-wide cap (loop bound only); the per-SLOT
        # quota rides the V2_ROW_QUOTA pool row so the scheduler can
        # redistribute sample ranges between slots mid-pass
        quota = seed_ref[0, 1].astype(jnp.float32)
        qrow = state_ref[V2_ROW_QUOTA]
        sample_base = seed_ref[0, 2].astype(jnp.float32)
        # per-call step budget: without it a block sweeps until its LONGEST
        # runner finishes (max over 2048 lanes of run-to-freeze ≈ 120 steps
        # vs a 14-step mean → ~10% occupancy in the bulk phase); capping
        # defers long runners to later cycles, which must happen anyway for
        # the frozen lanes. 0 disables (tests / single-cycle semantics).
        step_cap = seed_ref[0, 3].astype(jnp.float32)

        pix = state_ref[V2_ROW_PIX]
        raygen, (lcx, lcy, lcz) = make_raygen(cam_consts, pix)

        def portal_blocked(o, d, alive):
            t_en = jnp.zeros_like(o[0])
            t_ex = jnp.full_like(o[0], BIG)
            for k in range(3):
                inv = 1.0 / jnp.where(jnp.abs(d[k]) < 1e-30, 1e-30, d[k])
                ta = (lo[k] - o[k]) * inv
                tb = (hi[k] - o[k]) * inv
                t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
                t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
            return (t_ex >= t_en) & (t_ex > 0.0) & alive, t_en

        def active(st):
            st = dict(st)
            u = _uniform((6 * SUB, L))
            u = [u[k * SUB:(k + 1) * SUB] for k in range(6)]

            if park_k:
                st["p"] = [dict(pj) for pj in st["p"]]
                # re-activate resolver-advanced parked paths (lowest j
                # first) into dead lanes — before regen, so parked work
                # finishes ahead of fresh samples
                vacant = st["alive"] <= 0.0
                for pj in st["p"]:
                    pull = vacant & (pj["ps"] > 1.5)
                    for k in range(3):
                        st["o"][k] = jnp.where(pull, pj["o"][k], st["o"][k])
                        st["d"][k] = jnp.where(pull, pj["d"][k], st["d"][k])
                        st["thr"][k] = jnp.where(
                            pull, pj["thr"][k], st["thr"][k]
                        )
                    st["prev"] = jnp.where(pull, pj["prev"], st["prev"])
                    st["depth"] = jnp.where(pull, pj["depth"], st["depth"])
                    st["alive"] = jnp.where(pull, 1.0, st["alive"])
                    pj["ps"] = jnp.where(pull, 0.0, pj["ps"])
                    vacant = vacant & ~pull

            # regenerate: dead lanes with samples left start the next one
            issued = st["started"] if park_k else st["done"]
            need = (st["alive"] <= 0.0) & (issued < qrow)
            d_new = raygen(sample_base + issued, u[4], u[5])
            for k, lc in enumerate((lcx, lcy, lcz)):
                st["o"][k] = jnp.where(need, lc, st["o"][k])
                st["d"][k] = jnp.where(need, d_new[k], st["d"][k])
                st["thr"][k] = jnp.where(need, 1.0, st["thr"][k])
            st["prev"] = jnp.where(need, -1.0, st["prev"])
            st["depth"] = jnp.where(need, 0.0, st["depth"])
            st["alive"] = jnp.where(need, 1.0, st["alive"])
            if park_k:
                st["started"] = st["started"] + need.astype(jnp.float32)

            live = st["alive"] > 0.0
            hit_box, t_en = portal_blocked(st["o"], st["d"], live)
            tmin, h_color, h_emis, h_aux, h_rtype, h_sph, h_prev = prim_scan(
                st["o"], st["d"], st["prev"]
            )
            needs = hit_box & (t_en <= tmin)  # ties suspend (conservative)
            proc = live & ~needs
            st["counts"] = st["counts"] + proc.astype(jnp.float32)

            found = (tmin < BIG) & proc
            point = [st["o"][k] + st["d"][k] * tmin for k in range(3)]
            sn = [point[k] - h_aux[k] for k in range(3)]
            sl = jax.lax.rsqrt(
                jnp.maximum(sn[0] ** 2 + sn[1] ** 2 + sn[2] ** 2, 1e-30)
            )
            sph_w = h_sph > 0.5
            nrm = [jnp.where(sph_w, sn[k] * sl, h_aux[k]) for k in range(3)]
            new_prev = jnp.where(found, h_prev, -1.0)

            new_depth = st["depth"] + 1.0
            acc, thr_new, d2, alive_new = shade_phase(
                st["d"], nrm, h_color, h_emis, h_rtype, found,
                st["thr"], st["acc"], u[:4],
                new_depth, max_depth, rr_start_depth,
            )
            # alive_new ⊆ found ⊆ proc: frozen lanes keep their full state
            # via the needs-selects; processed lanes advance
            am = alive_new.astype(jnp.float32)
            ended = proc & ~alive_new
            st["done"] = st["done"] + ended.astype(jnp.float32)
            st["acc"] = acc  # shade_phase only adds for found ⊆ proc lanes
            st["o"] = [
                jnp.where(alive_new, point[k], st["o"][k]) for k in range(3)
            ]
            st["d"] = [
                jnp.where(alive_new, d2[k], st["d"][k]) for k in range(3)
            ]
            st["thr"] = [
                jnp.where(needs, st["thr"][k], thr_new[k] * am)
                for k in range(3)
            ]
            st["prev"] = jnp.where(needs, st["prev"], new_prev)
            st["alive"] = jnp.where(needs, st["alive"], am)
            st["depth"] = jnp.where(needs, st["depth"], new_depth * am)

            if park_k:
                # park the frozen path (its state was preserved unchanged
                # by the needs-selects above) in the first empty buffer and
                # free the lane; lanes that find no slot stall as before
                to_park = needs & live
                for pj in st["p"]:
                    park = to_park & (pj["ps"] < 0.5)
                    for k in range(3):
                        pj["o"][k] = jnp.where(park, st["o"][k], pj["o"][k])
                        pj["d"][k] = jnp.where(park, st["d"][k], pj["d"][k])
                        pj["thr"][k] = jnp.where(
                            park, st["thr"][k], pj["thr"][k]
                        )
                    pj["prev"] = jnp.where(park, st["prev"], pj["prev"])
                    pj["depth"] = jnp.where(park, st["depth"], pj["depth"])
                    pj["ps"] = jnp.where(park, 1.0, pj["ps"])
                    to_park = to_park & ~park
                parked = needs & live & ~to_park
                st["alive"] = jnp.where(parked, 0.0, st["alive"])
                stalled = to_park  # frozen and every buffer full
            else:
                stalled = needs
            # frozen marker for the NEXT loop-condition check (cheap: the
            # portal test is deterministic on unchanged o/d, so a frozen
            # lane stays frozen until the resolver moves it)
            st["frozen"] = jnp.where(live, stalled.astype(jnp.float32), 0.0)
            return st

        o = [state_ref[ROW_O + k] for k in range(3)]
        d = [state_ref[ROW_D + k] for k in range(3)]
        thr = [state_ref[ROW_THR + k] for k in range(3)]
        acc = [state_ref[ROW_ACC + k] for k in range(3)]
        # non-foldable zero (Mosaic: constant carries + PRNG updates crash)
        zero = jnp.minimum(_uniform((SUB, L)) * 0.0, 0.0)
        state = {
            "o": o, "d": d, "thr": thr, "acc": acc,
            "alive": state_ref[ROW_ALIVE],
            "prev": state_ref[ROW_PREV],
            "depth": state_ref[ROW_DEPTH],
            "done": state_ref[V2_ROW_DONE],
            "counts": zero,
            "frozen": zero,  # conservatively 0: first check runs the body
        }
        if park_k:
            state["started"] = state_ref[V3_ROW_STARTED]
            state["p"] = [
                {
                    "o": [state_ref[buf_row(j, BUF_O + k)] for k in range(3)],
                    "d": [state_ref[buf_row(j, BUF_D + k)] for k in range(3)],
                    "thr": [
                        state_ref[buf_row(j, BUF_THR + k)] for k in range(3)
                    ],
                    "prev": state_ref[buf_row(j, BUF_PREV)],
                    "depth": state_ref[buf_row(j, BUF_DEPTH)],
                    "ps": state_ref[buf_row(j, BUF_STATE)],
                }
                for j in range(park_k)
            ]

        def not_done(carry):
            i, st = carry
            can_start = st["done"] < qrow
            if park_k:
                can_start = st["started"] < qrow
                for pj in st["p"]:
                    can_start = can_start | (pj["ps"] > 1.5)
            runnable = jnp.where(
                st["alive"] > 0.0,
                1.0 - st["frozen"],
                jnp.where(can_start, 1.0, 0.0),
            )
            fi = i.astype(jnp.float32)
            bound = jnp.where(
                step_cap > 0.0,
                jnp.minimum(step_cap, quota * max_depth + 8.0),
                quota * max_depth + 8.0,
            )
            return (fi < bound) & (
                _fold_lanes(runnable) > 0.0
            )

        def wstep(carry):
            i, st = carry
            for _ in range(unroll):
                st = active(st)
            return (i + unroll, st)

        _, st = jax.lax.while_loop(not_done, wstep, (jnp.int32(0), state))

        for k in range(3):
            out_ref[ROW_O + k] = st["o"][k]
            out_ref[ROW_D + k] = st["d"][k]
            out_ref[ROW_THR + k] = st["thr"][k]
            out_ref[ROW_ACC + k] = st["acc"][k]
        out_ref[ROW_ALIVE] = st["alive"]
        out_ref[ROW_PREV] = st["prev"]
        out_ref[ROW_DEPTH] = st["depth"]
        out_ref[V2_ROW_DONE] = st["done"]
        out_ref[V2_ROW_PIX] = pix
        out_ref[V2_ROW_QUOTA] = qrow
        if park_k:
            out_ref[V3_ROW_STARTED] = st["started"]
            for j, pj in enumerate(st["p"]):
                for k in range(3):
                    out_ref[buf_row(j, BUF_O + k)] = pj["o"][k]
                    out_ref[buf_row(j, BUF_D + k)] = pj["d"][k]
                    out_ref[buf_row(j, BUF_THR + k)] = pj["thr"][k]
                out_ref[buf_row(j, BUF_PREV)] = pj["prev"]
                out_ref[buf_row(j, BUF_DEPTH)] = pj["depth"]
                out_ref[buf_row(j, BUF_STATE)] = pj["ps"]
        count_ref[0] = st["counts"]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "portal_key", "cam_key", "max_depth", "rr_start_depth", "block",
        "unroll", "park_k",
    ),
    donate_argnums=(0,),
)
def trace_cheap_regen(
    pool,
    portal_key: str,
    cam_key: str,
    seed,
    quota,
    sample_base,
    step_cap=0,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 2048,
    unroll: int = 8,
    park_k: int = 0,
):
    """Advance the pixel-pinned pool: every lane runs cheap-scene bounces
    with in-kernel regeneration until it is frozen at the portal, has
    issued `quota` samples, or the per-call `step_cap` is reached (all
    runtime scalars; step_cap 0 = unlimited). pool: [pool_rows(park_k), n]
    f32, n % block == 0. park_k > 0 parks frozen paths per lane instead of
    stalling (see _make_kernel_cheap_regen). Returns (pool', rays_traced).
    With step_cap 0 and park_k 0, alive == frozen after this call."""
    consts = _SCENES[portal_key]
    cam_consts = _SCENES[cam_key]
    n = pool.shape[1]
    rows = pool_rows(park_k)
    if n % block or block % SUB:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if pool.shape[0] != rows:
        raise ValueError(
            f"pool has {pool.shape[0]} rows; park_k={park_k} needs {rows}"
        )
    L = block // SUB
    rows8 = n // L
    kernel = _make_kernel_cheap_regen(
        consts, cam_consts, L, max_depth, rr_start_depth, unroll, park_k
    )

    def rspec(k):
        return pl.BlockSpec((k, SUB, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out, counts = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), rspec(rows)],
        out_specs=(rspec(rows), rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, rows8, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows8, L), jnp.float32),
        ),
        input_output_aliases={1: 0},
    )(
        jnp.stack([
            jnp.asarray(seed, jnp.int32),
            jnp.asarray(quota, jnp.int32),
            jnp.asarray(sample_base, jnp.int32),
            jnp.asarray(step_cap, jnp.int32),
        ]).reshape(1, 4),
        pool.reshape(rows, rows8, L),
    )
    return out.reshape(rows, n), jnp.sum(counts)


def _make_kernel_resolve_pool(
    R, parts, B, bpp, max_depth, rr_start_depth, fixed_uniforms, pretest,
    n_tiles, tile_base, const_mat_tiles,
):
    """Pool-native resolve kernel: one full-scene bounce over the active
    path and the first parts-1 parked buffers of a [R, B] pool column
    block, with ALL retire/park bookkeeping done in-kernel.

    The grid is (n // B, parts) with the part index iterating fastest; the
    pool block's index map ignores the part, so Pallas keeps ONE fetched
    copy resident in VMEM across the parts sweep and flushes the (aliased)
    output block once per column. This replaces the scheduler's XLA glue
    around trace_pallas_resolve — the per-part concatenates, where-selects
    and pool reassembly that measured ~15 ms of a ~104 ms mesh bulk cycle
    (PERF.md skip_kernel ablation). Bookkeeping semantics are EXACTLY
    render.portal.portal_resolve_phase's, and the per-block PRNG seeding
    reproduces the concatenated layout's block ids (g = part * bpp + i),
    so the two paths are bit-identical (tests/test_portal.py):

      part 0 (active path): bounce; done += ended (alive 1 -> 0).
      part j >= 1 (buffer j-1): bounce the FROZEN lanes (BUF_STATE == 1)
        with acc = 0; slot acc += the bounce's radiance delta; done +=
        newly-ended; BUF_STATE -> 2 (ready) / 0 (ended); EMPTY and READY
        buffers pass through untouched.
    """

    def kernel(seed_ref, pool_ref, *args):
        if fixed_uniforms:
            u_ref, *args = args
        *tables, pool_out, count_out = args
        isect = make_isect(tables, B, pretest, n_tiles, tile_base,
                           const_mat_tiles)
        j = pl.program_id(1)
        if not fixed_uniforms:
            # same per-block stream ids as the concatenated resolve input
            # (global block g = part * blocks_per_part + column)
            pltpu.prng_seed(
                seed_ref[0, 0]
                + (j * jnp.int32(bpp) + pl.program_id(0))
                * jnp.int32(-1640531535)
            )

        @pl.when(j == 0)
        def _init():
            # rows no part writes (pix, started, un-resolved buffers) ride
            # this one VMEM-resident copy; later parts read-modify-write
            # the done/acc rows in place
            pool_out[...] = pool_ref[...]
            count_out[...] = jnp.zeros((1, B), jnp.float32)

        # gather part j's resolve state (where-chain over the broadcast
        # part index — 15 VMEM row reads per part, cheap next to the sweep)
        def row(r):
            return pool_ref[r, :][None, :]

        jv = jnp.zeros((1, B)) + j.astype(jnp.float32)
        o = [row(ROW_O + k) for k in range(3)]
        d = [row(ROW_D + k) for k in range(3)]
        thr = [row(ROW_THR + k) for k in range(3)]
        acc = [row(ROW_ACC + k) for k in range(3)]
        alive_f = row(ROW_ALIVE)
        prev = row(ROW_PREV)
        depth = row(ROW_DEPTH)
        for jj in range(1, parts):
            b = buf_row(jj - 1)
            sel = jv == float(jj)

            def w(a, r, sel=sel):
                return jnp.where(sel, pool_ref[r, :][None, :], a)

            o = [w(o[k], b + BUF_O + k) for k in range(3)]
            d = [w(d[k], b + BUF_D + k) for k in range(3)]
            thr = [w(thr[k], b + BUF_THR + k) for k in range(3)]
            # buffers sweep a zero acc: their output is a pure delta
            acc = [jnp.where(sel, 0.0, acc[k]) for k in range(3)]
            st = pool_ref[b + BUF_STATE, :][None, :]
            frozen = jnp.where((st > 0.5) & (st < 1.5), 1.0, 0.0)
            alive_f = jnp.where(sel, frozen, alive_f)
            prev = w(prev, b + BUF_PREV)
            depth = w(depth, b + BUF_DEPTH)
        alive_in = alive_f

        if fixed_uniforms:
            u_fix = u_ref[0:4, :]

        def bounce(carry):
            o, d, thr, acc, alive_f, prev, depth, counts = carry
            alive = alive_f > 0.0
            counts = counts + alive_f
            found, point, nrm, color, emis, rtype, new_prev = isect(
                o, d, prev, alive
            )
            u = u_fix if fixed_uniforms else _uniform((4, B))
            u4 = [u[k, :][None, :] for k in range(4)]
            new_depth = depth + 1.0
            acc, thr_new, d_new, alive_new = shade_phase(
                d, nrm, color, emis, rtype, found, thr, acc, u4,
                new_depth, max_depth, rr_start_depth,
            )
            am = alive_new.astype(jnp.float32)
            o = [jnp.where(alive_new, point[k], o[k]) for k in range(3)]
            d = [jnp.where(alive_new, d_new[k], d[k]) for k in range(3)]
            thr = [thr_new[k] * am for k in range(3)]
            depth = depth + alive_f
            return (o, d, thr, acc, am, new_prev, depth, counts)

        # all-dead part skip (drained buffers in the tail phase): one
        # scalar branch elides the whole sweep, as in the stepped kernel
        live = alive_f
        while live.shape[-1] > 128:
            h = live.shape[-1] // 2
            live = live[..., :h] + live[..., h:]
        any_alive = jnp.sum(live) > 0.0
        counts0 = jnp.zeros((1, B), jnp.float32)
        (o, d, thr, acc, alive_out, prev, depth, counts) = jax.lax.cond(
            any_alive, bounce, lambda c: c,
            (o, d, thr, acc, alive_f, prev, depth, counts0),
        )
        count_out[0, :] = count_out[0, :] + counts[0, :]

        @pl.when(j == 0)
        def _wb_active():
            for k in range(3):
                pool_out[ROW_O + k, :] = o[k][0, :]
                pool_out[ROW_D + k, :] = d[k][0, :]
                pool_out[ROW_THR + k, :] = thr[k][0, :]
                pool_out[ROW_ACC + k, :] = acc[k][0, :]
            pool_out[ROW_ALIVE, :] = alive_out[0, :]
            pool_out[ROW_PREV, :] = prev[0, :]
            pool_out[ROW_DEPTH, :] = depth[0, :]
            ended = (alive_in > 0.0) & (alive_out <= 0.0)
            pool_out[V2_ROW_DONE, :] = (
                pool_ref[V2_ROW_DONE, :] + ended.astype(jnp.float32)[0, :]
            )

        for jj in range(1, parts):
            b = buf_row(jj - 1)

            @pl.when(j == jj)
            def _wb_buf(b=b):
                proc = alive_in > 0.0  # frozen buffers only
                pj_alive = alive_out > 0.0

                def sel(new, r):
                    return jnp.where(
                        proc, new, pool_ref[r, :][None, :]
                    )[0, :]

                for k in range(3):
                    pool_out[b + BUF_O + k, :] = sel(o[k], b + BUF_O + k)
                    pool_out[b + BUF_D + k, :] = sel(d[k], b + BUF_D + k)
                    pool_out[b + BUF_THR + k, :] = sel(
                        thr[k], b + BUF_THR + k
                    )
                pool_out[b + BUF_PREV, :] = sel(prev, b + BUF_PREV)
                pool_out[b + BUF_DEPTH, :] = sel(depth, b + BUF_DEPTH)
                ready = jnp.where(pj_alive, 2.0, 0.0)
                pool_out[b + BUF_STATE, :] = sel(ready, b + BUF_STATE)
                # parked radiance lives in the slot acc (shared across the
                # slot's samples); the buffer swept a zero acc, so its
                # output adds as a pure delta
                for k in range(3):
                    pool_out[ROW_ACC + k, :] = (
                        pool_out[ROW_ACC + k, :] + acc[k][0, :]
                    )
                newly = proc & ~pj_alive
                pool_out[V2_ROW_DONE, :] = (
                    pool_out[V2_ROW_DONE, :]
                    + newly.astype(jnp.float32)[0, :]
                )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "parts", "max_depth", "rr_start_depth", "block", "const_mat_tiles",
    ),
    donate_argnums=(0,),
)
def trace_pallas_resolve_pool(
    pool,
    kscene: dict,
    seed,
    *,
    parts: int,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 1024,
    uniforms=None,
    const_mat_tiles: tuple | None = None,
):
    """Pool-native resolve: one full-scene bounce over the active path and
    the first parts-1 parked buffers of a v2/v3 pool, with the retire/park
    bookkeeping done in-kernel (see _make_kernel_resolve_pool) — the
    fused form of render.portal.portal_resolve_phase, bit-identical to it.

    pool: [pool_rows, n] f32, n % block == 0. uniforms (testing only):
    [4, parts * n] injected uniforms laid out like the concatenated
    resolve input (part-major), replacing the PRNG. Returns
    (pool', rays_traced)."""
    R, n = pool.shape
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    need = V3_BUF_BASE + (parts - 1) * BUF_ROWS if parts > 1 else V2_ROWS
    if R < need:
        raise ValueError(f"pool has {R} rows; parts={parts} needs >= {need}")
    pretest = "gate" in kscene
    n_tiles = kscene["tile_lo"].shape[1] if "tile_lo" in kscene else 0
    T = kscene["tri_na"].shape[1]
    tile_base = T - n_tiles * TRI_TILE if n_tiles else 0
    scene_keys = _scene_keys(kscene)
    fixed = uniforms is not None
    bpp = n // block  # blocks per part (matches the concatenated layout)
    kernel = _make_kernel_resolve_pool(
        R, parts, block, bpp, max_depth, rr_start_depth, fixed, pretest,
        n_tiles, tile_base, const_mat_tiles,
    )

    pool_spec = pl.BlockSpec((R, block), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((1, block), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    uni_specs = [
        pl.BlockSpec((4, block), lambda i, j: (0, j * bpp + i),
                     memory_space=pltpu.VMEM)
    ] if fixed else []
    uni_args = [uniforms] if fixed else []
    out, counts = pl.pallas_call(
        kernel,
        grid=(bpp, parts),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pool_spec,
            *uni_specs,
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in scene_keys],
        ],
        out_specs=(pool_spec, cnt_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        input_output_aliases={1: 0},
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        pool,
        *uni_args,
        *[kscene[k] for k in scene_keys],
    )
    return out, jnp.sum(counts)


@functools.partial(
    jax.jit,
    static_argnames=("portal_key", "max_depth", "rr_start_depth", "block"),
    donate_argnums=(0,),
)
def trace_cheap_blocked(
    pool,
    portal_key: str,
    seed,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 2048,
):
    """Advance every pool lane through cheap-scene bounces until it dies or
    freezes at the portal. pool: [ROWS, n] f32 (row layout above), n % block
    == 0. Returns (pool', rays_traced). After this call alive == frozen.
    """
    consts = _SCENES[portal_key]
    n = pool.shape[1]
    if n % block or block % SUB:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    L = block // SUB
    rows8 = n // L
    kernel = _make_kernel_cheap(consts, L, max_depth, rr_start_depth)

    def rspec(k):
        return pl.BlockSpec((k, SUB, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    out, counts = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), rspec(ROWS)],
        out_specs=(rspec(ROWS), rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((ROWS, rows8, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows8, L), jnp.float32),
        ),
        input_output_aliases={1: 0},
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        pool.reshape(ROWS, rows8, L),
    )
    return out.reshape(ROWS, n), jnp.sum(counts)
