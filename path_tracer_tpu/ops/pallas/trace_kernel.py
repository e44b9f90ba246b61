"""Pallas TPU megakernel: the full wavefront trace loop fused on-chip.

The XLA-composed integrator (render.integrator.trace) materializes [N,*]
temporaries in HBM between fused ops — ~50 ms per bounce per 1.5M rays. This
kernel keeps EVERYTHING in VMEM/registers for all bounces: per block of
``B`` rays it runs the complete 12-bounce loop (intersect → merge → RR →
BSDF sample → state update), so HBM traffic is just rays in (24 B/ray) and
radiance out (12 B/ray). Scene tables (a few KB) are VMEM-resident.

Layout: rays ride the LANE axis (minor, 128-aligned); primitives ride the
SUBLANE axis. Per-ray state is [1,B]; per-(prim,ray) temporaries are [P,B].
All math is f32 (geometry needs the mantissa; bf16 is ~3 digits).

RNG: the per-core hardware PRNG (pltpu.prng_seed / prng_random_bits), seeded
per (seed, block id) — deterministic for a fixed layout, the Pallas analog
of the integrator's counter-based threefry.

Semantics match ops.intersect + ops.bsdf + render.integrator exactly
(same epsilons, reverse-scan tie-break via packed order, bounding-sphere
pre-test, prev-triangle exclusion, RR constants) — validated LANE-EXACTLY
against the XLA integrator under injected uniforms in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.models.scene import ScenePacked

F32 = jnp.float32
EPS_SPHERE = 1e-4
EPS_TRI_DET = 1e-4
EPS_TRI_T = 1e-4
BIG = 3.0e38  # ~f32 max: "miss" sentinel (inf-free math inside the kernel)

DEFAULT_BLOCK = 512

# static quota caps for the regenerative kernels (the compiled loop bound is
# quota_cap * max_depth; runtime quotas must stay <= the cap). Singly defined
# here — pipeline.py / bench.py import these instead of re-hardcoding.
QUOTA_CAP_PRIM = 64  # prim-major regen kernel (large loop body)
QUOTA_CAP_STATIC = 256  # static-scene regen kernel (trace_v2)

# regen fori loop: steps per all-done scalar sync (see regen_loop.steps_n)
SYNC_EVERY = 1

# regen while loop: steps per exit check (one while-cond + one cond reduce).
# Swept on single-sphere 256x256 (2026-08-17): 4/6/8/12/16 ->
# 2352/2714/3003/2952/2143 Mray/s — 8 is the peak; past it the wider body
# loses more (spills/overshoot) than the rarer scalar sync saves.
WHILE_UNROLL = 8



def detect_quad_pairs(packed: ScenePacked):
    """Find consecutive triangle pairs (in packed order) that form a
    parallelogram with identical material — collapsible into ONE quad
    primitive whose Möller–Trumbore acceptance is u,v ∈ [0,1]² instead of
    u+v ≤ 1. Exact-parity argument: the pair shares a plane, so the quad's
    t/normal equal the triangles' (bitwise for the axis-aligned wall quads
    of scenes.rs:321-367); the parallelogram is exactly the union of the
    two triangles; and excluding the departed QUAD is equivalent to
    excluding the departed triangle because the coplanar partner is always
    rejected by the t > EPS_TRI_T test. The first triangle is rotated so
    the parallelogram corner (its vertex not shared with the partner)
    comes first; the partner's unique vertex must equal p1 + p2 - p0 in
    exact f32 (conservative: approximate quads stay as triangles).

    Returns (quads, covered): quads maps first-triangle packed index →
    rotated [3,3] vertices; covered is the set of consumed indices."""
    nt = packed.num_triangles
    tv = np.asarray(packed.tri_v[:nt], np.float32)
    color = np.asarray(packed.tri_color[:nt])
    emis = np.asarray(packed.tri_emis[:nt])
    rtype = np.asarray(packed.tri_rtype[:nt])
    mesh = np.asarray(packed.tri_mesh[:nt])
    quads: dict[int, np.ndarray] = {}
    covered: set[int] = set()
    i = 0
    while i + 1 < nt:
        j = i + 1
        if (
            mesh[i] == mesh[j]
            and np.array_equal(color[i], color[j])
            and np.array_equal(emis[i], emis[j])
            and rtype[i] == rtype[j]
        ):
            A, B = tv[i], tv[j]
            bset = {tuple(v) for v in B}
            uniq = [k for k in range(3) if tuple(A[k]) not in bset]
            if len(uniq) == 1:
                k = uniq[0]
                p0, p1, p2 = A[k], A[(k + 1) % 3], A[(k + 2) % 3]
                shared = {tuple(p1), tuple(p2)}
                uniq_b = [tuple(v) for v in B if tuple(v) not in shared]
                q = p1 + p2 - p0  # f32 arithmetic, exact-match required
                if len(uniq_b) == 1 and np.array_equal(
                    np.asarray(uniq_b[0], np.float32), q
                ):
                    quads[i] = np.stack([p0, p1, p2])
                    covered.update((i, j))
                    i += 2
                    continue
        i += 1
    return quads, covered


def _pad_to(x: np.ndarray, n: int, axis: int, fill: float) -> np.ndarray:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill)


import os as _os  # noqa: E402

# triangles per culling tile (must stay a multiple of 8 for sublane
# alignment; 64 measured best unsorted — smaller tiles only pay once the
# sorted resolve makes per-tile conds fire, so the knob is env-sweepable)
TRI_TILE = int(_os.environ.get("PT_TPU_TRI_TILE", "64"))
if TRI_TILE <= 0 or TRI_TILE % 8:
    # a misaligned tile would surface as a slow, bare Mosaic lowering
    # failure (see CLAUDE.md) — fail loudly at import instead
    raise ValueError(f"PT_TPU_TRI_TILE={TRI_TILE} must be a positive "
                     "multiple of 8")
TILE_THRESHOLD = 192  # tile + cull only above this many triangles
# lane width of each tile-cull decision. A whole-block (1024-lane) ANY almost
# never skips for incoherent bounce rays (P(skip) ~ (1-p)^1024); 128-lane
# chunks would skip far more often — but MEASURED 4x SLOWER on the mesh
# scene (8.4 vs 36.8 Mray/s at CULL_CHUNK=128): 13 tiles x 8 chunks of
# scalar branches per bounce step cost more than the vector work they skip.
# Keep whole-block (0); the chunked machinery stays for narrower hardware.
CULL_CHUNK = 0

# Skip the per-tile any-can-hit lax.cond and execute every Morton tile
# unconditionally. For the portal RESOLVE the frozen lanes all reach the
# mesh AABB by construction, so the conds almost never fire there — this
# trades their scalar-branch overhead for the (already-paid) vector work.
# Module-level like CULL_CHUNK: set PT_TPU_FORCE_TILES=1 before import
# (separate process per variant — the jit cache does not key on it).
FORCE_TILES = bool(int(_os.environ.get("PT_TPU_FORCE_TILES", "0")))

# Timing-only ablation switch for scripts/ablate_resolve.py (ablated
# kernels render garbage by design; fresh process per variant, like
# FORCE_TILES): "nofetch" skips the deferred MXU feature fetch, "nomin"
# replaces the per-tile first-wins min reduction with a plain min.
ABLATE = _os.environ.get("PT_TPU_ABLATE", "")


# static per-scene kernel metadata (e.g. per-tile material uniformity),
# registered by the pipeline under its portal key so jitted schedulers can
# recover it at trace time from their static key (a jit-traced dict of
# arrays cannot carry static tuples).
TILE_META: dict[str, dict] = {}


def kernel_scene_buffers(packed: ScenePacked, with_meta: bool = False):
    """Scene tables shaped for the kernel: [3,P] / [1,P] with prims padded to
    sublane multiples using guaranteed-miss entries; plus the [M,T] 0/1 gate
    matrix mapping mesh bounding spheres to their triangles.

    Scenes with many triangles additionally get Morton-ordered culling tiles
    (the TPU-native BVH analog, survey §7 phase 5): triangles are sorted by
    centroid Morton code and grouped into TRI_TILE-sized tiles with AABBs;
    the kernel slab-tests each tile against the ray block's current best
    hits and skips the tile's Möller–Trumbore work when NO lane can hit it —
    block-level divergence is a scalar branch on TPU, so coherent blocks
    skip most of the scene. (Tie-breaks then follow Morton order rather
    than the reference's object order — distance ties are measure-zero.)"""
    # pack_scene already padded these with guaranteed-miss entries
    S = packed.sph_radius.shape[0]
    T = packed.tri_v.shape[0]
    M = packed.bnd_radius.shape[0]

    def prep(x, P, fill=0.0):
        x = np.asarray(x, np.float32)
        x = x[None, :] if x.ndim == 1 else x.T  # [P,k] -> [k,P]
        return _pad_to(x, P, 1, fill)

    sc = packed
    import path_tracer_tpu.ops.intersect as intersect_ops

    # The reference's bounding-sphere pre-test (mod.rs:265-279) exists to
    # skip triangle loops on the CPU; on TPU all lanes compute anyway, so it
    # is pure overhead UNLESS the (buggy-centered) sphere fails to contain
    # its mesh — then it genuinely gates hits and must be evaluated for
    # parity. Host-check containment; drop the pre-test when it is a no-op.
    contained = True
    for m_idx in range(sc.num_meshes):
        sel = np.asarray(sc.tri_mesh[: sc.num_triangles]) == m_idx
        if not sel.any():
            continue
        verts = np.asarray(sc.tri_v[: sc.num_triangles])[sel].reshape(-1, 3)
        c = sc.bnd_center[m_idx]
        r = float(sc.bnd_radius[m_idx])
        dmax = float(np.sqrt(((verts - c) ** 2).sum(axis=1)).max())
        if dmax > r * (1.0 + 1e-5) + 1e-6:
            contained = False
            break

    # --- Morton-ordered culling tiles for triangle-heavy scenes ---
    # (tiling reorders triangles, which is incompatible with the [M,T] gate
    # matrix — only tile when the pre-test was dropped, i.e. `contained`)
    # collapse parallelogram pairs into quads (identical hit semantics,
    # half the Möller–Trumbore work; see detect_quad_pairs)
    quads, covered = detect_quad_pairs(sc)
    keep = [i for i in range(sc.num_triangles)
            if i not in covered or i in quads]
    nt = len(keep)
    T = max(((nt + 7) // 8) * 8, 8)

    def collapse(src, fill, verts=False):
        a = np.asarray(src, np.float32)
        out = np.full((T,) + a.shape[1:], fill, np.float32)
        for row, i in enumerate(keep):
            out[row] = quads[i] if (verts and i in quads) else a[i]
        return out

    tri_v = collapse(sc.tri_v, 1e30, verts=True)
    tri_normal = collapse(sc.tri_normal, 0.0)
    tri_color = collapse(sc.tri_color, 0.0)
    tri_emis = collapse(sc.tri_emis, 0.0)
    tri_rtype = collapse(sc.tri_rtype, 0.0)
    tri_order = collapse(np.minimum(np.asarray(sc.tri_order), 2**24), 1.0e9)
    tri_quad = np.zeros(T, np.float32)
    # canonical per-row PACKED triangle index (quads: the pair's first
    # triangle) — prev-exclusion and new_prev use THIS id, not the kernel
    # row index, so prev values are meaningful across kernels (the static
    # v2/v3 kernels and the XLA integrator use packed ids already; the
    # portal scheduler hands paths between kernels). Padding: -2 (never
    # equals a real id or the "none" sentinel -1).
    tri_pid = np.full(T, -2.0, np.float32)
    for row, i in enumerate(keep):
        tri_quad[row] = 1.0 if i in quads else 0.0
        tri_pid[row] = float(i)
    tri_mesh_c = np.asarray(sc.tri_mesh)[keep] if nt else np.zeros(0, np.int64)

    tiles = None
    if contained and nt > TILE_THRESHOLD:
        verts_all = tri_v[:nt]
        cent = verts_all.mean(axis=1)
        # triangles nearly as large as the scene (walls) would bloat any
        # tile bound → keep them in an always-tested base set at the front
        tri_rad = np.sqrt(((verts_all - cent[:, None, :]) ** 2).sum(-1)).max(1)
        scene_diag = float(
            np.linalg.norm(
                verts_all.reshape(-1, 3).max(0) - verts_all.reshape(-1, 3).min(0)
            )
        )
        big = tri_rad > 0.125 * scene_diag
        small_idx = np.where(~big)[0]

        lo = cent[small_idx].min(axis=0)
        span = np.maximum(cent[small_idx].max(axis=0) - lo, 1e-9)
        norm = np.clip((cent[small_idx] - lo) / span, 0.0, 0.999999).astype(
            np.float32
        )
        from path_tracer_tpu.native import native_morton3d

        codes = native_morton3d(norm)
        if codes is None:  # python fallback
            q = (norm * 1024).astype(np.uint32)

            def expand(v):
                v = (v * 0x00010001) & 0xFF0000FF
                v = (v * 0x00000101) & 0x0F00F00F
                v = (v * 0x00000011) & 0xC30C30C3
                v = (v * 0x00000005) & 0x49249249
                return v

            codes = (
                (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
            )
        small_sorted = small_idx[np.argsort(codes, kind="stable")]

        n_base = int(big.sum())
        base_pad = max(((n_base + 7) // 8) * 8, 8)
        C = -(-len(small_sorted) // TRI_TILE)
        T = base_pad + C * TRI_TILE
        order = np.concatenate([np.where(big)[0], small_sorted])
        dst = np.concatenate(
            [np.arange(n_base), base_pad + np.arange(len(small_sorted))]
        )

        def reorder(a, fill=0.0):
            out = np.full((T,) + a.shape[1:], fill, a.dtype)
            out[dst] = a[:nt][order]
            return out

        tri_v = reorder(tri_v, 1e30)  # padding: degenerate + far away
        tri_normal = reorder(tri_normal)
        tri_color = reorder(tri_color)
        tri_emis = reorder(tri_emis)
        tri_rtype = reorder(tri_rtype)
        tri_order = reorder(tri_order, 1.0e9)
        tri_quad = reorder(tri_quad)
        tri_pid = reorder(tri_pid, -2.0)

        # tile AABBs: much tighter than bounding spheres for flat surface
        # patches (a sphere pays the full diagonal), and the slab test is
        # cheap; slop keeps the cull conservative under f32 rounding
        tile_lo = np.full((C, 3), 1e30, np.float32)
        tile_hi = np.full((C, 3), -1e30, np.float32)
        for c in range(C):
            verts = tri_v[base_pad + c * TRI_TILE : base_pad + (c + 1) * TRI_TILE]
            verts = verts[verts[:, 0, 0] < 1e29].reshape(-1, 3)
            if len(verts) == 0:
                continue
            span = verts.max(0) - verts.min(0)
            slop = np.maximum(span, np.abs(verts).max()) * 1e-5 + 1e-6
            tile_lo[c] = verts.min(axis=0) - slop
            tile_hi[c] = verts.max(axis=0) + slop
        tiles = (tile_lo, tile_hi, C, base_pad)

        # per-tile material uniformity: a tile whose real triangles share
        # color/emis/rtype can skip 8 of its 12 one-hot attribute reads in
        # the kernel (the winner's material is the tile's first row). True
        # for typical single-material OFF meshes; walls live in the base
        # set and don't constrain this.
        uniform = []
        for c in range(C):
            sl = slice(base_pad + c * TRI_TILE, base_pad + (c + 1) * TRI_TILE)
            rows = np.where(tri_pid[sl] > -1.5)[0]
            u = len(rows) > 0
            for tab in (tri_color, tri_emis, tri_rtype):
                a = tab[sl][rows]
                u = u and bool(np.all(a == a[0]))
            uniform.append(u)
        meta = {"tile_uniform_mat": tuple(uniform)}

    coeffs = intersect_ops.triangle_coeffs_np(tri_v)

    order_fill = 1.0e9
    bufs = {
        "sph_center": prep(sc.sph_center, S, 1e30),
        "sph_rad2": prep(np.asarray(sc.sph_radius) ** 2, S),
        "sph_color": prep(sc.sph_color, S),
        "sph_emis": prep(sc.sph_emis, S),
        "sph_rtype": prep(sc.sph_rtype.astype(np.float32), S),
        "sph_order": prep(
            np.minimum(sc.sph_order, 2**24).astype(np.float32), S, order_fill
        ),
        "tri_n": prep(coeffs["n"], T),
        "tri_e1": prep(coeffs["e1"], T),
        "tri_e2": prep(coeffs["e2"], T),
        "tri_e2xa": prep(coeffs["e2xa"], T),
        "tri_axe1": prep(coeffs["axe1"], T),
        "tri_na": prep(coeffs["na"], T),
        "tri_normal": prep(tri_normal, T),
        "tri_color": prep(tri_color, T),
        "tri_emis": prep(tri_emis, T),
        "tri_rtype": prep(tri_rtype, T),
        "tri_order": prep(tri_order, T, order_fill),
        "tri_quad": prep(tri_quad, T),
        "tri_pid": prep(tri_pid, T, -2.0),
    }
    if tiles is not None:
        tile_lo, tile_hi, _, _ = tiles
        # the always-tested base set size is recoverable statically as
        # T - C*TRI_TILE (trace_pallas derives it from the array shapes)
        bufs["tile_lo"] = prep(tile_lo, tile_lo.shape[0])
        bufs["tile_hi"] = prep(tile_hi, tile_hi.shape[0])
    if not contained:
        gate = np.zeros((M, T), np.float32)
        for t in range(nt):
            gate[tri_mesh_c[t], t] = 1.0
        bufs["bnd_center"] = prep(sc.bnd_center, M, 1e30)
        bufs["bnd_rad2"] = prep(np.asarray(sc.bnd_radius) ** 2, M)
        bufs["gate"] = gate

    # scene AABB for inter-bounce ray-sort key quantization (not a kernel
    # table — consumed host-side by trace_pallas_sorted; `_scene_keys`
    # whitelists what reaches the kernel, so extra entries are harmless)
    pts = [tri_v[tri_v[:, 0, 0] < 1e29].reshape(-1, 3)]
    srad = np.asarray(sc.sph_radius, np.float32)
    scen = np.asarray(sc.sph_center, np.float32)
    real = srad > 0.0
    if real.any():
        pts += [scen[real] - srad[real, None], scen[real] + srad[real, None]]
    pts = np.concatenate(pts) if pts[0].size or len(pts) > 1 else np.zeros((1, 3))
    lo = pts.min(axis=0).astype(np.float32)
    span = np.maximum(pts.max(axis=0) - lo, 1e-6).astype(np.float32)
    bufs["aabb_lo"] = lo.reshape(3, 1)
    bufs["aabb_inv_span"] = (1.0 / span).reshape(3, 1)
    out = {k: jnp.asarray(v) for k, v in bufs.items()}
    if with_meta:
        return out, (meta if tiles is not None else {})
    return out


def _uniform(shape):
    """Hardware PRNG bits → uniform f32 in [0,1)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _first_min_sublane(t, idx):
    """[P,B] distances + [P,B] index iota → (min [1,B], one-hot [P,B],
    winner index [1,B]). First-wins tie-break via a second min over the
    tying indices."""
    tmin = jnp.min(t, axis=0, keepdims=True)
    eq = t == tmin
    imin = jnp.min(jnp.where(eq, idx, BIG), axis=0, keepdims=True)
    return tmin, (idx == imin).astype(jnp.float32), imin


def _sphere_t(cen, rad2, o, d):
    """centers 3x[S,1], rad2 [S,1], rays 3x[1,B] → t [S,B] (BIG = miss)."""
    cd = sum(cen[k] * d[k] for k in range(3))
    co = sum(cen[k] * o[k] for k in range(3))
    cc = sum(cen[k] * cen[k] for k in range(3))
    od = sum(o[k] * d[k] for k in range(3))
    oo = sum(o[k] * o[k] for k in range(3))
    b = cd - od
    det = b * b - (cc - 2.0 * co + oo) + rad2
    sq = jnp.sqrt(jnp.maximum(det, 0.0))
    t_near = b - sq
    t_far = b + sq
    t = jnp.where(
        t_near >= EPS_SPHERE, t_near, jnp.where(t_far >= EPS_SPHERE, t_far, BIG)
    )
    # rad2 == 0 marks padding: the far-away center makes b²-|op|² cancel
    # catastrophically (can yield phantom positive roots) — force miss.
    return jnp.where((det < 0.0) | (rad2 <= 0.0), BIG, t)


_PI = np.float32(np.pi)
_R0 = np.float32((1.5 - 1.0) ** 2 / (1.5 + 1.0) ** 2)


def shade_phase(d, nrm, color, emis, rtype, found, thr, acc, u4,
                new_depth, max_depth, rr_start_depth):
    """Russian roulette + emission + BSDF sample + throughput update.

    Shape-agnostic (component lists of any 2D per-ray shape); shared by the
    prim-major (v1) and ray-major (v2) kernels. Semantics: mod.rs:676-788
    with the always-RR refraction branch (see ops.bsdf).
    Returns (acc', thr', d_new, alive_mask).
    """
    u_rr, u1, u2, u_br = u4

    nd = nrm[0] * d[0] + nrm[1] * d[1] + nrm[2] * d[2]
    to_ray = nd < 0.0
    nl = [jnp.where(to_ray, nrm[k], -nrm[k]) for k in range(3)]

    # --- Russian roulette (mod.rs:676-683) ---
    max_refl = jnp.maximum(color[0], jnp.maximum(color[1], color[2]))
    rr_on = new_depth > rr_start_depth
    survive = (u_rr < max_refl) & (new_depth < max_depth)
    die_rr = rr_on & ~survive
    scale = jnp.where(rr_on & survive, 1.0 / jnp.maximum(max_refl, 1e-30), 1.0)

    fm = found.astype(jnp.float32)
    acc = [acc[k] + thr[k] * emis[k] * fm for k in range(3)]

    # --- diffuse: cosine-weighted around nl (mod.rs:687-715) ---
    r1 = 2.0 * _PI * u1
    r2s = jnp.sqrt(u2)
    w = nl
    use_y = jnp.abs(w[0]) > 0.1
    upx = jnp.where(use_y, 0.0, 1.0)
    upy = jnp.where(use_y, 1.0, 0.0)
    ux = upy * w[2]
    uy = -upx * w[2]
    uz = upx * w[1] - upy * w[0]
    ul = jax.lax.rsqrt(jnp.maximum(ux * ux + uy * uy + uz * uz, 1e-30))
    ux, uy, uz = ux * ul, uy * ul, uz * ul
    vx = w[1] * uz - w[2] * uy
    vy = w[2] * ux - w[0] * uz
    vz = w[0] * uy - w[1] * ux
    cr1 = jnp.cos(r1) * r2s
    sr1 = jnp.sin(r1) * r2s
    wz = jnp.sqrt(jnp.maximum(1.0 - u2, 0.0))
    dd0 = ux * cr1 + vx * sr1 + w[0] * wz
    dd1 = uy * cr1 + vy * sr1 + w[1] * wz
    dd2 = uz * cr1 + vz * sr1 + w[2] * wz
    dl = jax.lax.rsqrt(jnp.maximum(dd0 * dd0 + dd1 * dd1 + dd2 * dd2, 1e-30))
    d_diff = [dd0 * dl, dd1 * dl, dd2 * dl]

    # --- specular mirror ---
    d_spec = [d[k] - nrm[k] * 2.0 * nd for k in range(3)]

    # --- refract (mod.rs:729-788; always-RR branch, weights Re/P, Tr/(1-P)) ---
    into = to_ray
    nnt = jnp.where(into, np.float32(1.0 / 1.5), np.float32(1.5))
    ddn = nl[0] * d[0] + nl[1] * d[1] + nl[2] * d[2]
    cos2t = 1.0 - nnt * nnt * (1.0 - ddn * ddn)
    tir = cos2t < 0.0
    tsc = ddn * nnt + jnp.sqrt(jnp.maximum(cos2t, 0.0))
    td = [d[k] * nnt - nl[k] * tsc for k in range(3)]
    tl = jax.lax.rsqrt(jnp.maximum(td[0] ** 2 + td[1] ** 2 + td[2] ** 2, 1e-30))
    td = [x * tl for x in td]
    tdn = td[0] * nrm[0] + td[1] * nrm[1] + td[2] * nrm[2]
    c_ = 1.0 - jnp.where(into, -ddn, tdn)
    re = _R0 + (1.0 - _R0) * c_**5
    p_ = 0.25 + 0.5 * re
    pick_refl = (u_br < p_) | tir
    d_refr = [jnp.where(pick_refl, d_spec[k], td[k]) for k in range(3)]
    # select numerator/denominator first -> ONE divide instead of two
    w_num = jnp.where(u_br < p_, re, 1.0 - re)
    w_den = jnp.where(u_br < p_, p_, 1.0 - p_)
    w_refr = jnp.where(tir, 1.0, w_num / w_den)

    is_diff = rtype < 0.5
    is_spec = (rtype >= 0.5) & (rtype < 1.5)
    d_new = [
        jnp.where(is_diff, d_diff[k], jnp.where(is_spec, d_spec[k], d_refr[k]))
        for k in range(3)
    ]
    wgt = jnp.where(is_diff | is_spec, 1.0, w_refr)

    thr_new = [thr[k] * color[k] * scale * wgt for k in range(3)]
    thr_max = jnp.maximum(thr_new[0], jnp.maximum(thr_new[1], thr_new[2]))
    # unconditional max-depth cut. For max_depth > rr_start_depth (the
    # reference production config) this is bit-identical to the RR-gated
    # cut above; for max_depth <= rr_start_depth it matches the XLA
    # integrator's scan bound — and it guarantees every sample terminates
    # within max_depth steps, which the regen loops' static
    # quota_cap*max_depth bound relies on under RUNTIME quotas.
    die_depth = new_depth >= max_depth
    alive_new = found & ~die_rr & ~die_depth & (thr_max > 0.0)
    return acc, thr_new, d_new, alive_new


def make_isect(tables, B, pretest, n_tiles, tile_base, const_mat_tiles=None):
    """Build the full-scene closest-hit intersector shared by the stepped /
    regen kernels (_make_kernel) and the pool-native resolver
    (ops.pallas.portal.trace_pallas_resolve_pool — ONE definition so the
    intersection semantics cannot drift between them).

    tables: the scene table refs in _scene_keys order. Returns
    isect(o, d, prev, alive) -> (found, point, nrm, color, emis, rtype,
    new_prev) over [1, B]-row lane vectors."""
    (
        sph_center, sph_rad2, sph_color, sph_emis, sph_rtype, sph_order,
        *rest,
    ) = tables
    if pretest:
        bnd_center, bnd_rad2, gate, *rest = rest
    if n_tiles:
        tile_lo, tile_hi, *rest = rest
    (
        tri_n, tri_e1, tri_e2, tri_e2xa, tri_axe1, tri_na,
        tri_normal, tri_color, tri_emis, tri_rtype, tri_order, tri_quad,
        tri_pid,
    ) = rest
    S = sph_rad2.shape[1]
    T = tri_na.shape[1]

    def tcol(ref, k):  # row k of [3,P] table as a [P,1] column
        return ref[k, :][:, None]

    sphc = [tcol(sph_center, k) for k in range(3)]
    sph_r2 = sph_rad2[0, :][:, None]
    if pretest:
        bndc = [tcol(bnd_center, k) for k in range(3)]
        bnd_r2 = bnd_rad2[0, :][:, None]
    # tpu.iota only produces integers — build f32 indices via cast
    sph_idx = jax.lax.broadcasted_iota(jnp.int32, (S, B), 0).astype(jnp.float32)

    def isect(o, d, prev, alive):
        """Closest hit for the current lanes. Returns (found, point,
        nrm, color, emis, rtype, new_prev)."""
        # --- spheres (+ bounding pre-test when it can gate hits) ---
        t_sph = _sphere_t(sphc, sph_r2, o, d)  # [S,B]
        if pretest:
            t_bnd = _sphere_t(bndc, bnd_r2, o, d)  # [M,B]
            pre_ok = (t_bnd < BIG).astype(jnp.float32)  # [M,B]
            tri_ok = jax.lax.dot_general(  # [T,B] per-triangle gate
                gate[...], pre_ok, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        # --- triangles (affine feature form) ---
        m = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]

        def tri_block(lo, size, rays=None, lane=(0, None),
                      const_mat=False, lite=False):
            """Intersect triangles [lo, lo+size) (static slice) against
            the ray lane window `lane=(start, width)` (whole block when
            width is None); rays=(o, d, m, prev) defaults to the full
            block vectors. Returns per-ray (d_t, i_t, normal3, color3,
            emis3, rtype, order), each [1, width]. const_mat: the
            slice's triangles share color/emis/rtype (static fact from
            kernel_scene_buffers meta) — read them once from the first
            row instead of 8 one-hot reductions. lite: return only
            (d_t, winner ROW index [1,width]) — the caller defers all
            feature reads to one fetch after merging tiles (see
            fetch_tri_features)."""
            ls, lw = lane
            lw = B if lw is None else lw
            ob, db, mb, prevb = rays if rays is not None else (o, d, m, prev)

            def col(tab, k):
                return tab[k, lo : lo + size][:, None]

            def dotT(tab, vec):  # [3,size] x 3x[1,lw] -> [size,lw]
                return (
                    col(tab, 0) * vec[0]
                    + col(tab, 1) * vec[1]
                    + col(tab, 2) * vec[2]
                )

            # row iota drives the first-wins tie-break/one-hot; the
            # PACKED id column drives prev-exclusion and the winner id
            # (prev is meaningful across kernels — see kernel_scene_buffers)
            idx = (
                jax.lax.broadcasted_iota(jnp.int32, (size, lw), 0)
                .astype(jnp.float32)
                + float(lo)
            )
            pid = tri_pid[0, lo : lo + size][:, None]
            det = -dotT(tri_n, db)
            udet = dotT(tri_e2, mb) - dotT(tri_e2xa, db)
            vdet = -dotT(tri_e1, mb) - dotT(tri_axe1, db)
            tdet = dotT(tri_n, ob) - tri_na[0, lo : lo + size][:, None]

            dvalid = jnp.abs(det) >= EPS_TRI_DET
            inv = 1.0 / jnp.where(dvalid, det, 1.0)
            u_ = udet * inv
            v_ = vdet * inv
            t_ = tdet * inv
            # quads accept u,v ∈ [0,1]²; triangles u+v ≤ 1. Select on
            # the f32 operand, not the booleans — i1-vector selects hit
            # an unsupported trunci in Mosaic lowering.
            isq = tri_quad[0, lo : lo + size][:, None] > 0.5
            uv_hi = jnp.where(isq, v_, u_ + v_)
            valid = (
                dvalid
                & (u_ >= 0.0) & (u_ <= 1.0)
                & (v_ >= 0.0) & (uv_hi <= 1.0)
                & (t_ > EPS_TRI_T)
                & (pid != prevb)
            )
            if pretest:
                valid &= tri_ok[lo : lo + size, ls : ls + lw] > 0.0
            t_tri = jnp.where(valid, t_, BIG)
            if lite:
                if ABLATE == "nomin":  # timing ablation: plain min
                    d_t = jnp.min(t_tri, axis=0, keepdims=True)
                    return d_t, d_t
                d_t, _, imin = _first_min_sublane(t_tri, idx)
                return d_t, imin
            d_t, oh_t, _ = _first_min_sublane(t_tri, idx)

            def read_t(tab, k):
                return jnp.sum(col(tab, k) * oh_t, axis=0, keepdims=True)

            if const_mat:
                def bconst(tab, k):
                    # (1,1) row read broadcast across the lane window
                    return tab[k, lo:lo + 1][None, :] + jnp.zeros((1, lw))

                color_t = [bconst(tri_color, k) for k in range(3)]
                emis_t = [bconst(tri_emis, k) for k in range(3)]
                rtype_t = bconst(tri_rtype, 0)
            else:
                color_t = [read_t(tri_color, k) for k in range(3)]
                emis_t = [read_t(tri_emis, k) for k in range(3)]
                rtype_t = read_t(tri_rtype, 0)

            return (
                d_t,
                read_t(tri_pid, 0),
                [read_t(tri_normal, k) for k in range(3)],
                color_t,
                emis_t,
                rtype_t,
                read_t(tri_order, 0),
            )

        def merge_closer(cur, res):
            """strictly-closer merge of two tri_block results."""
            better = res[0] < cur[0]  # Morton-order first-wins on ties

            def w(a, b):
                return jnp.where(better, a, b)

            return (
                w(res[0], cur[0]), w(res[1], cur[1]),
                [w(res[2][k], cur[2][k]) for k in range(3)],
                [w(res[3][k], cur[3][k]) for k in range(3)],
                [w(res[4][k], cur[4][k]) for k in range(3)],
                w(res[5], cur[5]), w(res[6], cur[6]),
            )

        d_s, oh_s, _ = _first_min_sublane(t_sph, sph_idx)

        def read_s(tab, k):  # [1,B]
            return jnp.sum(tcol(tab, k) * oh_s, axis=0, keepdims=True)

        def _merge_sph_tri(d_t, i_t, trin, tric, trie, trirt, triord):
            order_s = read_s(sph_order, 0)
            sph_wins = (d_s < d_t) | ((d_s == d_t) & (order_s < triord))
            t = jnp.where(sph_wins, d_s, d_t)
            found = (t < BIG) & alive

            point = [o[k] + d[k] * t for k in range(3)]
            sn = [point[k] - read_s(sph_center, k) for k in range(3)]
            sl = jax.lax.rsqrt(
                jnp.maximum(sn[0] ** 2 + sn[1] ** 2 + sn[2] ** 2, 1e-30)
            )
            nrm = [
                jnp.where(sph_wins, sn[k] * sl, trin[k]) for k in range(3)
            ]
            color = [
                jnp.where(sph_wins, read_s(sph_color, k), tric[k])
                for k in range(3)
            ]
            emis = [
                jnp.where(sph_wins, read_s(sph_emis, k), trie[k])
                for k in range(3)
            ]
            rtype = jnp.where(sph_wins, read_s(sph_rtype, 0), trirt)
            new_prev = jnp.where(found & ~sph_wins, i_t, -1.0)
            return found, point, nrm, color, emis, rtype, new_prev

        if not n_tiles:
            d_t, i_t, trin, tric, trie, trirt, triord = tri_block(0, T)
        else:
            # block-coherent tile culling: slab-test each Morton tile's
            # AABB against the whole ray block and skip its triangles
            # when no live lane can hit it CLOSER than its current best
            # hit (block divergence is a scalar branch — cheap on TPU).
            # Entry/exit are ray-only, so they hoist out of the loop;
            # the best-t comparison happens per tile as d_t shrinks.
            # Oversized triangles (walls) live in an always-tested base
            # set at the front of the tables — their hits immediately
            # tighten the bound for every tile that follows.
            lo_t = [tcol(tile_lo, k) for k in range(3)]
            hi_t = [tcol(tile_hi, k) for k in range(3)]
            inv = [
                1.0 / jnp.where(jnp.abs(d[k]) < 1e-30, 1e-30, d[k])
                for k in range(3)
            ]
            t_en = jnp.zeros((1, B))
            t_ex = jnp.full((1, B), BIG)
            for k in range(3):
                ta = (lo_t[k] - o[k]) * inv[k]  # [C,B]
                tb = (hi_t[k] - o[k]) * inv[k]
                t_en = jnp.maximum(t_en, jnp.minimum(ta, tb))
                t_ex = jnp.minimum(t_ex, jnp.maximum(ta, tb))
            tl_poss = (t_ex >= t_en) & (t_ex >= 0.0) & alive  # [C,B]

            CW = CULL_CHUNK if 0 < CULL_CHUNK < B else B
            if CW == B:
                # DEFERRED-FETCH sweep (production): tiles carry only
                # (closest t, winner row); the 12 per-winner feature
                # rows are fetched ONCE after the merge as 3 exact
                # bf16-split one-hot matmuls per slice (MXU) — the
                # per-tile one-hot reductions were ~20% of the whole
                # resolve's VPU time. Bitwise-identical: the bf16
                # split f = hi+mid+lo is exact (8+8+8 = 24 mantissa
                # bits) and the one-hot leaves one product per lane.
                st = tri_block(0, tile_base, lite=True)
                for c in range(n_tiles):
                    t_lo = tile_base + c * TRI_TILE
                    if FORCE_TILES:
                        res = tri_block(t_lo, TRI_TILE, lite=True)
                    else:
                        bound = jnp.minimum(st[0], d_s)
                        cand = tl_poss[c][None, :] & (
                            t_en[c][None, :] < bound
                        )
                        any_hit = jnp.sum(cand.astype(jnp.float32)) > 0.0
                        res = jax.lax.cond(
                            any_hit,
                            lambda lo2=t_lo: tri_block(
                                lo2, TRI_TILE, lite=True),
                            lambda: (jnp.full((1, B), BIG),
                                     jnp.full((1, B), BIG)),
                        )
                        if ABLATE == "lanemask":
                            # timing ablation: apply the per-lane slab
                            # candidacy to the tile result. Semantically
                            # a no-op (a lane whose segment misses the
                            # tile AABB cannot hit its triangles) — it
                            # exists to measure the COST of per-lane
                            # masking, since lockstep VPU lanes cannot
                            # early-out: the tile's (tri x lane) work
                            # executes regardless, so any nonzero cost
                            # here closes the per-lane-culling lever.
                            res = (jnp.where(cand, res[0], BIG), res[1])
                    better = res[0] < st[0]
                    st = (jnp.where(better, res[0], st[0]),
                          jnp.where(better, res[1], st[1]))
                d_t, win_row = st

                def dot3(feats, ohc):
                    # exact f32 one-hot gather on the MXU: split the
                    # feature rows into 3 bf16 parts (hi/mid/lo — an
                    # exact decomposition) and accumulate in f32
                    hi = feats.astype(jnp.bfloat16)
                    r1 = feats - hi.astype(jnp.float32)
                    mid = r1.astype(jnp.bfloat16)
                    lo3 = (r1 - mid.astype(jnp.float32)).astype(
                        jnp.bfloat16)
                    ob = ohc.astype(jnp.bfloat16)
                    dn = (((1,), (0,)), ((), ()))
                    out = jax.lax.dot_general(
                        hi, ob, dn, preferred_element_type=jnp.float32)
                    out = out + jax.lax.dot_general(
                        mid, ob, dn, preferred_element_type=jnp.float32)
                    return out + jax.lax.dot_general(
                        lo3, ob, dn, preferred_element_type=jnp.float32)

                feat12 = jnp.zeros((12, B), jnp.float32)
                # tile_base >= 8 always (kernel_scene_buffers pads the
                # base set to at least one sublane row)
                slices = [(0, tile_base)] + [
                    (tile_base + c * TRI_TILE, TRI_TILE)
                    for c in range(n_tiles)
                ]
                if ABLATE == "nofetch":  # timing ablation: skip fetch
                    slices = []
                for lo2, size in slices:
                    rows = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (size, B), 0
                        ).astype(jnp.float32) + float(lo2)
                    )
                    ohc = (rows == win_row).astype(jnp.float32)
                    feats = jnp.concatenate([
                        tri_normal[:, lo2:lo2 + size],
                        tri_color[:, lo2:lo2 + size],
                        tri_emis[:, lo2:lo2 + size],
                        tri_rtype[:, lo2:lo2 + size],
                        tri_pid[:, lo2:lo2 + size],
                        tri_order[:, lo2:lo2 + size],
                    ], axis=0)
                    feat12 = feat12 + dot3(feats, ohc)
                trin = [feat12[k][None, :] for k in range(3)]
                tric = [feat12[3 + k][None, :] for k in range(3)]
                trie = [feat12[6 + k][None, :] for k in range(3)]
                trirt = feat12[9][None, :]
                i_t = feat12[10][None, :]
                triord = feat12[11][None, :]
                return _merge_sph_tri(
                    d_t, i_t, trin, tric, trie, trirt, triord)

            base_res = tri_block(0, tile_base)
            chunk_states = []
            for j in range(B // CW):
                ls = j * CW

                # NB: pick a name that nothing below reuses — the last
                # iteration's closure outlives this loop in function scope
                def lslice(x, ls=ls):
                    return x[:, ls : ls + CW]

                st = (
                    lslice(base_res[0]), lslice(base_res[1]),
                    [lslice(v) for v in base_res[2]],
                    [lslice(v) for v in base_res[3]],
                    [lslice(v) for v in base_res[4]],
                    lslice(base_res[5]), lslice(base_res[6]),
                ) if CW < B else base_res
                rays_j = (
                    [lslice(x) for x in o], [lslice(x) for x in d],
                    [lslice(x) for x in m], lslice(prev),
                ) if CW < B else None
                d_s_j = lslice(d_s) if CW < B else d_s

                lw = CW if CW < B else B
                miss1 = jnp.full((1, lw), BIG)
                zero3 = [jnp.zeros((1, lw)) for _ in range(3)]
                skip_val = (
                    miss1, jnp.full((1, lw), -1.0),
                    zero3, list(zero3), list(zero3),
                    jnp.zeros((1, lw)), jnp.full((1, lw), 1.0e9),
                )
                for c in range(n_tiles):
                    cmat = bool(const_mat_tiles[c]) if const_mat_tiles \
                        else False
                    if FORCE_TILES:
                        res = tri_block(
                            tile_base + c * TRI_TILE, TRI_TILE,
                            rays=rays_j,
                            lane=(ls, CW if CW < B else None),
                            const_mat=cmat,
                        )
                        st = merge_closer(st, res)
                        continue
                    bound = jnp.minimum(st[0], d_s_j)  # closest hit so far
                    cand = tl_poss[c, ls : ls + CW][None, :] & (
                        t_en[c, ls : ls + CW][None, :] < bound
                    )
                    any_hit = jnp.sum(cand.astype(jnp.float32)) > 0.0
                    # merge OUTSIDE the cond (a cond returning the whole
                    # merged state measured ~5% slower than one returning
                    # just the tile result)
                    res = jax.lax.cond(
                        any_hit,
                        lambda lo=tile_base + c * TRI_TILE, rj=rays_j,
                               ls=ls, cm=cmat: tri_block(
                            lo, TRI_TILE, rays=rj,
                            lane=(ls, CW if CW < B else None),
                            const_mat=cm,
                        ),
                        lambda: skip_val,
                    )
                    st = merge_closer(st, res)
                chunk_states.append(st)

            if CW < B:
                def cat(parts):
                    return jnp.concatenate(parts, axis=1)

                d_t = cat([c_[0] for c_ in chunk_states])
                i_t = cat([c_[1] for c_ in chunk_states])
                trin = [cat([c_[2][k] for c_ in chunk_states]) for k in range(3)]
                tric = [cat([c_[3][k] for c_ in chunk_states]) for k in range(3)]
                trie = [cat([c_[4][k] for c_ in chunk_states]) for k in range(3)]
                trirt = cat([c_[5] for c_ in chunk_states])
                triord = cat([c_[6] for c_ in chunk_states])
            else:
                (d_t, i_t, trin, tric, trie, trirt, triord) = chunk_states[0]

        return _merge_sph_tri(d_t, i_t, trin, tric, trie, trirt, triord)

    return isect


def _make_kernel(
    B, n_steps, max_depth, rr_start_depth, fixed_uniforms, pretest,
    n_tiles=0, tile_base=0, regen=None, per_lane_depth=False,
    const_mat_tiles=None,
):
    """Kernel running n_steps bounces starting at depth depth0 (SMEM input).

    Full state rides HBM↔VMEM so calls chain: n_steps == max_depth is the
    single-pass megakernel (state never leaves the chip); smaller n_steps
    trades a little HBM traffic (~112 B/ray per boundary) for much smaller
    Mosaic compile units and a hook for future inter-bounce compaction.

    regen=(cam_consts, quota_cap): regenerative variant — lanes own pixels,
    generate their rays in-kernel from the static camera constants, and
    restart the next sample the moment a path dies (see trace_v2 for the
    design; this is its prim-major twin for triangle-heavy scenes).
    Signature then becomes kernel(seed, pix, *tables, rad_out, count_out)
    with n_steps = quota_cap * max_depth, the RUNTIME quota in
    seed_ref[0, 2], and an all-done early exit.

    per_lane_depth (stepped variant only): bounce depth rides a [1,B] state
    row instead of the uniform SMEM depth0 — for batches mixing paths of
    different depths (the portal scheduler's mesh-segment resolver).
    """

    def kernel(seed_ref, *args):
        if regen is None:
            if per_lane_depth:
                (o_ref, d_ref, thr_ref, acc_ref, alive_ref, prev_ref,
                 depth_ref, *rest) = args
            else:
                o_ref, d_ref, thr_ref, acc_ref, alive_ref, prev_ref, *rest = args
        else:
            pix_ref, *rest = args
        if fixed_uniforms:
            u_ref = rest[0]  # [n_steps*4, B] precomputed uniforms
            rest = rest[1:]
        n_tab = 6 + (3 if pretest else 0) + (2 if n_tiles else 0) + 13
        tables, outs = rest[:n_tab], list(rest[n_tab:])
        depth0 = seed_ref[0, 1] if regen is None else jnp.int32(0)
        if not fixed_uniforms:
            # Knuth multiplicative hash (golden-ratio constant as signed i32)
            pltpu.prng_seed(
                seed_ref[0, 0]
                + pl.program_id(0) * jnp.int32(-1640531535)
                + depth0 * jnp.int32(9741)
            )
        isect = make_isect(tables, B, pretest, n_tiles, tile_base,
                           const_mat_tiles)

        if regen is not None:
            cam_consts, quota_cap = regen
            rad_out, count_ref = outs
            pix = args[0][0, :][None, :]  # [1,B] f32 pixel indices

            def draw(n):
                u = _uniform((max(n, 1), B))
                return [u[k, :][None, :] for k in range(n)]

            acc, counts = regen_loop(
                seed_ref[0, 1].astype(jnp.float32), pix, isect, draw,
                cam_consts, seed_ref[0, 2].astype(jnp.float32), max_depth,
                rr_start_depth, quota_cap=quota_cap,
            )
            for k in range(3):
                rad_out[k, :] = acc[k][0, :]
            count_ref[0, :] = counts[0, :]
            return

        if per_lane_depth:
            (o_out, d_out, thr_out, acc_out, alive_out, prev_out, depth_out,
             count_ref) = outs
        else:
            o_out, d_out, thr_out, acc_out, alive_out, prev_out, count_ref = outs

        # per-ray state: lists of [1,B]
        o = [o_ref[k, :][None, :] for k in range(3)]
        d = [d_ref[k, :][None, :] for k in range(3)]
        thr = [thr_ref[k, :][None, :] for k in range(3)]
        acc = [acc_ref[k, :][None, :] for k in range(3)]
        alive_f = alive_ref[0, :][None, :]
        prev = prev_ref[0, :][None, :]
        depth_row = (
            depth_ref[0, :][None, :] if per_lane_depth else jnp.zeros((1, B))
        )
        counts = jnp.zeros((1, B), jnp.float32)

        def body(s, carry):
            o, d, thr, acc, alive_f, prev, depth_row, counts = carry
            alive = alive_f > 0.0
            counts = counts + alive_f

            found, point, nrm, color, emis, rtype, new_prev = isect(
                o, d, prev, alive
            )

            if fixed_uniforms:
                u = u_ref[pl.ds(s * 4, 4), :]
                u4 = [u[k, :][None, :] for k in range(4)]
            else:
                u = _uniform((4, B))
                u4 = [u[k, :][None, :] for k in range(4)]

            if per_lane_depth:
                new_depth = depth_row + 1.0  # [1,B] f32 (exact < 2^24)
            else:
                new_depth = depth0 + s + 1
            acc, thr_new, d_new, alive_new = shade_phase(
                d, nrm, color, emis, rtype, found, thr, acc, u4,
                new_depth, max_depth, rr_start_depth,
            )
            am = alive_new.astype(jnp.float32)
            o = [jnp.where(alive_new, point[k], o[k]) for k in range(3)]
            d = [jnp.where(alive_new, d_new[k], d[k]) for k in range(3)]
            thr = [thr_new[k] * am for k in range(3)]
            depth_row = depth_row + alive_f  # advanced one bounce if it ran
            return (o, d, thr, acc, am, new_prev, depth_row, counts)

        def run_steps(carry):
            if n_steps <= 4:
                # python-unroll: avoids scf.for entirely (Mosaic legalization)
                for s in range(n_steps):
                    carry = body(jnp.int32(s), carry)
            else:
                carry = jax.lax.fori_loop(0, n_steps, body, carry)
            return carry

        # all-dead block skip: when rays are sorted dead-last between calls
        # (trace_pallas_sorted), whole trailing blocks go dead — one scalar
        # branch skips their entire bounce loop (the poor lane's compaction:
        # no gather/scatter, just the sort the caller already did).
        # INVARIANT: a skipped block's prev/thr are whatever they were at
        # death (prev keeps the last triangle id; an executed step would
        # have reset prev to -1 and rewritten thr). Dead lanes never
        # resurrect in the stepped kernel, so this is inert — but any
        # future regen/stepped hybrid or compaction pass must not read
        # prev/thr of lanes that died in a skipped block.
        live = alive_f
        while live.shape[-1] > 128:  # Mosaic: reduce at most (8,128) at once
            h = live.shape[-1] // 2
            live = live[..., :h] + live[..., h:]
        any_alive = jnp.sum(live) > 0.0
        carry = jax.lax.cond(
            any_alive, run_steps, lambda c: c,
            (o, d, thr, acc, alive_f, prev, depth_row, counts),
        )
        o, d, thr, acc, alive_f, prev, depth_row, counts = carry
        for k in range(3):
            o_out[k, :] = o[k][0, :]
            d_out[k, :] = d[k][0, :]
            thr_out[k, :] = thr[k][0, :]
            acc_out[k, :] = acc[k][0, :]
        alive_out[0, :] = alive_f[0, :]
        prev_out[0, :] = prev[0, :]
        if per_lane_depth:
            depth_out[0, :] = depth_row[0, :]
        count_ref[0, :] = counts[0, :]

    return kernel


def _scalar_any_left(done, quota):
    """Count-of-unfinished as a scalar, folding the lane axis down to 128
    first: full-array reductions over (8,256)+ lanes hit a Mosaic relayout
    bug ("Non-singleton logical dimension is replicated"); (8,128) works."""
    left = jnp.where(done >= quota, 0.0, 1.0)
    while left.shape[-1] > 128:
        h = left.shape[-1] // 2
        left = left[..., :h] + left[..., h:]
    return jnp.sum(left)


def make_raygen(cam_consts, pix):
    """In-kernel camera sampling for regenerative kernels: pixel index →
    tent-filtered subpixel ray (reference semantics, mod.rs:826-846 — see
    render.raygen for the host-side equivalent).

    pix: lane-shaped f32 pixel indices. Returns (raygen, lens_center3) where
    raygen(s_idx, u1, u2) → direction3 for global sample index s_idx (the
    2x2 subpixel grid cycles s_idx mod 4). Shared by regen_loop and the
    portal cheap kernel — ONE definition so the sampling semantics cannot
    drift between them."""
    (sox, soy, soz), su, sv, (lcx, lcy, lcz), W, H = cam_consts
    inv_w = float(np.float32(1.0 / W))
    inv_h = float(np.float32(1.0 / H))
    # pixel -> (x, y) with y flip + exact integer fix-up (see trace_v2)
    rowf = jnp.floor(pix * inv_w)
    x = pix - rowf * W
    rowf = rowf + jnp.where(x >= W, 1.0, 0.0) - jnp.where(x < 0.0, 1.0, 0.0)
    x = pix - rowf * W
    y = (H - 1) - rowf

    def raygen(s_idx, u1, u2):
        half = jnp.floor(s_idx * 0.5)
        ysub = half - jnp.floor(half * 0.5) * 2.0
        xsub = s_idx - half * 2.0
        r1 = 2.0 * u1
        r2 = 2.0 * u2
        xf = jnp.where(
            r1 < 1.0, jnp.sqrt(r1) - 1.0,
            1.0 - jnp.sqrt(jnp.maximum(2.0 - r1, 0.0)),
        )
        yf = jnp.where(
            r2 < 1.0, jnp.sqrt(r2) - 1.0,
            1.0 - jnp.sqrt(jnp.maximum(2.0 - r2, 0.0)),
        )
        sx = (x + 0.5 * (0.5 + xsub + xf)) * inv_w - 0.5
        sy = (y + 0.5 * (0.5 + ysub + yf)) * inv_h - 0.5
        spx = sox + su[0] * sx + sv[0] * sy
        spy = soy + su[1] * sx + sv[1] * sy
        spz = soz + su[2] * sx + sv[2] * sy
        dx, dy, dz = lcx - spx, lcy - spy, lcz - spz
        dl = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        return [dx * dl, dy * dl, dz * dl]

    return raygen, (lcx, lcy, lcz)


def regen_loop(sample_base, pix, isect, draw, cam_consts, quota, max_depth,
               rr_start_depth, loop="fori", sync_every=None, quota_cap=None):
    """Shape-agnostic regenerative main loop, shared by the static-scene
    (trace_v2, (8,L) lanes) and prim-major ((1,B) lanes) kernels: each lane
    owns one pixel, traces `quota` full samples with in-kernel raygen
    (restarting the moment a path dies), and exits early once every lane in
    the block finished its quota. Per-pixel sample counts are exact — no
    length-biased partial samples are ever counted.

    pix: lane-shaped f32 pixel indices; isect(o, d, prev, alive) → (found,
    point, nrm, color, emis, rtype, new_prev); draw(n) → n lane-shaped
    uniforms (must consume the PRNG — carries initialized from constants
    crash Mosaic layout inference, so the zero seed derives from a draw).
    Returns (acc3, counts).

    quota may be a TRACED scalar (runtime samples-per-lane) when quota_cap
    gives the static loop bound — one compiled kernel then serves every
    spp <= quota_cap (the early-exit cond skips the unused tail). With
    quota_cap=None the loop bound is the (then static) quota itself.
    """
    if quota_cap is None:
        quota_cap = quota
    raygen, (lcx, lcy, lcz) = make_raygen(cam_consts, pix)

    # non-foldable zero (Mosaic: constant carries + PRNG updates crash)
    zero = jnp.minimum(draw(1)[0] * 0.0, 0.0)
    state = {
        "o": [zero + lcx, zero + lcy, zero + lcz],
        "d": [zero, zero, zero + 1.0],
        "thr": [zero, zero, zero],
        "acc": [zero, zero, zero],
        "alive": zero,
        "prev": zero - 1.0,
        "depth": zero,
        "done": zero,
        "counts": zero,
    }

    def active(st):
        st = dict(st)
        u = draw(6)

        need = (st["alive"] <= 0.0) & (st["done"] < quota)
        s_global = sample_base + st["done"]
        d_new = raygen(s_global, u[4], u[5])
        for k, lc in enumerate((lcx, lcy, lcz)):
            st["o"][k] = jnp.where(need, lc, st["o"][k])
            st["d"][k] = jnp.where(need, d_new[k], st["d"][k])
            st["thr"][k] = jnp.where(need, 1.0, st["thr"][k])
        st["prev"] = jnp.where(need, -1.0, st["prev"])
        st["depth"] = jnp.where(need, 0.0, st["depth"])
        st["alive"] = jnp.where(need, 1.0, st["alive"])

        live = st["alive"] > 0.0
        st["counts"] = st["counts"] + st["alive"]

        found, point, nrm, color, emis, rtype, new_prev = isect(
            st["o"], st["d"], st["prev"], live
        )
        new_depth = st["depth"] + 1.0
        acc, thr_new, d2, alive_new = shade_phase(
            st["d"], nrm, color, emis, rtype, found,
            st["thr"], st["acc"], u[:4],
            new_depth, max_depth, rr_start_depth,
        )
        am = alive_new.astype(jnp.float32)
        ended = live & ~alive_new
        st["done"] = st["done"] + ended.astype(jnp.float32)
        st["acc"] = acc
        st["o"] = [jnp.where(alive_new, point[k], st["o"][k]) for k in range(3)]
        st["d"] = [jnp.where(alive_new, d2[k], st["d"][k]) for k in range(3)]
        st["thr"] = [thr_new[k] * am for k in range(3)]
        st["prev"] = jnp.where(alive_new, new_prev, -1.0)
        st["depth"] = new_depth
        st["alive"] = am
        return st

    # `active` is self-gating per lane (need/quota/alive masks), so applying
    # it several times under ONE all-done cond is semantically identical to
    # cond-per-step — it just checks the scalar less often. The scalar
    # reduce+branch costs ~5-10% of a step on small scenes; syncing every
    # SYNC_EVERY steps amortizes it at the price of up to SYNC_EVERY-1
    # wasted (all-done) steps per block at the very end of the quota.
    def act_n(n_inner):
        def run(st):
            for _ in range(n_inner):
                st = active(st)
            return st

        return run

    def steps_n(n_inner):
        body = act_n(n_inner)

        def stepn(_, st):
            all_done = _scalar_any_left(st["done"], quota) == 0.0
            return jax.lax.cond(all_done, lambda s: s, body, st)

        return stepn

    if loop == "while":
        # exit the moment every lane finished its quota. Faster when mean
        # path length << max_depth (open scenes: most samples die in 1-2
        # bounces); ~20% slower than fori+cond on enclosed scenes where the
        # per-iteration scalar sync defeats Mosaic's pipelining. Bound
        # retained for guaranteed termination.
        def not_done(carry):
            i, st = carry
            any_left = _scalar_any_left(st["done"], quota) > 0.0
            # quota may be traced; bound in f32 (values <= cap*depth, exact)
            return (i.astype(jnp.float32) < quota * max_depth) & any_left

        # N bare steps per while iteration: the loop condition just
        # established not-all-done over this exact state, so an inner
        # all-done cond would always take the active branch — run the body
        # directly and let the condition be the single scalar sync.
        # Overshoot past all-done is a no-op (`active` is self-gating);
        # open scenes die in 1-2 bounces so the ≤N-1 overshoot steps at
        # the quota tail are negligible next to the sync savings.
        unroll = max(1, min(WHILE_UNROLL, quota_cap * max_depth))
        stepu = act_n(unroll)

        def wstep(carry):
            i, st = carry
            return (i + unroll, stepu(st))

        _, st = jax.lax.while_loop(not_done, wstep, (jnp.int32(0), state))
    else:
        se = sync_every if sync_every is not None else SYNC_EVERY
        se = max(1, min(se, quota_cap * max_depth))
        n_iters = -(-quota_cap * max_depth // se)
        st = jax.lax.fori_loop(0, n_iters, steps_n(se), state)
    return st["acc"], st["counts"]


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam_consts", "max_depth", "rr_start_depth", "block", "quota_cap"
    ),
)
def trace_pallas_regen_prim(
    pixel_idx,
    kscene: dict,
    cam_consts: tuple,
    seed,
    sample_base,
    *,
    quota,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 1024,
    quota_cap: int = QUOTA_CAP_PRIM,
):
    """Regenerative trace on the prim-major (table-driven) kernel — for
    triangle-heavy scenes. pixel_idx [N] i32 (one lane per pixel, N % block
    == 0); cam_consts from trace_v2.build_camera_consts (static tuple).
    Returns (radiance SUM over quota [N,3], rays f32). quota is RUNTIME
    (any spp <= quota_cap reuses the one compiled kernel; the cap is 64 —
    not 256 like the static-scene kernel — because this kernel's loop body
    is large and triangle-heavy scenes run low per-pass quotas anyway)."""
    n = pixel_idx.shape[0]
    if n % block:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    # a runtime quota beyond the static cap would silently truncate samples
    # (the loop bound is quota_cap * max_depth) — reject concrete overruns
    if isinstance(quota, (int, np.integer)) and quota > quota_cap:
        raise ValueError(f"quota={quota} exceeds static quota_cap={quota_cap}")
    T = kscene["tri_na"].shape[1]
    pretest = "gate" in kscene
    n_tiles = kscene["tile_lo"].shape[1] if "tile_lo" in kscene else 0
    tile_base = T - n_tiles * TRI_TILE if n_tiles else 0
    scene_keys = _scene_keys(kscene)

    kernel = _make_kernel(
        block, quota_cap * max_depth, max_depth, rr_start_depth,
        False, pretest, n_tiles=n_tiles, tile_base=tile_base,
        regen=(cam_consts, quota_cap),
    )

    def rspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    rad, counts = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            rspec(1),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in scene_keys],
        ],
        out_specs=(rspec(3), rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(sample_base, jnp.int32),
                   jnp.asarray(quota, jnp.int32)]).reshape(1, 3),
        pixel_idx.astype(jnp.float32).reshape(1, n),
        *[kscene[k] for k in scene_keys],
    )
    return rad.T, jnp.sum(counts)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start_depth", "block", "const_mat_tiles",
    ),
)
def trace_pallas_resolve(
    o, d, thr, acc, alive, prev, depth,
    kscene: dict,
    seed,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 1024,
    uniforms=None,
    const_mat_tiles: tuple | None = None,
):
    """ONE full-scene bounce for a batch of mid-path rays whose depths
    differ per lane — the portal scheduler's mesh-segment resolver (each
    suspended path gets its blocking segment intersected against the whole
    scene, shaded, and handed back).

    const_mat_tiles: static per-tile material-uniformity flags from
    kernel_scene_buffers(with_meta=True) — uniform tiles skip 8 of their
    12 one-hot attribute reads (TILE_META registry, keyed by portal key).

    o, d, thr, acc: [3, n]; alive, prev, depth: [1, n] (prev in PACKED
    triangle ids; depth = bounces already completed). n % block == 0.
    uniforms (testing only): [4, n] injected uniforms replacing the PRNG.
    Returns the updated 7 state arrays plus per-lane counts [1, n]
    (1.0 where a segment was traced).
    """
    n = o.shape[1]
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    T = kscene["tri_na"].shape[1]
    pretest = "gate" in kscene
    n_tiles = kscene["tile_lo"].shape[1] if "tile_lo" in kscene else 0
    tile_base = T - n_tiles * TRI_TILE if n_tiles else 0
    scene_keys = _scene_keys(kscene)
    fixed = uniforms is not None
    kernel = _make_kernel(
        block, 1, max_depth, rr_start_depth, fixed, pretest,
        n_tiles=n_tiles, tile_base=tile_base, per_lane_depth=True,
        const_mat_tiles=const_mat_tiles,
    )

    def rspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    state_specs = [rspec(3), rspec(3), rspec(3), rspec(3), rspec(1), rspec(1),
                   rspec(1)]
    uni_specs = [rspec(4)] if fixed else []
    uni_args = [uniforms] if fixed else []
    out = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
            *uni_specs,
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in scene_keys],
        ],
        out_specs=(*state_specs, rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # o
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # d
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # thr
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # acc
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # alive
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # prev
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # depth
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # counts
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5, 7: 6},
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32), jnp.int32(0)]).reshape(1, 2),
        o, d, thr, acc, alive, prev, depth,
        *uni_args,
        *[kscene[k] for k in scene_keys],
    )
    return out


_SPH_KEYS = "sph_center sph_rad2 sph_color sph_emis sph_rtype sph_order".split()
_BND_KEYS = "bnd_center bnd_rad2 gate".split()
_TILE_KEYS = "tile_lo tile_hi".split()
_TRI_KEYS = (
    "tri_n tri_e1 tri_e2 tri_e2xa tri_axe1 tri_na "
    "tri_normal tri_color tri_emis tri_rtype tri_order tri_quad tri_pid"
).split()


def _scene_keys(kscene: dict) -> list[str]:
    keys = list(_SPH_KEYS)
    if "gate" in kscene:
        keys += _BND_KEYS
    if "tile_lo" in kscene:
        keys += _TILE_KEYS
    return keys + _TRI_KEYS


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "rr_start_depth", "block", "steps_per_call"),
)
def trace_pallas(
    o,
    d,
    kscene: dict,
    seed,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = DEFAULT_BLOCK,
    steps_per_call: int = 12,
    uniforms=None,
):
    """Trace rays with the fused wavefront kernel.

    o, d: [N,3] f32 (N must be a multiple of `block`); kscene from
    kernel_scene_buffers(); seed: int32 scalar (pass/chunk stream id).
    steps_per_call: bounces fused per kernel invocation (max_depth = one
    fully-fused megakernel; smaller values compile faster and round-trip
    state through HBM between calls).
    uniforms (testing only): [max_depth*4, N] precomputed uniforms replacing
    the hardware PRNG (for interpreter-mode and same-uniform validation).
    Returns (radiance [N,3], rays_traced scalar f32).
    """
    n = o.shape[0]
    if n % block:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    T = kscene["tri_na"].shape[1]
    steps = min(steps_per_call, max_depth)
    n_calls = -(-max_depth // steps)

    fixed = uniforms is not None
    if fixed and max_depth % steps:
        # the last call's uniform slice would come up short of the BlockSpec
        raise ValueError(
            f"with injected uniforms, steps_per_call={steps} must divide "
            f"max_depth={max_depth}"
        )
    pretest = "gate" in kscene
    n_tiles = kscene["tile_lo"].shape[1] if "tile_lo" in kscene else 0
    tile_base = T - n_tiles * TRI_TILE if n_tiles else 0
    scene_keys = _scene_keys(kscene)
    kernel = _make_kernel(
        block, steps, max_depth, rr_start_depth, fixed, pretest,
        n_tiles=n_tiles, tile_base=tile_base,
    )
    grid = (n // block,)

    def rspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    state_specs = [rspec(3), rspec(3), rspec(3), rspec(3), rspec(1), rspec(1)]
    uni_specs = [rspec(steps * 4)] if fixed else []
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
            *uni_specs,
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in scene_keys],
        ],
        out_specs=(*state_specs, rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # o
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # d
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # thr
            jax.ShapeDtypeStruct((3, n), jnp.float32),  # acc
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # alive
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # prev
            jax.ShapeDtypeStruct((1, n), jnp.float32),  # counts
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
    )

    state = (
        o.T,
        d.T,
        jnp.ones((3, n), jnp.float32),
        jnp.zeros((3, n), jnp.float32),
        jnp.ones((1, n), jnp.float32),
        jnp.full((1, n), -1.0, jnp.float32),
    )
    tables = [kscene[k] for k in scene_keys]
    seed32 = jnp.asarray(seed, jnp.int32)
    total = jnp.zeros((), jnp.float32)
    for c in range(n_calls):
        depth0 = c * steps
        smem = jnp.stack([seed32, jnp.int32(depth0)]).reshape(1, 2)
        uni = (
            [uniforms[depth0 * 4 : (depth0 + steps) * 4]] if fixed else []
        )
        *state, counts = call(smem, *state, *uni, *tables)
        total = total + jnp.sum(counts)
    acc = state[3]
    return acc.T, total


def _spread6(v):
    """Interleave the low 6 bits of v into every 3rd bit (Morton spread;
    the 10-bit magic numbers — computed in u32, result < 2^27 so the cast
    back to i32 is lossless)."""
    v = v.astype(jnp.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0x30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x9249249)
    return v.astype(jnp.int32)


_DEAD_KEY = np.int32(1 << 30)


def ray_sort_keys(o, d, alive, lo, inv_span, dir_major: bool = False):
    """i32 sort key per ray: 18-bit Morton cell of the origin (64³ grid over
    the scene AABB) + 3-bit direction octant; dead rays sort last (so the
    kernel's all-dead block skip fires on whole trailing blocks).

    o, d: [3,n]; alive: [1,n]; lo, inv_span: [3,1]. dir_major puts the
    octant in the high bits (group by direction first, then locality)."""
    q = jnp.clip((o - lo) * inv_span * 64.0, 0.0, 63.0).astype(jnp.int32)
    morton = (
        (_spread6(q[0]) << 2) | (_spread6(q[1]) << 1) | _spread6(q[2])
    )
    octant = (
        jnp.where(d[0] < 0.0, 4, 0)
        + jnp.where(d[1] < 0.0, 2, 0)
        + jnp.where(d[2] < 0.0, 1, 0)
    )
    key = (
        (octant << 18) | morton if dir_major else (morton << 3) | octant
    )
    return jnp.where(alive[0] > 0.0, key, _DEAD_KEY)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_depth", "rr_start_depth", "block", "sort_every", "dir_major"
    ),
)
def trace_pallas_sorted(
    o,
    d,
    kscene: dict,
    seed,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 1024,
    sort_every: int = 1,
    dir_major: bool = False,
    uniforms=None,
):
    """Stepped wavefront trace with inter-bounce ray sorting — the coherence
    path for triangle-heavy scenes.

    The regenerative kernels mix path depths per lane, so a block almost
    never agrees on which geometry tiles it can hit and the block-level
    Morton-tile culling never fires (P(all 1024 lanes miss) ≈ 0 for
    incoherent rays). Here rays round-trip through HBM every `sort_every`
    bounces anyway (the stepped kernel), so between calls we re-sort the
    whole wavefront by (origin cell, direction octant): blocks become
    spatially coherent, tiles cull, and dead rays cluster into trailing
    blocks that the kernel skips entirely (compaction without gathers).

    Per-ray estimates are a pure permutation of the unsorted kernel's (the
    RNG is positional, so *which* uniforms a ray draws changes — equal in
    distribution, not bitwise; with injected `uniforms` [max_depth*4, N]
    rows ride the permutation and results ARE lane-exact vs trace_pallas).

    Returns (radiance [N,3] in the CALLER's ray order, rays_traced)."""
    n = o.shape[0]
    if n % block:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    T = kscene["tri_na"].shape[1]
    steps = min(sort_every, max_depth)
    n_calls = -(-max_depth // steps)
    fixed = uniforms is not None
    if fixed and max_depth % steps:
        raise ValueError(
            f"with injected uniforms, sort_every={steps} must divide "
            f"max_depth={max_depth}"
        )
    pretest = "gate" in kscene
    n_tiles = kscene["tile_lo"].shape[1] if "tile_lo" in kscene else 0
    tile_base = T - n_tiles * TRI_TILE if n_tiles else 0
    scene_keys = _scene_keys(kscene)
    kernel = _make_kernel(
        block, steps, max_depth, rr_start_depth, fixed, pretest,
        n_tiles=n_tiles, tile_base=tile_base,
    )

    def rspec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    state_specs = [rspec(3), rspec(3), rspec(3), rspec(3), rspec(1), rspec(1)]
    uni_specs = [rspec(steps * 4)] if fixed else []
    call = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
            *uni_specs,
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in scene_keys],
        ],
        out_specs=(*state_specs, rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((3, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
    )

    lo = kscene["aabb_lo"]
    inv_span = kscene["aabb_inv_span"]
    state = (
        o.T,
        d.T,
        jnp.ones((3, n), jnp.float32),
        jnp.zeros((3, n), jnp.float32),
        jnp.ones((1, n), jnp.float32),
        jnp.full((1, n), -1.0, jnp.float32),
    )
    # ray_id rides the sort so radiance lands back in caller order; ids fit
    # f32 exactly below 2^24 lanes (16.7M — far above any dispatch size)
    ray_id = jnp.arange(n, dtype=jnp.int32)
    uni = uniforms
    tables = [kscene[k] for k in scene_keys]
    seed32 = jnp.asarray(seed, jnp.int32)
    total = jnp.zeros((), jnp.float32)
    for c in range(n_calls):
        if c > 0:
            keys = ray_sort_keys(
                state[0], state[1], state[4], lo, inv_span, dir_major
            )
            perm = jnp.argsort(keys)
            # one [n, rows] row-gather moves all state at once (row gathers
            # are the TPU-efficient shape; per-array lane gathers are not)
            mat = jnp.concatenate(state, axis=0)  # [14, n]
            mat = mat.T[perm].T
            state = (
                mat[0:3], mat[3:6], mat[6:9], mat[9:12], mat[12:13], mat[13:14]
            )
            ray_id = ray_id[perm]
            if fixed:
                uni = uni[:, perm]
        depth0 = c * steps
        smem = jnp.stack([seed32, jnp.int32(depth0)]).reshape(1, 2)
        uslice = [uni[depth0 * 4 : (depth0 + steps) * 4]] if fixed else []
        *state, counts = call(smem, *state, *uslice, *tables)
        total = total + jnp.sum(counts)
    acc = state[3]
    rad = jnp.zeros((n, 3), jnp.float32).at[ray_id].set(acc.T)
    return rad, total
