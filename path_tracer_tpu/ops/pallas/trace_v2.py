"""Ray-major Pallas kernel (v2): scene baked as compile-time constants.

The prim-major kernel (trace_kernel) holds per-ray values as [1,B] rows —
on TPU those occupy full (8,128) vregs with one valid sublane, wasting 7/8
of the VPU on the shade/merge phase (measured: ~2/3 of cornell's bounce
time). v2 flips the layout: a block of B rays is a full (8, B/8) matrix, so
every elementwise op runs at 100% vreg utilization.

The scene becomes *static*: primitive positions/materials are python floats
baked into the kernel (scenes are small and static per render; a scene edit
recompiles in seconds). Intersection is a python-unrolled sequential scan
over primitives in packed (reversed-object) order with strictly-closer
replacement — the reference's ``intersect_scene`` loop semantics verbatim
(mod.rs:631-659), so tie-breaking needs no `order` bookkeeping at all.
Constants fold into immediates: no scene tables, no padding, no gathers.

Suitable for scenes up to ~#prims ≤ 128 (all sphere scenes + cornell); the
mesh scene (824 triangles) stays on the prim-major kernel where triangles
ride sublanes. Selection is automatic (render.pipeline.prepare_scene).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from path_tracer_tpu.models.scene import ScenePacked
from path_tracer_tpu.ops.pallas.trace_kernel import (
    QUOTA_CAP_STATIC, _uniform, detect_quad_pairs, shade_phase,
)

BIG = 3.0e38
_EARLY_EXIT = True  # toggled for Mosaic debugging
EPS_SPHERE = 1e-4
EPS_TRI_DET = 1e-4
EPS_TRI_T = 1e-4

V2_MAX_PRIMS = 128
SUB = 8  # sublane rows per ray block

_LOOP_OVERRIDE: str | None = None  # force regen loop style (benchmarking)

# One all-done scalar sync per N bounce steps in the v3 fori loop. On static
# small scenes the per-step reduce+cond costs ~1/3 of the whole step:
# 2924 → 3387/3767/3958/4058/4098 Mray/s at sync 1/2/4/8/16/32 on cornell
# 1024x768 (2026-08-16). 16 is the knee; 32 buys ~1% for 9x the Mosaic
# compile time (the loop body unrolls N-fold — which is also why
# tests/conftest.py lowers this to 2 for the Pallas TPU interpreter, where
# a 16-wide body is pathologically slow to lower).
SYNC_EVERY_V3 = 16

# static scene registry: jit can't trace python constants through arguments,
# so prepared scenes register here under a content key (passed statically).
_SCENES: dict[str, tuple] = {}


def f(x) -> float:
    return float(np.float32(x))


def build_scene_consts(packed: ScenePacked) -> tuple | None:
    """ScenePacked → (prims tuple, needs_pretest meshes) of python floats, or
    None if the scene is too big for static unrolling.

    Each prim: ("s", cx,cy,cz, r2, color3, emis3, rtype)
            or ("t", n3, e1xx? -> (a3, e1_3, e2_3, n3, e2xa3, axe13, na),
                color3, emis3, rtype, packed_tri_index)
    plus optional per-triangle gate mesh id when the bounding sphere does not
    contain the mesh (rare; handled by baked bounding spheres).
    """
    n_prims = packed.num_spheres + packed.num_triangles
    if n_prims > V2_MAX_PRIMS:
        return None

    # uncontained bounding spheres must gate their triangles (reference
    # parity — see trace_kernel.kernel_scene_buffers)
    bnd = []
    mesh_gated = {}
    for m_idx in range(packed.num_meshes):
        sel = np.asarray(packed.tri_mesh[: packed.num_triangles]) == m_idx
        if not sel.any():
            continue
        verts = np.asarray(packed.tri_v[: packed.num_triangles])[sel].reshape(-1, 3)
        c = packed.bnd_center[m_idx]
        r = float(packed.bnd_radius[m_idx])
        dmax = float(np.sqrt(((verts - c) ** 2).sum(axis=1)).max())
        if dmax > r * (1.0 + 1e-5) + 1e-6:
            mesh_gated[m_idx] = len(bnd)
            bnd.append((tuple(map(f, c)), f(r * r)))

    # consecutive parallelogram pairs collapse into quad prims (identical
    # hit semantics, half the Möller–Trumbore work — see detect_quad_pairs)
    quads, covered = detect_quad_pairs(packed)

    # interleave spheres and triangles in global packed order (both arrays
    # are already in reversed-object order; merge by their `order` rank,
    # triangles of one mesh staying consecutive)
    prims = []
    si, ti = 0, 0
    S, T = packed.num_spheres, packed.num_triangles
    while si < S or ti < T:
        s_ord = packed.sph_order[si] if si < S else 2**62
        t_ord = packed.tri_order[ti] if ti < T else 2**62
        if s_ord <= t_ord:
            prims.append((
                "s",
                tuple(map(f, packed.sph_center[si])),
                f(packed.sph_radius[si] ** 2),
                tuple(map(f, packed.sph_color[si])),
                tuple(map(f, packed.sph_emis[si])),
                float(packed.sph_rtype[si]),
            ))
            si += 1
        else:
            if ti in covered and ti not in quads:
                ti += 1  # second half of a quad pair — consumed
                continue
            kind = "q" if ti in quads else "t"
            v = (
                quads[ti] if ti in quads else packed.tri_v[ti]
            ).astype(np.float64)
            a, e1, e2 = v[0], v[1] - v[0], v[2] - v[0]
            n = np.cross(e1, e2)
            nn = np.linalg.norm(n)
            prims.append((
                kind,
                tuple(map(f, a)),
                tuple(map(f, e1)),
                tuple(map(f, e2)),
                tuple(map(f, n)),
                tuple(map(f, (n / nn) if nn > 0 else n)),
                tuple(map(f, packed.tri_color[ti])),
                tuple(map(f, packed.tri_emis[ti])),
                float(packed.tri_rtype[ti]),
                float(ti),
                mesh_gated.get(int(packed.tri_mesh[ti]), -1),
            ))
            ti += 1
    return (tuple(prims), tuple(bnd))


def register_scene(key: str, consts: tuple) -> None:
    _SCENES[key] = consts


def make_prim_scan(prims, bnd):
    """Build the static sequential primitive scan: (o, d, prev) →
    (tmin, color3, emis3, aux3(center|normal), rtype, is_sphere, prev_id).
    Shared by the plain (v2) and regenerative (v3) kernels."""

    def scan(o, d, prev):
        m = [
            o[1] * d[2] - o[2] * d[1],
            o[2] * d[0] - o[0] * d[2],
            o[0] * d[1] - o[1] * d[0],
        ]
        gates = []
        for (cx, cy, cz), r2 in bnd:
            op = [cx - o[0], cy - o[1], cz - o[2]]
            b = op[0] * d[0] + op[1] * d[1] + op[2] * d[2]
            det = b * b - (op[0] ** 2 + op[1] ** 2 + op[2] ** 2) + r2
            sq = jnp.sqrt(jnp.maximum(det, 0.0))
            ok = (det >= 0.0) & ((b - sq >= EPS_SPHERE) | (b + sq >= EPS_SPHERE))
            gates.append(ok)

        tmin = jnp.full_like(o[0], BIG)
        h_color = [jnp.zeros_like(o[0]) for _ in range(3)]
        h_emis = [jnp.zeros_like(o[0]) for _ in range(3)]
        h_aux = [jnp.zeros_like(o[0]) for _ in range(3)]
        h_rtype = jnp.zeros_like(o[0])
        h_sph = jnp.zeros_like(o[0])
        h_prev = jnp.full_like(o[0], -1.0)

        for prim in prims:
            if prim[0] == "s":
                _, (cx, cy, cz), r2, color, emis, rtype = prim
                op = [cx - o[0], cy - o[1], cz - o[2]]
                b = op[0] * d[0] + op[1] * d[1] + op[2] * d[2]
                det = b * b - (op[0] ** 2 + op[1] ** 2 + op[2] ** 2) + r2
                sq = jnp.sqrt(jnp.maximum(det, 0.0))
                t_near = b - sq
                t_far = b + sq
                t_p = jnp.where(
                    t_near >= EPS_SPHERE,
                    t_near,
                    jnp.where(t_far >= EPS_SPHERE, t_far, BIG),
                )
                t_p = jnp.where(det < 0.0, BIG, t_p)
                aux = (cx, cy, cz)
                is_sph, previd = 1.0, -1.0
            else:
                (kind, a, e1, e2, n, nu, color, emis, rtype, previd, gate_id
                 ) = prim
                det = -(d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
                udet = (
                    m[0] * e2[0] + m[1] * e2[1] + m[2] * e2[2]
                ) - (
                    d[0] * (e2[1] * a[2] - e2[2] * a[1])
                    + d[1] * (e2[2] * a[0] - e2[0] * a[2])
                    + d[2] * (e2[0] * a[1] - e2[1] * a[0])
                )
                vdet = -(
                    m[0] * e1[0] + m[1] * e1[1] + m[2] * e1[2]
                ) - (
                    d[0] * (a[1] * e1[2] - a[2] * e1[1])
                    + d[1] * (a[2] * e1[0] - a[0] * e1[2])
                    + d[2] * (a[0] * e1[1] - a[1] * e1[0])
                )
                na = a[0] * n[0] + a[1] * n[1] + a[2] * n[2]
                tdet = (o[0] * n[0] + o[1] * n[1] + o[2] * n[2]) - na
                dvalid = jnp.abs(det) >= EPS_TRI_DET
                inv = 1.0 / jnp.where(dvalid, det, 1.0)
                u_ = udet * inv
                v_ = vdet * inv
                t_p = tdet * inv
                # quads ("q") accept the whole parallelogram u,v ∈ [0,1]²;
                # triangles the half u+v ≤ 1 — same op count either way
                uv_hi = (v_ <= 1.0) if kind == "q" else (u_ + v_ <= 1.0)
                valid = (
                    dvalid
                    & (u_ >= 0.0) & (u_ <= 1.0)
                    & (v_ >= 0.0) & uv_hi
                    & (t_p > EPS_TRI_T)
                    & (prev != previd)
                )
                if gate_id >= 0:
                    valid &= gates[gate_id]
                t_p = jnp.where(valid, t_p, BIG)
                aux = nu
                is_sph = 0.0

            better = t_p < tmin  # strictly closer — first-wins on ties
            tmin = jnp.where(better, t_p, tmin)
            for k in range(3):
                h_color[k] = jnp.where(better, color[k], h_color[k])
                h_emis[k] = jnp.where(better, emis[k], h_emis[k])
                h_aux[k] = jnp.where(better, aux[k], h_aux[k])
            h_rtype = jnp.where(better, rtype, h_rtype)
            h_sph = jnp.where(better, is_sph, h_sph)
            h_prev = jnp.where(better, previd, h_prev)
        return tmin, h_color, h_emis, h_aux, h_rtype, h_sph, h_prev

    return scan


def _make_kernel_v2(consts, L, n_steps, max_depth, rr_start_depth, fixed_uniforms):
    prims, bnd = consts
    prim_scan = make_prim_scan(prims, bnd)

    def kernel(seed_ref, o_ref, d_ref, thr_ref, acc_ref, alive_ref, prev_ref,
               *rest):
        if fixed_uniforms:
            u_ref = rest[0]  # [n_steps*4, SUB, L]
            rest = rest[1:]
        (o_out, d_out, thr_out, acc_out, alive_out, prev_out, count_ref) = rest
        depth0 = seed_ref[0, 1]
        if not fixed_uniforms:
            pltpu.prng_seed(
                seed_ref[0, 0]
                + pl.program_id(0) * jnp.int32(-1640531535)
                + depth0 * jnp.int32(9741)
            )

        o = [o_ref[k] for k in range(3)]  # (SUB, L)
        d = [d_ref[k] for k in range(3)]
        thr = [thr_ref[k] for k in range(3)]
        acc = [acc_ref[k] for k in range(3)]
        alive_f = alive_ref[0]
        prev = prev_ref[0]
        counts = jnp.zeros_like(alive_f)

        def body(s, carry):
            o, d, thr, acc, alive_f, prev, counts = carry
            alive = alive_f > 0.0
            counts = counts + alive_f

            tmin, h_color, h_emis, h_aux, h_rtype, h_sph, h_prev = prim_scan(
                o, d, prev
            )
            found = (tmin < BIG) & alive
            point = [o[k] + d[k] * tmin for k in range(3)]
            sn = [point[k] - h_aux[k] for k in range(3)]
            sl = jax.lax.rsqrt(
                jnp.maximum(sn[0] ** 2 + sn[1] ** 2 + sn[2] ** 2, 1e-30)
            )
            sph_w = h_sph > 0.5
            nrm = [jnp.where(sph_w, sn[k] * sl, h_aux[k]) for k in range(3)]
            new_prev = jnp.where(found, h_prev, -1.0)

            if fixed_uniforms:
                u4 = [u_ref[pl.ds(s * 4 + k, 1), :, :][0] for k in range(4)]
            else:
                u4 = [_uniform((SUB, L)) for _ in range(4)]

            new_depth = depth0 + s + 1
            acc, thr_new, d_new, alive_new = shade_phase(
                d, nrm, h_color, h_emis, h_rtype, found, thr, acc, u4,
                new_depth, max_depth, rr_start_depth,
            )
            am = alive_new.astype(jnp.float32)
            o = [jnp.where(alive_new, point[k], o[k]) for k in range(3)]
            d = [jnp.where(alive_new, d_new[k], d[k]) for k in range(3)]
            thr = [thr_new[k] * am for k in range(3)]
            return (o, d, thr, acc, am, new_prev, counts)

        carry = (o, d, thr, acc, alive_f, prev, counts)
        if n_steps <= 4:
            for s in range(n_steps):
                carry = body(s, carry)
        else:
            carry = jax.lax.fori_loop(0, n_steps, body, carry)
        o, d, thr, acc, alive_f, prev, counts = carry
        for k in range(3):
            o_out[k] = o[k]
            d_out[k] = d[k]
            thr_out[k] = thr[k]
            acc_out[k] = acc[k]
        alive_out[0] = alive_f
        prev_out[0] = prev
        count_ref[0] = counts

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "scene_key", "max_depth", "rr_start_depth", "block", "steps_per_call"
    ),
)
def trace_pallas_v2(
    o,
    d,
    scene_key: str,
    seed,
    *,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 1024,
    steps_per_call: int = 12,
    uniforms=None,
):
    """Ray-major static-scene trace. o, d: [N,3] f32, N % block == 0.

    scene_key: registry key from register_scene(). Returns (radiance [N,3],
    rays_traced f32). Ray i maps to (row, sub, lane) of the (SUB, L) blocks.
    """
    consts = _SCENES[scene_key]
    n = o.shape[0]
    if n % block or block % SUB:
        raise ValueError(f"N={n} must be a multiple of block={block} (and block of {SUB})")
    L = block // SUB
    steps = min(steps_per_call, max_depth)
    n_calls = -(-max_depth // steps)
    fixed = uniforms is not None

    kernel = _make_kernel_v2(consts, L, steps, max_depth, rr_start_depth, fixed)
    grid = (n // block,)
    rows = n // L  # total sublane-rows across all blocks

    def to_blocks(x_t):  # [k,N] -> [k, rows, L]
        return x_t.reshape(x_t.shape[0], rows, L)

    def rspec(k):
        return pl.BlockSpec((k, SUB, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM)

    state_specs = [rspec(3), rspec(3), rspec(3), rspec(3), rspec(1), rspec(1)]
    uni_specs = [rspec(steps * 4)] if fixed else []
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *state_specs,
            *uni_specs,
        ],
        out_specs=(*state_specs, rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((3, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows, L), jnp.float32),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
    )

    state = (
        to_blocks(o.T),
        to_blocks(d.T),
        jnp.ones((3, rows, L), jnp.float32),
        jnp.zeros((3, rows, L), jnp.float32),
        jnp.ones((1, rows, L), jnp.float32),
        jnp.full((1, rows, L), -1.0, jnp.float32),
    )
    seed32 = jnp.asarray(seed, jnp.int32)
    total = jnp.zeros((), jnp.float32)
    for c in range(n_calls):
        depth0 = c * steps
        smem = jnp.stack([seed32, jnp.int32(depth0)]).reshape(1, 2)
        uni = (
            [to_blocks(uniforms[depth0 * 4 : (depth0 + steps) * 4])]
            if fixed
            else []
        )
        *state, counts = call(smem, *state, *uni)
        total = total + jnp.sum(counts)
    acc = state[3]  # [3, rows, L]
    return acc.reshape(3, n).T, total


# ---------------------------------------------------------------------------
# v3: regenerative megakernel — lanes own pixels and restart samples in-kernel
# ---------------------------------------------------------------------------


def build_camera_consts(camera, width: int, height: int) -> tuple:
    """Static raygen constants for in-kernel camera sampling."""
    from path_tracer_tpu.render.raygen import camera_arrays

    cam = camera_arrays(camera)
    return (
        tuple(map(f, cam["sensor_origin"])),
        tuple(map(f, cam["su"])),
        tuple(map(f, cam["sv"])),
        tuple(map(f, cam["lens_center"])),
        int(width),
        int(height),
    )


def _host_scene_hit(prims, o, d):
    """Vectorized numpy closest-hit of probe rays against the static prim
    tuple (the same geometry make_prim_scan bakes into the kernel) —
    openness probing only, so bounding-sphere gates and prev-exclusion
    are skipped and the self-hit epsilon is coarse. Returns
    (t [n] with inf = miss, unit normal [n,3], color [n,3])."""
    n = o.shape[0]
    best_t = np.full(n, np.inf)
    best_n = np.zeros((n, 3))
    best_c = np.zeros((n, 3))
    eps = 1e-3
    for p in prims:
        if p[0] == "s":
            _, c, r2, color, _, _ = p
            oc = np.asarray(c)[None] - o
            b = np.sum(oc * d, axis=1)
            det = b * b - np.sum(oc * oc, axis=1) + r2
            sq = np.sqrt(np.maximum(det, 0.0))
            t = np.where(b - sq >= eps, b - sq,
                         np.where(b + sq >= eps, b + sq, np.inf))
            t = np.where(det >= 0.0, t, np.inf)
            better = t < best_t
            if better.any():
                pt = o + np.where(better, t, 0.0)[:, None] * d
                nn = pt - np.asarray(c)[None]
                nn /= np.maximum(
                    np.linalg.norm(nn, axis=1, keepdims=True), 1e-30)
                best_n = np.where(better[:, None], nn, best_n)
                best_c = np.where(better[:, None],
                                  np.asarray(color)[None], best_c)
                best_t = np.where(better, t, best_t)
        else:
            kind, a, e1, e2, _, nu, color = p[0], *map(np.asarray, p[1:7])
            pv = np.cross(d, e2[None])
            det = pv @ e1
            ok = np.abs(det) >= EPS_TRI_DET
            inv = 1.0 / np.where(ok, det, 1.0)
            tv = o - a[None]
            u = np.sum(tv * pv, axis=1) * inv
            qv = np.cross(tv, e1[None])
            v = np.sum(qv * d, axis=1) * inv
            t = (qv @ e2) * inv
            hi = (v <= 1.0) if kind == "q" else (u + v <= 1.0)
            t = np.where(ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & hi
                         & (t > eps), t, np.inf)
            better = t < best_t
            best_t = np.where(better, t, best_t)
            best_n = np.where(better[:, None], nu[None], best_n)
            best_c = np.where(better[:, None], color[None], best_c)
    return best_t, best_n, best_c


@functools.lru_cache(maxsize=64)
def probe_loop_style(prims, cam_consts, max_depth: int,
                     rr_start_depth: int) -> str:
    """Pick the regen loop style from the scene's EXPECTED PATH LENGTH,
    not its prim count: a true early-exit while loop wins when most
    samples die within a bounce or two (open scenes — rays escape to the
    sky); enclosed scenes (walls on every side → paths run to RR/depth)
    pipeline better as fori+cond. A prim-count proxy mispicks enclosed
    few-prim scenes (a 6-wall box) and open many-prim ones.

    Host Monte-Carlo probe at kernel-build time (~1 ms, lru-cached on
    the baked consts): trace diffuse-bounce paths from the real camera
    through the real prim geometry with the renderer's RR schedule
    (survival = max color component from rr_start_depth, parity with
    shade_phase) and measure mean traced segments per path. Deliberately
    approximate — mirrors/refraction treated as diffuse, bounding gates
    skipped — the probe only picks a loop style, and both styles are
    exact; the fixed seed keeps the pick (a static compile flag) stable
    across processes."""
    rng_ = np.random.default_rng(0)
    n = 512
    so, su, sv, lens = (np.asarray(cam_consts[k], np.float64)
                        for k in range(4))
    sx = rng_.uniform(-0.5, 0.5, n)
    sy = rng_.uniform(-0.5, 0.5, n)
    sensor = so[None] + su[None] * sx[:, None] + sv[None] * sy[:, None]
    d = lens[None] - sensor
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = np.broadcast_to(lens, d.shape).astype(np.float64).copy()
    alive = np.ones(n, bool)
    segments = 0.0
    for depth in range(max_depth):
        segments += alive.sum()
        t, nrm, col = _host_scene_hit(prims, o, d)
        hit = np.isfinite(t) & alive
        if depth + 1 >= rr_start_depth:
            hit &= rng_.uniform(size=n) < col.max(axis=1)
        alive = hit
        if not alive.any():
            break
        # dead lanes carry inf t; pin them so the (ignored) bounce math
        # below stays finite instead of spraying numpy warnings
        t = np.where(alive, t, 0.0)
        nrm = np.where(alive[:, None], nrm, np.array([0.0, 0.0, 1.0])[None])
        o = o + t[:, None] * d
        nrm = np.where((np.sum(nrm * d, axis=1) < 0.0)[:, None], nrm, -nrm)
        # cosine-hemisphere bounce about the oriented normal
        u1 = rng_.uniform(size=n)
        u2 = rng_.uniform(size=n)
        r = np.sqrt(u1)
        phi = 2.0 * np.pi * u2
        w = nrm
        a_ = np.where((np.abs(w[:, 0]) > 0.1)[:, None],
                      np.array([0.0, 1.0, 0.0])[None],
                      np.array([1.0, 0.0, 0.0])[None])
        uvec = np.cross(a_, w)
        uvec /= np.maximum(np.linalg.norm(uvec, axis=1, keepdims=True),
                           1e-30)
        vvec = np.cross(w, uvec)
        d = (uvec * (r * np.cos(phi))[:, None]
             + vvec * (r * np.sin(phi))[:, None]
             + w * np.sqrt(np.maximum(1.0 - u1, 0.0))[:, None])
        d /= np.linalg.norm(d, axis=1, keepdims=True)
    mean_len = segments / n
    return "while" if mean_len <= 0.35 * max_depth else "fori"


def _make_kernel_v3(consts, cam_consts, L, quota_cap, max_depth, rr_start_depth):
    """Regenerative static-scene kernel on (SUB, L) lanes: a thin wrapper
    around the shared trace_kernel.regen_loop with this module's static
    primitive scan as the isect callback (see regen_loop for semantics)."""
    from path_tracer_tpu.ops.pallas.trace_kernel import regen_loop

    prims, bnd = consts
    prim_scan = make_prim_scan(prims, bnd)
    # loop style from measured expected path length (see probe_loop_style);
    # _LOOP_OVERRIDE is a tuning knob for benchmarking the choice.
    loop = _LOOP_OVERRIDE or probe_loop_style(
        prims, cam_consts, max_depth, rr_start_depth)

    def kernel(seed_ref, pix_ref, rad_ref, count_ref):
        pltpu.prng_seed(
            seed_ref[0, 0] + pl.program_id(0) * jnp.int32(-1640531535)
        )

        def isect(o, d, prev, alive):
            tmin, h_color, h_emis, h_aux, h_rtype, h_sph, h_prev = prim_scan(
                o, d, prev
            )
            found = (tmin < BIG) & alive
            point = [o[k] + d[k] * tmin for k in range(3)]
            sn = [point[k] - h_aux[k] for k in range(3)]
            sl = jax.lax.rsqrt(
                jnp.maximum(sn[0] ** 2 + sn[1] ** 2 + sn[2] ** 2, 1e-30)
            )
            sph_w = h_sph > 0.5
            nrm = [jnp.where(sph_w, sn[k] * sl, h_aux[k]) for k in range(3)]
            new_prev = jnp.where(found, h_prev, -1.0)
            return found, point, nrm, h_color, h_emis, h_rtype, new_prev

        def draw(n):
            u = _uniform((max(n, 1) * SUB, L))
            return [u[k * SUB : (k + 1) * SUB] for k in range(n)]

        acc, counts = regen_loop(
            seed_ref[0, 1].astype(jnp.float32), pix_ref[0], isect, draw,
            cam_consts, seed_ref[0, 2].astype(jnp.float32), max_depth,
            rr_start_depth, loop=loop, sync_every=SYNC_EVERY_V3,
            quota_cap=quota_cap,
        )
        for k in range(3):
            rad_ref[k] = acc[k]
        count_ref[0] = counts

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "scene_key", "cam_key", "max_depth", "rr_start_depth", "block",
        "quota_cap",
    ),
)
def trace_pallas_regen(
    pixel_idx,
    scene_key: str,
    cam_key: str,
    seed,
    sample_base,
    *,
    quota,
    max_depth: int = 12,
    rr_start_depth: int = 5,
    block: int = 2048,
    quota_cap: int = QUOTA_CAP_STATIC,
):
    """Regenerative trace: pixel_idx [N] i32 (one lane per pixel; N % block
    == 0), each lane traces `quota` full samples with in-kernel raygen.
    sample_base: global sample offset of this pass (for the 2x2 subpixel
    grid). Returns (radiance_sum [N,3] — SUM over quota samples, rays f32).

    quota is a RUNTIME value (traced; any spp <= quota_cap reuses the one
    compiled kernel — the loop bound comes from the static quota_cap and
    the all-done early exit skips the unused tail).
    """
    consts = _SCENES[scene_key]
    cam_consts = _SCENES[cam_key]
    n = pixel_idx.shape[0]
    if n % block or block % SUB:
        raise ValueError(f"N={n} must be a multiple of block={block}")
    # a runtime quota beyond the static cap would silently truncate samples
    if isinstance(quota, (int, np.integer)) and quota > quota_cap:
        raise ValueError(f"quota={quota} exceeds static quota_cap={quota_cap}")
    L = block // SUB
    rows = n // L

    kernel = _make_kernel_v3(
        consts, cam_consts, L, quota_cap, max_depth, rr_start_depth
    )

    def rspec(k):
        return pl.BlockSpec((k, SUB, L), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    rad, counts = pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), rspec(1)],
        out_specs=(rspec(3), rspec(1)),
        out_shape=(
            jax.ShapeDtypeStruct((3, rows, L), jnp.float32),
            jax.ShapeDtypeStruct((1, rows, L), jnp.float32),
        ),
    )(
        jnp.stack([jnp.asarray(seed, jnp.int32),
                   jnp.asarray(sample_base, jnp.int32),
                   jnp.asarray(quota, jnp.int32)]).reshape(1, 3),
        pixel_idx.astype(jnp.float32).reshape(1, rows, L),
    )
    return rad.reshape(3, n).T, jnp.sum(counts)
