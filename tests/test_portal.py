"""Portal-deferred mesh tracing (ops.pallas.portal + render.portal).

Validation strategy (the scheduler's PRNG is positional, so image parity is
statistical and measured on hardware; here we prove the pieces):

1. CONSERVATIVENESS — the load-bearing claim: a segment the portal test does
   NOT suspend provably cannot hit the heavy mesh, so its cheap-scene hit
   equals its full-scene hit. Property-tested on random rays vs the XLA
   intersector on both scenes.
2. The full-scene resolver (trace_pallas_resolve) is lane-exact vs a manual
   XLA single-step oracle under injected uniforms at MIXED per-lane depths.
3. K_cheap freeze semantics: every lane still alive after the call is
   genuinely portal-blocked; frozen-at-entry lanes kept their state; counts
   equal the depth advance.
4. End-to-end: the scheduler retires every issued sample exactly once
   (rays == npix*spp at max_depth=1) and matches the XLA image at depth 1
   up to tent-filter jitter.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import path_tracer_tpu as pt
from path_tracer_tpu.models.scene import pack_scene
from path_tracer_tpu.ops.intersect import intersect_scene
from path_tracer_tpu.ops.pallas import portal as portal_mod
from path_tracer_tpu.ops.pallas import trace_v2
from path_tracer_tpu.ops.pallas.trace_kernel import (
    kernel_scene_buffers, trace_pallas_resolve,
)


@pytest.fixture(scope="module")
def mesh_packed(all_scenes):
    return pack_scene(all_scenes["mesh"])


@pytest.fixture(scope="module")
def portal_consts(mesh_packed):
    out = portal_mod.build_portal_consts(mesh_packed)
    assert out is not None
    return out


def _random_rays(key, n, lo, hi):
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(
        ko, (n, 3), minval=jnp.asarray(lo), maxval=jnp.asarray(hi)
    )
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o.astype(jnp.float32), d.astype(jnp.float32)


def test_portal_eligibility(mesh_packed, all_scenes):
    out = portal_mod.build_portal_consts(mesh_packed)
    assert out is not None
    consts, heavy = out
    prims, bnd, (lo, hi) = consts
    # cheap scene = 7 wall quads (no heavy-mesh triangles)
    assert all(p[0] in ("q", "t") or p[0] == "s" for p in prims)
    assert len(prims) <= 16
    # cornell (38 kernel prims but no heavy mesh) is NOT eligible
    assert portal_mod.build_portal_consts(
        pack_scene(all_scenes["cornell"])) is None


def test_portal_conservative_vs_full_scene(mesh_packed, portal_consts):
    """Non-suspended segments: cheap hit == full hit (the correctness core).

    Also checks the suspension rate is selective (well under half of random
    segments) — the perf premise."""
    consts, heavy = portal_consts
    _, _, (lo, hi) = consts

    full = {k: jnp.asarray(v) for k, v in mesh_packed.buffers().items()}
    # cheap scene: heavy-mesh triangles forced to guaranteed-miss
    tm = np.asarray(mesh_packed.tri_mesh)
    sel = jnp.asarray(
        (tm == heavy)
        & (np.arange(tm.shape[0]) < mesh_packed.num_triangles)
    )
    cheap = dict(full)
    cheap["tri_v"] = jnp.where(sel[:, None, None], 1e30, full["tri_v"])

    # random segments across the box (the scene AABB spans the walls)
    o, d = _random_rays(
        jax.random.PRNGKey(3), 4096,
        *(np.asarray(b, np.float32) for b in scene_bounds_mesh(mesh_packed)),
    )

    hit_full = intersect_scene(o, d, full, mode="fast")
    hit_cheap = intersect_scene(o, d, cheap, mode="fast")

    # the kernel's portal test, mirrored in numpy
    lo_a = np.asarray(lo)
    hi_a = np.asarray(hi)
    on, dn = np.asarray(o), np.asarray(d)
    inv = 1.0 / np.where(np.abs(dn) < 1e-30, 1e-30, dn)
    ta = (lo_a[None] - on) * inv
    tb = (hi_a[None] - on) * inv
    t_en = np.maximum.reduce(np.minimum(ta, tb), axis=1)
    t_ex = np.minimum.reduce(np.maximum(ta, tb), axis=1)
    blocked = (t_ex >= t_en) & (t_ex > 0.0)
    t_cheap = np.asarray(hit_cheap.t)
    suspend = blocked & (t_en <= t_cheap)

    free = ~suspend
    # every non-suspended segment resolves identically on the cheap scene
    np.testing.assert_array_equal(
        np.asarray(hit_full.t)[free], t_cheap[free]
    )
    np.testing.assert_array_equal(
        np.asarray(hit_full.obj)[free], np.asarray(hit_cheap.obj)[free]
    )
    # and the portal is selective, not vacuous
    assert suspend.mean() < 0.5
    # sanity: some segments DO hit the heavy mesh (tri id within heavy range)
    hit_heavy = (
        np.asarray(hit_full.tri) >= 0
    ) & np.asarray(jnp.take(sel, jnp.maximum(hit_full.tri, 0)))
    assert hit_heavy.any()


def scene_bounds_mesh(packed):
    verts = np.asarray(packed.tri_v[: packed.num_triangles]).reshape(-1, 3)
    return verts.min(axis=0), verts.max(axis=0)


def test_resolve_lane_exact_vs_xla_single_step(mesh_packed):
    """trace_pallas_resolve under injected uniforms == a manual XLA bounce
    with per-lane depths (RR gating per lane)."""
    from path_tracer_tpu.ops import rng as rng_mod
    from path_tracer_tpu.ops.bsdf import sample_bsdf

    kscene = kernel_scene_buffers(mesh_packed)
    scene = {k: jnp.asarray(v) for k, v in mesh_packed.buffers().items()}

    n = 512
    block = 256
    lo, hi = scene_bounds_mesh(mesh_packed)
    o, d = _random_rays(jax.random.PRNGKey(11), n, lo, hi)
    key = jax.random.PRNGKey(5)
    u = jax.random.uniform(key, (4, n), dtype=jnp.float32)
    depth = jax.random.randint(
        jax.random.PRNGKey(6), (1, n), 0, 12
    ).astype(jnp.float32)
    thr = jnp.full((3, n), 0.7, jnp.float32)
    acc0 = jnp.zeros((3, n), jnp.float32)
    alive = jnp.ones((1, n), jnp.float32)
    prev = jnp.full((1, n), -1.0, jnp.float32)

    max_depth, rr_start = 12, 5
    with pltpu.force_tpu_interpret_mode():
        ro, rd, rthr, racc, ralive, rprev, rdepth, counts = (
            trace_pallas_resolve(
                o.T, d.T, thr, acc0, alive, prev, depth, kscene, 7,
                max_depth=max_depth, rr_start_depth=rr_start, block=block,
                uniforms=u,
            )
        )

    # ---- XLA oracle: one bounce with per-lane depth ----
    hit = intersect_scene(o, d, scene, mode="fast",
                          prev_tri=jnp.full((n,), -1, jnp.int32))
    found = hit.found
    nd = jnp.sum(hit.normal * d, axis=-1)
    nl = jnp.where((nd < 0.0)[:, None], hit.normal, -hit.normal)
    new_depth = depth[0] + 1.0
    max_refl = jnp.max(hit.color, axis=-1)
    rr_applies = new_depth > rr_start
    survive = (u[0] < max_refl) & (new_depth < max_depth)
    die_rr = rr_applies & ~survive
    scale = jnp.where(rr_applies & survive,
                      1.0 / jnp.maximum(max_refl, 1e-30), 1.0)
    accx = jnp.where(found[:, None], thr.T * hit.emission, 0.0)
    bs = sample_bsdf(d, hit.normal, nl, hit.rtype, u[1:4].T)
    thrx = thr.T * hit.color * scale[:, None] * bs.weight
    alivex = found & ~die_rr & (new_depth < max_depth) \
        & (jnp.max(thrx, axis=-1) > 0.0)

    np.testing.assert_allclose(
        np.asarray(racc).T, np.asarray(accx), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(ralive[0]) > 0, np.asarray(alivex)
    )
    live = np.asarray(alivex)
    np.testing.assert_allclose(
        np.asarray(rthr).T[live], np.asarray(thrx)[live], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rd).T[live], np.asarray(bs.direction)[live], rtol=1e-5,
        atol=1e-6,
    )
    # prev of surviving triangle hits = PACKED id of the hit (quad pairs
    # collapse to their first triangle's id)
    tri_ids = np.asarray(hit.tri)
    quads, covered = __import__(
        "path_tracer_tpu.ops.pallas.trace_kernel", fromlist=["x"]
    ).detect_quad_pairs(mesh_packed)
    canon = {}
    for first in quads:
        canon[first + 1] = first
    exp_prev = np.array(
        [canon.get(int(t), int(t)) if t >= 0 else -1 for t in tri_ids],
        np.float32,
    )
    sel = live & (tri_ids >= 0)
    np.testing.assert_array_equal(np.asarray(rprev[0])[sel], exp_prev[sel])
    # depth advanced for every (initially alive) lane, counts match
    np.testing.assert_array_equal(
        np.asarray(rdepth[0]), np.asarray(depth[0]) + 1.0
    )
    assert float(jnp.sum(counts)) == n


def test_cheap_kernel_freeze_semantics(mesh_packed, portal_consts, all_scenes):
    """Run K_cheap on primary rays; check every surviving lane is genuinely
    portal-blocked and the counts equal the total depth advance."""
    consts, heavy = portal_consts
    key = "portal:test-mesh"
    trace_v2.register_scene(key, consts)

    n = 2048  # one block
    scene_desc = all_scenes["mesh"]
    from path_tracer_tpu.render.raygen import camera_arrays, generate_rays
    from path_tracer_tpu.ops import rng as rng_mod

    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene_desc.camera).items()}
    w, h = 64, 32
    pix = jnp.arange(n, dtype=jnp.int32) % (w * h)
    u = rng_mod.raygen_uniforms(jax.random.PRNGKey(2), (n,), 2)
    o, d = generate_rays(pix, jnp.zeros((n,), jnp.int32), u, cam, w, h)

    pool = jnp.zeros((portal_mod.ROWS, n), jnp.float32)
    pool = pool.at[portal_mod.ROW_O:portal_mod.ROW_O + 3].set(o.T)
    pool = pool.at[portal_mod.ROW_D:portal_mod.ROW_D + 3].set(d.T)
    pool = pool.at[portal_mod.ROW_THR:portal_mod.ROW_THR + 3].set(1.0)
    pool = pool.at[portal_mod.ROW_ALIVE].set(1.0)
    pool = pool.at[portal_mod.ROW_PREV].set(-1.0)
    pool = pool.at[portal_mod.ROW_PIX].set(pix.astype(jnp.float32))

    with pltpu.force_tpu_interpret_mode():
        out, counts = portal_mod.trace_cheap_blocked(
            pool, key, 3, max_depth=12, rr_start_depth=5, block=2048
        )

    out = np.asarray(out)
    alive = out[portal_mod.ROW_ALIVE] > 0
    depth_out = out[portal_mod.ROW_DEPTH]
    assert alive.any() and (~alive).any()
    # counts == total processed segments == total depth advance
    assert float(counts) == depth_out.sum()
    assert (depth_out <= 12).all()

    # every alive (frozen) lane is genuinely blocked: portal slab accepts
    # its ray no further than its cheap-scene hit
    _, _, (lo, hi) = consts
    oo = out[portal_mod.ROW_O:portal_mod.ROW_O + 3].T
    dd = out[portal_mod.ROW_D:portal_mod.ROW_D + 3].T
    inv = 1.0 / np.where(np.abs(dd) < 1e-30, 1e-30, dd)
    ta = (np.asarray(lo)[None] - oo) * inv
    tb = (np.asarray(hi)[None] - oo) * inv
    t_en = np.maximum.reduce(np.minimum(ta, tb), axis=1)
    t_ex = np.minimum.reduce(np.maximum(ta, tb), axis=1)
    blocked = (t_ex >= t_en) & (t_ex > 0.0)
    assert blocked[alive].all()

    # frozen pixels kept their pix row; pix row untouched overall
    np.testing.assert_array_equal(out[portal_mod.ROW_PIX], np.asarray(pix))

    # a frozen-at-entry lane (depth_out == 0, alive) kept o/d exactly
    frozen0 = alive & (depth_out == 0)
    if frozen0.any():
        np.testing.assert_array_equal(oo[frozen0], np.asarray(o)[frozen0])
        np.testing.assert_array_equal(dd[frozen0], np.asarray(d)[frozen0])


@pytest.mark.slow
def test_portal_render_end_to_end(all_scenes, monkeypatch):
    """Scheduler conservation + depth-1 image parity with the XLA path.
    PARK_K=1: the property (pipeline routing + conservation + parity on
    the REAL mesh scene) is park-depth-independent, and the interpreter
    pays ~3x for the production park_k=3 shape — which IS covered at
    full depth by test_resolve_pool_native_bit_identical[3-2]. (This was
    the single most expensive test of the suite, ~12 min.)"""
    from path_tracer_tpu.render import pipeline
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    scene = all_scenes["mesh"]
    res = Resolution.from_height(24)
    spp = 2
    cfg = RenderConfig(samples_per_pixel=spp, resolution=res,
                       backend="pallas", max_depth=1)
    bufs, mode = pipeline.prepare_scene_and_mode(scene, "pallas", res)
    assert mode.startswith("portal:")
    with pltpu.force_tpu_interpret_mode():
        done = pipeline.render(
            scene, cfg, out_dir=None, device_buffers=bufs, device_mode=mode,
            verbose=False,
        )
    img = np.asarray(done.image.pixels)
    npix = res.num_pixels
    assert done.stats.num_rays == npix * spp  # exact conservation @ depth 1
    assert np.isfinite(img).all() and (img >= 0).all() and (img <= 1).all()

    cfg2 = RenderConfig(samples_per_pixel=spp, resolution=res,
                        backend="jnp", max_depth=1)
    done2 = pipeline.render(scene, cfg2, out_dir=None, verbose=False)
    img2 = np.asarray(done2.image.pixels)
    # depth 1 = first-hit emission only; differences are tent-filter jitter
    # at geometry edges under different RNG streams
    rmse = float(np.sqrt(((img - img2) ** 2).mean()))
    assert rmse < 0.08, rmse


def test_compact_tail_accounting():
    """_compact_tail moves radiance without loss or duplication: moved
    slots' full state is carried, their source acc is zeroed, padding lanes
    are inert, and the per-pixel scatter-add over (source, small)
    reconstructs the original exactly."""
    from path_tracer_tpu.render import portal as rportal

    g = np.random.default_rng(7)
    n, npix, quota, target = 64, 50, 4.0, 48
    pool = g.normal(size=(portal_mod.V2_ROWS, n)).astype(np.float32)
    pool[portal_mod.V2_ROW_PIX] = np.minimum(np.arange(n), npix - 1)
    pool[portal_mod.V2_ROW_QUOTA] = quota
    done = g.integers(0, 5, size=n).astype(np.float32)
    done[npix:] = quota  # padding slots of the source pool: born retired
    pool[portal_mod.V2_ROW_DONE] = done

    idx_np = np.flatnonzero(done < quota).astype(np.int32)
    assert 0 < len(idx_np) <= target
    m = len(idx_np)
    idx = jnp.asarray(np.pad(idx_np, (0, target - m)))
    valid = jnp.asarray(np.arange(target) < m)
    src, small = rportal._compact_tail(jnp.asarray(pool), idx, valid)
    src, small = np.asarray(src), np.asarray(small)

    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    keep = np.setdiff1d(np.arange(n), idx_np)
    assert np.all(src[A0:A1][:, idx_np] == 0)
    np.testing.assert_array_equal(src[A0:A1][:, keep], pool[A0:A1][:, keep])
    # non-acc rows of the source are untouched
    np.testing.assert_array_equal(src[:A0], pool[:A0])
    np.testing.assert_array_equal(src[A1:], pool[A1:])
    # moved slots carry their complete state
    np.testing.assert_array_equal(small[:, :m], pool[:, idx_np])
    # padding lanes are inert: dead, retired (done == quota == 0), zero
    # radiance
    assert np.all(small[portal_mod.ROW_ALIVE, m:] == 0)
    assert np.all(
        small[portal_mod.V2_ROW_DONE, m:]
        >= small[portal_mod.V2_ROW_QUOTA, m:]
    )
    assert np.all(small[A0:A1, m:] == 0)

    def scatter(p):
        out = np.zeros((npix, 3), np.float64)
        np.add.at(out, p[portal_mod.V2_ROW_PIX].astype(int), p[A0:A1].T)
        return out

    np.testing.assert_allclose(
        scatter(src) + scatter(small), scatter(pool), rtol=1e-5, atol=1e-6
    )

    # the on-device index selection (_compact_tail_auto — no [2, W] host
    # fetch per ladder rung) must be BITWISE the host-index path
    src_a, small_a = rportal._compact_tail_auto(
        jnp.asarray(pool), target=target)
    np.testing.assert_array_equal(np.asarray(src_a), src)
    np.testing.assert_array_equal(np.asarray(small_a), small)


@pytest.mark.slow
def test_drive_pool_v2_compaction_equivalence(monkeypatch):
    """Tail compaction is radiance-exact for every slot it does NOT move
    (bit-identical to the uncompacted drive — inert lanes are provably
    untouched by later cycles) and sample-exact for the ones it does.
    PARK_K=1 + the synthetic 72-tri scene: compaction exactness is
    park-depth- and scene-independent, and the interpreter's resolve
    cost scales with both park depth (~3x at the production 3) and
    triangle count (824 -> 72 = ~11x) — at the real-mesh/park-3 shape
    this was the second most expensive test of the suite (~11 min).
    Real-scene end-to-end coverage lives in
    test_portal_render_end_to_end; full-depth parking in
    test_resolve_pool_native_bit_identical[3-2]."""
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        TILE_META, kernel_scene_buffers,
    )
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.utils.config import Resolution

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    # isolate COMPACTION: redistribution re-tasks slots (its own
    # exactness is covered by test_redistribute_* and the sharded tests)
    # and would break the bit-identity comparison below
    monkeypatch.setenv("PT_TPU_REDIST", "0")
    scene = _synthetic_portal_scene()
    res = Resolution.from_height(48)  # npix 3456 -> n_pad 4096 > 2048
    spp, depth = 1, 2
    packed = pack_scene(scene)
    portal = portal_mod.build_portal_consts(packed)
    assert portal is not None
    pkey = "portal:test-synth-compact48"
    trace_v2.register_scene(pkey, portal[0])
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    trace_v2.register_scene(cam_key, trace_v2.build_camera_consts(
        scene.camera, res.width, res.height))
    kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
    TILE_META[pkey] = meta
    npix = res.num_pixels
    n_pad = rportal._round_block(npix)
    assert n_pad > 2048  # the ladder has somewhere to squeeze the tail

    # HETEROGENEOUS per-slot quotas (1..8, the shape of a resumed or
    # redistributed pool): a uniform-quota synth pool drains as a cliff
    # (u: 3064 -> 0 in one cycle — no poll ever sees a ladder-sized
    # tail), while staggered quotas retire slots over ~2*quota cycles at
    # step_cap=1, guaranteeing polls with 0 < u <= 2048
    quota_np = 1.0 + (np.arange(npix) % 8)
    spp = 8  # k_pass >= max per-slot quota

    def fresh_pool():
        return rportal._pool_from_rows(
            jnp.asarray(np.arange(npix), jnp.float32),
            jnp.zeros(npix, jnp.float32),
            jnp.asarray(quota_np, jnp.float32),
            n_pad=n_pad, park_k=1,
        )

    def drive(ladder):
        with pltpu.force_tpu_interpret_mode():
            return rportal.drive_pool_v2(
                fresh_pool(), spp, 0, jnp.int32(3), kbufs,
                portal_key=pkey, cam_key=cam_key, max_depth=depth,
                rr_start_depth=5, check_every=1, ladder=ladder,
                adaptive_polls=False, step_cap=1,
            )

    stages, rays = drive((2048,))
    stages0, rays0 = drive(())
    assert len(stages0) == 1
    if len(stages) == 1:
        pytest.skip("tail never fit the ladder at a poll — nothing to test")

    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    main = np.asarray(stages[0])
    ref = np.asarray(stages0[0])
    moved = (
        main[portal_mod.V2_ROW_DONE] < main[portal_mod.V2_ROW_QUOTA]
    )
    assert moved.any()
    # unmoved slots: bit-identical to the uncompacted drive
    np.testing.assert_array_equal(
        main[A0:A1][:, ~moved], ref[A0:A1][:, ~moved]
    )
    # every stage retired its per-slot quota exactly (moved slots excepted
    # upstream; compaction padding lanes are born retired done==quota==0)
    for st in stages[1:]:
        st = np.asarray(st)
        assert np.all(
            st[portal_mod.V2_ROW_DONE] >= st[portal_mod.V2_ROW_QUOTA]
        )
    # reconstruction: scatter-add of all stages is finite, >= 0, and
    # statistically consistent with the uncompacted image
    accum = main[A0:A1][:, :npix].T.astype(np.float64).copy()
    for st in stages[1:]:
        st = np.asarray(st)
        np.add.at(
            accum, st[portal_mod.V2_ROW_PIX].astype(int), st[A0:A1].T
        )
    accum0 = ref[A0:A1][:, :npix].T
    assert np.isfinite(accum).all() and (accum >= 0).all()
    assert abs(accum.mean() - accum0.mean()) < 0.15 * max(accum0.mean(), 1e-6)


@pytest.mark.slow
def test_resolve_const_mat_tiles_bitwise(mesh_packed, monkeypatch):
    """The const-material tile path (8 one-hot reads replaced by first-row
    broadcasts, gated on kernel_scene_buffers' uniformity meta) is BITWISE
    identical to the general path — same uniforms, same rays.

    const_mat only exists on the CULL_CHUNK < block path (the production
    whole-block deferred-fetch sweep ignores it — its one-hot matmul fetch
    costs the same either way), so force the chunked path here or the two
    programs would be identical and the assertion vacuous."""
    from path_tracer_tpu.ops.pallas import trace_kernel as tk

    monkeypatch.setattr(tk, "CULL_CHUNK", 128)
    kscene, meta = kernel_scene_buffers(mesh_packed, with_meta=True)
    flags = meta["tile_uniform_mat"]
    assert len(flags) > 0 and all(flags)  # the OFF mesh is single-material

    n = 512
    lo, hi = scene_bounds_mesh(mesh_packed)
    o, d = _random_rays(jax.random.PRNGKey(21), n, lo, hi)
    u = jax.random.uniform(jax.random.PRNGKey(22), (4, n), jnp.float32)
    depth = jax.random.randint(
        jax.random.PRNGKey(23), (1, n), 0, 12
    ).astype(jnp.float32)
    thr = jnp.full((3, n), 0.7, jnp.float32)
    acc0 = jnp.zeros((3, n), jnp.float32)
    alive = jnp.ones((1, n), jnp.float32)
    prev = jnp.full((1, n), -1.0, jnp.float32)

    def run(cm):
        with pltpu.force_tpu_interpret_mode():
            return trace_pallas_resolve(
                o.T, d.T, thr, acc0, alive, prev, depth, kscene, 7,
                max_depth=12, rr_start_depth=5, block=256, uniforms=u,
                const_mat_tiles=cm,
            )

    ref = run(None)
    got = run(flags)
    # some ray must actually hit the mesh for the test to mean anything
    assert float(jnp.sum(ref[7])) > 0
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _synthetic_portal_scene() -> "SceneDescriptor":
    """A portal-eligible scene ~11x cheaper to interpret than mesh.json:
    a 72-triangle bumpy plate (>= PORTAL_MIN_TRIS) facing the default
    camera, over a floor sphere and under a light sphere. Primaries all
    freeze at the plate's AABB, so the full v2 freeze/park/resolve
    machinery runs, but the interpreted resolve sweeps 72 rows, not 824."""
    from path_tracer_tpu.models.geometry import Mesh
    from path_tracer_tpu.models.material import Material, ReflectType
    from path_tracer_tpu.models.scene import SceneDescriptor, SceneObject

    g = np.random.default_rng(3)
    nx = 6  # 6x6 quads -> 72 triangles
    xs = np.linspace(-3.0, 3.0, nx + 1)
    z = -6.0 + g.uniform(-0.3, 0.3, (nx + 1, nx + 1))
    tris = []
    for i in range(nx):
        for j in range(nx):
            p = [np.array([xs[a], xs[b], z[a, b]], np.float32)
                 for a, b in ((i, j), (i + 1, j), (i, j + 1), (i + 1, j + 1))]
            tris.append(np.stack([p[0], p[1], p[2]]))
            tris.append(np.stack([p[1], p[3], p[2]]))
    plate = Mesh.from_triangles(np.stack(tris).astype(np.float32))

    def mat(color, emis=(0, 0, 0)):
        return Material(np.asarray(color, np.float32),
                        np.asarray(emis, np.float32), ReflectType.DIFFUSE)

    return SceneDescriptor(id="synth-portal", objects=[
        # small emissive sphere IN VIEW in front of the plate: depth-1
        # renders get nonzero first-hit radiance
        SceneObject.sphere((1.2, 0.8, -4.3), 0.6,
                           mat((1, 1, 1), (10, 10, 10))),
        SceneObject.sphere((0.0, -104.0, -6.0), 100.0, mat((0.6, 0.6, 0.6))),
        SceneObject.from_mesh(np.zeros(3, np.float32), plate,
                              mat((0.75, 0.55, 0.35))),
    ])


@pytest.fixture(scope="module")
def synth_portal():
    """The synthetic 72-tri scene registered the way
    pipeline.prepare_scene_and_mode does for portal scenes
    (pipeline.py:120-147) — bypassing its >V2_MAX_PRIMS gate so a small
    synthetic mesh exercises the same machinery cheaply. Returns
    (pkey, cam_key, kernel bufs, npix, n_pad)."""
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        TILE_META, kernel_scene_buffers,
    )
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.utils.config import Resolution

    scene = _synthetic_portal_scene()
    res = Resolution.from_height(24)
    packed = pack_scene(scene)
    portal = portal_mod.build_portal_consts(packed)
    assert portal is not None  # 72 tris >= PORTAL_MIN_TRIS
    pkey = "portal:test-synth-72"
    trace_v2.register_scene(pkey, portal[0])
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    trace_v2.register_scene(cam_key, trace_v2.build_camera_consts(
        scene.camera, res.width, res.height))
    kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
    TILE_META[pkey] = meta
    npix = res.num_pixels
    return pkey, cam_key, kbufs, npix, rportal._round_block(npix)


@pytest.mark.parametrize(
    "park_k,resolve_bufs",
    [
        pytest.param(1, None, marks=pytest.mark.slow),
        # production PARK_K=3 with a NARROW resolve (resolve_bufs < park_k):
        # exercises the cross-part read-modify-write of ROW_ACC/V2_ROW_DONE
        # over parts 2..3 AND the untouched-buffer passthrough (part-0 init
        # copies all rows; un-resolved buffers must survive verbatim).
        # Interpreter-heavy (the cheap kernel carries 3 park buffers).
        pytest.param(3, 2, marks=pytest.mark.slow),
    ],
)
def test_resolve_pool_native_bit_identical(synth_portal, park_k,
                                           resolve_bufs):
    """The pool-native resolve (trace_pallas_resolve_pool: in-kernel
    bookkeeping, aliased pool output) is BIT-IDENTICAL to the XLA
    composition it replaces (portal_resolve_phase's glue path) on a pool
    mid-drive — frozen active paths, parked buffers, empty buffers — under
    the PRNG (same per-block stream ids) and under injected uniforms."""
    from path_tracer_tpu.render import portal as rportal

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth = (2, 3) if park_k == 1 else (5, 4)
    quota = jnp.int32(spp)
    pool0 = rportal.make_pool_v2(npix, n_pad, spp, park_k=park_k)
    nb = park_k if resolve_bufs is None else min(resolve_bufs, park_k)
    with pltpu.force_tpu_interpret_mode():
        # several cheap calls so deeper park buffers actually fill
        for it in range(1 if park_k == 1 else 2):
            pool0, _ = portal_mod.trace_cheap_regen(
                pool0, pkey, cam_key, jnp.int32(7 + it), quota, jnp.int32(0),
                jnp.int32(4), max_depth=depth, rr_start_depth=5,
                block=rportal.CHEAP_BLOCK, park_k=park_k,
            )
        # the pool must hold real work in EVERY resolved part (and, for the
        # narrow case, in at least one untouched buffer) or the test is
        # vacuous
        assert float(jnp.sum(pool0[portal_mod.ROW_ALIVE])) > 0
        for j in range(park_k if park_k == 1 else nb + 1):
            bs = pool0[portal_mod.buf_row(j, portal_mod.BUF_STATE)]
            assert float(jnp.sum((bs > 0.5) & (bs < 1.5))) > 0, f"buffer {j}"

        def phase(pool_native, uniforms=None):
            return rportal.portal_resolve_phase(
                jnp.array(pool0), quota, jnp.int32(11), kbufs,
                portal_key=pkey, max_depth=depth, rr_start_depth=5,
                park_k=park_k, resolve_bufs=resolve_bufs,
                pool_resolve=pool_native, uniforms=uniforms,
            )

        old_pool, old_rays, old_unfin = phase(False)
        new_pool, new_rays, new_unfin = phase(True)
        np.testing.assert_array_equal(
            np.asarray(old_pool), np.asarray(new_pool)
        )
        assert float(old_rays) == float(new_rays) > 0
        assert float(old_unfin) == float(new_unfin)

        # injected uniforms: the old path takes them via the phase, the
        # pool-native kernel via its own hook (part-major layout)
        u = jnp.asarray(
            np.random.default_rng(5).uniform(
                size=(4, (nb + 1) * n_pad)
            ).astype(np.float32)
        )
        old_pool_u, _, _ = phase(False, uniforms=u)
        from path_tracer_tpu.ops.pallas.trace_kernel import TILE_META

        new_pool_u, _ = portal_mod.trace_pallas_resolve_pool(
            jnp.array(pool0), kbufs, jnp.int32(11) + jnp.int32(1),
            parts=nb + 1, max_depth=depth, rr_start_depth=5,
            block=rportal.RESOLVE_BLOCK, uniforms=u,
            const_mat_tiles=TILE_META[pkey].get("tile_uniform_mat"),
        )
        np.testing.assert_array_equal(
            np.asarray(old_pool_u), np.asarray(new_pool_u)
        )


@pytest.mark.slow
def test_drive_pool_v2_narrow_resolve(synth_portal):
    """narrow_bufs: cycles that resolve only the active path (+ prefix of
    parked buffers) still retire every sample exactly once and leave no
    path parked at the end."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import make_pool_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth = 2, 1  # depth 1: primaries still freeze/park at the plate

    # park_k=1 + step_cap=16: same machinery (freeze, park, narrow skip,
    # periodic full resolve), ~3x cheaper to compile+interpret than the
    # production park_k=3/cap-64 shape (measured 158 s vs 490 s)
    with pltpu.force_tpu_interpret_mode():
        stages, rays = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0,
            jnp.int32(5),
            kbufs, portal_key=pkey, cam_key=cam_key,
            max_depth=depth, rr_start_depth=5, check_every=1,
            ladder=(), adaptive_polls=False, step_cap=16,
            narrow_bufs=0, full_every=2,
        )
    (pool,) = stages
    pool = np.asarray(pool)
    done = pool[portal_mod.V2_ROW_DONE][:npix]
    assert np.all(done == spp)  # every sample retired exactly once
    assert float(np.asarray(rays)) >= npix * spp  # every sample traced
    # no path left parked (BUF_STATE rows are all 0 at exit)
    assert np.all(pool[portal_mod.buf_row(0, portal_mod.BUF_STATE)] == 0.0)
    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    acc = pool[A0:A1][:, :npix]
    assert np.isfinite(acc).all() and (acc >= 0).all() and acc.mean() > 0


def test_drive_pool_v2_on_check_abort(synth_portal):
    """A truthy on_check return aborts the drive at that poll, returning
    the partial pool — the mid-pass cancel path for big portal passes."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import make_pool_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    # spp 4 at step_cap 2: one cycle provably cannot retire a slot's
    # quota (2 cheap steps + a resolve advance at most 3 samples), so the
    # first poll always sees unfinished slots for the abort to strand
    spp, depth = 4, 1
    calls = []

    def hook(cycle, width, unfin):
        calls.append((cycle, width, unfin))
        return True  # cancel at the first poll

    with pltpu.force_tpu_interpret_mode():
        stages, rays = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(5),
            kbufs, portal_key=pkey, cam_key=cam_key,
            max_depth=depth, rr_start_depth=5, check_every=1,
            ladder=(), adaptive_polls=False, step_cap=2, park_k=1,
        )
        assert not calls  # no hook, no calls — and the pool completes
        stages_c, rays_c = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(5),
            kbufs, portal_key=pkey, cam_key=cam_key,
            max_depth=depth, rr_start_depth=5, check_every=1,
            ladder=(), adaptive_polls=False, step_cap=2, park_k=1,
            on_check=hook,
        )
    assert len(calls) == 1  # aborted at the FIRST poll
    done = np.asarray(stages[-1][portal_mod.V2_ROW_DONE][:npix])
    assert np.all(done == spp)  # the un-hooked drive finished
    done_c = np.asarray(stages_c[-1][portal_mod.V2_ROW_DONE][:npix])
    # step_cap 2 at quota 4: one cycle cannot retire everything
    assert np.any(done_c < spp)
    assert float(rays_c) < float(rays)


@pytest.mark.slow
def test_portal_pass_runner_v2_mid_pass_cancel(synth_portal, monkeypatch):
    """A mid-pass cancel KEEPS every started sample (freeze-and-drain —
    reference parity: cancel keeps completed work, mod.rs:1002-1004):
    .last_cancelled flips, the retired radiance lands in accum, and
    .last_partial_counts holds EXACT per-pixel retired counts — proven by
    depth-1 ray conservation (each retired sample traced exactly one
    segment, so rays == sum(counts))."""
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render.portal import make_portal_pass_runner_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    # step_cap=1: one cheap step per cycle, so the first poll (spp 4)
    # provably sees unfinished slots — the cancel lands mid-pass
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    spp = 4
    runner = make_portal_pass_runner_v2(
        portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        max_depth=1, check_every=1, on_check=lambda c, w, u: True,
    )
    accum = jnp.zeros((npix, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        accum2, rays = runner({"kernel": kbufs}, None, accum, 0, spp,
                              rng.root_key(0))
    assert runner.last_cancelled
    cnt = np.asarray(runner.last_partial_counts)
    assert cnt.shape == (npix,)
    assert np.all(cnt >= 0) and np.all(cnt <= spp)
    total = cnt.sum()
    # mid-pass: some but not all samples retired, and none lost
    assert 0 < total < npix * spp
    # depth-1 conservation: every retired sample traced exactly 1 segment
    assert float(np.asarray(rays)) == total
    acc = np.asarray(accum2)
    assert np.isfinite(acc).all() and acc.sum() > 0.0


@pytest.mark.slow
def test_portal_pass_runner_v2_pause_checkpoint_resume(synth_portal,
                                                       monkeypatch):
    """Mid-pass checkpoints via freeze-and-drain: a 'pause' verdict drains
    the pool, hands (accum, slot rows) to on_pause, and CONTINUES the
    pass; a fresh runner resuming from those slot rows completes the
    remaining sample ranges so every sample id is rendered exactly once
    (depth-1 ray conservation across the two runners sums to npix*spp,
    and per-pixel counts reach exactly spp)."""
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render.portal import make_portal_pass_runner_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    spp = 4
    saved = {}

    def on_pause(accum_dev, slot_rows, pass_idx, k_pass):
        # first pause only (the hook below stops asking after one)
        saved["accum"] = np.asarray(accum_dev)
        saved["slots"] = slot_rows
        saved["pass_idx"] = pass_idx

    def hook(cycle, w, unfin):
        if "accum" not in saved and unfin > 0:
            return "pause"
        return False

    runner = make_portal_pass_runner_v2(
        portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        max_depth=1, check_every=1, on_check=hook, on_pause=on_pause,
    )
    accum = jnp.zeros((npix, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        accum_full, rays_full = runner({"kernel": kbufs}, None, accum, 0,
                                       spp, rng.root_key(0))
    assert "accum" in saved  # a pause really happened
    assert not runner.last_cancelled
    # the pass CONTINUED after the pause and finished everything
    assert float(np.asarray(rays_full)) == npix * spp

    # resume a fresh runner from the checkpointed slot rows: it must
    # complete exactly the remaining samples
    pix_s, done_s, quota_s = saved["slots"]
    rem = (quota_s - done_s).sum()
    assert 0 < rem < npix * spp  # checkpoint landed mid-pass
    runner2 = make_portal_pass_runner_v2(
        portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        max_depth=1, check_every=1,
    )
    runner2.resume_slots = (pix_s, done_s, quota_s)
    with pltpu.force_tpu_interpret_mode():
        accum_res, rays_res = runner2(
            {"kernel": kbufs}, None, jnp.asarray(saved["accum"]), 0, spp,
            rng.root_key(0))
    # exact sample accounting: checkpointed + resumed == whole pass
    assert float(np.asarray(rays_res)) == rem
    acc = np.asarray(accum_res)
    assert np.isfinite(acc).all() and acc.sum() > 0.0


def test_redist_min_scales_with_quota(monkeypatch):
    """Redistribution's min split size scales to the pass quota so short
    passes (the reference's interactive 64-500 spp workloads) keep
    redistributing into the drain tail: the fixed 16 left HALF of a
    64-sample quota non-distributable. Env override preserved."""
    from path_tracer_tpu.render.portal import _redist_min

    monkeypatch.delenv("PT_TPU_REDIST_MIN", raising=False)
    assert _redist_min(1024) == 16
    assert _redist_min(512) == 16
    assert _redist_min(256) == 16
    assert _redist_min(100) == 6
    assert _redist_min(64) == 4
    assert _redist_min(16) == 2
    assert _redist_min(1) == 2
    monkeypatch.setenv("PT_TPU_REDIST_MIN", "9")
    assert _redist_min(64) == 9


def test_with_cnt_base_wider_snapshot():
    """Regression (ADVICE r4): the pause-carry add must tolerate a
    snapshot wider than the carry — single-device snapshots are
    out_rows = max(pool_width, npix) while the carry is [npix]. Any npix
    that is not a CHEAP_BLOCK multiple (e.g. the GUI default 450x300)
    hits this; the old slice-add raised TypeError."""
    from path_tracer_tpu.render import portal as rportal

    c0, npix = 2048, 864
    rad = jnp.zeros((c0, 3), jnp.float32)
    cnt = jnp.ones((c0,), jnp.float32)
    base = jnp.full((npix,), 2.0, jnp.float32)
    rad2, cnt2 = rportal._with_cnt_base((rad, cnt), base)
    assert cnt2.shape == (c0,)
    np.testing.assert_array_equal(np.asarray(cnt2[:npix]), 3.0)
    np.testing.assert_array_equal(np.asarray(cnt2[npix:]), 1.0)
    np.testing.assert_array_equal(np.asarray(rad2), np.asarray(rad))
    # equal widths (the sharded runner's shape) still work
    _, cnt3 = rportal._with_cnt_base(
        (rad[:npix], cnt[:npix]), base)
    np.testing.assert_array_equal(np.asarray(cnt3), 3.0)


@pytest.mark.slow
def test_portal_snapshot_after_pause_nonblock_npix(synth_portal,
                                                   monkeypatch):
    """End-to-end regression (ADVICE r4): a progress snapshot taken AFTER
    a mid-pass pause, with the pool wider than npix, must not crash and
    must include the pause carry (pixels retired before the pause do not
    normalize short). The synth fixture has npix=864 < n_pad=2048 — the
    same non-block-multiple-shape mismatch as 450x300 with checkpointing
    plus progress previews."""
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render.portal import make_portal_pass_runner_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    assert n_pad > npix  # the shape-mismatch precondition under test
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    spp = 4
    state = {"paused": False, "snaps": []}

    def on_pause(accum_dev, slot_rows, pass_idx, k_pass):
        state["paused"] = True

    def hook(cycle, w, unfin, *, snapshot=None):
        if not state["paused"] and unfin > 0:
            return "pause"
        if state["paused"] and snapshot is not None:
            state["snaps"].append(snapshot())
        return False

    runner = make_portal_pass_runner_v2(
        portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        max_depth=1, check_every=1, on_check=hook, on_pause=on_pause,
    )
    accum = jnp.zeros((npix, 3), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        accum2, rays = runner({"kernel": kbufs}, None, accum, 0, spp,
                              rng.root_key(0))
    assert state["paused"] and state["snaps"]
    assert float(np.asarray(rays)) == npix * spp  # pass still completed
    rad, cnt = state["snaps"][-1]
    cnt = np.asarray(cnt)
    # the final snapshot (unfin == 0) must show the FULL quota on every
    # pixel — stages retired after the pause plus the carried counts
    np.testing.assert_array_equal(cnt[:npix], float(spp))
    assert np.asarray(rad).shape[0] == cnt.shape[0]


@pytest.mark.slow
def test_portal_cycles_v2_fused_matches_unfused(synth_portal):
    """portal_cycles_v2 (n cycles in one fori dispatch, the tunnel
    amortization) is bitwise the same pool as n portal_cycle_v2 calls with
    the per-cycle seeds it claims to reproduce. park_k=0 keeps the fori
    program small (the parked-buffer resolve is covered by the drive
    tests; here the property under test is the seed/cycle threading)."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import make_pool_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth, n_cycles = 1, 1, 2
    kw = dict(portal_key=pkey, cam_key=cam_key, max_depth=depth,
              rr_start_depth=5, park_k=0)
    seed0, cycle0, cap = jnp.int32(9), 3, jnp.int32(16)

    with pltpu.force_tpu_interpret_mode():
        pool = make_pool_v2(npix, n_pad, spp, park_k=0)
        fused, rays_f, unfin_f = rportal.portal_cycles_v2(
            pool, jnp.int32(spp), jnp.int32(0), seed0, jnp.int32(cycle0),
            kbufs, cap, n_cycles=n_cycles, **kw)
        pool = make_pool_v2(npix, n_pad, spp, park_k=0)
        rays_u = jnp.float32(0.0)
        for i in range(n_cycles):
            pool, r, unfin_u = rportal.portal_cycle_v2(
                pool, jnp.int32(spp), jnp.int32(0),
                seed0 + jnp.int32(2 * (cycle0 + i) + 1), kbufs, cap, **kw)
            rays_u = rays_u + r

    np.testing.assert_array_equal(np.asarray(fused), np.asarray(pool))
    assert float(rays_f) == float(rays_u)
    assert float(unfin_f) == float(unfin_u)


def test_resolve_sort_order_groups_lanes():
    """_resolve_sort_order: dead lanes sort last (into skippable all-dead
    blocks), zero-candidate lanes first, and alive lanes group by their
    candidate-tile slab mask; the sort is stable within equal keys."""
    from path_tracer_tpu.render.portal import _resolve_sort_order

    kscene = {
        "tile_lo": jnp.array([[0.0, 10.0], [0.0, 0.0], [0.0, 0.0]]),
        "tile_hi": jnp.array([[1.0, 11.0], [1.0, 1.0], [1.0, 1.0]]),
    }
    # rays along +x at y=z=0.5 (through tile0 then tile1) or y=z=5 (miss)
    o = jnp.array([[-1.0] * 5, [0.5, 0.5, 0.5, 0.5, 5.0],
                   [0.5, 0.5, 0.5, 0.5, 5.0]])
    # lane1 hits both tiles; lane2 starts between them (tile1 only);
    # lane3 duplicates lane1 (stability pair); lane4 misses; lane0 dead
    o = o.at[0, 2].set(5.0)
    d = jnp.array([[1.0] * 5, [0.0] * 5, [0.0] * 5])
    alive = jnp.array([[0.0, 1.0, 1.0, 1.0, 1.0]])
    order, unsort = _resolve_sort_order(o, d, alive, kscene, 2)
    order = np.asarray(order)
    rank = {lane: i for i, lane in enumerate(order)}
    assert rank[0] == 4  # dead last
    assert rank[4] == 0  # no candidates first
    assert rank[1] + 1 == rank[3]  # equal masks stay adjacent, stable
    # mask(lane1)=0b11=3, mask(lane2)=0b10=2 -> lane2 before lane1
    assert list(order) == [4, 2, 1, 3, 0]
    assert list(np.asarray(unsort)[order]) == list(range(5))  # inverse
    # mode 1: alive partition only, original order retained within groups
    ord1, _ = _resolve_sort_order(o, d, alive, kscene, 1)
    assert list(np.asarray(ord1)) == [1, 2, 3, 4, 0]
    # counting modes reproduce the argsort modes' grouping semantics:
    # 3 == 1 (dead partition), 6 == 2 (LSB-first radix == ascending mask)
    ord3, uns3 = _resolve_sort_order(o, d, alive, kscene, 3)
    assert list(np.asarray(ord3)) == [1, 2, 3, 4, 0]
    assert list(np.asarray(uns3)[np.asarray(ord3)]) == list(range(5))
    ord6, uns6 = _resolve_sort_order(o, d, alive, kscene, 6)
    assert list(np.asarray(ord6)) == list(order)
    assert list(np.asarray(uns6)[np.asarray(ord6)]) == list(range(5))
    # mode 4: all alive lanes share the +x octant -> dead partition only
    ord4, _ = _resolve_sort_order(o, d, alive, kscene, 4)
    assert list(np.asarray(ord4)) == [1, 2, 3, 4, 0]
    # mode 5: nearest candidate tile (lanes 1,3 -> tile0; lane2 -> tile1;
    # lane4 no candidates; lane0 dead)
    ord5, _ = _resolve_sort_order(o, d, alive, kscene, 5)
    assert list(np.asarray(ord5)) == [1, 3, 2, 4, 0]


def test_freeze_pixel_order_partitions(synth_portal):
    """freeze_pixel_order: a bijection onto [0, npix) that puts every
    pixel whose primary ray crosses the heavy-mesh AABB strictly before
    every pixel whose ray misses it, raster order within each group."""
    from path_tracer_tpu.ops.pallas.trace_v2 import _SCENES
    from path_tracer_tpu.render.portal import freeze_pixel_order

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    order = freeze_pixel_order(pkey, cam_key)
    assert sorted(order.tolist()) == list(range(npix))
    # the synth plate fills the whole view — every primary crosses, so
    # the order degenerates to raster (covers the all-cross edge case)
    assert order.tolist() == list(range(npix))

    # non-trivial split: same camera, an AABB covering only part of the
    # view (registered under synthetic keys — freeze_pixel_order reads
    # consts[2] and the camera tuple only)
    from path_tracer_tpu.ops.pallas import trace_v2 as _tv2

    pkey2 = pkey + ":half-aabb"
    _tv2.register_scene(pkey2, (None, None,
                                ((-0.35, -0.1, -0.6), (0.0, 0.1, -0.4))))
    order = freeze_pixel_order(pkey2, cam_key)
    assert sorted(order.tolist()) == list(range(npix))
    # independent classification: numpy slab test on the exact primary rays
    _, _, (lo, hi) = _SCENES[pkey2]
    (sox, soy, soz), su, sv, lc, W, H = _SCENES[cam_key]
    pix = np.arange(npix)
    x = (pix % W).astype(np.float64)
    y = (H - 1) - (pix // W).astype(np.float64)
    sx = (x + 0.5) / W - 0.5
    sy = (y + 0.5) / H - 0.5
    so = (sox, soy, soz)
    sp = [so[k] + su[k] * sx + sv[k] * sy for k in range(3)]
    d = np.stack([lc[k] - sp[k] for k in range(3)])
    o = np.asarray(lc)[:, None]
    inv = 1.0 / np.where(np.abs(d) < 1e-30, 1e-30, d)
    ta = (np.asarray(lo)[:, None] - o) * inv
    tb = (np.asarray(hi)[:, None] - o) * inv
    crosses = (np.maximum(ta, tb).min(0) >= np.minimum(ta, tb).max(0)) \
        & (np.maximum(ta, tb).min(0) > 0)
    n_cross = int(crosses.sum())
    assert 0 < n_cross < npix  # the synth scene splits both ways
    assert set(order[:n_cross].tolist()) == set(pix[crosses].tolist())
    # raster order within each group (stable partition)
    assert list(order[:n_cross]) == sorted(order[:n_cross])
    assert list(order[n_cross:]) == sorted(order[n_cross:])


def test_morton_pixel_order_is_zcurve_permutation():
    """morton_pixel_order: a bijection onto [0, npix) whose consecutive
    slots tile the image as Z-curve squares (so RESOLVE_BLOCK-sized slot
    ranges cover compact pixel regions, not raster stripes)."""
    from path_tracer_tpu.render.portal import morton_pixel_order

    w, h = 36, 24
    order = morton_pixel_order(w, h)
    assert sorted(order.tolist()) == list(range(w * h))
    # the first 2x2 Z block: (0,0) (1,0) (0,1) (1,1)
    assert order[:4].tolist() == [0, 1, w, w + 1]
    # any aligned run of 64 slots spans a bounded pixel neighborhood
    xs, ys = order % w, order // w
    for s in range(0, w * h, 64):
        bx = xs[s:s + 64].max() - xs[s:s + 64].min()
        by = ys[s:s + 64].max() - ys[s:s + 64].min()
        assert bx <= 15 and by <= 15  # an 8x8 Z square pads to <= 16x16


def test_drive_pool_v2_morton_pix_order(synth_portal):
    """A Morton slot->pixel map: every pixel still retires exactly its
    quota (accounting is per-slot, so the remap must not disturb it) and
    the pix row stays a bijection the pass-end scatter-add can key on."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import (
        make_pool_v2, morton_pixel_order,
    )

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth = 2, 1
    order = morton_pixel_order(36, 24)

    with pltpu.force_tpu_interpret_mode():
        stages, rays = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1, pix_order=order),
            spp, 0, jnp.int32(7), kbufs,
            portal_key=pkey, cam_key=cam_key,
            max_depth=depth, rr_start_depth=5, check_every=1,
            ladder=(), adaptive_polls=False, step_cap=16,
        )
    (pool,) = stages
    pool = np.asarray(pool)
    assert np.all(pool[portal_mod.V2_ROW_DONE][:npix] == spp)
    pix = pool[portal_mod.V2_ROW_PIX][:npix].astype(np.int64)
    assert sorted(pix.tolist()) == list(range(npix))
    # padding slots keep a valid pixel id and zero radiance
    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    assert np.all(pool[A0:A1][:, npix:] == 0.0)
    acc = np.zeros((npix, 3))
    np.add.at(acc, pix, pool[A0:A1][:, :npix].T)
    assert np.isfinite(acc).all() and (acc >= 0).all() and acc.mean() > 0


def test_counting_positions_matches_argsort():
    """_counting_positions: destination positions equal a stable argsort's
    inverse permutation, for random keys across the full bucket range."""
    from path_tracer_tpu.render.portal import _counting_positions

    rs = np.random.RandomState(3)
    for n_buckets in (2, 9, 16):
        key = rs.randint(0, n_buckets, size=997).astype(np.int32)
        pos = np.asarray(_counting_positions(jnp.asarray(key), n_buckets))
        order = np.argsort(key, kind="stable")
        expect = np.empty_like(order)
        expect[order] = np.arange(len(key))
        np.testing.assert_array_equal(pos, expect)


@pytest.mark.parametrize("sort_mode", [5])
@pytest.mark.slow
def test_drive_pool_v2_sorted_resolve(synth_portal, sort_mode):
    """Sorted resolve blocks (mode 5 = counting permutation by nearest
    candidate tile; the argsort modes share the same gather/unsort
    integration path and their permutations are unit-tested above): the
    drive still retires every sample exactly once with finite positive
    radiance. Lane permutation changes each path's PRNG stream, so this
    checks the bookkeeping invariants, not bitwise equality with the
    unsorted path."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import make_pool_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth = 2, 1

    with pltpu.force_tpu_interpret_mode():
        stages, rays = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(7),
            kbufs, portal_key=pkey, cam_key=cam_key,
            max_depth=depth, rr_start_depth=5, check_every=1,
            ladder=(), adaptive_polls=False, step_cap=16,
            sort_lanes=sort_mode,
        )
    (pool,) = stages
    pool = np.asarray(pool)
    done = pool[portal_mod.V2_ROW_DONE][:npix]
    assert np.all(done == spp)
    assert float(np.asarray(rays)) >= npix * spp
    assert np.all(pool[portal_mod.buf_row(0, portal_mod.BUF_STATE)] == 0.0)
    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    acc = pool[A0:A1][:, :npix]
    assert np.isfinite(acc).all() and (acc >= 0).all() and acc.mean() > 0


def test_stall_limits_scale_with_narrow_cadence():
    """The stall/hard backstops must not misdiagnose a healthy narrow
    drive whose full-resolve period spans more than 20 polls."""
    from path_tracer_tpu.render.portal import _stall_limits

    s0, h0 = _stall_limits(64, 12, 4, 4, narrow=False)
    assert s0 == 20 and h0 == 256 + 4 * 64 * 16
    # narrow with full_every <= check_every: every poll spans a full
    # resolve, no scaling needed
    assert _stall_limits(64, 12, 4, 4, narrow=True) == (s0, h0)
    # full_every=128, check_every=4: 32 polls/full-resolve period — the
    # old fixed 20-poll limit would have raised before the next full
    s1, h1 = _stall_limits(64, 12, 4, 128, narrow=True)
    assert s1 == 20 * 32 and h1 == h0 * 32
    # big-quota passes (the portal pass cap): no slot retires until deep
    # into the bulk phase, so the patience scales with quota/64
    s2, h2 = _stall_limits(512, 12, 4, 4, narrow=False)
    assert s2 == 20 * 8 and h2 == 256 + 4 * 512 * 16


def _scatter_counts(pool_np, flush_np, npix, *, live):
    """Per-pixel retired-count reconstruction under the snapshot rule:
    raw done for the LIVE pool, done>=quota rows only for retired stages,
    plus the flush count-credit column."""
    pix = pool_np[portal_mod.V2_ROW_PIX].astype(np.int64)
    done = pool_np[portal_mod.V2_ROW_DONE]
    if not live:
        done = np.where(done >= pool_np[portal_mod.V2_ROW_QUOTA], done, 0.0)
    cnt = np.zeros(npix, np.float64)
    np.add.at(cnt, pix, done)
    if flush_np is not None:
        cnt += flush_np[:npix, 3]
    return cnt


def test_redistribute_samples_accounting():
    """redistribute_samples re-tasks finished slots onto laggards' upper
    sample ranges while preserving, bit-for-bit in aggregate: (a) the
    per-pixel union of sample ranges (exact partition at the split), (b)
    the banked radiance (donor acc moves to flush under its OLD pixel),
    and (c) the mid-pass per-pixel retired-count invariant that the
    progress-snapshot path normalizes by (+done at the old pixel, -split
    phantom at the new one). Exercised twice (chained adoption) to cover
    donors whose own done already contains a phantom prefix."""
    from path_tracer_tpu.render import portal as rportal

    park_k = 1
    rows = portal_mod.pool_rows(park_k)
    C, npix, quota = 64, 64, 40.0
    g = np.random.default_rng(3)
    pool = np.zeros((rows, C), np.float32)
    pool[portal_mod.V2_ROW_PIX] = np.arange(C)
    pool[portal_mod.V2_ROW_QUOTA] = quota
    # slots 0..15 finished donors (dead, empty park buffers, acc pending)
    # slots 16..23 laggards with lots of unissued quota
    # the rest mid-flight (alive, nearly-issued: rem < 2*min_rem so they
    # are NOT laggards) — must be untouched
    done = np.full(C, 20.0, np.float32)
    alive = np.ones(C, np.float32)
    done[:16] = quota
    alive[:16] = 0.0
    started = np.full(C, quota - 2.0, np.float32)
    started[:16] = quota
    started[16:24] = 8.0
    done[16:24] = 6.0
    pool[portal_mod.V2_ROW_DONE] = done
    pool[portal_mod.V3_ROW_STARTED] = started
    pool[portal_mod.ROW_ALIVE] = alive
    acc = g.uniform(size=(3, C)).astype(np.float32)
    pool[portal_mod.ROW_ACC:portal_mod.ROW_ACC + 3] = acc

    cnt0 = _scatter_counts(pool, None, npix, live=True)
    rad0 = np.zeros((npix, 3))
    np.add.at(rad0, pool[portal_mod.V2_ROW_PIX].astype(np.int64),
              acc.T.astype(np.float64))

    flush = jnp.zeros((C, 4), jnp.float32)
    pool1, flush1, n_pairs = rportal.redistribute_samples(
        jnp.asarray(pool), flush, 4, park_k=park_k)
    pool1, flush1 = np.asarray(pool1), np.asarray(flush1)
    assert int(n_pairs) == 8  # 16 donors, 8 laggards -> 8 pairs

    # (a) exact range partition: donor_j covers [split_j, 40) of laggard_j
    split = quota - np.floor((quota - 8.0) * 0.5)
    for j in range(8):
        d, l = j, 16 + j  # rank-k greedy in slot order
        assert pool1[portal_mod.V2_ROW_PIX, d] == l
        assert pool1[portal_mod.V2_ROW_QUOTA, d] == quota
        assert pool1[portal_mod.V2_ROW_DONE, d] == split
        assert pool1[portal_mod.V3_ROW_STARTED, d] == split
        assert pool1[portal_mod.V2_ROW_QUOTA, l] == split
        assert pool1[portal_mod.V2_ROW_DONE, l] == 6.0
    # non-paired donors and mid-flight slots untouched
    np.testing.assert_array_equal(pool1[:, 8:16], pool[:, 8:16])
    np.testing.assert_array_equal(pool1[:, 24:], pool[:, 24:])

    # (b) donor acc banked under the OLD pixel, zeroed in the pool
    A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
    np.testing.assert_array_equal(pool1[A0:A1, :8], 0.0)
    np.testing.assert_allclose(flush1[:8, :3], acc.T[:8], rtol=1e-6)
    rad1 = np.zeros((npix, 3))
    np.add.at(rad1, pool1[portal_mod.V2_ROW_PIX].astype(np.int64),
              pool1[A0:A1].T.astype(np.float64))
    np.testing.assert_allclose(rad1 + flush1[:npix, :3], rad0, rtol=1e-5)

    # (c) per-pixel retired counts invariant under re-tasking
    np.testing.assert_array_equal(
        _scatter_counts(pool1, flush1, npix, live=True), cnt0)

    # chained adoption: the 8 paired donors "finish" their adopted quota
    # and immediately re-donate; counts must STILL reconstruct (their done
    # now contains a phantom prefix of `split`)
    pool2 = pool1.copy()
    pool2[portal_mod.V2_ROW_DONE, :8] = quota
    pool2[portal_mod.V3_ROW_STARTED, :8] = quota
    pool2[A0:A1, :8] = 1.0
    cnt_truth = _scatter_counts(pool2, flush1, npix, live=True)
    pool3, flush3, n2 = rportal.redistribute_samples(
        jnp.asarray(pool2), jnp.asarray(flush1), 4, park_k=park_k)
    pool3, flush3 = np.asarray(pool3), np.asarray(flush3)
    assert int(n2) == 8  # laggards still have 34-6 >= 8 samples left
    np.testing.assert_array_equal(
        _scatter_counts(pool3, flush3, npix, live=True), cnt_truth)

    # the aggregate radiance also still reconstructs (the chained donors'
    # 1.0-acc was earned while they worked pixels 16..23)
    rad_truth = rad0.copy()
    rad_truth[16:24] += 1.0
    rad3 = np.zeros((npix, 3))
    np.add.at(rad3, pool3[portal_mod.V2_ROW_PIX].astype(np.int64),
              pool3[A0:A1].T.astype(np.float64))
    np.testing.assert_allclose(rad3 + flush3[:npix, :3], rad_truth,
                               rtol=1e-5)


def test_drive_pool_v2_snapshot_hook(synth_portal):
    """A hook that declares `snapshot` receives a callable computing the
    mid-pass partial image; at the final poll (unfin == 0) the snapshot's
    counts equal the full quota for every pixel and its radiance equals
    the pass's exact framebuffer merge — and the hook itself must not
    perturb the drive (bitwise-equal stages vs an unhooked run)."""
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.portal import make_pool_v2

    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    spp, depth = 2, 1
    snaps = []

    def hook(cycle, w, unfin, *, snapshot=None):
        assert snapshot is not None
        snaps.append((unfin, snapshot()))
        return False

    kw = dict(portal_key=pkey, cam_key=cam_key, max_depth=depth,
              rr_start_depth=5, check_every=1, ladder=(),
              adaptive_polls=False, step_cap=16, park_k=1)
    with pltpu.force_tpu_interpret_mode():
        stages, rays = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(5),
            kbufs, on_check=hook, **kw)
        stages_ref, rays_ref = rportal.drive_pool_v2(
            make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(5),
            kbufs, **kw)
    assert snaps
    for st, st_ref in zip(stages, stages_ref):
        np.testing.assert_array_equal(np.asarray(st), np.asarray(st_ref))
    assert float(rays) == float(rays_ref)

    unfin_last, (rad, cnt) = snaps[-1]
    assert unfin_last == 0
    cnt = np.asarray(cnt)[:npix]
    np.testing.assert_array_equal(cnt, float(spp))
    accum = np.zeros((n_pad, 3), np.float64)
    for st in stages:
        st = np.asarray(st)
        np.add.at(accum, st[portal_mod.V2_ROW_PIX].astype(np.int64),
                  st[portal_mod.ROW_ACC:portal_mod.ROW_ACC + 3]
                  .T.astype(np.float64))
    np.testing.assert_allclose(np.asarray(rad)[:npix], accum[:npix],
                               rtol=1e-6)


@pytest.mark.slow
def test_pipeline_portal_cancel_keeps_samples(synth_portal, monkeypatch):
    """Full pipeline: a mid-pass portal cancel produces a partial image
    normalized by EXACT per-pixel retired counts (freeze-and-drain — no
    started sample is discarded), with the reference's clamp semantics."""
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    monkeypatch.setenv("PT_TPU_CHECK_EVERY", "1")
    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    scene = _synthetic_portal_scene()
    cfg = RenderConfig(samples_per_pixel=4,
                       resolution=Resolution.from_height(24), max_depth=1)
    calls = {"n": 0}

    def cancel():
        calls["n"] += 1
        return calls["n"] > 1  # False at the pre-pass check, then cancel

    with pltpu.force_tpu_interpret_mode():
        done = pt.render(
            scene, cfg, device_buffers={"kernel": kbufs},
            device_mode=f"{pkey}@36x24", cancel=cancel,
            out_dir=None, verbose=False,
        )
    assert done.cancelled
    px = done.image.pixels
    assert px.shape == (npix, 3)
    assert np.isfinite(px).all()
    assert 0.0 <= px.min() and px.max() <= 1.0
    assert px.max() > 0.0  # retained radiance, not a discarded pass
    assert done.stats.num_rays > 0


@pytest.mark.slow
def test_pipeline_portal_mid_pass_checkpoint_resume(synth_portal, tmp_path,
                                                    monkeypatch):
    """Full pipeline: PT_TPU_CKPT_SECS=0 checkpoints at the first poll
    (freeze-and-drain, npz carries the per-slot remaining sample ranges);
    a cancelled run leaves the file; the resumed run completes EXACTLY the
    remaining samples (depth-1 ray conservation against the npz rows)."""
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    monkeypatch.setenv("PT_TPU_CHECK_EVERY", "1")
    monkeypatch.setenv("PT_TPU_CKPT_SECS", "0")
    pkey, cam_key, kbufs, npix, n_pad = synth_portal
    scene = _synthetic_portal_scene()
    # spp 32 at step_cap 1: the post-checkpoint continuation provably
    # cannot finish before its first poll, so the cancel lands mid-pass
    spp = 32
    cfg = RenderConfig(samples_per_pixel=spp,
                       resolution=Resolution.from_height(24), max_depth=1)
    import os

    ck = str(tmp_path / "mid.npz")

    def cancel():  # cancel as soon as a checkpoint has been written
        return os.path.exists(ck)

    with pltpu.force_tpu_interpret_mode():
        done1 = pt.render(
            scene, cfg, device_buffers={"kernel": kbufs},
            device_mode=f"{pkey}@36x24", cancel=cancel,
            checkpoint_path=ck, checkpoint_every=1,
            out_dir=None, verbose=False,
        )
    assert done1.cancelled and os.path.exists(ck)
    saved = np.load(ck)
    assert int(saved["mid_pass"]) == 1
    rem = int((saved["slot_quota"] - saved["slot_done"]).sum())
    assert 0 < rem < npix * spp  # the checkpoint landed mid-pass

    with pltpu.force_tpu_interpret_mode():
        done2 = pt.render(
            scene, cfg, device_buffers={"kernel": kbufs},
            device_mode=f"{pkey}@36x24",
            checkpoint_path=ck, checkpoint_every=1,
            out_dir=None, verbose=False,
        )
    assert not done2.cancelled
    assert not os.path.exists(ck)  # consumed on success
    # exact conservation: the resume traced exactly the remaining samples
    assert done2.stats.num_rays == rem
    px = done2.image.pixels
    assert np.isfinite(px).all() and px.max() > 0.0
