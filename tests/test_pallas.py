"""Pallas megakernel vs the XLA integrator — same-uniform lane-exact parity.

Runs in TPU-interpret mode so CI needs no TPU. The hardware-PRNG path can
only run on a real chip; these tests inject precomputed uniforms (the same
threefry draws the XLA integrator consumes), making every lane comparable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import path_tracer_tpu as pt
import path_tracer_tpu.ops.pallas.trace_kernel as tk
from path_tracer_tpu.ops import rng as prng
from path_tracer_tpu.render.integrator import trace
from path_tracer_tpu.render.pipeline import prepare_scene


def _run_both(scene, n=1024, seed=7, max_depth=12):
    packed = pt.pack_scene(scene)
    kscene = tk.kernel_scene_buffers(packed)
    bufs = prepare_scene(scene)
    g = np.random.default_rng(0)
    o = np.tile(np.array([0.0, -0.2, 7.0], np.float32), (n, 1))
    d = g.normal(0, 1, (n, 3))
    d = (d / np.linalg.norm(d, axis=1, keepdims=True)).astype(np.float32)
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    key = jax.random.PRNGKey(seed)
    U = jnp.stack([prng.bounce_uniforms(key, s, (n,), 4) for s in range(max_depth)])
    u_kernel = U.transpose(0, 2, 1).reshape(max_depth * 4, n)

    with pltpu.force_tpu_interpret_mode():
        rad, rays = tk.trace_pallas.__wrapped__(
            o_j, d_j, kscene, seed, block=512, uniforms=u_kernel,
            max_depth=max_depth,
        )
    res = trace(o_j, d_j, bufs, key, max_depth=max_depth)
    return np.asarray(rad), float(rays), np.asarray(res.radiance), float(
        res.rays_traced
    )


@pytest.mark.parametrize("sid", ["cornell", "mesh", "two-spheres"])
def test_kernel_matches_integrator_lanewise(all_scenes, sid):
    pr, prays, xr, xrays = _run_both(all_scenes[sid])
    assert prays == xrays
    frac_equal = (np.abs(pr - xr).sum(axis=1) < 1e-3).mean()
    assert frac_equal > 0.995, frac_equal
    np.testing.assert_allclose(pr.mean(0), xr.mean(0), rtol=1e-3, atol=1e-3)


def test_kernel_max_depth(all_scenes):
    pr, prays, xr, xrays = _run_both(all_scenes["cornell"], n=512, max_depth=4)
    assert prays == xrays
    assert (np.abs(pr - xr).sum(axis=1) < 1e-3).mean() > 0.995


def test_kernel_stepped_equals_megakernel(all_scenes):
    """steps_per_call < max_depth must produce identical results (the state
    round-trips HBM between calls but the math is the same)."""
    scene = all_scenes["cornell"]
    packed = pt.pack_scene(scene)
    kscene = tk.kernel_scene_buffers(packed)
    n = 512
    g = np.random.default_rng(3)
    o = jnp.asarray(np.tile(np.array([0.0, -0.2, 7.0], np.float32), (n, 1)))
    d = g.normal(0, 1, (n, 3))
    d = jnp.asarray((d / np.linalg.norm(d, axis=1, keepdims=True)), jnp.float32)
    key = jax.random.PRNGKey(11)
    U = jnp.stack([prng.bounce_uniforms(key, s, (n,), 4) for s in range(12)])
    u_kernel = U.transpose(0, 2, 1).reshape(48, n)
    with pltpu.force_tpu_interpret_mode():
        r12, c12 = tk.trace_pallas.__wrapped__(
            o, d, kscene, 0, block=512, uniforms=u_kernel, steps_per_call=12
        )
        r3, c3 = tk.trace_pallas.__wrapped__(
            o, d, kscene, 0, block=512, uniforms=u_kernel, steps_per_call=3
        )
    np.testing.assert_array_equal(np.asarray(r12), np.asarray(r3))
    assert float(c12) == float(c3)


@pytest.mark.parametrize(
    "sid", [pytest.param("mesh", marks=pytest.mark.slow), "cornell"]
)
def test_sorted_trace_is_a_permutation(all_scenes, sid):
    """trace_pallas_sorted re-sorts the wavefront between bounces; with
    injected uniforms (which ride the permutation) every per-ray estimate
    must be bitwise identical to the unsorted kernel's, in caller order."""
    scene = all_scenes[sid]
    packed = pt.pack_scene(scene)
    kscene = tk.kernel_scene_buffers(packed)
    n, max_depth = 1024, 6
    g = np.random.default_rng(5)
    o = jnp.asarray(np.tile(np.array([0.0, -0.2, 7.0], np.float32), (n, 1)))
    d = g.normal(0, 1, (n, 3))
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True), jnp.float32)
    key = jax.random.PRNGKey(2)
    U = jnp.stack(
        [prng.bounce_uniforms(key, s, (n,), 4) for s in range(max_depth)]
    )
    u_kernel = U.transpose(0, 2, 1).reshape(max_depth * 4, n)
    with pltpu.force_tpu_interpret_mode():
        r0, c0 = tk.trace_pallas.__wrapped__(
            o, d, kscene, 0, block=256, uniforms=u_kernel,
            max_depth=max_depth, steps_per_call=1,
        )
        rs, cs = tk.trace_pallas_sorted.__wrapped__(
            o, d, kscene, 0, block=256, uniforms=u_kernel,
            max_depth=max_depth, sort_every=1,
        )
        rs2, cs2 = tk.trace_pallas_sorted.__wrapped__(
            o, d, kscene, 0, block=256, uniforms=u_kernel,
            max_depth=max_depth, sort_every=2, dir_major=True,
        )
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(rs))
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(rs2))
    assert float(c0) == float(cs) == float(cs2)


def test_kernel_scene_buffers_shapes(all_scenes):
    packed = pt.pack_scene(all_scenes["mesh"])
    ks = tk.kernel_scene_buffers(packed)
    # all built-in meshes are contained in their (buggy) bounding spheres,
    # so the pre-test is a no-op and gets dropped from the kernel tables
    assert "gate" not in ks
    # 824 triangles > TILE_THRESHOLD → Morton culling tiles + a base set of
    # oversized (wall) triangles; T = base_pad + C*TRI_TILE
    assert "tile_lo" in ks
    C = ks["tile_lo"].shape[1]
    T = ks["tri_n"].shape[1]
    base = T - C * tk.TRI_TILE
    assert C >= 1 and base >= 8
    # cornell (14 tris) stays untiled
    ks2 = tk.kernel_scene_buffers(pt.pack_scene(all_scenes["cornell"]))
    assert "tile_lo" not in ks2


def test_pretest_kept_when_sphere_does_not_contain_mesh():
    """A mesh whose buggy bounding sphere misses part of it must keep the
    pre-test (it genuinely gates hits — reference parity), and rays hitting
    the uncovered part must report a miss."""
    from path_tracer_tpu.models.geometry import Mesh
    from path_tracer_tpu.models.material import Material, ReflectType
    from path_tracer_tpu.models.scene import SceneDescriptor, SceneObject

    # bounds min=(4,-10,0), max=(10,2,0): buggy center = min + max*0.5 =
    # (9,-9,0), radius = max(|min-c|, |max-c|) = 11.05 — but the mixed
    # corner (4, 2, 0) sits at distance 12.08: outside the sphere.
    tris = np.array(
        [
            [[4, -10, 0], [10, -10, 0], [4, 2, 0]],
            [[10, -10, 0], [10, 2, 0], [4, 2, 0]],
        ],
        np.float32,
    )
    mesh = Mesh.from_triangles(tris)
    c = mesh.bounding_sphere_center
    r = mesh.bounding_sphere_radius
    corner = np.array([4, 2, 0], np.float32)
    assert np.linalg.norm(corner - c) > r  # the bug leaves this corner out

    scene = SceneDescriptor(
        id="t",
        objects=[
            SceneObject.from_mesh(
                np.zeros(3, np.float32), mesh,
                Material(np.ones(3), np.zeros(3), ReflectType.DIFFUSE),
            )
        ],
    )
    packed = pt.pack_scene(scene)
    ks = tk.kernel_scene_buffers(packed)
    assert "gate" in ks  # pre-test retained

    # a ray at the uncovered corner: triangles would hit, pre-test says miss
    from path_tracer_tpu.ops.intersect import intersect_scene
    from path_tracer_tpu.render.pipeline import prepare_scene

    bufs = prepare_scene(scene)
    # two rays toward the quad: one at the uncovered corner (pre-test culls
    # the real triangle hit), one near the center (normal hit)
    o = jnp.asarray([[4.2, 1.5, 5.0], [7.0, -4.0, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    hit = intersect_scene(o, d, bufs, mode="exact")
    assert not bool(hit.found[0])  # culled by the (buggy) pre-test
    assert bool(hit.found[1])


@pytest.mark.slow
def test_regen_kernels_agree(all_scenes):
    """The two regenerative loops (static-scene v3 and prim-major) implement
    the same sampling semantics; under the interpreter's deterministic PRNG
    stub they must produce identical per-pixel radiance."""
    import path_tracer_tpu.ops.pallas.trace_v2 as tv2

    scene = all_scenes["cornell"]
    packed = pt.pack_scene(scene)
    W, H = 64, 32
    n = W * H  # 2048 = 2 blocks of 1024
    consts = tv2.build_scene_consts(packed)
    tv2.register_scene("regen-test", consts)
    cam_consts = tv2.build_camera_consts(scene.camera, W, H)
    tv2.register_scene("cam-regen-test", cam_consts)
    kscene = tk.kernel_scene_buffers(packed)
    pix = jnp.arange(n, dtype=jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        # quota_cap=quota keeps the interpreter's loop bound tight; the
        # runtime-quota path (cap > quota) is covered by
        # test_regen_runtime_quota below
        r3, c3 = tv2.trace_pallas_regen.__wrapped__(
            pix, "regen-test", "cam-regen-test", 3, 0, quota=2, max_depth=4,
            block=1024, quota_cap=2,
        )
        rp, cp = tk.trace_pallas_regen_prim.__wrapped__(
            pix, kscene, cam_consts, 3, 0, quota=2, max_depth=4, block=1024,
            quota_cap=2,
        )
    a, b = np.asarray(r3), np.asarray(rp)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    frac = (np.abs(a - b).sum(axis=1) < 1e-3).mean()
    assert frac > 0.999, frac
    np.testing.assert_allclose(float(c3), float(cp), rtol=1e-6)


@pytest.mark.slow
def test_regen_runtime_quota(all_scenes):
    """quota is a runtime scalar under a larger static quota_cap: the
    result must be identical to compiling with quota_cap == quota (the
    early-exit cond makes the unused loop tail a no-op), and per-pixel
    sample counts must stay exact."""
    import path_tracer_tpu.ops.pallas.trace_v2 as tv2

    scene = all_scenes["cornell"]
    packed = pt.pack_scene(scene)
    W, H = 64, 16
    n = W * H
    consts = tv2.build_scene_consts(packed)
    tv2.register_scene("rtq-test", consts)
    cam_consts = tv2.build_camera_consts(scene.camera, W, H)
    tv2.register_scene("cam-rtq-test", cam_consts)
    pix = jnp.arange(n, dtype=jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        tight, c_tight = tv2.trace_pallas_regen.__wrapped__(
            pix, "rtq-test", "cam-rtq-test", 3, 0, quota=2, max_depth=4,
            block=1024, quota_cap=2,
        )
        capped, c_capped = tv2.trace_pallas_regen.__wrapped__(
            pix, "rtq-test", "cam-rtq-test", 3, jnp.int32(0),
            quota=jnp.int32(2), max_depth=4, block=1024, quota_cap=5,
        )
    np.testing.assert_array_equal(np.asarray(tight), np.asarray(capped))
    np.testing.assert_array_equal(np.asarray(c_tight), np.asarray(c_capped))

    # prim-major twin
    kscene = tk.kernel_scene_buffers(packed)
    with pltpu.force_tpu_interpret_mode():
        pt_t, pc_t = tk.trace_pallas_regen_prim.__wrapped__(
            pix, kscene, cam_consts, 3, 0, quota=2, max_depth=4, block=1024,
            quota_cap=2,
        )
        pt_c, pc_c = tk.trace_pallas_regen_prim.__wrapped__(
            pix, kscene, cam_consts, 3, 0, quota=jnp.int32(2), max_depth=4,
            block=1024, quota_cap=5,
        )
    np.testing.assert_array_equal(np.asarray(pt_t), np.asarray(pt_c))
    np.testing.assert_array_equal(np.asarray(pc_t), np.asarray(pc_c))


def test_quad_detector_rejects_non_parallelograms():
    """Coplanar same-material pairs that do NOT form an exact parallelogram
    (trapezoids, mismatched materials) must stay triangles; a translated
    parallelogram must collapse — and either way the kernel stays lane-exact
    vs the XLA integrator."""
    from path_tracer_tpu.models.geometry import Mesh
    from path_tracer_tpu.models.material import Material, ReflectType
    from path_tracer_tpu.models.scene import SceneDescriptor, SceneObject

    def scene_of(tris, pos=(0.0, 0.0, 0.0)):
        mesh = Mesh.from_triangles(np.asarray(tris, np.float32))
        return SceneDescriptor(
            id="t",
            objects=[
                SceneObject.from_mesh(
                    np.asarray(pos, np.float32), mesh,
                    Material(np.full(3, 0.8, np.float32), np.zeros(3),
                             ReflectType.DIFFUSE),
                )
            ],
        )

    # trapezoid: second unique vertex != p1 + p2 - p0
    trap = [
        [[-1, -1, 0], [-1, 1, 0], [1, -1, 0]],
        [[1, -1, 0], [-1, 1, 0], [0.5, 1, 0]],
    ]
    q, cov = tk.detect_quad_pairs(pt.pack_scene(scene_of(trap)))
    assert not q and not cov

    # translated, non-axis-aligned parallelogram: must collapse
    a = np.array([0.3, -0.2, 0.1])
    e1 = np.array([1.0, 0.25, 0.0])
    e2 = np.array([-0.125, 1.0, 0.5])
    par = [
        [a, a + e1, a + e2],
        [(a + e1), (a + e1 + e2), (a + e2)],
    ]
    packed = pt.pack_scene(scene_of(par, pos=(0.5, 0.25, -3.0)))
    q, cov = tk.detect_quad_pairs(packed)
    assert len(q) == 1 and len(cov) == 2

    # lane-exact: kernel (quad) vs XLA integrator (triangles)
    scene = scene_of(par, pos=(0.5, 0.25, -3.0))
    pr, prays, xr, xrays = _run_both(scene, n=512, max_depth=4)
    assert prays == xrays
    assert (np.abs(pr - xr).sum(axis=1) < 1e-3).mean() > 0.995
