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


def test_kernel_scene_buffers_shapes(all_scenes):
    packed = pt.pack_scene(all_scenes["mesh"])
    ks = tk.kernel_scene_buffers(packed)
    T = packed.tri_v.shape[0]
    assert ks["tri_n"].shape == (3, T)
    assert ks["gate"].shape[1] == T
    # gate rows sum to each mesh's triangle count
    assert float(ks["gate"].sum()) == packed.num_triangles
