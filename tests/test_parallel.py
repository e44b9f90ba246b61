"""Multi-device rendering on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

import path_tracer_tpu as pt
from path_tracer_tpu.parallel.mesh import make_mesh, render_sharded
from path_tracer_tpu.utils.config import RenderConfig, Resolution


needs_8 = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _cfg(**kw):
    return RenderConfig(
        samples_per_pixel=8, resolution=Resolution(24, 36), samples_per_pass=4, **kw
    )


@needs_8
def test_mesh_shapes():
    mesh = make_mesh(8, sample_parallel=2)
    assert mesh.shape == {"dp": 4, "sp": 2}
    assert make_mesh(8).shape == {"dp": 8, "sp": 1}
    with pytest.raises(ValueError):
        make_mesh(8, sample_parallel=3)


@needs_8
@pytest.mark.parametrize("sp", [1, 2, 4])
def test_sharded_render_runs(all_scenes, sp):
    done = render_sharded(
        all_scenes["cornell"], _cfg(seed=2), num_devices=8, sample_parallel=sp,
        out_dir=None, verbose=False,
    )
    px = done.image.pixels
    assert px.shape == (24 * 36, 3)
    assert np.isfinite(px).all()
    assert 0.0 <= px.min() and px.max() <= 1.0
    assert px.max() > 0.1
    assert done.stats.num_rays > 0


@needs_8
def test_sharded_deterministic():
    scene = pt.builtin_scenes("meshes")[2]  # two-spheres
    a = render_sharded(scene, _cfg(seed=7), num_devices=8, sample_parallel=2,
                       out_dir=None, verbose=False)
    b = render_sharded(scene, _cfg(seed=7), num_devices=8, sample_parallel=2,
                       out_dir=None, verbose=False)
    np.testing.assert_array_equal(a.image.pixels, b.image.pixels)


@needs_8
def test_sharded_statistically_matches_single_device(all_scenes):
    """Same scene, high spp: sharded and single-device means must agree
    (different RNG streams — statistical, not bitwise)."""
    scene = all_scenes["two-spheres"]
    cfg = RenderConfig(
        samples_per_pixel=64, resolution=Resolution(16, 24), samples_per_pass=16
    )
    a = render_sharded(scene, cfg, num_devices=8, sample_parallel=2,
                       out_dir=None, verbose=False)
    b = pt.render(scene, cfg, out_dir=None, verbose=False)
    # the emissive sphere region is high-signal; compare mean brightness
    assert abs(a.image.pixels.mean() - b.image.pixels.mean()) < 0.02


@needs_8
def test_sharded_exact_spp_ragged(all_scenes):
    """Any spp is honored EXACTLY under sharding (parity: main.rs:157-170)
    — no rounding to whole passes. spp=30 with k=8 across sp=2 runs passes
    (8,8,8,6): the ragged tail rides the same compiled program as a runtime
    limit, masked per-shard. A masking bug (dropped or double-counted tail
    samples) shifts brightness by >=2/30 = 6.7%, well above the 2%
    statistical threshold vs the single-device render."""
    scene = all_scenes["two-spheres"]
    cfg = RenderConfig(
        samples_per_pixel=30, resolution=Resolution(16, 24),
        samples_per_pass=8,
    )
    a = render_sharded(scene, cfg, num_devices=8, sample_parallel=2,
                       out_dir=None, verbose=False)
    assert a.stats.num_samples == 30 * 16 * 24  # exact accounting
    b = pt.render(scene, cfg, out_dir=None, verbose=False)
    assert abs(a.image.pixels.mean() - b.image.pixels.mean()) < 0.02
    # deterministic under the ragged schedule too
    c = render_sharded(scene, cfg, num_devices=8, sample_parallel=2,
                       out_dir=None, verbose=False)
    np.testing.assert_array_equal(a.image.pixels, c.image.pixels)


@needs_8
def test_sharded_regen_exact_spp_ragged(all_scenes):
    """Regen kernels under sharding honor ragged spp via runtime per-shard
    quotas (limit//sp split): spp=7 across sp=2 gives shard quotas (4,3)
    then (0,0)... all inside one compiled kernel. Structure-level checks
    (interpreter PRNG stub is deterministic, not uniform)."""
    from jax.experimental.pallas import tpu as pltpu

    scene = all_scenes["cornell"]
    cfg = RenderConfig(
        samples_per_pixel=7, resolution=Resolution(16, 24), backend="pallas"
    )
    with pltpu.force_tpu_interpret_mode():
        a = render_sharded(scene, cfg, num_devices=4, sample_parallel=2,
                           out_dir=None, verbose=False)
        b = render_sharded(scene, cfg, num_devices=4, sample_parallel=2,
                           out_dir=None, verbose=False)
    px = a.image.pixels
    assert a.stats.num_samples == 7 * 16 * 24
    assert np.isfinite(px).all() and px.max() > 0.1
    np.testing.assert_array_equal(px, b.image.pixels)


@needs_8
@pytest.mark.parametrize("sp", [1, 2])
def test_sharded_regen_kernel(all_scenes, sp):
    """backend='pallas' routes the sharded pass through the regenerative
    kernel (dp shards own pixel tiles, sp shards split the quota). The
    interpreter's PRNG stub is deterministic, not uniform, so this checks
    structure (shape, finiteness, ray accounting, determinism) — the
    statistical match against the XLA backend is validated on real TPU
    hardware (see PARITY_REPORT.md)."""
    from jax.experimental.pallas import tpu as pltpu

    scene = all_scenes["cornell"]
    cfg = RenderConfig(
        samples_per_pixel=16, resolution=Resolution(16, 24), backend="pallas"
    )
    with pltpu.force_tpu_interpret_mode():
        a = render_sharded(scene, cfg, num_devices=4, sample_parallel=sp,
                           out_dir=None, verbose=False)
        b = render_sharded(scene, cfg, num_devices=4, sample_parallel=sp,
                           out_dir=None, verbose=False)
    px = a.image.pixels
    assert px.shape == (16 * 24, 3)
    assert np.isfinite(px).all() and px.max() > 0.1
    # every sample traces >=1 ray and <=max_depth rays; the count includes
    # block-padding lanes (each tile pads to a 2048-lane block — negligible
    # at real resolutions, 10-20x here at 384 pixels)
    n_samples = 16 * 24 * cfg.samples_per_pixel
    dp = 4 // sp
    padded_samples = dp * 2048 * (cfg.samples_per_pixel // sp) * sp
    assert n_samples <= a.stats.num_rays <= padded_samples * cfg.max_depth
    np.testing.assert_array_equal(px, b.image.pixels)
