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
def test_sharded_device_fns_are_cached():
    """jit identity IS a cache key on hardware: building a sharded runner
    (or pass) twice must return the SAME jitted callables, or every
    render re-traces and re-loads every compiled program — the 8.7x
    sharded-portal slowdown of 2026-08-21 (PERF.md). Guards the lru_cache
    on parallel.portal._device_fns and parallel.mesh.make_sharded_pass."""
    from path_tracer_tpu.parallel.mesh import make_sharded_pass
    from path_tracer_tpu.parallel.portal import _device_fns

    mesh = make_mesh(2, sample_parallel=1)
    a = _device_fns(mesh, "portal:idcheck", "portal:idcheck:cam:4x4",
                    16, 12, 5, 3)
    b = _device_fns(mesh, "portal:idcheck", "portal:idcheck:cam:4x4",
                    16, 12, 5, 3)
    assert a is b
    assert a.cycle is b.cycle and a.compact is b.compact
    # a different mesh topology must NOT share programs
    c = _device_fns(make_mesh(2, sample_parallel=2), "portal:idcheck",
                    "portal:idcheck:cam:4x4", 16, 12, 5, 3)
    assert c is not a

    p1 = make_sharded_pass(mesh, width=24, height=16, k_full=4, mode="fast")
    p2 = make_sharded_pass(mesh, width=24, height=16, k_full=4, mode="fast")
    assert p1 is p2
    assert make_sharded_pass(mesh, width=24, height=16, k_full=8,
                             mode="fast") is not p1


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
@pytest.mark.slow
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
def test_sharded_pass_rejects_unknown_mode():
    """An unrecognized mode must FAIL LOUDLY instead of silently dispatching
    the exact-arithmetic oracle path (a ~100x slowdown / pod-scale OOM in
    round 2 — VERDICT item). Portal scenes route through
    parallel.portal.make_sharded_portal_runner, never through here."""
    from path_tracer_tpu.parallel.mesh import make_sharded_pass

    mesh = make_mesh(8, sample_parallel=2)
    with pytest.raises(ValueError, match="cannot shard"):
        make_sharded_pass(
            mesh, width=24, height=16, k_full=4,
            mode="portal:deadbeef@24x16",
        )


@needs_8
def test_sharded_portal_routing(all_scenes, monkeypatch):
    """render_sharded on the triangle-heavy `mesh` scene must route to the
    sharded portal path (parallel.portal) — the scene family that silently
    fell back to the exact XLA path in round 2. Routing only (no compute):
    the portal execution itself is covered on a 2-device mesh below (the
    Pallas TPU interpreter's cross-device barrier deadlocks with >= 4
    concurrent devices on a 1-CPU host — see CLAUDE.md)."""
    from path_tracer_tpu.parallel import mesh as pmesh
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode

    scene = all_scenes["mesh"]
    res = Resolution(16, 24)
    _, mode = prepare_scene_and_mode(scene, "pallas", res)
    assert mode.startswith("portal:")  # the scene really is portal-routed

    seen = {}

    def fake(scene_, config_, *, mesh, mode, **kw):
        seen["mode"] = mode
        seen["shape"] = dict(mesh.shape)
        return "SENTINEL"

    monkeypatch.setattr(pmesh, "_render_sharded_portal", fake)
    cfg = RenderConfig(samples_per_pixel=3, resolution=res,
                       backend="pallas", max_depth=1)
    out = render_sharded(scene, cfg, num_devices=8, sample_parallel=2,
                         out_dir=None, verbose=False)
    assert out == "SENTINEL"
    assert seen["mode"].startswith("portal:")
    assert seen["shape"] == {"dp": 4, "sp": 2}


@needs_8
@pytest.mark.slow
@pytest.mark.parametrize("dp,sp", [(2, 1), (1, 2)])
def test_sharded_portal_execution(dp, sp, monkeypatch):
    """The sharded portal pool end-to-end on a 2-device mesh (one v2 pool
    per device: dp shards own pixel tiles, sp shards split each pixel's
    quota). max_depth=1 makes ray accounting EXACT: every one of npix*spp
    samples traces exactly one segment, wherever (cheap kernel or
    resolver, either device) it ran — the count proves no sample was
    lost, duplicated, or re-routed — and two runs are bitwise equal.
    spp=3 with sp=2 exercises the RAGGED runtime quota split (2, 1).
    Reference parity target: every scene parallelizes (mod.rs:1020-1023).
    2 devices, not 8: the Pallas TPU interpreter's cross-device barrier
    deadlocks with >= 4 concurrent devices on a 1-CPU host (jax bug;
    hardware meshes are unaffected — dryrun_multichip covers 8-device
    GSPMD compilation on the non-portal path)."""
    from jax.experimental.pallas import tpu as pltpu

    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.ops.pallas import trace_v2
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        TILE_META, kernel_scene_buffers,
    )
    from path_tracer_tpu.parallel.mesh import (
        _render_sharded_portal, make_mesh,
    )
    from tests.test_portal import _synthetic_portal_scene

    monkeypatch.setattr(portal_mod, "PARK_K", 1)  # 3x cheaper interpret
    scene = _synthetic_portal_scene()
    res = Resolution.from_height(24)
    packed = pack_scene(scene)
    portal = portal_mod.build_portal_consts(packed)
    assert portal is not None
    pkey = "portal:test-synth-sharded"
    trace_v2.register_scene(pkey, portal[0])
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    trace_v2.register_scene(cam_key, trace_v2.build_camera_consts(
        scene.camera, res.width, res.height))
    kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
    TILE_META[pkey] = meta
    mode = f"{pkey}@{res.width}x{res.height}"

    mesh = make_mesh(dp * sp, sample_parallel=sp)
    assert dict(mesh.shape) == {"dp": dp, "sp": sp}
    cfg = RenderConfig(samples_per_pixel=3, resolution=res, max_depth=1)
    npix = res.num_pixels
    with pltpu.force_tpu_interpret_mode():
        a = _render_sharded_portal(
            scene, cfg, mesh=mesh, mode=mode,
            scene_bufs={"kernel": kbufs}, npix_pad=npix,
            out_dir=None, verbose=False)
        b = _render_sharded_portal(
            scene, cfg, mesh=mesh, mode=mode,
            scene_bufs={"kernel": kbufs}, npix_pad=npix,
            out_dir=None, verbose=False)
    px = a.image.pixels
    assert px.shape == (npix, 3)
    assert np.isfinite(px).all()
    assert px.max() > 0.0
    assert a.stats.num_samples == 3 * npix
    assert a.stats.num_rays == 3 * npix  # exact conservation @ depth 1
    np.testing.assert_array_equal(px, b.image.pixels)


@needs_8
@pytest.mark.slow
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


@needs_8
@pytest.mark.slow
def test_sharded_portal_redistribution(monkeypatch):
    """Mid-pass sample redistribution is ACTIVE in sharded pools (the +28%
    single-chip mechanism, PERF.md 2026-08-19 — round 3 shipped it only in
    the single-device drive). PT_TPU_REDIST_MIN=1 with spp=4 over sp=2
    makes per-shard quotas (2,2) redistribution-eligible, and the born-
    retired padding slots give the drive's idle-lane trigger an immediate
    donor pool. Exactness under redistribution: depth-1 ray conservation
    (every one of npix*spp samples traces exactly one segment, wherever
    its adopted slot ran) and bitwise determinism across runs."""
    from jax.experimental.pallas import tpu as pltpu

    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.ops.pallas import trace_v2
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        TILE_META, kernel_scene_buffers,
    )
    from path_tracer_tpu.parallel.mesh import (
        _render_sharded_portal, make_mesh,
    )
    from path_tracer_tpu.render import portal as rportal
    from tests.test_portal import _synthetic_portal_scene

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    monkeypatch.setenv("PT_TPU_REDIST_MIN", "1")
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")  # polls see unfinished slots
    monkeypatch.setenv("PT_TPU_CHECK_EVERY", "1")
    fired = {"n": 0}
    real = rportal.redistribute_samples

    def spy(*a, **kw):
        fired["n"] += 1  # traced => the drive really entered the path
        return real(*a, **kw)

    monkeypatch.setattr(rportal, "redistribute_samples", spy)

    scene = _synthetic_portal_scene()
    res = Resolution.from_height(16)
    packed = pack_scene(scene)
    portal = portal_mod.build_portal_consts(packed)
    assert portal is not None
    pkey = "portal:test-synth-redist"
    trace_v2.register_scene(pkey, portal[0])
    trace_v2.register_scene(
        f"{pkey}:cam:{res.width}x{res.height}",
        trace_v2.build_camera_consts(scene.camera, res.width, res.height))
    kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
    TILE_META[pkey] = meta
    mode = f"{pkey}@{res.width}x{res.height}"

    mesh = make_mesh(2, sample_parallel=2)
    # spp 16 -> per-shard quotas of 8: with step_cap=1 and park_k=1 a
    # plate-facing slot retires at most ~2 samples per cycle, so several
    # polls see unfinished slots and the idle-lane trigger (the 1664
    # born-retired padding slots per device are immediate donors) fires
    cfg = RenderConfig(samples_per_pixel=16, resolution=res, max_depth=1)
    npix = res.num_pixels
    with pltpu.force_tpu_interpret_mode():
        a = _render_sharded_portal(
            scene, cfg, mesh=mesh, mode=mode,
            scene_bufs={"kernel": kbufs}, npix_pad=npix,
            out_dir=None, verbose=False)
        b = _render_sharded_portal(
            scene, cfg, mesh=mesh, mode=mode,
            scene_bufs={"kernel": kbufs}, npix_pad=npix,
            out_dir=None, verbose=False)
    assert fired["n"] > 0  # redistribution really ran in the sharded drive
    px = a.image.pixels
    assert np.isfinite(px).all() and px.max() > 0.0
    assert a.stats.num_rays == 16 * npix  # exact conservation @ depth 1
    np.testing.assert_array_equal(px, b.image.pixels)


def _register_synth_portal(tag, res):
    """Register the synthetic 72-tri scene under a test-local portal key
    (same machinery as pipeline.prepare_scene_and_mode) and return
    (scene, pkey, cam_key, kernel bufs, npix)."""
    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.ops.pallas import trace_v2
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        TILE_META, kernel_scene_buffers,
    )
    from tests.test_portal import _synthetic_portal_scene

    scene = _synthetic_portal_scene()
    packed = pack_scene(scene)
    portal = portal_mod.build_portal_consts(packed)
    assert portal is not None
    pkey = f"portal:test-synth-{tag}"
    trace_v2.register_scene(pkey, portal[0])
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    trace_v2.register_scene(cam_key, trace_v2.build_camera_consts(
        scene.camera, res.width, res.height))
    kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
    TILE_META[pkey] = meta
    return scene, pkey, cam_key, kbufs, res.num_pixels


@needs_8
@pytest.mark.slow
def test_sharded_portal_mid_pass_cancel(monkeypatch):
    """Sharded freeze-and-drain cancel END-TO-END with real kernels
    (VERDICT r4 #2 — the sharded mirror of
    test_portal.test_portal_pass_runner_v2_mid_pass_cancel): a mid-pass
    cancel on a 2-device mesh KEEPS every started sample (reference
    parity: cancel keeps completed work, mod.rs:1002-1004) —
    .last_cancelled flips, the retired radiance lands in the sharded
    accum, and .last_partial_counts holds EXACT per-pixel retired counts,
    proven by depth-1 ray conservation across both devices."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.parallel.portal import make_sharded_portal_runner

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")  # first poll sees unfinished
    scene, pkey, cam_key, kbufs, npix = _register_synth_portal(
        "shcancel", Resolution.from_height(24))
    spp = 4
    mesh = make_mesh(2, sample_parallel=1)
    runner = make_sharded_portal_runner(
        mesh, portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
        max_depth=1, check_every=1, on_check=lambda c, w, u: True,
    )
    sharding = NamedSharding(mesh, P("dp", None))
    accum = jax.device_put(jnp.zeros((npix, 3), jnp.float32), sharding)
    with pltpu.force_tpu_interpret_mode():
        accum2, rays = runner({"kernel": kbufs}, None, accum, 0, spp,
                              rng.root_key(0))
    assert runner.last_cancelled
    cnt = np.asarray(runner.last_partial_counts)
    assert cnt.shape == (npix,)
    assert np.all(cnt >= 0) and np.all(cnt <= spp)
    total = cnt.sum()
    assert 0 < total < npix * spp  # mid-pass: some but not all retired
    # depth-1 conservation: every retired sample traced exactly 1 segment,
    # wherever (either device) it ran
    assert float(np.asarray(rays)) == total
    acc = np.asarray(accum2)
    assert np.isfinite(acc).all() and acc.sum() > 0.0


@needs_8
@pytest.mark.slow
@pytest.mark.parametrize("dp,sp", [(2, 1), (1, 2)])
def test_sharded_portal_pause_checkpoint_resume(dp, sp, monkeypatch):
    """Sharded mid-pass checkpoints END-TO-END with real kernels
    (VERDICT r4 #2 — the sharded mirror of
    test_portal.test_portal_pass_runner_v2_pause_checkpoint_resume): a
    'pause' verdict freeze-and-drains both device pools, hands
    positionally device-mapped (pix, done, quota) slot rows to on_pause,
    and CONTINUES; a fresh runner on the SAME mesh topology resuming
    from those rows completes exactly the remaining sample ranges
    (depth-1 conservation: checkpointed + resumed == whole pass). The
    sp=2 case exercises the per-shard quota-split rows through a
    checkpoint+resume round trip. With the interpreter PRNG stub all
    uniform draws are 0, so the resumed accumulation must also EQUAL the
    uninterrupted pass's up to scatter order."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.ops.pallas import portal as portal_mod
    from path_tracer_tpu.parallel.portal import make_sharded_portal_runner

    monkeypatch.setattr(portal_mod, "PARK_K", 1)
    monkeypatch.setenv("PT_TPU_STEP_CAP", "1")
    scene, pkey, cam_key, kbufs, npix = _register_synth_portal(
        f"shck{dp}{sp}", Resolution.from_height(24))
    # per-SHARD quota of 4: smaller quotas (spp=4 over sp=2 -> 2/shard)
    # can finish inside the first poll window, so no pause ever lands
    spp = 4 * sp
    mesh = make_mesh(dp * sp, sample_parallel=sp)
    saved = {}

    def on_pause(accum_dev, slot_rows, pass_idx, k_pass):
        saved.setdefault("accum", np.asarray(accum_dev))
        saved.setdefault("slots", slot_rows)

    def hook(cycle, w, unfin):
        if "accum" not in saved and unfin > 0:
            return "pause"
        return False

    kw = dict(portal_key=pkey, cam_key=cam_key, npix=npix, k_full=spp,
              max_depth=1, check_every=1)
    runner = make_sharded_portal_runner(
        mesh, on_check=hook, on_pause=on_pause, **kw)
    sharding = NamedSharding(mesh, P("dp", None))
    accum = jax.device_put(jnp.zeros((npix, 3), jnp.float32), sharding)
    with pltpu.force_tpu_interpret_mode():
        accum_full, rays_full = runner({"kernel": kbufs}, None, accum, 0,
                                       spp, rng.root_key(0))
    assert "accum" in saved  # a pause really happened
    assert not runner.last_cancelled
    # the pass CONTINUED after the pause and finished everything
    assert float(np.asarray(rays_full)) == npix * spp

    pix_s, done_s, quota_s = saved["slots"]
    rem = (quota_s - done_s).sum()
    assert 0 < rem < npix * spp  # the checkpoint landed mid-pass
    runner2 = make_sharded_portal_runner(mesh, **kw)
    assert runner2.slot_layout == runner.slot_layout  # resume guard key
    runner2.resume_slots = (pix_s, done_s, quota_s)
    accum_saved = jax.device_put(jnp.asarray(saved["accum"]), sharding)
    with pltpu.force_tpu_interpret_mode():
        accum_res, rays_res = runner2({"kernel": kbufs}, None, accum_saved,
                                      0, spp, rng.root_key(0))
    # exact sample accounting: checkpointed + resumed == whole pass
    assert float(np.asarray(rays_res)) == rem
    acc = np.asarray(accum_res)
    assert np.isfinite(acc).all() and acc.sum() > 0.0
    # zero-stub determinism: identical radiance up to scatter order
    np.testing.assert_allclose(acc, np.asarray(accum_full), rtol=1e-5,
                               atol=1e-7)
