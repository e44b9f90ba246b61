"""Host-side render orchestration.

Replaces the reference's thread/channel architecture (``mod.rs:928-1099``:
rayon pool + cancel-watcher thread + progress thread + mutexed framebuffer)
with chunked device dispatch: one jit call per sample-pass, a pure-functional
accumulator that never leaves the device between passes, progress callbacks
and cooperative cancellation between dispatches, and chunk-level
checkpoint/resume (the idiomatic upgrade for preemptible TPU pods — the
reference has no persistence at all).

Cancellation parity (§3.3 of the survey): a cancelled render still produces a
``RenderDone`` with the partial image and still writes the PPM.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.models.scene import SceneDescriptor, pack_scene
from path_tracer_tpu.ops import rng
from path_tracer_tpu.ops.intersect import triangle_coeffs_np
from path_tracer_tpu.render import integrator
from path_tracer_tpu.render.image import Image, write_ppm
from path_tracer_tpu.render.raygen import camera_arrays
from path_tracer_tpu.utils.config import RenderConfig, Resolution
from path_tracer_tpu.utils.profiling import RenderStats

import functools


@functools.partial(jax.jit, static_argnames=("npix",))
def _partial_image(accum, rad, cnt, samples_done, *, npix: int):
    """Mid-pass preview frame: completed-pass accum + the pool snapshot's
    retired radiance, normalized per pixel by its actual retired count
    (ragged mid-pass), clamp-after-average like finalize (mod.rs:849-856).
    One device computation -> one host fetch per preview frame."""
    total = jnp.maximum(samples_done + cnt[:npix], 1.0)
    return jnp.clip((accum[:npix] + rad[:npix]) / total[:, None], 0.0, 1.0)


@dataclass
class RenderUpdate:
    progress: float
    image: Image | None = None
    samples_done: int = 0
    stats: RenderStats | None = None


@dataclass
class RenderDone:
    image: Image
    duration: float
    stats: RenderStats = field(default_factory=RenderStats)
    ppm_path: str | None = None
    cancelled: bool = False


# Target wavefront width per dispatch (lanes). ~2M lanes ≈ 160 MB of carried
# scan state in HBM — small vs. 16 GB, big enough to saturate the chip.
DEFAULT_LANE_BUDGET = 2 * 1024 * 1024


def prepare_scene(
    scene: SceneDescriptor, mode: str = "fast", packed=None
) -> dict:
    """Pack + upload scene buffers, with precomputed triangle coefficients."""
    packed = packed if packed is not None else pack_scene(scene)
    bufs = {k: jnp.asarray(v) for k, v in packed.buffers().items()}
    if mode in ("fast", "auto"):
        bufs["tri_coeffs"] = {
            k: jnp.asarray(v) for k, v in triangle_coeffs_np(packed.tri_v).items()
        }
    if mode == "pallas" or mode.startswith("pallas2"):
        from path_tracer_tpu.ops.pallas.trace_kernel import kernel_scene_buffers

        bufs["kernel"] = kernel_scene_buffers(packed)
    return bufs


def prepare_scene_and_mode(
    scene: SceneDescriptor,
    backend: str,
    resolution: Resolution | None = None,
    regen: bool = True,
) -> tuple[dict, str]:
    """Resolve the backend AND upgrade 'pallas' to the ray-major static-scene
    kernels when the scene is small enough: 'pallas3:<key>' (regenerative —
    in-kernel raygen, lanes restart samples the moment a path dies) when the
    resolution is known and regen=True, else 'pallas2:<key>'.

    Keys are CONTENT digests routed statically through jit via the mode
    string — the scene key covers the objects only (v2's kernel is
    camera-free, so camera edits don't recompile it); the v3 camera key
    additionally digests the camera+resolution, so a moved camera maps to a
    fresh kernel rather than a stale cached one. Interactive callers that
    move the camera every frame should pass regen=False.
    """
    mode = resolve_backend(backend)
    packed = pack_scene(scene)
    bufs = prepare_scene(scene, mode, packed=packed)
    if mode == "pallas":
        import hashlib

        from path_tracer_tpu.models.scene import dumps_scene_json
        from path_tracer_tpu.ops.pallas import trace_v2

        consts = trace_v2.build_scene_consts(packed)
        if consts is None and resolution is not None and regen:
            # triangle-heavy scene. Preferred: portal-deferred tracing (the
            # heavy mesh's triangles are paid only by the ~8% of segments
            # that can reach its AABB — see ops.pallas.portal). Fallback:
            # the regenerative prim-major kernel (brute force per bounce).
            from path_tracer_tpu.ops.pallas import portal as portal_mod

            portal = (
                None
                if os.environ.get("PT_TPU_NO_PORTAL")
                else portal_mod.build_portal_consts(packed)
            )
            w, h = resolution.width, resolution.height
            cam_digest = hashlib.sha1(
                dumps_scene_json(scene.camera.to_json()).encode()
                + f":{w}x{h}".encode()
            ).hexdigest()[:12]
            if portal is not None:
                portal_consts, _heavy = portal
                objs_json = dumps_scene_json(
                    {"objects": [o.to_json() for o in scene.objects]}
                )
                pkey = "portal:" + hashlib.sha1(
                    objs_json.encode()
                ).hexdigest()[:16]
                trace_v2.register_scene(pkey, portal_consts)
                # the v2 cheap kernel regenerates samples in-kernel → needs
                # the camera raygen consts under a resolution-scoped key
                trace_v2.register_scene(
                    f"{pkey}:cam:{w}x{h}",
                    trace_v2.build_camera_consts(scene.camera, w, h),
                )
                from path_tracer_tpu.ops.pallas.trace_kernel import (
                    TILE_META, kernel_scene_buffers,
                )

                if "kernel" not in bufs or pkey not in TILE_META:
                    bufs["kernel"], meta = kernel_scene_buffers(
                        packed, with_meta=True
                    )
                    # static per-tile facts (material uniformity) for the
                    # resolver, recoverable at trace time from the static
                    # portal key
                    TILE_META[pkey] = meta
                mode = f"{pkey}@{w}x{h}"
            else:
                cam_key = f"camr:{cam_digest}:{w}x{h}"
                trace_v2.register_scene(
                    cam_key, trace_v2.build_camera_consts(scene.camera, w, h)
                )
                mode = f"pallasr:{cam_key}"
        elif consts is not None:
            objs_json = dumps_scene_json(
                {"objects": [o.to_json() for o in scene.objects]}
            )
            key = hashlib.sha1(objs_json.encode()).hexdigest()[:16]
            trace_v2.register_scene(key, consts)
            if resolution is not None and regen:
                w, h = resolution.width, resolution.height
                cam_digest = hashlib.sha1(
                    dumps_scene_json(scene.camera.to_json()).encode()
                    + f":{w}x{h}".encode()
                ).hexdigest()[:12]
                key3 = f"{key}:{cam_digest}"
                trace_v2.register_scene(key3, consts)
                trace_v2.register_scene(
                    f"cam:{key3}:{w}x{h}",
                    trace_v2.build_camera_consts(scene.camera, w, h),
                )
                mode = f"pallas3:{key3}"
            else:
                mode = f"pallas2:{key}"
    return bufs, mode


def resolve_backend(backend: str) -> str:
    """auto → the fused Pallas megakernel on TPU, XLA 'fast' elsewhere
    (the kernel runs on CPU only in interpret mode)."""
    if backend in ("auto", "mxu"):
        return "pallas" if jax.default_backend() != "cpu" else "fast"
    if backend == "jnp":
        return "fast"
    return backend


def _pick_samples_per_pass(npix: int, spp: int, budget: int) -> int:
    k = max(1, budget // max(npix, 1))
    return min(k, spp)


import functools


_CAM_CACHE: dict[tuple, dict] = {}


def _device_camera(camera) -> dict:
    """Device-resident camera basis arrays, cached by value: re-uploading
    5 small arrays through the tunnel costs ~ms each — real money on a
    ~0.15 s small-scene render. Entries are tiny; the dict grows only
    with distinct camera poses (interactive orbits evict via FIFO)."""
    arrs = camera_arrays(camera)
    key = tuple(
        (k, np.asarray(v).tobytes()) for k, v in sorted(arrs.items())
    )
    hit = _CAM_CACHE.get(key)
    if hit is None:
        if len(_CAM_CACHE) >= 64:
            _CAM_CACHE.pop(next(iter(_CAM_CACHE)))
        hit = _CAM_CACHE[key] = {k: jnp.asarray(v) for k, v in arrs.items()}
    return hit


@functools.lru_cache(maxsize=8)
def _device_pixel_perm(width: int, height: int, npix_pad: int):
    """(perm [npix_pad] on device, inv [npix] host): cached — the Morton
    permutation is pure in (w, h) and its per-render device upload is
    ~0.25 MB at 256x256 (a measurable slice of a 0.15 s render)."""
    perm_np, inv_perm = morton_pixel_order(width, height)
    if npix_pad != len(perm_np):
        # pad lanes redo pixel 0; their accum rows are cropped at the end
        perm_np = np.concatenate(
            [perm_np, np.zeros(npix_pad - len(perm_np), perm_np.dtype)]
        )
    return jnp.asarray(perm_np), inv_perm


@functools.lru_cache(maxsize=8)
def morton_pixel_order(width: int, height: int) -> tuple[np.ndarray, np.ndarray]:
    """(perm, inv): Z-order traversal of the pixel grid. Lane blocks then
    cover compact screen tiles (spatial coherence for kernel tile-culling).
    perm[i] = pixel index visited i-th; inv is its inverse. Cached: the
    argsort is ~30 ms of host time at 1024x768 — real money against a
    ~1 s steady-state render (callers must not mutate the arrays)."""
    p = np.arange(width * height, dtype=np.int64)
    row = p // width
    col = p % width

    def spread(v):  # 16-bit -> even bit positions
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v

    code = (spread(row) << 1) | spread(col)
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm), dtype=np.int32)
    return perm, inv


def render(
    scene: SceneDescriptor,
    config: RenderConfig,
    *,
    progress: Callable[[RenderUpdate], None] | None = None,
    progress_interval: float = 0.5,
    progress_snapshots: bool = True,
    cancel: Callable[[], bool] | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    out_dir: str | None = "out",
    device_buffers: dict | None = None,
    device_mode: str | None = None,
    pass_runner: Callable | None = None,
    accum_init=None,
    verbose: bool = True,
) -> RenderDone:
    """Render a scene to completion (or cancellation). See module docstring."""
    config = config.validated()
    if config.f32_precision != "highest":
        from path_tracer_tpu.ops import intersect

        # process-global; affects newly compiled programs only
        intersect.set_precision(config.f32_precision)
    if checkpoint_path and not checkpoint_path.endswith(".npz"):
        checkpoint_path += ".npz"  # np.savez appends it regardless
    res = config.resolution
    npix = res.num_pixels
    spp = config.samples_per_pixel
    mode = resolve_backend(config.backend)

    if verbose:
        print(
            f"Rendering scene {scene.id} ({len(scene.objects)} objects), "
            f"{spp} samples per pixel, {res.width}x{res.height} resolution"
        )

    literal = config.estimator == "literal"
    t_start = time.perf_counter()
    if device_buffers is not None:
        scene_bufs = device_buffers
        if device_mode is not None:
            mode = device_mode
        if literal and mode not in ("fast", "exact"):
            raise ValueError(
                "estimator='literal' needs an XLA mode (fast/exact); got "
                f"device_mode={mode!r}"
            )
    elif config.mock_random or literal:
        # both are XLA-only semantics switches: the Pallas kernels bake the
        # shipped estimator (EPS_TRI_T + prev-exclusion) and threefry/HW PRNG
        mode = "fast" if mode not in ("fast", "exact") else mode
        scene_bufs = prepare_scene(scene, mode)
    else:
        scene_bufs, mode = prepare_scene_and_mode(scene, config.backend, res)
    cam = _device_camera(scene.camera)
    base_key = rng.root_key(config.seed)

    budget = DEFAULT_LANE_BUDGET
    if mode in ("exact", "fast"):
        T = int(scene_bufs["tri_v"].shape[0])
        if mode == "exact":
            # the literal-arithmetic oracle materializes [lanes, T, 3]
            # intermediates — bound them to ~2 GB of HBM
            budget = min(budget, max(2_000_000_000 // (T * 36), 4096))
        else:
            # the matmul form materializes several [lanes, T] f32
            # intermediates (det/u/v/t) — same bound, smaller factor
            budget = min(budget, max(2_000_000_000 // (T * 16), 4096))
    # regen kernels compile with a static quota_cap (256 static-scene / 64
    # prim-major); a larger runtime quota would overrun the static loop
    # bound (partial samples), so passes are capped to it
    regen_cap = 0
    if mode.startswith("pallas3"):
        from path_tracer_tpu.ops.pallas.trace_kernel import QUOTA_CAP_STATIC

        regen_cap = QUOTA_CAP_STATIC
    elif mode.startswith("pallasr"):
        from path_tracer_tpu.ops.pallas.trace_kernel import QUOTA_CAP_PRIM

        regen_cap = QUOTA_CAP_PRIM
    elif mode.startswith("portal:"):
        # the portal scheduler has no static quota; the cap only sets the
        # pass granularity. Big passes amortize the pool's drain tail —
        # the bulk phase runs ~272 Mray/s while 64-spp passes average 117
        # because every pass pays the full drain (PERF.md 2026-08-18).
        # Progress/cancel/preview-images AND checkpoints all ride the
        # drive's poll hook mid-pass: previews via the hook's `snapshot`
        # callable, cancel and checkpoints via freeze-and-drain (every
        # started sample retires and merges exactly — see render.drive),
        # so nothing needs fine-grained passes anymore.
        # 64/512/1024-spp passes measured 119/161/176 Mray/s on the
        # mesh headline (PERF.md) — the drain amortizes with pass size
        regen_cap = int(os.environ.get("PT_TPU_PORTAL_PASS_CAP", "1024"))
        if (os.environ.get("PT_TPU_PORTAL_V1")
                and checkpoint_path and checkpoint_every):
            # the v1 runner has no set_hooks, so mid-pass checkpoints
            # (and mid-pass cancel) cannot attach — keep the legacy
            # 64-spp passes so pass-BOUNDARY checkpoints still fire;
            # a 1024-spp single pass would checkpoint nothing at all
            regen_cap = min(regen_cap, 64)
    if config.samples_per_pass:
        k = config.samples_per_pass
        if regen_cap:
            k = min(k, regen_cap)
    elif regen_cap:
        # regenerative kernel: state is per-PIXEL (not per-sample), so big
        # quotas amortize the ragged all-lanes-done tail (~1/sqrt(quota))
        # and per-dispatch overhead; the cap keeps progress/cancel
        # granularity in check
        k = min(spp, regen_cap)
    else:
        k = _pick_samples_per_pass(npix, spp, budget)
    full_passes, remainder = divmod(spp, k)

    if pass_runner is None and mode.startswith("portal:"):
        pkey = mode.split("@", 1)[0]
        if "@" in mode and not os.environ.get("PT_TPU_PORTAL_V1"):
            # v2: pixel-pinned pool (no compaction/scatter — see
            # render.portal). The cam key is registered by
            # prepare_scene_and_mode for exactly this resolution.
            from path_tracer_tpu.render.portal import (
                make_portal_pass_runner_v2,
            )

            pass_runner = make_portal_pass_runner_v2(
                portal_key=pkey,
                cam_key=f"{pkey}:cam:{res.width}x{res.height}",
                npix=npix,
                k_full=k,
                max_depth=config.max_depth,
                rr_start_depth=config.rr_start_depth,
                width=res.width,
                height=res.height,
            )
        else:
            from path_tracer_tpu.render.portal import make_portal_pass_runner

            pass_runner = make_portal_pass_runner(
                portal_key=pkey,
                npix=npix,
                width=res.width,
                height=res.height,
                k_full=k,
                max_depth=config.max_depth,
                rr_start_depth=config.rr_start_depth,
            )

    # mid-pass hook wiring for portal runners (the internal one above or
    # an externally supplied sharded one): progress, cancel and
    # time-based mid-pass checkpoints all ride the drive's poll hook —
    # passes are up to PT_TPU_PORTAL_PASS_CAP spp, so pass boundaries are
    # too coarse for any of them. Cancel/checkpoint stop the pass via
    # freeze-and-drain (render.drive): every started sample retires and
    # merges exactly — a cancelled render keeps all its samples
    # (reference parity at sample granularity: mod.rs:1002-1004) and a
    # checkpoint written mid-pass resumes sample-exactly.
    # Late-binding closures: maybe_progress / current_k_pass /
    # samples_done are defined further down, resolved at call time.
    if pass_runner is not None and hasattr(pass_runner, "set_hooks"):
        mid_ckpt = bool(checkpoint_path and checkpoint_every)
        ck_state = {"t": time.monotonic()}
        # cadence in seconds (checkpoint_every counts passes, but a big
        # portal pass IS the render — time is the usable granularity).
        # 15 s is measured FREE on hardware: 231.8 vs 234.7 Mray/s
        # hookless (-1.2%, inside run variance; 6 s costs -15%) — see
        # PERF.md 2026-08-20 / scripts/bench_checkpoint.py.
        ck_secs = float(os.environ.get("PT_TPU_CKPT_SECS", "15"))

        def portal_hook(cycle, w, unfin, *, snapshot=None):
            if progress is not None:
                # unfin counts SLOTS: npix for the single-device pool,
                # sp*npix for a sharded one (sp shards duplicate pixels)
                denom = getattr(pass_runner, "total_slots", npix)
                frac = 1.0 - min(unfin / denom, 1.0)
                maybe_progress(extra_samples=frac * current_k_pass,
                               snapshot=snapshot)
            if cancel is not None and cancel():
                return "cancel"
            if mid_ckpt and time.monotonic() - ck_state["t"] >= ck_secs:
                return "pause"
            return False

        def save_mid_pass(accum_dev, slot_rows, pass_idx, k_pass):
            # accum_dev already holds every retired sample's radiance;
            # slot_rows = (pix, done, quota) describe the remaining
            # per-slot sample ranges [done, quota) — see render.drive.
            # Drain the completed passes' ray-count handles first: they
            # are fetched lazily, and a checkpoint written from the bare
            # counter would resume with near-zero num_rays. (The current
            # pass's pre-pause rays are not recoverable — the runner owns
            # them until the pass returns — so num_rays is a floor.)
            drain_rays()
            np.savez(
                checkpoint_path,
                accum=accum_to_host(accum_dev),
                samples_done=samples_done,
                next_pass=pass_idx,
                seed=config.seed, spp=spp, npix=npix, k=k,
                num_rays=stats.num_rays,
                mid_pass=1,
                # cycle counter at the freeze: a resume continues the
                # per-cycle PRNG seed schedule instead of replaying it
                cycle0=int(getattr(pass_runner, "last_pause_cycles", 0)),
                slot_layout=getattr(pass_runner, "slot_layout", "single"),
                slot_pix=slot_rows[0], slot_done=slot_rows[1],
                slot_quota=slot_rows[2],
            )
            ck_state["t"] = time.monotonic()

        if progress is not None or cancel is not None or mid_ckpt:
            pass_runner.set_hooks(
                on_check=portal_hook,
                on_pause=save_mid_pass if mid_ckpt else None,
            )

    # pixel chunking: when even one sample/pixel exceeds the lane budget
    # (full-res renders of triangle-heavy scenes in the XLA modes), split
    # the pixel axis across dispatches (config.pixel_chunk overrides)
    chunk = 0
    if pass_runner is None and mode in ("exact", "fast"):
        chunk = config.pixel_chunk
        if not chunk and npix > budget:
            chunk = max(budget // k, 4096)
        if chunk >= npix:
            chunk = 0
    npix_pad = npix if not chunk else ((npix + chunk - 1) // chunk) * chunk
    n_chunks = npix_pad // chunk if chunk else 1

    # Z-order pixel traversal (see morton_pixel_order); accum lives in
    # permuted order until finalize. Only the single-device path uses it.
    perm = inv_perm = None
    if pass_runner is None:
        perm, inv_perm = _device_pixel_perm(res.width, res.height, npix_pad)

    def unpermute(arr: np.ndarray) -> np.ndarray:
        return arr if inv_perm is None else arr[inv_perm]

    accum = (
        accum_init
        if accum_init is not None
        else jnp.zeros((npix_pad, 3), jnp.float32)
    )
    # sharded accum (render_sharded): checkpoints must gather the global
    # value (multi-host: np.asarray on a non-addressable array would throw)
    # and restores must re-shard it. NOTE: every jax array carries a
    # .sharding (SingleDeviceSharding for plain arrays), so "is it
    # sharded" must test for an explicit accum_init with a NamedSharding
    # — r3's packed one-round-trip finalize fetch was keyed on
    # `accum_sharding is None` and therefore NEVER ran (caught by the r5
    # overhead decomposition: 105 ms of two serialized fetches where the
    # packed path pays ~40).
    accum_sharding = getattr(accum, "sharding", None)
    is_sharded_accum = isinstance(accum_sharding, jax.sharding.NamedSharding)

    def accum_to_host(a) -> np.ndarray:
        from path_tracer_tpu.parallel.distributed import assemble_image

        return assemble_image(a)

    def host_to_accum(a_np: np.ndarray):
        if accum_sharding is None or jax.process_count() == 1:
            return jax.device_put(jnp.asarray(a_np), accum_sharding)
        return jax.make_array_from_callback(
            a_np.shape, accum_sharding, lambda idx: a_np[idx]
        )
    samples_done = 0
    pass_start = 0
    stats = RenderStats()

    # ---- resume ----
    if checkpoint_path and os.path.exists(checkpoint_path):
        ck = np.load(checkpoint_path)
        mismatches = [
            f"{name} {int(ck[name])} != {want}"
            for name, want in (
                ("seed", config.seed), ("spp", spp), ("npix", npix), ("k", k),
            )
            if int(ck[name]) != want
        ]
        if ck["accum"].shape[0] != npix_pad:
            mismatches.append(
                f"accum rows {ck['accum'].shape[0]} != {npix_pad} (chunking)"
            )
        mid_pass = "mid_pass" in ck.files and int(ck["mid_pass"])
        if mid_pass and not hasattr(pass_runner, "resume_slots"):
            mismatches.append(
                "mid-pass checkpoint needs a portal pass runner "
                "(backend/scene changed?)"
            )
        elif mid_pass:
            # slot rows are POSITIONAL (per-shard quotas and sample-base
            # offsets live in slot positions) — a different pool topology
            # would silently corrupt the sample accounting
            want = getattr(pass_runner, "slot_layout", "single")
            got = str(ck["slot_layout"]) if "slot_layout" in ck.files \
                else "single"
            if got != want:
                mismatches.append(f"slot layout {got} != {want}")
        if not mismatches:
            accum = host_to_accum(ck["accum"])
            samples_done = int(ck["samples_done"])
            pass_start = int(ck["next_pass"])
            stats.num_rays = int(ck["num_rays"])
            stats.resumed_samples = samples_done
            if mid_pass:
                # resume INTO pass `pass_start`: the runner continues the
                # saved per-slot sample ranges, so every remaining sample
                # id renders exactly once and the finished frame is
                # scalar-normalizable as if never interrupted
                pass_runner.resume_slots = (
                    ck["slot_pix"], ck["slot_done"], ck["slot_quota"]
                )
                # continue the interrupted pass's cycle counter so the
                # per-cycle PRNG seeds never replay (old checkpoints
                # without the field get a disjoint 2^20 offset instead)
                pass_runner.resume_cycle0 = (
                    int(ck["cycle0"]) if "cycle0" in ck.files else 1 << 20
                )
            if verbose:
                print(f"Resumed from {checkpoint_path} at {samples_done}/{spp} spp"
                      + (" (mid-pass)" if mid_pass else ""))
        else:
            # a silently dropped checkpoint would discard hours of
            # accumulation without a trace — ALWAYS say why it was ignored
            import sys

            print(
                f"WARNING: ignoring checkpoint {checkpoint_path} "
                f"(config mismatch: {'; '.join(mismatches)}); "
                "rendering restarts from zero",
                file=sys.stderr,
            )

    # regen kernels take the pass's sample count at RUNTIME; the static
    # samples_in_pass is pinned to the kernels' quota cap (256), so every
    # pass of every spp — including ragged remainders — reuses ONE compiled
    # program per (scene, resolution). A 100-spp job after a 512-spp warm
    # compiles nothing.
    regen_mode = regen_cap > 0

    def run_pass(accum, pass_idx: int, k_pass: int):
        if pass_runner is not None:
            return pass_runner(scene_bufs, cam, accum, pass_idx, k_pass, base_key)
        rays = jnp.zeros((), jnp.float32)
        for c in range(n_chunks):
            accum, r = integrator.render_pass(
                scene_bufs,
                cam,
                accum,
                jnp.int32(pass_idx),
                base_key,
                # global sample base (k = FULL pass size, not k_pass)
                sample_base=jnp.int32(pass_idx * k),
                width=res.width,
                height=res.height,
                samples_in_pass=regen_cap if regen_mode else k_pass,
                max_depth=config.max_depth,
                rr_start_depth=config.rr_start_depth,
                mode=mode,
                pixel_perm=perm,
                mock_random=config.mock_random,
                pixel_chunk=chunk,
                chunk_start=jnp.int32(c * chunk) if chunk else None,
                quota_rt=jnp.int32(k_pass) if regen_mode else None,
                literal=literal,
            )
            rays = rays + r
        return accum, rays

    last_update = 0.0
    # mid-pass previews cost a device round-trip + [npix,3] fetch through
    # the tunnel; self-throttle so they never exceed ~10% of the render
    # (next preview no sooner than 10x the last one's cost)
    last_image_t = 0.0
    last_image_cost = 0.0
    cancelled = False

    def maybe_progress(force: bool = False, extra_samples: float = 0.0,
                       allow_image: bool = True, snapshot=None):
        # extra_samples: mid-pass slot-completion estimate from the portal
        # hook; `snapshot` (same hook) computes the pool's retired
        # radiance/counts on device so big passes still stream previews
        nonlocal last_update, last_image_t, last_image_cost
        if progress is None:
            return
        now = time.perf_counter()
        if not force and now - last_update < progress_interval:
            return
        last_update = now
        img = None
        if allow_image and progress_snapshots and snapshot is not None:
            if force or now - last_image_t >= max(
                progress_interval, 10.0 * last_image_cost
            ):
                rad, cnt = snapshot()
                partial = _partial_image(
                    accum, rad, cnt, jnp.float32(samples_done), npix=npix
                )
                img = Image.new(np.asarray(partial), res)
                last_image_t = time.perf_counter()
                last_image_cost = last_image_t - now
        elif allow_image and progress_snapshots and samples_done > 0:
            partial = integrator.finalize(accum, samples_done)
            # accum may be padded beyond the framebuffer (sharded execution)
            img = Image.new(unpermute(np.asarray(partial)[:npix]), res)
        progress(
            RenderUpdate(
                progress=min((samples_done + extra_samples) / spp, 1.0),
                image=img,
                samples_done=samples_done,
                stats=stats,
            )
        )

    # ---- pass schedule: full passes of k samples, then one remainder pass ----
    schedule = [(i, k) for i in range(pass_start, full_passes)]
    if remainder:
        schedule.append((full_passes, remainder))
    # resume may land inside the remainder
    schedule = [(i, kp) for (i, kp) in schedule if i >= pass_start]

    # ray counts are fetched lazily: an int() per pass would block the host
    # until the device finishes, serializing passes — keeping them as device
    # handles lets jax queue the next pass while the previous one runs. The
    # drain stacks them into ONE device array first: each scalar fetch is a
    # full host<->device round-trip (~25 ms through a remote-TPU tunnel).
    # Counts arrive as f32 (the kernels reduce them on-device), so passes
    # beyond 2^24 rays are already rounded to ~1e-7 relative — num_rays is
    # a throughput metric, not an exact tally; the int64 host sum just
    # avoids adding further error
    ray_handles: list = []

    def drain_rays():
        nonlocal ray_handles
        if ray_handles:
            counts = np.asarray(jnp.stack(ray_handles))
            stats.num_rays += int(counts.astype(np.int64).sum())
        ray_handles = []

    current_k_pass = 0

    # hookless fast path: no progress, no cancel, no checkpoint, no pixel
    # chunking, not resumed — run all FULL passes as ONE fused dispatch
    # (integrator.render_passes_fused); the remainder pass (if any) still
    # goes through the ordinary loop below. Saves the per-pass dispatch +
    # host-loop overhead (~10% of a small-scene render on the tunnel).
    if (
        pass_runner is None and progress is None and cancel is None
        and not (checkpoint_path and checkpoint_every)
        and not config.mock_random and not chunk and pass_start == 0
        and full_passes > 1
        # PT_TPU_NO_FUSE=1: A/B the fused dispatch against the per-pass
        # loop (scripts/ab_fused_dispatch.py); read per render call
        and not os.environ.get("PT_TPU_NO_FUSE")
    ):
        accum, rays = integrator.render_passes_fused(
            scene_bufs, cam, accum, base_key,
            n_passes=full_passes, width=res.width, height=res.height,
            samples_in_pass=regen_cap if regen_mode else k,
            max_depth=config.max_depth,
            rr_start_depth=config.rr_start_depth, mode=mode,
            pixel_perm=perm,
            quota_rt=jnp.int32(k) if regen_mode else None,
            literal=literal,
        )
        ray_handles.append(rays)
        samples_done += k * full_passes
        stats.num_samples += k * full_passes * npix
        stats.num_dispatches += 1
        schedule = [(i, kp) for (i, kp) in schedule if i >= full_passes]

    for pass_idx, k_pass in schedule:
        if cancel is not None and cancel():
            if verbose:
                print("Canceling render prematurely")
            cancelled = True
            break
        current_k_pass = k_pass
        accum, rays = run_pass(accum, pass_idx, k_pass)
        ray_handles.append(rays)
        if getattr(pass_runner, "last_cancelled", False):
            # the portal hook cancelled mid-pass via freeze-and-drain:
            # every started sample retired and merged into accum (the
            # runner's .last_partial_counts holds the exact ragged
            # per-pixel counts for finalize); un-started samples are the
            # only loss
            if verbose:
                print("Canceling render prematurely")
            cancelled = True
            break
        samples_done += k_pass * 1  # per pixel
        stats.num_samples += k_pass * npix
        stats.num_dispatches += n_chunks
        maybe_progress()

        if checkpoint_path and checkpoint_every and (
            (pass_idx + 1) % checkpoint_every == 0
        ):
            drain_rays()  # the snapshot stores the count up to this pass
            accum.block_until_ready()
            np.savez(
                checkpoint_path,
                accum=accum_to_host(accum),
                samples_done=samples_done,
                next_pass=pass_idx + 1,
                seed=config.seed,
                spp=spp,
                npix=npix,
                k=k,
                num_rays=stats.num_rays,
            )

    # ---- finalize ----
    effective_spp = max(samples_done, 1)
    partial_counts = getattr(pass_runner, "last_partial_counts", None) \
        if pass_runner is not None else None
    if cancelled and partial_counts is not None:
        # a drained portal cancel keeps every started sample; normalize
        # per pixel by its exact retired count (completed passes + the
        # cancelled pass's ragged counts) — nothing is discarded
        final = _partial_image(
            accum, jnp.zeros((npix, 3), jnp.float32), partial_counts,
            jnp.float32(samples_done), npix=npix,
        )
    else:
        final = integrator.finalize(accum, effective_spp)
    if not is_sharded_accum and jax.process_count() == 1:
        # ONE host round-trip for image + ray counts: each separate fetch
        # is a ~25 ms tunnel round-trip — at small-scene walls of ~0.1 s
        # the second fetch alone was ~20% of the render
        packed = jnp.concatenate(
            [final.reshape(-1)]
            + ([jnp.stack(ray_handles)] if ray_handles else [])
        )
        host = np.asarray(packed)
        if ray_handles:
            counts = host[final.size:]
            stats.num_rays += int(counts.astype(np.int64).sum())
            ray_handles = []
        final_np = host[: final.size].reshape(final.shape)
    else:
        drain_rays()  # host fetch: syncs all queued passes
        final.block_until_ready()
        final_np = accum_to_host(final)
    duration = time.perf_counter() - t_start
    stats.wall_seconds = duration

    image = Image.new(unpermute(final_np[:npix]), res)
    if verbose:
        print("Rendering complete" if not cancelled else "Rendering cancelled")

    ppm_path = None
    if out_dir is not None:
        ppm_path = write_ppm(image, scene.id, spp, duration, out_dir=out_dir)

    if checkpoint_path and not cancelled and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)

    maybe_progress(force=True)
    return RenderDone(
        image=image,
        duration=duration,
        stats=stats,
        ppm_path=ppm_path,
        cancelled=cancelled,
    )
