"""Headline benchmark: cornell.json 1024×768, Mrays/s on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 1000 (the BASELINE.json target is 1 Gray/s/chip).

Measures steady-state throughput: one warmup pass (compile + cache), then a
timed run at fixed spp counting traced ray segments (sum of alive lanes per
bounce — the standard Mrays/s definition).
"""

import json
import os
import sys

import numpy as np
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.chdir(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render import integrator
    from path_tracer_tpu.render.pipeline import prepare_scene, _pick_samples_per_pass, DEFAULT_LANE_BUDGET
    from path_tracer_tpu.render.raygen import camera_arrays
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    # 512 spp = 2 full quota-256 regen passes: long enough that steady-state
    # throughput dominates dispatch overhead (100 spp under-reports by ~10%)
    spp = int(os.environ.get("BENCH_SPP", "512"))
    width, height = 1024, 768
    npix = width * height
    backend = os.environ.get("BENCH_BACKEND", "auto")
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode

    scene = pt.load_scene("cornell", "scenes")
    cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(height, width))
    bufs, mode = prepare_scene_and_mode(scene, backend, cfg.resolution)
    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}
    base_key = rng.root_key(0)

    from path_tracer_tpu.ops.pallas.trace_kernel import (
        QUOTA_CAP_PRIM, QUOTA_CAP_STATIC,
    )

    if mode.startswith("pallas3"):
        k = min(spp, QUOTA_CAP_STATIC)  # the kernels' static quota caps
    elif mode.startswith("pallasr"):
        k = min(spp, QUOTA_CAP_PRIM)
    else:
        k = cfg.samples_per_pass or _pick_samples_per_pass(npix, spp, DEFAULT_LANE_BUDGET)
    n_passes = max(spp // k, 1)

    def run_pass(accum, i):
        # quota_rt deliberately NOT passed: with a full-cap pass the
        # constant-quota program is identical in work, and it is the one
        # already in the compile cache (a traced-quota variant would force
        # a fresh multi-minute tunnel compile for zero benchmark effect)
        return integrator.render_pass(
            bufs, cam, accum, jnp.int32(i), base_key,
            sample_base=jnp.int32(i * k),
            width=width, height=height, samples_in_pass=k,
            max_depth=cfg.max_depth, rr_start_depth=cfg.rr_start_depth,
            mode=mode,
        )

    # warmup/compile (fetch to host: block_until_ready has been observed to
    # return early on the remote TPU backend right after a fresh compile)
    accum = jnp.zeros((npix, 3), jnp.float32)
    accum, rays0 = run_pass(accum, 0)
    np.asarray(rays0)

    # timed steady-state: 4 reps, report 2nd-best (first rep after a fresh
    # compile can read 2-6x slow through the tunnel; see CLAUDE.md)
    walls = []
    for _ in range(4):
        accum = jnp.zeros((npix, 3), jnp.float32)
        np.asarray(accum[0])  # drain the queue before starting the clock
        t0 = time.perf_counter()
        rays_handles = []
        for i in range(n_passes):
            accum, rays = run_pass(accum, i)
            rays_handles.append(rays)
        # one stacked fetch (a scalar fetch is a ~25 ms tunnel round-trip);
        # sum as int64 (an int32 reduction wraps past 2.1e9 rays)
        counts = np.asarray(jnp.stack(rays_handles))
        total_rays = int(counts.astype(np.int64).sum())
        np.asarray(accum[:1])
        walls.append(time.perf_counter() - t0)
    wall = sorted(walls)[1]
    total_samples = n_passes * k * npix
    if wall < 1e-3:
        raise RuntimeError(f"implausible bench timing ({wall*1e3:.3f} ms)")

    mrays = total_rays / wall / 1e6

    # VPU roofline (VERDICT r1 #5): essential f32 arithmetic per traced
    # segment, counted from the kernel's own components by jaxpr walk
    # (scripts/count_flops.py; compares/selects/casts excluded, so this is
    # a LOWER bound on VPU occupancy). Peak assumes a v5e TensorCore VPU:
    # (8,128) lanes x 4 ALUs x 2 flops (FMA) x 1.5 GHz = 12.3 TFLOP/s f32.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scripts.count_flops import flops_per_segment

    VPU_PEAK_F32 = 8 * 128 * 4 * 2 * 1.5e9
    fps = flops_per_segment(scene)["total"]
    useful = mrays * 1e6 * fps
    mfu = useful / VPU_PEAK_F32

    print(
        f"cornell {width}x{height} @ {n_passes * k} spp: {wall:.2f}s, "
        f"{total_samples / wall / 1e6:.1f} Msamples/s, {mrays:.1f} Mrays/s, "
        f"{fps:.0f} flops/seg -> {useful / 1e12:.2f} TFLOP/s useful "
        f"= {mfu * 100:.1f}% of VPU peak",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "cornell_1024x768_throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(mrays / 1000.0, 4),
        "flops_per_ray": fps,
        "useful_tflops": round(useful / 1e12, 3),
        "mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
