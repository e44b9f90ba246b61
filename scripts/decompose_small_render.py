"""Decompose the fixed per-render overhead of a warm small-scene render
(VERDICT r4 #3: single-sphere e2e is 2.18 Gray/s vs 2.9 Gsam/s
kernel-only — ~40 ms/render of host work + final fetch, never itemized).

Phases of pipeline.render's hookless fused path, timed separately on one
warm render (all programs cached):

  prep      camera_arrays + pixel perm + accum init + python prologue
  dispatch  render_passes_fused enqueue (async — host returns immediately)
  finalize  finalize + pack enqueue (async)
  compute   block_until_ready on the packed result (device time not
            already overlapped with the host phases)
  fetch     np.asarray of the packed [npix*3 + npasses] f32 result
            (tunnel RTT + payload transfer)
  image     Image.new + unpermute (host numpy)

Controls measured alongside: bare scalar fetch (the tunnel RTT floor) and
a full-size [npix,3] fetch (payload bandwidth), so every phase can be
attributed to host work, RTT, or bandwidth.

Usage: python scripts/decompose_small_render.py [scene] [spp] [reps]
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.render import integrator
    from path_tracer_tpu.render.pipeline import (
        _device_pixel_perm, prepare_scene_and_mode,
    )
    from path_tracer_tpu.render.raygen import camera_arrays
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    sid = sys.argv[1] if len(sys.argv) > 1 else "single-sphere"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    w, h = (256, 256) if sid == "single-sphere" else (384, 256)
    npix = w * h

    scene = pt.load_scene(sid, "scenes")
    cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(h, w))
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, cfg.resolution)
    print(f"{sid} {w}x{h}@{spp} mode={mode}")

    from path_tracer_tpu.ops.pallas.trace_kernel import QUOTA_CAP_STATIC
    regen = mode.startswith("pallas3:")
    k = min(spp, QUOTA_CAP_STATIC) if regen else spp
    n_passes = spp // k

    # ---- controls ----
    z = jnp.zeros((), jnp.float32)
    np.asarray(z)
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(jnp.zeros((), jnp.float32) + 1.0)
    rtt = (time.perf_counter() - t0) / 4
    big = jnp.zeros((npix, 3), jnp.float32) + 1.0
    big.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(4):
        np.asarray(big)
    t_big = (time.perf_counter() - t0) / 4
    print(f"controls: scalar fetch {rtt*1e3:.1f} ms | [npix,3] f32 fetch "
          f"{t_big*1e3:.1f} ms ({npix*12/1024:.0f} KiB)")

    def one_render(timed):
        t = {}
        tick = time.perf_counter

        t0 = tick()
        cam = {kk: jnp.asarray(v)
               for kk, v in camera_arrays(scene.camera).items()}
        perm, inv_perm = _device_pixel_perm(w, h, npix)
        accum = jnp.zeros((npix, 3), jnp.float32)
        base_key = rng.root_key(0)
        t["prep"] = tick() - t0

        t0 = tick()
        accum, rays = integrator.render_passes_fused(
            bufs, cam, accum, base_key, n_passes=n_passes, width=w,
            height=h, samples_in_pass=k, max_depth=cfg.max_depth,
            rr_start_depth=cfg.rr_start_depth, mode=mode, pixel_perm=perm,
            quota_rt=jnp.int32(k) if regen else None, literal=False)
        t["dispatch"] = tick() - t0

        t0 = tick()
        final = integrator.finalize(accum, spp)
        packed = jnp.concatenate([final.reshape(-1), rays.reshape(1)])
        t["finalize"] = tick() - t0

        t0 = tick()
        packed.block_until_ready()
        t["compute"] = tick() - t0

        t0 = tick()
        host = np.asarray(packed)
        t["fetch"] = tick() - t0

        t0 = tick()
        final_np = host[:npix * 3].reshape(npix, 3)
        img = final_np[inv_perm] if inv_perm is not None else final_np
        img = np.ascontiguousarray(img)
        t["image"] = tick() - t0
        t["wall"] = sum(t.values())
        if timed is not None:
            timed.append(t)
        return host[-1]

    one_render(None)  # warm
    rows = []
    for _ in range(reps):
        one_render(rows)
    keys = ["prep", "dispatch", "finalize", "compute", "fetch", "image",
            "wall"]
    best = {kk: sorted(r[kk] for r in rows)[1] for kk in keys}  # 2nd-best
    med = {kk: sorted(r[kk] for r in rows)[len(rows) // 2] for kk in keys}
    print(f"{'phase':10s} {'2nd-best ms':>12s} {'median ms':>10s}")
    for kk in keys:
        print(f"{kk:10s} {best[kk]*1e3:12.1f} {med[kk]*1e3:10.1f}")
    n_rays = float(one_render(None))
    wall2 = med["wall"]
    print(f"~{n_rays/1e6:.0f} Mrays -> {n_rays/wall2/1e6:.0f} Mray/s at "
          f"median wall (public render adds PRNG-key + schedule prologue)")

    # reference point: the public pipeline on the same workload
    kw = dict(out_dir=None, verbose=False, progress_snapshots=False,
              device_buffers=bufs, device_mode=mode)
    pt.render(scene, cfg, **kw)
    pub = sorted((pt.render(scene, cfg, **kw) for _ in range(4)),
                 key=lambda d: d.duration)[1]
    print(f"pt.render wall {pub.duration*1e3:.1f} ms  "
          f"{pub.stats.mrays_per_sec:.1f} Mray/s")


if __name__ == "__main__":
    main()
