"""Step-composition ablation for the cornell v3 regen kernel.

Forces the regen fori loop to execute every step (patching the all-done
reduce to "always work left"), so wall time divided by the fixed step
count gives a clean per-step cost — then ablates one component at a time:

    full     forced-all-steps baseline
    prng2x   _uniform drawn twice and averaged (+1x PRNG cost -> slope)
    noshade  shade_phase replaced by a passthrough stub
    half     prim scan over only the first half of the primitives

Shares: PRNG = T(prng2x)-T(full); shade = T(full)-T(noshade);
isect ~= 2*(T(full)-T(half)) (cornell: 11 prims -> 5); the remainder is
raygen + state plumbing + loop bookkeeping. Timing-only — the ablated
kernels render garbage by design.

Usage: python scripts/ablate_step.py <variant> [spp]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/root/repo")

import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
import path_tracer_tpu.ops.pallas.trace_kernel as tk
import path_tracer_tpu.ops.pallas.trace_v2 as tv2
from path_tracer_tpu.ops import rng
from path_tracer_tpu.render import integrator
from path_tracer_tpu.render.pipeline import (
    morton_pixel_order, prepare_scene_and_mode,
)
from path_tracer_tpu.render.raygen import camera_arrays
from path_tracer_tpu.utils.config import Resolution


def apply_variant(name: str):
    # force every loop step to run: per-step wall no longer depends on the
    # (semantics-breaking) ablations below
    tk._scalar_any_left = lambda done, quota: jnp.float32(1.0)

    if name == "full":
        pass
    elif name == "prng2x":
        orig = tk._uniform
        tk._uniform = lambda shape: (orig(shape) + orig(shape)) * 0.5
    elif name == "noshade":
        def stub(d, nrm, color, emis, rtype, found, thr, acc, u4,
                 new_depth, max_depth, rr_start_depth):
            alive = found & (new_depth < max_depth)
            return acc, thr, d, alive
        tk.shade_phase = stub
    elif name == "half":
        orig_make = tv2.make_prim_scan
        tv2.make_prim_scan = lambda prims, bnd: orig_make(
            prims[: max(len(prims) // 2, 1)], bnd)
    else:
        raise SystemExit(f"unknown variant {name}")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    apply_variant(variant)

    scene = pt.load_scene("cornell", "scenes")
    res = Resolution(768, 1024)
    bufs, mode = prepare_scene_and_mode(scene, "auto", res)
    cam = {k: jnp.asarray(v) for k, v in camera_arrays(scene.camera).items()}
    base_key = rng.root_key(0)
    perm_np, _ = morton_pixel_order(res.width, res.height)
    perm = jnp.asarray(perm_np)
    npix = res.num_pixels
    k = min(spp, 256)
    n_passes = -(-spp // k)
    # forced loop: ceil(quota*max_depth / sync) * sync steps per pass
    se = tv2.SYNC_EVERY_V3
    steps = (-(-k * 12 // se)) * se * n_passes

    def run():
        accum = jnp.zeros((npix, 3), jnp.float32)
        for i in range(n_passes):
            accum, _ = integrator.render_pass(
                bufs, cam, accum, jnp.int32(i), base_key,
                sample_base=jnp.int32(i * k), width=res.width, height=res.height, samples_in_pass=k,
                mode=mode, pixel_perm=perm,
            )
        return accum

    t0 = time.perf_counter()
    np.asarray(run()[:8])
    print(f"compile+run {time.perf_counter()-t0:.1f}s (variant={variant})")
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        np.asarray(run()[:8])
        times.append(time.perf_counter() - t0)
    best2 = sorted(times)[1]
    # per-step cost across the whole chip: all lanes (npix) run every step
    ns_per_step = best2 / steps * 1e9
    print(f"RESULT variant={variant}: {best2*1e3:.1f} ms for {steps} steps "
          f"-> {ns_per_step:.0f} ns/step (whole-frame)")


if __name__ == "__main__":
    main()
