"""Essential-FLOPs-per-ray-segment counter for the v3 regen kernel.

Traces the kernel's pure components (make_prim_scan, shade_phase,
make_raygen — exactly the functions the Pallas kernel inlines) with
jax.make_jaxpr and counts f32 arithmetic primitives per lane. "Essential"
= adds/muls/divs/sqrts/transcendentals only; compares, selects, casts and
logical ops are NOT counted (they occupy VPU issue slots but are not FLOPs
— so the derived utilization is a LOWER bound on VPU occupancy).

Usage:  python scripts/count_flops.py [scene_id]
Import: flops_per_segment(scene) -> dict of per-component flops/segment.

The result feeds bench.py's `mfu` field (VERDICT.md round-1 item #5) and
PERF.md's roofline section.
"""

from __future__ import annotations

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
import numpy as np

# flops per element for each counted primitive. Transcendentals count 1
# (their polynomial cost is implementation detail, not algorithmic work —
# the conservative MFU convention).
_FLOP_PRIMS = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "neg": 1,
    "max": 1, "min": 1, "abs": 1,
    "sqrt": 1, "rsqrt": 1, "cos": 1, "sin": 1, "exp": 1, "log": 1,
}


def _count_jaxpr(jaxpr, per_lane_elems):
    """Sum flops over all eqns (recursing into sub-jaxprs), per lane."""
    total = 0
    for eqn in jaxpr.eqns:
        for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(
            jax.core, "jaxprs_in_params"
        ) else _sub_jaxprs(eqn.params):
            total += _count_jaxpr(sub, per_lane_elems)
        name = eqn.primitive.name
        if name == "integer_pow":
            n = abs(eqn.params["y"]) - 1
            elems = int(np.prod(eqn.outvars[0].aval.shape, dtype=np.int64))
            total += n * elems
            continue
        flops = _FLOP_PRIMS.get(name)
        if flops is None:
            continue
        elems = int(np.prod(eqn.outvars[0].aval.shape, dtype=np.int64))
        total += flops * elems
    return total


def _sub_jaxprs(params):
    out = []
    for v in params.values():
        if isinstance(v, jax.core.ClosedJaxpr):
            out.append(v.jaxpr)
        elif isinstance(v, jax.core.Jaxpr):
            out.append(v)
        elif isinstance(v, (tuple, list)):
            for x in v:
                if isinstance(x, jax.core.ClosedJaxpr):
                    out.append(x.jaxpr)
                elif isinstance(x, jax.core.Jaxpr):
                    out.append(x)
    return out


def _per_lane(fn, *args):
    shape = (8, 256)
    n = int(np.prod(shape))
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _count_jaxpr(jaxpr.jaxpr, n) / n


# kernel-body plumbing the components don't cover, hand-counted from
# trace_v2's regen kernel: hit point o + d*tmin (6), sphere-normal
# recompute sub/rsqrt/normalize (~12), depth/done/counts updates (~5).
BODY_FLOPS = 23


def flops_per_segment(scene) -> dict:
    """Per-component essential flops per traced ray segment for the
    static-scene (v3) regen kernel on `scene` (a loaded Scene)."""
    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas import trace_v2
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        make_raygen, shade_phase,
    )

    packed = pack_scene(scene)
    consts = trace_v2.build_scene_consts(packed)
    if consts is None:
        raise ValueError("scene has triangles — use the portal/mesh path")
    prims, bnd = consts
    scan = trace_v2.make_prim_scan(prims, bnd)

    shape = (8, 256)
    v = jnp.zeros(shape, jnp.float32)
    v3 = [v, v, v]
    b = jnp.zeros(shape, bool)

    n_scan = _per_lane(lambda o0: scan([o0, v, v], v3, v)[0], v)

    def shade(d0):
        return shade_phase(
            [d0, v, v], v3, v3, v3, v, b, v3, v3, [v, v, v, v],
            v, 12, 5,
        )[0][0]

    n_shade = _per_lane(shade, v)

    cam_consts = trace_v2.build_camera_consts(scene.camera, 1024, 768)

    def rg(pix):
        raygen, _ = make_raygen(cam_consts, pix)
        return raygen(v, v, v)[0]

    n_raygen = _per_lane(rg, v)

    total = n_scan + n_shade + n_raygen + BODY_FLOPS
    return {
        "prim_scan": round(n_scan, 1),
        "shade": round(n_shade, 1),
        "raygen": round(n_raygen, 1),
        "body": BODY_FLOPS,
        "total": round(total, 1),
    }


def main():
    import path_tracer_tpu as pt

    os.chdir(_ROOT)
    scene_id = sys.argv[1] if len(sys.argv) > 1 else "cornell"
    scene = pt.load_scene(scene_id, "scenes")
    out = flops_per_segment(scene)
    print(f"{scene_id}: {out}")


if __name__ == "__main__":
    main()
