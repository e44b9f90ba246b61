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

# VPU issue-SLOT cost per element: every elementwise vector op occupies an
# ALU slot whether or not it is a FLOP. Compares/selects/logic/converts are
# the branchy half of a path tracer that the FLOP count discounts; counting
# them bounds the attainable Mray/s for THIS instruction mix (the roofline
# derivation, PERF.md). Transcendentals/div/sqrt expand to multi-slot
# polynomial/Newton sequences on the VPU — counted at a conservative 4.
# mul+add pairs the compiler fuses into one FMA slot are still counted as
# 2, so the slot count is an over-estimate in exactly the places the
# 4-slot transcendentals under-estimate; the derived ceiling is an
# ESTIMATE, good to tens of percent, not a measurement.
_SLOT_PRIMS = dict(_FLOP_PRIMS)
_SLOT_PRIMS.update({
    "div": 4, "sqrt": 4, "rsqrt": 4, "cos": 4, "sin": 4, "exp": 4,
    "log": 4,
    "eq": 1, "ne": 1, "lt": 1, "le": 1, "gt": 1, "ge": 1,
    "select_n": 1, "and": 1, "or": 1, "xor": 1, "not": 1,
    "convert_element_type": 1, "sign": 1, "floor": 1, "ceil": 1,
    "round": 1, "rem": 1, "shift_left": 1, "shift_right_logical": 1,
    "shift_right_arithmetic": 1, "iota": 1,
})


def _count_jaxpr(jaxpr, per_lane_elems, table=None):
    """Sum flops over all eqns (recursing into sub-jaxprs), per lane."""
    table = _FLOP_PRIMS if table is None else table
    total = 0
    for eqn in jaxpr.eqns:
        for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(
            jax.core, "jaxprs_in_params"
        ) else _sub_jaxprs(eqn.params):
            total += _count_jaxpr(sub, per_lane_elems, table)
        name = eqn.primitive.name
        if name == "integer_pow":
            n = abs(eqn.params["y"]) - 1
            elems = int(np.prod(eqn.outvars[0].aval.shape, dtype=np.int64))
            total += n * elems
            continue
        flops = table.get(name)
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


def _per_lane(fn, *args, table=None):
    shape = (8, 256)
    n = int(np.prod(shape))
    jaxpr = jax.make_jaxpr(fn)(*args)
    return _count_jaxpr(jaxpr.jaxpr, n, table) / n


# kernel-body plumbing the components don't cover, hand-counted from
# trace_v2's regen kernel: hit point o + d*tmin (6), sphere-normal
# recompute sub/rsqrt/normalize (~12), depth/done/counts updates (~5).
BODY_FLOPS = 23


def flops_per_segment(scene, *, slots: bool = False) -> dict:
    """Per-component essential flops per traced ray segment for the
    static-scene (v3) regen kernel on `scene` (a loaded Scene).
    slots=True counts VPU issue slots instead (see _SLOT_PRIMS) — the
    denominator of the attainable-Mray/s roofline for this instruction
    mix."""
    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops.pallas import trace_v2
    from path_tracer_tpu.ops.pallas.trace_kernel import (
        make_raygen, shade_phase,
    )

    table = _SLOT_PRIMS if slots else None
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

    n_scan = _per_lane(lambda o0: scan([o0, v, v], v3, v)[0], v,
                       table=table)

    def shade(d0):
        return shade_phase(
            [d0, v, v], v3, v3, v3, v, b, v3, v3, [v, v, v, v],
            v, 12, 5,
        )[0][0]

    n_shade = _per_lane(shade, v, table=table)

    cam_consts = trace_v2.build_camera_consts(scene.camera, 1024, 768)

    def rg(pix):
        raygen, _ = make_raygen(cam_consts, pix)
        return raygen(v, v, v)[0]

    n_raygen = _per_lane(rg, v, table=table)

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
    print(f"{scene_id} flops: {out}")
    sl = flops_per_segment(scene, slots=True)
    print(f"{scene_id} slots: {sl}")
    # attainable ceiling for this mix on a v5e TensorCore VPU:
    # 8x128 lanes x 4 ALUs x 1.5 GHz = 6.14e12 issue slots/s
    peak_slots = 8 * 128 * 4 * 1.5e9
    print(f"slot-roofline: {peak_slots / sl['total'] / 1e6:.0f} Mray/s "
          f"(vs measured headline — see PERF.md)")


if __name__ == "__main__":
    main()
