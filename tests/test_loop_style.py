"""Regen loop-style heuristic (trace_v2.probe_loop_style).

The style must derive from EXPECTED PATH LENGTH (scene openness), not
prim count: an enclosed 6-wall box has <= 8 prims but long paths, where
fori+cond is measured ~20% faster than the early-exit while loop
(trace_kernel.regen_loop docstring); an open sphere scene dies in a
bounce or two, where the while loop's early exit wins. Pure host-numpy
probe — no kernels compiled here; the hardware optimality of the picks
themselves is the PERF.md sync-sweep / fusion record.
"""

import numpy as np
import pytest

from path_tracer_tpu.models.scene import SceneDescriptor, pack_scene
from path_tracer_tpu.models.scenes import _cornell_box, builtin_scenes
from path_tracer_tpu.ops.pallas import trace_v2


def _consts_and_cam(scene, w=1024, h=768):
    consts = trace_v2.build_scene_consts(pack_scene(scene))
    assert consts is not None
    cam = trace_v2.build_camera_consts(scene.camera, w, h)
    return consts, cam


@pytest.mark.parametrize(
    "scene_id,expected",
    [
        # the measured-optimal choices (PERF.md: cornell fori sync-sweep
        # 2924->4098; single-sphere while +20% over fori) — the probe
        # must keep picking them
        ("single-sphere", "while"),
        ("two-spheres", "while"),
        ("three-spheres", "while"),
        ("cartesian", "while"),
        ("cornell", "fori"),
    ],
)
def test_builtin_picks_preserved(scene_id, expected):
    scene = next(s for s in builtin_scenes() if s.id == scene_id)
    consts, cam = _consts_and_cam(scene)
    assert trace_v2.probe_loop_style(consts[0], cam, 10, 5) == expected


def test_enclosed_few_prim_box_picks_fori():
    """The failure case a prim-count proxy mispicks (CLAUDE.md named it
    for two rounds): 6 diffuse walls fully enclosing the camera — only
    6 prims after quad collapse, but no ray ever escapes, so paths run
    to RR/max_depth and fori must win."""
    cornell = next(s for s in builtin_scenes() if s.id == "cornell")
    box = SceneDescriptor(
        id="enclosed-box", objects=_cornell_box()[:6], camera=cornell.camera
    )
    consts, cam = _consts_and_cam(box)
    assert len(consts[0]) <= 8  # the old `prims <= 8 -> while` territory
    assert trace_v2.probe_loop_style(consts[0], cam, 10, 5) == "fori"


def test_probe_is_cheap_and_deterministic():
    """The probe runs at kernel-build time: it must be milliseconds and
    return a stable pick (it is a static compile flag — a flappy pick
    would thrash the jit cache across processes)."""
    import time

    scene = next(s for s in builtin_scenes() if s.id == "cornell")
    consts, cam = _consts_and_cam(scene)
    first = trace_v2.probe_loop_style(consts[0], cam, 10, 5)
    trace_v2.probe_loop_style.cache_clear()
    t0 = time.perf_counter()
    again = trace_v2.probe_loop_style(consts[0], cam, 10, 5)
    dt = time.perf_counter() - t0
    assert again == first
    assert dt < 0.5  # uncached cost at kernel-build time (measured ~20 ms)


def test_open_many_prim_scene_picks_while():
    """The dual failure case of the prim-count proxy: MANY prims but
    wide-open geometry (a sparse 3x3 grid of small spheres) — most
    paths escape immediately, so the early-exit while loop is right
    even though nprims > 8."""
    from path_tracer_tpu.models.material import Material, ReflectType
    from path_tracer_tpu.models.scene import SceneObject

    cornell = next(s for s in builtin_scenes() if s.id == "cornell")
    objs = [
        SceneObject.sphere(
            np.array([x, y, 0.0], np.float32), 0.2,
            Material(np.array([0.8, 0.8, 0.8], np.float32),
                     np.zeros(3, np.float32), ReflectType.DIFFUSE),
        )
        for x in (-1.0, 0.0, 1.0)
        for y in (-1.0, 0.0, 1.0)
    ]
    grid = SceneDescriptor(id="sphere-grid", objects=objs,
                           camera=cornell.camera)
    consts, cam = _consts_and_cam(grid)
    assert len(consts[0]) > 8
    assert trace_v2.probe_loop_style(consts[0], cam, 10, 5) == "while"
