"""Standalone repro of tests/test_portal.py::test_drive_pool_v2_narrow_resolve
with timing prints (CPU interpret mode)."""
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.join(_ROOT, "tests"))
os.chdir(_ROOT)

from path_tracer_tpu.models.scene import pack_scene
from path_tracer_tpu.ops.pallas import portal as portal_mod
from path_tracer_tpu.ops.pallas import trace_v2
from path_tracer_tpu.ops.pallas.trace_kernel import (
    TILE_META, kernel_scene_buffers,
)
from path_tracer_tpu.render import portal as rportal
from path_tracer_tpu.render.portal import make_pool_v2
from path_tracer_tpu.utils.config import Resolution

from tests.test_portal import _synthetic_portal_scene

scene = _synthetic_portal_scene()
res = Resolution.from_height(24)
spp, depth = 2, 1
packed = pack_scene(scene)
portal = portal_mod.build_portal_consts(packed)
assert portal is not None, "not portal-eligible"
pkey = "portal:test-synth-72"
trace_v2.register_scene(pkey, portal[0])
cam_key = f"{pkey}:cam:{res.width}x{res.height}"
trace_v2.register_scene(cam_key, trace_v2.build_camera_consts(
    scene.camera, res.width, res.height))
kbufs, meta = kernel_scene_buffers(packed, with_meta=True)
TILE_META[pkey] = meta
npix = res.num_pixels
n_pad = rportal._round_block(npix)
print(f"npix={npix} n_pad={n_pad} tris={packed.num_triangles}")

t0 = time.time()


def on_check(cycle, width, unfin):
    print(f"  cycle={cycle} width={width} unfin={unfin} "
          f"t={time.time()-t0:.1f}s", flush=True)


with pltpu.force_tpu_interpret_mode():
    stages, rays = rportal.drive_pool_v2(
        make_pool_v2(npix, n_pad, spp, park_k=1), spp, 0, jnp.int32(5),
        kbufs, portal_key=pkey, cam_key=cam_key,
        max_depth=depth, rr_start_depth=5, check_every=1,
        ladder=(), adaptive_polls=False, step_cap=16,
        narrow_bufs=0, full_every=2, on_check=on_check,
    )
print(f"drive done in {time.time()-t0:.1f}s, rays={float(np.asarray(rays))}")
(pool,) = stages
pool = np.asarray(pool)
done = pool[portal_mod.V2_ROW_DONE][:npix]
print("done==spp:", bool(np.all(done == spp)),
      "min/max done:", done.min(), done.max())
print("rays >= npix*spp:", float(np.asarray(rays)) >= npix * spp)
for j in range(1):
    st = pool[portal_mod.buf_row(j, portal_mod.BUF_STATE)]
    print(f"buf {j} state nonzero: {int((st != 0).sum())}")
A0, A1 = portal_mod.ROW_ACC, portal_mod.ROW_ACC + 3
acc = pool[A0:A1][:, :npix]
print("acc finite/nonneg/mean:", np.isfinite(acc).all(),
      (acc >= 0).all(), acc.mean())
