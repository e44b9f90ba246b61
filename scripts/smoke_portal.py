"""Smoke-test the portal path end to end on CPU (interpret mode): render the
mesh scene small via the portal scheduler and compare to the XLA fast path."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from jax.experimental.pallas import tpu as pltpu

import path_tracer_tpu as pt
from path_tracer_tpu.render import pipeline
from path_tracer_tpu.utils.config import RenderConfig, Resolution

scene = pt.load_scene("mesh", "scenes")
res = Resolution.from_height(32)
spp = 4
# depth 2: deterministic-ish (RR never fires); remaining difference is only
# tent-filter/BSDF draw noise between the kernel PRNG and threefry
depth = int(sys.argv[1]) if len(sys.argv) > 1 else 2
cfg = RenderConfig(samples_per_pixel=spp, resolution=res, backend="pallas",
                   max_depth=depth)

t0 = time.time()
bufs, mode = pipeline.prepare_scene_and_mode(scene, "pallas", res)
print("mode:", mode, f"({time.time()-t0:.1f}s)")
assert mode.startswith("portal:"), mode

with pltpu.force_tpu_interpret_mode():
    done = pipeline.render(
        scene, cfg, out_dir=None, device_buffers=bufs, device_mode=mode,
        verbose=True,
    )
img_portal = np.asarray(done.image.pixels)
print("portal render ok", img_portal.shape, img_portal.mean(axis=(0, 1)),
      "rays", done.stats.num_rays, f"({time.time()-t0:.1f}s)")

cfg2 = RenderConfig(samples_per_pixel=spp, resolution=res, backend="jnp",
                    max_depth=depth)
done2 = pipeline.render(scene, cfg2, out_dir=None, verbose=False)
img_fast = np.asarray(done2.image.pixels)
print("fast render ok ", img_fast.mean(axis=(0, 1)), "rays",
      done2.stats.num_rays)

rmse = float(np.sqrt(((img_portal - img_fast) ** 2).mean()))
print(f"RMSE(portal, fast) @ {spp}spp = {rmse:.4f}")
