"""Regen prim-major kernel on the mesh scene: tiles on/off x block size.

Usage: python scripts/bench_regen_mesh.py [tiles01] [block] [quota]
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
from path_tracer_tpu.render.pipeline import morton_pixel_order
from path_tracer_tpu.utils.config import Resolution


def main():
    tiles = bool(int(sys.argv[1])) if len(sys.argv) > 1 else True
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    quota = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    tk.SYNC_EVERY = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    if not tiles:
        tk.TILE_THRESHOLD = 10**9

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(768, 1024)
    packed = pt.pack_scene(scene)
    kscene = tk.kernel_scene_buffers(packed)
    print("tiled:", "tile_lo" in kscene, "T:", kscene["tri_na"].shape[1])
    cam_consts = tv2.build_camera_consts(scene.camera, res.width, res.height)
    npix = res.num_pixels
    perm_np, _ = morton_pixel_order(res.width, res.height)
    n_pad = ((npix + block - 1) // block) * block
    pix = np.concatenate([perm_np, np.zeros(n_pad - npix, perm_np.dtype)])
    pix = jnp.asarray(pix, jnp.int32)

    def run(seed):
        return tk.trace_pallas_regen_prim(
            pix, kscene, cam_consts, seed, 0, quota=quota, block=block,
        )

    t0 = time.perf_counter()
    rad, rays = run(0)
    r = float(np.asarray(rays))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s rays={r:.0f} "
          f"(tiles={tiles}, block={block}, quota={quota}, sync={tk.SYNC_EVERY})")
    times = []
    for rep in range(4):
        t0 = time.perf_counter()
        rad, rays = run(rep + 1)
        r = float(np.asarray(rays))
        _ = np.asarray(rad[:8])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {rep}: {dt*1e3:.1f} ms  {r/dt/1e6:.1f} Mray/s")
    best2 = sorted(times)[1]
    print(f"RESULT tiles={tiles} block={block} quota={quota} sync={tk.SYNC_EVERY}: "
          f"{best2*1e3:.1f} ms  {r/best2/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()
