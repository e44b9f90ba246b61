"""Measure trace_pallas_sorted on the mesh scene vs the regen baseline.

Usage: python scripts/bench_sorted.py [sort_every] [dir_major] [block] [k]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
import path_tracer_tpu.ops.pallas.trace_kernel as tk
from path_tracer_tpu.ops import rng
from path_tracer_tpu.render.pipeline import morton_pixel_order
from path_tracer_tpu.render.raygen import camera_arrays, generate_rays
from path_tracer_tpu.utils.config import Resolution


def main():
    sort_every = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    dir_major = bool(int(sys.argv[2])) if len(sys.argv) > 2 else False
    block = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    k = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(768, 1024)
    packed = pt.pack_scene(scene)
    kscene = tk.kernel_scene_buffers(packed)
    cam = {kk: jnp.asarray(v) for kk, v in camera_arrays(scene.camera).items()}
    npix = res.num_pixels
    perm_np, _ = morton_pixel_order(res.width, res.height)
    base = jnp.asarray(perm_np)
    key = rng.root_key(0)

    @jax.jit
    def make_rays(pass_idx):
        pk = rng.chunk_key(key, pass_idx)
        pixel_idx = jnp.repeat(base, k)
        sample_idx = jnp.tile(jnp.arange(k, dtype=jnp.int32), npix)
        u = rng.raygen_uniforms(pk, (pixel_idx.shape[0],), 2)
        return generate_rays(pixel_idx, sample_idx, u, cam, res.width, res.height)

    o, d = make_rays(jnp.int32(0))
    n = o.shape[0]
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        o = jnp.concatenate([o, jnp.full((n_pad - n, 3), 1e30, jnp.float32)])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_pad - n, 1))])

    def run(seed):
        rad, rays = tk.trace_pallas_sorted(
            o, d, kscene, seed, block=block, sort_every=sort_every,
            dir_major=dir_major,
        )
        return rad, rays

    t0 = time.perf_counter()
    rad, rays = run(0)
    r = float(np.asarray(rays))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s rays={r:.0f} "
          f"(n={n_pad}, sort_every={sort_every}, dir_major={dir_major}, "
          f"block={block})")
    times = []
    for rep in range(5):
        t0 = time.perf_counter()
        rad, rays = run(rep + 1)
        r = float(np.asarray(rays))
        _ = np.asarray(rad[:8])
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"rep {rep}: {dt*1e3:.1f} ms  {r/dt/1e6:.1f} Mray/s")
    best2 = sorted(times)[1]
    print(f"RESULT 2nd-best: {best2*1e3:.1f} ms  {r/best2/1e6:.1f} Mray/s")


if __name__ == "__main__":
    main()
