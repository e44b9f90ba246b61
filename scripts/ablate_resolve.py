"""Composition ablation for the portal resolver (trace_pallas_resolve) on
a forced-no-cull workload: every ray aims through the mesh AABB, so every
Morton tile executes for every block — the frozen-lane regime the bulk
phase pays ~86 ns/lane for.

    full       baseline
    noshade    shade_phase stubbed
    constmat   all tiles read color/emis/rtype as per-tile constants
    halftiles  kscene truncated to half the Morton tiles (per-tile slope)
    nofetch    deferred MXU feature fetch skipped (PT_TPU_ABLATE)
    nomin      per-tile first-wins reduction -> plain min (PT_TPU_ABLATE)
    lanemask   per-lane slab candidacy applied to each tile result
               (PT_TPU_ABLATE; a no-op up to exact-tie edge cases already
               implied by the block cull — measures the pure COST of
               per-lane masking, the floor any per-lane culling scheme
               must beat before it saves anything)

Usage: python scripts/ablate_resolve.py <variant> [block]
Timing-only — ablated kernels render garbage by design. Run each variant
in a fresh process (kernel code paths are patched at import scope).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
if sys.argv[1:2] and sys.argv[1] in ("nofetch", "nomin", "lanemask"):
    os.environ["PT_TPU_ABLATE"] = sys.argv[1]  # before the tk import
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir("/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import path_tracer_tpu as pt
import path_tracer_tpu.ops.pallas.trace_kernel as tk
from path_tracer_tpu.models.scene import pack_scene


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    if variant == "noshade":
        def stub(d, nrm, color, emis, rtype, found, thr, acc, u4,
                 new_depth, max_depth, rr_start_depth):
            alive = found & (new_depth < max_depth)
            return acc, thr, d, alive
        tk.shade_phase = stub

    scene = pt.load_scene("mesh", "scenes")
    packed = pack_scene(scene)
    kscene, meta = tk.kernel_scene_buffers(packed, with_meta=True)
    const_tiles = None
    if variant == "constmat":
        const_tiles = meta["tile_uniform_mat"]
    if variant == "halftiles":
        C = kscene["tile_lo"].shape[1]
        T = kscene["tri_na"].shape[1]
        base = T - C * tk.TRI_TILE
        C2 = C // 2
        T2 = base + C2 * tk.TRI_TILE
        for k in list(kscene):
            if k.startswith("tri_"):
                kscene[k] = kscene[k][:, :T2]
        kscene["tile_lo"] = kscene["tile_lo"][:, :C2]
        kscene["tile_hi"] = kscene["tile_hi"][:, :C2]

    n = 786432
    key = jax.random.PRNGKey(0)
    # aim every ray at a jittered point inside the mesh AABB from random
    # room positions: no tile can cull, the frozen-lane regime
    verts = np.asarray(packed.tri_v[: packed.num_triangles]).reshape(-1, 3)
    mlo, mhi = verts.min(0), verts.max(0)
    ko, kt = jax.random.split(key)
    o = jax.random.uniform(ko, (3, n), minval=-1.5, maxval=1.5)
    o = o + jnp.asarray((mlo + mhi) / 2 + np.array([0, 0, 2.5]))[:, None]
    tgt = jax.random.uniform(
        kt, (3, n),
        minval=jnp.asarray(mlo)[:, None] * 0.9,
        maxval=jnp.asarray(mhi)[:, None] * 0.9,
    )
    d = tgt - o
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    thr = jnp.ones((3, n), jnp.float32)
    acc = jnp.zeros((3, n), jnp.float32)
    alive = jnp.ones((1, n), jnp.float32)
    prev = jnp.full((1, n), -1.0, jnp.float32)
    depth = jnp.full((1, n), 3.0, jnp.float32)

    def run():
        return tk.trace_pallas_resolve(
            o, d, thr, acc, alive, prev, depth, kscene, jnp.int32(7),
            max_depth=12, rr_start_depth=5, block=block,
            const_mat_tiles=const_tiles,
        )

    out = run()
    np.asarray(out[-1][0, :8])
    # k back-to-back calls on the SAME inputs per timed region, ONE fetch:
    # a single call + fetch measures the ~25 ms tunnel round-trip, not the
    # kernel (every ablation variant read a flat 43-50 ms that way)
    k = 16
    reps = []
    for _ in range(6):
        t0 = time.perf_counter()
        outs = [run() for _ in range(k)]
        np.asarray(outs[-1][-1][0, :8])
        reps.append((time.perf_counter() - t0) / k)
    dt = sorted(reps)[1]
    segs = float(np.asarray(jnp.sum(out[-1])))
    print(f"{variant} block={block}: {dt*1e3:7.2f} ms/call  "
          f"{dt/n*1e9:6.1f} ns/lane  ({segs:.0f} traced)")


if __name__ == "__main__":
    main()
