"""Measure, per bounce, what fraction of alive ray segments in the `mesh`
scene actually need the 810-triangle mctri mesh tested — i.e. their ray hits
the mesh's AABB at an entry distance closer than the best hit among the
CHEAP geometry (walls + spheres).

This is the design statistic for a portal/suspend two-kernel architecture:
throughput_bound = 1 / (f_cheap/rate_cheap + f_mesh/rate_mesh).

Runs on CPU (conftest-style forcing) at modest resolution.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.models.scene import pack_scene
from path_tracer_tpu.models.scenes import load_scene
from path_tracer_tpu.ops import rng
from path_tracer_tpu.ops.bsdf import sample_bsdf
from path_tracer_tpu.ops.intersect import intersect_scene
from path_tracer_tpu.render.raygen import generate_rays


def main(scene_id="mesh", res_y=96, spp=4, max_depth=12, rr_start_depth=5):
    desc = load_scene(scene_id, scene_dir="scenes", mesh_dir="meshes")
    packed = pack_scene(desc)
    scene = {k: jnp.asarray(v) for k, v in packed.buffers().items()}

    # find the big mesh (mctri): mesh index owning the most triangles
    tm = np.asarray(packed.tri_mesh[: packed.num_triangles])
    counts = np.bincount(tm, minlength=packed.num_meshes)
    big_mesh = int(np.argmax(counts))
    print(f"meshes: {counts.tolist()}  -> big mesh = {big_mesh} "
          f"({counts[big_mesh]} tris)")
    sel = tm == big_mesh
    verts = np.asarray(packed.tri_v[: packed.num_triangles])[sel].reshape(-1, 3)
    lo = jnp.asarray(verts.min(axis=0) - 1e-4)
    hi = jnp.asarray(verts.max(axis=0) + 1e-4)
    print(f"mctri AABB lo={np.asarray(lo)}, hi={np.asarray(hi)}")

    # cheap scene = everything except the big mesh's triangles
    cheap = dict(scene)
    keep = ~jnp.asarray(
        np.pad(sel, (0, packed.tri_v.shape[0] - len(sel)), constant_values=False)
    )
    cheap["tri_v"] = jnp.where(
        keep[:, None, None], scene["tri_v"], jnp.float32(1e30)
    )

    w = res_y * 3 // 2
    h = res_y
    npix = w * h
    from path_tracer_tpu.render.raygen import camera_arrays

    cam = camera_arrays(desc.camera)
    key = jax.random.PRNGKey(7)

    pixel_idx = jnp.tile(jnp.arange(npix, dtype=jnp.int32), spp)
    sample_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), npix)
    u = rng.raygen_uniforms(key, (pixel_idx.shape[0],), 2)
    o, d = generate_rays(pixel_idx, sample_idx, u, cam, w, h)

    n = o.shape[0]
    thr = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    prev_tri = jnp.full((n,), -1, jnp.int32)

    tot_alive = 0
    tot_mesh = 0
    tot_hit_mesh = 0
    tot_tainted = 0
    ever_mesh = jnp.zeros((n,), bool)  # path has needed the mesh at least once
    for s in range(max_depth):
        hit = intersect_scene(o, d, scene, mode="fast", prev_tri=prev_tri)
        cheap_hit = intersect_scene(o, d, cheap, mode="fast", prev_tri=prev_tri)

        # slab test vs the big mesh AABB
        invd = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        ta = (lo[None, :] - o) * invd
        tb = (hi[None, :] - o) * invd
        t_en = jnp.max(jnp.minimum(ta, tb), axis=1)
        t_ex = jnp.min(jnp.maximum(ta, tb), axis=1)
        aabb_hit = (t_ex >= jnp.maximum(t_en, 0.0)) & (t_ex > 1e-4)
        needs_mesh = alive & aabb_hit & (t_en < cheap_hit.t)

        hit_is_mesh = alive & hit.found & (hit.t < cheap_hit.t)

        ever_mesh = ever_mesh | needs_mesh
        na = int(jnp.sum(alive))
        nm = int(jnp.sum(needs_mesh))
        nh = int(jnp.sum(hit_is_mesh))
        nt = int(jnp.sum(alive & ever_mesh))
        tot_alive += na
        tot_mesh += nm
        tot_hit_mesh += nh
        tot_tainted += nt
        if na == 0:
            break
        print(f"bounce {s:2d}: alive {na:7d}  needs_mesh {nm:7d} "
              f"({100.0*nm/max(na,1):5.1f}%)  hits_mesh {nh:7d} "
              f"({100.0*nh/max(na,1):5.1f}%)  tainted {nt:7d} "
              f"({100.0*nt/max(na,1):5.1f}%)")

        found = hit.found & alive
        nd = jnp.sum(hit.normal * d, axis=-1)
        nl = jnp.where((nd < 0.0)[:, None], hit.normal, -hit.normal)
        uu = rng.bounce_uniforms(key, s, (n,), 4)
        new_depth = s + 1
        max_refl = jnp.max(hit.color, axis=-1)
        rr_applies = new_depth > rr_start_depth
        survive = (uu[:, 0] < max_refl) & (new_depth < max_depth)
        die_rr = rr_applies & ~survive
        scale = jnp.where(
            rr_applies & survive, 1.0 / jnp.maximum(max_refl, 1e-30), 1.0
        )
        bs = sample_bsdf(d, hit.normal, nl, hit.rtype, uu[:, 1:4])
        thr_new = thr * hit.color * scale[:, None] * bs.weight
        alive = found & ~die_rr & (jnp.max(thr_new, axis=-1) > 0.0)
        o = jnp.where(alive[:, None], hit.point, o)
        d = jnp.where(alive[:, None], bs.direction, d)
        thr = jnp.where(alive[:, None], thr_new, 0.0)
        prev_tri = hit.tri

    p1 = float(jnp.mean(ever_mesh.astype(jnp.float32)))
    print(f"\nTOTAL segments: {tot_alive}  needs_mesh: {tot_mesh} "
          f"({100.0*tot_mesh/tot_alive:.1f}%)  actually hits mesh: "
          f"{tot_hit_mesh} ({100.0*tot_hit_mesh/tot_alive:.1f}%)")
    print(f"tainted segments (at/after first encounter): {tot_tainted} "
          f"({100.0*tot_tainted/tot_alive:.1f}%)")
    print(f"P(path ever needs mesh) = {100.0*p1:.1f}%  "
          f"(suspensions per sample in a suspend-on-first-touch design)")
    f = tot_mesh / tot_alive
    for cheap_rate, mesh_rate in [(2000.0, 35.0), (3000.0, 60.0),
                                  (2000.0, 100.0)]:
        bound = 1.0 / ((1 - f) / cheap_rate + f / mesh_rate)
        print(f"  portal bound @ cheap={cheap_rate:.0f}, mesh={mesh_rate:.0f}"
              f" Mray/s -> {bound:.0f} Mray/s")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*args) if args else main()
