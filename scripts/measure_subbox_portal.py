"""How much does a K-sub-AABB portal tighten the freeze test?

Splits the heavy mesh's triangles into K leaf AABBs (median split on the
longest axis) and replays the measure_mesh_fraction bounce loop, comparing
per-segment freeze rates: 1 box vs K boxes vs the true hit rate (the
irreducible floor). Decides whether false-positive freezes (segments through
empty AABB space) are worth attacking in the portal cheap kernel.

Run on CPU: python scripts/measure_subbox_portal.py [res_y] [spp]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from path_tracer_tpu.models.scene import pack_scene
from path_tracer_tpu.models.scenes import load_scene
from path_tracer_tpu.ops import rng
from path_tracer_tpu.ops.bsdf import sample_bsdf
from path_tracer_tpu.ops.intersect import intersect_scene
from path_tracer_tpu.render.raygen import camera_arrays, generate_rays


def split_boxes(tris, K):
    """tris [T,3,3] -> list of (lo,hi) for K median-split leaves."""
    cent = tris.mean(axis=1)
    groups = [np.arange(len(tris))]
    while len(groups) < K:
        # split the group with the largest AABB volume
        vols = []
        for g in groups:
            v = tris[g].reshape(-1, 3)
            ext = v.max(0) - v.min(0)
            vols.append(ext.prod())
        gi = int(np.argmax(vols))
        g = groups.pop(gi)
        if len(g) < 2:
            groups.append(g)
            break
        v = tris[g].reshape(-1, 3)
        ax = int(np.argmax(v.max(0) - v.min(0)))
        order = np.argsort(cent[g, ax])
        h = len(g) // 2
        groups.append(g[order[:h]])
        groups.append(g[order[h:]])
    out = []
    for g in groups:
        v = tris[g].reshape(-1, 3)
        out.append((v.min(0) - 1e-4, v.max(0) + 1e-4))
    return out


def main(res_y=96, spp=4, max_depth=12, rr_start_depth=5):
    os.chdir(_ROOT)
    desc = load_scene("mesh", scene_dir="scenes", mesh_dir="meshes")
    packed = pack_scene(desc)
    scene = {k: jnp.asarray(v) for k, v in packed.buffers().items()}

    tm = np.asarray(packed.tri_mesh[: packed.num_triangles])
    counts = np.bincount(tm, minlength=packed.num_meshes)
    big = int(np.argmax(counts))
    sel = tm == big
    tris = np.asarray(packed.tri_v[: packed.num_triangles])[sel]

    KS = [1, 4, 8, 16, 32, 64]
    boxes_k = {K: split_boxes(tris, K) for K in KS}
    for K in KS:
        vol = sum((hi - lo).prod() for lo, hi in boxes_k[K])
        print(f"K={K:3d}: total box volume {vol:8.4f}")

    cheap = dict(scene)
    keep = ~jnp.asarray(
        np.pad(sel, (0, scene["tri_v"].shape[0] - len(sel)),
               constant_values=False)
    )
    cheap["tri_v"] = jnp.where(
        keep[:, None, None], scene["tri_v"], jnp.float32(1e30)
    )
    cheap.pop("tri_coeffs", None)

    w, h = res_y * 3 // 2, res_y
    npix = w * h
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

    tot = {K: 0 for K in KS}
    tot_alive = 0
    tot_hit = 0

    def needs(boxes, o, d, cheap_t, alive):
        m = jnp.zeros((o.shape[0],), bool)
        invd = 1.0 / jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
        for lo, hi in boxes:
            ta = (jnp.asarray(lo)[None] - o) * invd
            tb = (jnp.asarray(hi)[None] - o) * invd
            t_en = jnp.max(jnp.minimum(ta, tb), axis=1)
            t_ex = jnp.min(jnp.maximum(ta, tb), axis=1)
            ok = (t_ex >= jnp.maximum(t_en, 0.0)) & (t_ex > 0.0)
            m = m | (ok & (t_en <= cheap_t))
        return m & alive

    for s in range(max_depth):
        hit = intersect_scene(o, d, scene, mode="fast", prev_tri=prev_tri)
        cheap_hit = intersect_scene(o, d, cheap, mode="fast", prev_tri=prev_tri)
        na = int(jnp.sum(alive))
        if na == 0:
            break
        tot_alive += na
        tot_hit += int(jnp.sum(alive & hit.found & (hit.t < cheap_hit.t)))
        for K in KS:
            tot[K] += int(jnp.sum(needs(boxes_k[K], o, d, cheap_hit.t, alive)))

        found = hit.found & alive
        nd = jnp.sum(hit.normal * d, axis=-1)
        nl = jnp.where((nd < 0.0)[:, None], hit.normal, -hit.normal)
        uu = rng.bounce_uniforms(key, s, (n,), 4)
        new_depth = s + 1
        max_refl = jnp.max(hit.color, axis=-1)
        rr_applies = new_depth > rr_start_depth
        survive = (uu[:, 0] < max_refl) & (new_depth < max_depth)
        die_rr = rr_applies & ~survive
        scale = jnp.where(rr_applies & survive,
                          1.0 / jnp.maximum(max_refl, 1e-30), 1.0)
        bs = sample_bsdf(d, hit.normal, nl, hit.rtype, uu[:, 1:4])
        thr_new = thr * hit.color * scale[:, None] * bs.weight
        alive = found & ~die_rr & (jnp.max(thr_new, axis=-1) > 0.0)
        o = jnp.where(alive[:, None], hit.point, o)
        d = jnp.where(alive[:, None], bs.direction, d)
        thr = jnp.where(alive[:, None], thr_new, 0.0)
        prev_tri = hit.tri

    print(f"\nsegments: {tot_alive}; TRUE mesh hits: {tot_hit} "
          f"({100.0 * tot_hit / tot_alive:.2f}%)")
    for K in KS:
        print(f"K={K:3d}: freeze {tot[K]:8d} ({100.0*tot[K]/tot_alive:5.2f}%)"
              f"  false-positive x{tot[K]/max(tot_hit,1):.2f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a)) if a else main()
