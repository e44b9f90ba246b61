"""Does a k-DOP freeze test beat the AABB portal's false-positive rate?

The portal cheap kernel freezes any segment whose ray could enter the
heavy mesh's AABB before its cheap-scene hit (8.0% of segments vs a 3.6%
true-hit floor, measure_mesh_fraction). Sub-AABB splits only reached 6.7%
(measure_subbox_portal: the model nearly fills its axis-aligned box), but
the model is *rounded* — slabs along diagonal directions (a k-DOP, the
convex-polytope generalization of the slab test) can shave the corners an
AABB cannot. A k-DOP is conservative by construction (every mesh vertex
inside every slab), and each extra direction costs only ~8 VPU slots per
segment in the cheap kernel vs the 824-triangle resolve sweep it avoids.

Replays the measure_subbox_portal bounce loop and compares per-segment
freeze rates: AABB vs 7-DOP (axes + 4 corner diagonals) vs 13-DOP
(+ 6 edge diagonals) vs K sub-boxes x 13-DOP, against the true-hit floor.

Run on CPU: env -u PALLAS_AXON_POOL_IPS python scripts/measure_dop_portal.py [res_y] [spp]
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

AXES = np.eye(3, dtype=np.float64)
CORNERS = np.array(
    [[1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1]], np.float64
)
EDGES = np.array(
    [[1, 1, 0], [1, -1, 0], [1, 0, 1], [1, 0, -1], [0, 1, 1], [0, 1, -1]],
    np.float64,
)
DIR_SETS = {
    "aabb": AXES,
    "7-dop": np.concatenate([AXES, CORNERS / np.sqrt(3.0)]),
    "13-dop": np.concatenate(
        [AXES, CORNERS / np.sqrt(3.0), EDGES / np.sqrt(2.0)]
    ),
}


def dop_slabs(verts, dirs, pad=1e-4):
    """[k] direction rows -> (dirs, lo, hi) with relative+absolute padding
    (the same conservatism as build_portal_consts' padded AABB)."""
    proj = verts @ dirs.T  # [V, k]
    lo, hi = proj.min(0), proj.max(0)
    span = hi - lo
    lo = lo - pad * np.maximum(span, 1.0) - 1e-5
    hi = hi + pad * np.maximum(span, 1.0) + 1e-5
    return dirs.astype(np.float32), lo.astype(np.float32), hi.astype(np.float32)


def split_groups(tris, K):
    """Median-split triangle index groups (same scheme as the sub-box study)."""
    cent = tris.mean(axis=1)
    groups = [np.arange(len(tris))]
    while len(groups) < K:
        vols = []
        for g in groups:
            v = tris[g].reshape(-1, 3)
            vols.append((v.max(0) - v.min(0)).prod())
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
    return groups


def dop_freeze(o, d, cheap_t, alive, dirs, lo, hi):
    """Ray vs convex polytope: slab-interval intersection over k directions.
    Freeze iff the entry point lies in [0, cheap_t] (ties freeze — same
    conservatism as the shipped AABB test)."""
    dn = o @ dirs.T  # [n, k] origin projections
    dd = d @ dirs.T  # [n, k] direction projections
    dd = jnp.where(jnp.abs(dd) < 1e-30, 1e-30, dd)
    ta = (lo[None] - dn) / dd
    tb = (hi[None] - dn) / dd
    t_en = jnp.max(jnp.minimum(ta, tb), axis=1)
    t_ex = jnp.min(jnp.maximum(ta, tb), axis=1)
    ok = (t_ex >= jnp.maximum(t_en, 0.0)) & (t_ex > 0.0)
    return ok & (t_en <= cheap_t) & alive


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
    verts = tris.reshape(-1, 3).astype(np.float64)

    variants = {}  # name -> list of (dirs, lo, hi) polytopes (OR over list)
    for name, dirs in DIR_SETS.items():
        variants[name] = [dop_slabs(verts, dirs)]
    for K in (2, 4, 8):
        groups = split_groups(tris, K)
        variants[f"{K}x13-dop"] = [
            dop_slabs(tris[g].reshape(-1, 3).astype(np.float64),
                      DIR_SETS["13-dop"])
            for g in groups
        ]

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

    tot = {name: 0 for name in variants}
    missed = {name: 0 for name in variants}  # conservatism check
    tot_alive = 0
    tot_hit = 0

    for s in range(max_depth):
        hit = intersect_scene(o, d, scene, mode="fast", prev_tri=prev_tri)
        cheap_hit = intersect_scene(o, d, cheap, mode="fast",
                                    prev_tri=prev_tri)
        na = int(jnp.sum(alive))
        if na == 0:
            break
        tot_alive += na
        true_hit = alive & hit.found & (hit.t < cheap_hit.t)
        tot_hit += int(jnp.sum(true_hit))
        for name, polys in variants.items():
            m = jnp.zeros((n,), bool)
            for dirs, lo, hi in polys:
                m = m | dop_freeze(o, d, cheap_hit.t, alive,
                                   jnp.asarray(dirs), jnp.asarray(lo),
                                   jnp.asarray(hi))
            tot[name] += int(jnp.sum(m))
            missed[name] += int(jnp.sum(true_hit & ~m))

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
    for name in variants:
        fp = tot[name] / max(tot_hit, 1)
        print(f"{name:>9s}: freeze {tot[name]:8d} "
              f"({100.0 * tot[name] / tot_alive:5.2f}%)  x{fp:.2f} of floor"
              f"  MISSED {missed[name]}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(*(int(x) for x in a)) if a else main()
