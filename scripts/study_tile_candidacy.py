"""CPU study: can sorting frozen lanes make the resolve's per-tile conds
fire? Captures REAL bounce segments on the mesh scene (XLA integrator,
python-unrolled so every bounce's rays are observable), keeps the ones the
portal would freeze, computes each segment's per-tile candidacy
(slab-test pass AND entry closer than the segment's true hit), then
reports the fraction of (block, tile) sweeps a resolve would execute
under different lane orderings. Executed-fraction ~ resolve MT cost.

Usage: env -u PALLAS_AXON_POOL_IPS python scripts/study_tile_candidacy.py [res_y] [spp]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.models.scene import pack_scene
    from path_tracer_tpu.ops import rng
    from path_tracer_tpu.ops.bsdf import sample_bsdf
    from path_tracer_tpu.ops.intersect import EPS_TRI_T, intersect_scene
    from path_tracer_tpu.ops.pallas.portal import build_portal_consts
    from path_tracer_tpu.ops.pallas.trace_kernel import kernel_scene_buffers
    from path_tracer_tpu.render.raygen import camera_arrays, generate_rays

    res_y = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    w, h = res_y * 3 // 2, res_y
    max_depth, rr_start = 12, 5

    scene = pt.load_scene("mesh", "scenes")
    packed = pack_scene(scene)
    bufs = {k: jnp.asarray(v) for k, v in packed.buffers().items()}
    kscene = kernel_scene_buffers(packed)
    (_, _, (plo, phi)), heavy = build_portal_consts(packed)

    # cheap (static) scene = packed minus the heavy mesh — gives the
    # resolve's true initial bound t_static per segment
    import dataclasses

    nt = packed.num_triangles
    tm = np.asarray(packed.tri_mesh[:nt])
    keep = tm != heavy
    n_keep = int(keep.sum())

    def filt(a):
        a = np.asarray(a)
        out = np.zeros((max(n_keep, 1),) + a.shape[1:], a.dtype)
        out[:n_keep] = a[:nt][keep]
        return out

    cheap_packed = dataclasses.replace(
        packed, num_triangles=n_keep,
        tri_v=filt(packed.tri_v), tri_normal=filt(packed.tri_normal),
        tri_color=filt(packed.tri_color), tri_emis=filt(packed.tri_emis),
        tri_rtype=filt(packed.tri_rtype), tri_order=filt(packed.tri_order),
        tri_obj=filt(packed.tri_obj), tri_mesh=filt(packed.tri_mesh),
    )
    cheap_bufs = {k: jnp.asarray(v)
                  for k, v in cheap_packed.buffers().items()}
    tile_lo = np.asarray(kscene["tile_lo"])  # [3, C]
    tile_hi = np.asarray(kscene["tile_hi"])
    C = tile_lo.shape[1]
    cam = camera_arrays(scene.camera)

    n = w * h * spp
    pixel_idx = jnp.tile(jnp.arange(w * h, dtype=jnp.int32), spp)
    sample_idx = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), w * h)
    key = rng.chunk_key(rng.root_key(1234), 0)
    u = rng.raygen_uniforms(key, (n,), 2)
    o, d = generate_rays(pixel_idx, sample_idx, u, cam, w, h)

    thr = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    prev_tri = jnp.full((n,), -1, jnp.int32)

    segs_o, segs_d, segs_t, segs_b = [], [], [], []
    plo_a, phi_a = np.asarray(plo, np.float32), np.asarray(phi, np.float32)

    @jax.jit
    def bounce(o, d, thr, alive, prev_tri, s):
        hit = intersect_scene(o, d, bufs, mode="fast", prev_tri=prev_tri,
                              eps_tri_t=EPS_TRI_T)
        found = hit.found & alive
        uu = rng.bounce_uniforms(key, s, (n,), 4)
        new_depth = s + 1
        max_refl = jnp.max(hit.color, axis=-1)
        rr_applies = new_depth > rr_start
        survive = (uu[:, 0] < max_refl) & (new_depth < max_depth)
        die_rr = rr_applies & ~survive
        scale = jnp.where(rr_applies & survive,
                          1.0 / jnp.maximum(max_refl, 1e-30), 1.0)
        nd = jnp.sum(hit.normal * d, axis=-1)
        nl = jnp.where((nd < 0.0)[:, None], hit.normal, -hit.normal)
        bs = sample_bsdf(d, hit.normal, nl, hit.rtype, uu[:, 1:4])
        thr_new = thr * (hit.color * scale[:, None]) * bs.weight
        alive_new = found & ~die_rr & (jnp.max(thr_new, axis=-1) > 0.0)
        o_new = jnp.where(alive_new[:, None], hit.point, o)
        d_new = jnp.where(alive_new[:, None], bs.direction, d)
        return (o_new, d_new, jnp.where(alive_new[:, None], thr_new, 0.0),
                alive_new, hit.tri, hit.t)

    @jax.jit
    def static_t(o, d, prev_tri):
        hit = intersect_scene(o, d, cheap_bufs, mode="fast",
                              prev_tri=prev_tri, eps_tri_t=EPS_TRI_T)
        return hit.t

    segs_ts = []
    for s in range(max_depth):
        # record the segment ABOUT to be traced (o, d, alive) + its true t
        o_np, d_np, al = np.asarray(o), np.asarray(d), np.asarray(alive)
        ts_np = np.asarray(static_t(o, d, prev_tri))
        o2, d2, thr, alive, prev_tri, t_hit = bounce(
            o, d, thr, alive, prev_tri, jnp.int32(s))
        t_np = np.asarray(t_hit)
        # portal freeze test: padded AABB slab vs the segment, bounded by
        # the STATIC hit (what the cheap kernel actually knows)
        inv = 1.0 / np.where(np.abs(d_np) < 1e-30, 1e-30, d_np)
        ta = (plo_a[None, :] - o_np) * inv
        tb = (phi_a[None, :] - o_np) * inv
        t_en = np.minimum(ta, tb).max(axis=1)
        t_ex = np.maximum(ta, tb).min(axis=1)
        frozen = (t_ex >= t_en) & (t_ex > 0.0) & al & (t_en <= ts_np)
        segs_o.append(o_np[frozen])
        segs_d.append(d_np[frozen])
        segs_t.append(t_np[frozen])
        segs_ts.append(ts_np[frozen])
        segs_b.append(np.full(frozen.sum(), s, np.int32))
        o, d = o2, d2
        if not np.asarray(alive).any():
            break

    so = np.concatenate(segs_o)
    sd = np.concatenate(segs_d)
    st = np.concatenate(segs_t)
    sts = np.concatenate(segs_ts)
    sb = np.concatenate(segs_b)
    F = len(so)
    print(f"captured {F} frozen segments of {n * max_depth} lane-steps "
          f"({100 * F / (n * max_depth):.2f}%); bounce hist "
          f"{np.bincount(sb, minlength=max_depth)}")
    print(f"true mesh-hit fraction of frozen: "
          f"{100 * np.mean(st < sts - 1e-7):.1f}%")

    # per-tile candidacy, the kernel's test under two bounds:
    # static hit (what the resolve starts from) and true hit (optimistic)
    inv = 1.0 / np.where(np.abs(sd) < 1e-30, 1e-30, sd)
    ta = (tile_lo.T[:, None, :] - so[None]) * inv[None]   # [C,F,3]
    tb = (tile_hi.T[:, None, :] - so[None]) * inv[None]
    t_en = np.minimum(ta, tb).max(axis=2)                 # [C,F]
    t_ex = np.maximum(ta, tb).min(axis=2)
    slab = (t_ex >= t_en) & (t_ex >= 0.0)
    cand_s = slab & (t_en < sts[None, :])
    cand = slab & (t_en < st[None, :])

    for nm, cc in (("static-bound", cand_s), ("true-bound", cand)):
        per_lane = cc.sum(axis=0)
        print(f"[{nm}] tiles={C} candidates/lane: mean "
              f"{per_lane.mean():.2f} median {np.median(per_lane):.0f} "
              f"p90 {np.percentile(per_lane, 90):.0f} max {per_lane.max()} "
              f"zero-cand {100 * np.mean(per_lane == 0):.1f}%")
    per_lane = cand.sum(axis=0)
    print("hist:", np.bincount(per_lane, minlength=C + 1))

    first = np.where(cand.any(axis=0), cand.argmax(axis=0), C)
    mask_key = (cand.astype(np.uint64)
                * (1 << np.arange(C, dtype=np.uint64))[:, None]).sum(axis=0)
    # slab-only mask: what render/portal._resolve_sort_order can actually
    # compute BEFORE the kernel runs (no hit bound available at sort time)
    slab_key = (slab.astype(np.uint64)
                * (1 << np.arange(C, dtype=np.uint64))[:, None]).sum(axis=0)
    octant = ((sd[:, 0] < 0) * 4 + (sd[:, 1] < 0) * 2
              + (sd[:, 2] < 0)).astype(np.int64)
    cell = np.clip(((so - plo_a) / np.maximum(phi_a - plo_a, 1e-9) * 4)
                   .astype(np.int64), 0, 3)
    morton = cell[:, 0] * 16 + cell[:, 1] * 4 + cell[:, 2]

    rng_np = np.random.default_rng(0)
    orders = {
        "shuffled (pool-like)": rng_np.permutation(F),
        "capture order (pixel,bounce)": np.arange(F),
        "sort: first-tile,t_en": np.lexsort((t_en[np.minimum(first, C - 1),
                                             np.arange(F)], first)),
        "sort: candidate mask": np.argsort(mask_key, kind="stable"),
        "sort: slab-only mask (shipped)": np.argsort(slab_key, kind="stable"),
        "sort: octant,cell": np.lexsort((morton, octant)),
        "sort: octant,mask": np.lexsort((mask_key, octant)),
    }
    from path_tracer_tpu.ops.pallas.trace_kernel import TRI_TILE
    for B in (1024, 256):
        nb = F // B
        if nb == 0:
            continue
        print(f"\nblock={B} ({nb} blocks): executed (block,tile) fraction "
              f"(lower = more culled); MT rows/lane model = base + "
              f"exec * {C} * {TRI_TILE}")
        for name, idx in orders.items():
            cb = cand[:, idx[: nb * B]].reshape(C, nb, B)
            execd = cb.any(axis=2).mean()
            print(f"  {name:32s} {100 * execd:6.1f}%  "
                  f"~{execd * C * TRI_TILE:5.0f} tiled MT rows/lane")


if __name__ == "__main__":
    main()
