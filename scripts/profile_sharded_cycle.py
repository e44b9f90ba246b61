"""Why is the sharded portal runner slow on hardware?

bench_sharded_portal measured the dp1xsp1 sharded runner at 28 Mray/s vs
244.8 plain (2026-08-21) — an 8.7x gap the CPU tests cannot see. This
isolates the per-cycle cost of each stack with the chained-call protocol
(>= 16 calls per timed region, ONE fetch — see CLAUDE.md):

  plain    — render.portal.portal_cycle_v2 (the headline path's bulk cycle)
  sharded  — the exact shard_map'd cycle parallel.portal builds (copied
             construction), on a Mesh(dp=1, sp=1)
  sh-nopsum— sharded minus the lax.psum of the ray counter (isolates
             collective overhead on a 1-device mesh)

Usage: python scripts/profile_sharded_cycle.py [n_chain]
"""

import functools
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    os.chdir(_ROOT)
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import path_tracer_tpu as pt
    from path_tracer_tpu.ops.pallas.portal import trace_cheap_regen
    from path_tracer_tpu.parallel.mesh import make_mesh
    from path_tracer_tpu.render import portal as rportal
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.utils.config import Resolution

    n_chain = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(768, 1024)
    bufs, mode = prepare_scene_and_mode(scene, "auto", res)
    pkey = mode.split("@", 1)[0]
    cam_key = f"{pkey}:cam:{res.width}x{res.height}"
    kscene = bufs["kernel"]
    park_k = rportal._pm_park_k()
    step_cap = jnp.int32(rportal._default_step_cap())
    npix = res.num_pixels
    n_pad = rportal._round_block(npix)
    k_pass = 1024
    kq = jnp.int32(k_pass)
    sb = jnp.int32(0)
    max_depth, rr = 12, 5

    def timed(tag, mk_pool, chain):
        pool = mk_pool()
        pool, _ = chain(pool, 0, 2)  # warm/compile
        jax.block_until_ready(pool)
        reps = []
        for r in range(3):
            pool = mk_pool()
            jax.block_until_ready(pool)
            t0 = time.perf_counter()
            pool, rays = chain(pool, 2 + r * n_chain, n_chain)
            np.asarray(rays)  # one fetch syncs the chain
            reps.append((time.perf_counter() - t0) / n_chain * 1e3)
        print(f"{tag:10s}: {sorted(reps)[1]:7.1f} ms/cycle "
              f"(reps {' '.join(f'{x:.1f}' for x in reps)})", flush=True)

    # --- plain ---
    def plain_pool():
        return make_plain()

    @functools.partial(jax.jit, static_argnames=())
    def make_plain():
        return rportal.make_pool_v2(npix, n_pad, k_pass, park_k)

    def plain_chain(pool, c0, steps):
        rays = jnp.float32(0.0)
        for s in range(steps):
            pool, r, _ = rportal.portal_cycle_v2(
                pool, kq, sb, jnp.int32(2 * (c0 + s) + 1), kscene, step_cap,
                portal_key=pkey, cam_key=cam_key, max_depth=max_depth,
                rr_start_depth=rr, park_k=park_k,
                pool_resolve=rportal.POOL_RESOLVE,
            )
            rays = rays + r
        return pool, rays

    timed("plain", plain_pool, plain_chain)

    # --- sharded (construction copied from parallel.portal) ---
    mesh = make_mesh(1, sample_parallel=1)
    sp = 1
    sharding = NamedSharding(mesh, P(None, ("dp", "sp")))

    for tag, with_psum in (("sharded", True), ("sh-nopsum", False)):

        @functools.partial(jax.jit, static_argnames=("pool_resolve",),
                           donate_argnums=(0,))
        def cycle(pool, k_pass, sample_base, seed, kscene, step_cap,
                  *, pool_resolve, _psum=with_psum):
            def local(pool_loc, k_pass, sample_base, seed, kscene, step_cap):
                i = lax.axis_index("dp")
                j = lax.axis_index("sp")
                g = i * sp + j
                seed_loc = seed + (g + jnp.int32(1)) * jnp.int32(1000003)
                pool_loc, c1 = trace_cheap_regen(
                    pool_loc, pkey, cam_key, seed_loc, k_pass,
                    sample_base, step_cap,
                    max_depth=max_depth, rr_start_depth=rr,
                    block=rportal.CHEAP_BLOCK, park_k=park_k,
                )
                pool_loc, c2, unfin = rportal.portal_resolve_phase(
                    pool_loc, k_pass, seed_loc, kscene,
                    portal_key=pkey, max_depth=max_depth,
                    rr_start_depth=rr, park_k=park_k,
                    pool_resolve=pool_resolve,
                )
                c = c1 + c2
                if _psum:
                    c = lax.psum(c, ("dp", "sp"))
                return pool_loc, c, unfin.reshape(1)

            return jax.shard_map(
                local, mesh=mesh,
                in_specs=(P(None, ("dp", "sp")), P(), P(), P(), P(), P()),
                out_specs=(P(None, ("dp", "sp")), P(), P(("dp", "sp"))),
                check_vma=False,
            )(pool, k_pass, sample_base, seed, kscene, step_cap)

        def sh_pool():
            return jax.device_put(make_plain(), sharding)

        def sh_chain(pool, c0, steps, cycle=cycle):
            rays = jnp.float32(0.0)
            for s in range(steps):
                pool, r, _ = cycle(
                    pool, kq, sb, jnp.int32(2 * (c0 + s) + 1), kscene,
                    step_cap, pool_resolve=rportal.POOL_RESOLVE,
                )
                rays = rays + r
            return pool, rays

        timed(tag, sh_pool, sh_chain)


if __name__ == "__main__":
    main()
