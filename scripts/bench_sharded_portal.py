"""First hardware timing of the SHARDED portal path (VERDICT r3 weak #6:
"no TPU run of the sharded portal exists; single chip = mesh of 1 is
untested as such").

Only one real chip is reachable through the tunnel, so this times the
sharded runner on a Mesh(dp=1, sp=1) — the full shard_map machinery
(per-device pool, quota split, psum ray counts, sharded compaction ladder,
device-local redistribution, dp-sharded accum scatter) against the plain
single-device drive as the control. Parity of the two stacks at >= 2
devices is covered by the CPU tests (tests/test_parallel.py) and the
driver's dryrun; what this adds is the shard_map overhead measured on
real hardware.

Usage: python scripts/bench_sharded_portal.py [spp]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.parallel.mesh import render_sharded
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scene = pt.load_scene("mesh", "scenes")
    cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(768, 1024))
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, cfg.resolution)
    kw = dict(out_dir=None, verbose=False, progress_snapshots=False)

    def report(arm, reps):
        done = sorted(reps, key=lambda d: d.duration)[1]
        s = done.stats
        print(
            f"mesh 1024x768@{spp} [{arm:12s}]: {done.duration:.2f}s  "
            f"{s.mrays_per_sec:.1f} Mray/s  "
            f"(reps {' '.join(f'{r.duration:.2f}' for r in reps)})",
            flush=True,
        )
        return done

    # control: the plain single-device drive (the headline path)
    pt.render(scene, cfg, **kw, device_buffers=bufs, device_mode=mode)
    report("plain", [
        pt.render(scene, cfg, **kw, device_buffers=bufs, device_mode=mode)
        for _ in range(4)
    ])

    # sharded runner on a 1-device mesh (prepare_scene_and_mode re-used
    # internally; scene digest check is a no-op single-host)
    skw = dict(num_devices=1, sample_parallel=1, **kw)
    render_sharded(scene, cfg, **skw)
    report("sharded dp1", [render_sharded(scene, cfg, **skw)
                           for _ in range(4)])


if __name__ == "__main__":
    main()
