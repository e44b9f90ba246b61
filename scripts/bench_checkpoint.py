"""Hardware cost of mid-pass (freeze-and-drain) checkpoints on the mesh
headline render.

Round-3 checkpointed renders were pinned to 64-spp passes (111-129 Mray/s,
~2x under the 241 headline) because pass boundaries were the only exact
artifacts. The shared drive loop now freeze-and-drains at poll boundaries
(render/drive.py), so checkpointed renders keep BIG passes; this measures
what a periodic mid-pass checkpoint actually costs vs the hookless
headline. Reference analog: the Rust renderer keeps all completed work on
interruption (/root/reference/src/render/mod.rs:1002-1004) but has no
persistence at all — this is strictly beyond parity.

Arms (mesh 1024x768 @ 1024 spp, one warm + 2nd-best of 4 timed each):
  baseline   — no hooks at all (the BENCH_ALL protocol)
  ckpt@6s    — checkpoint_every=1 with PT_TPU_CKPT_SECS=6 (~3 freezes/render)
  ckpt@15s   — ~1 freeze/render (a realistic preemption guard cadence)

Usage: python scripts/bench_checkpoint.py [spp]
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    os.chdir(_ROOT)
    import numpy as np

    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    scene = pt.load_scene("mesh", "scenes")
    cfg = RenderConfig(samples_per_pixel=spp, resolution=Resolution(768, 1024))
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, cfg.resolution)
    kw = dict(out_dir=None, verbose=False, progress_snapshots=False,
              device_buffers=bufs, device_mode=mode)
    ck = "/tmp/bench_ckpt.npz"

    def run(arm, secs):
        if secs is None:
            os.environ.pop("PT_TPU_CKPT_SECS", None)
            extra = {}
        else:
            os.environ["PT_TPU_CKPT_SECS"] = str(secs)
            extra = dict(checkpoint_path=ck, checkpoint_every=1)
        pt.render(scene, cfg, **kw, **extra)  # warm
        reps = []
        for _ in range(4):
            if os.path.exists(ck):
                os.remove(ck)  # a leftover would trigger resume
            reps.append(pt.render(scene, cfg, **kw, **extra))
        done = sorted(reps, key=lambda d: d.duration)[1]
        s = done.stats
        print(
            f"mesh 1024x768@{spp} [{arm:9s}]: {done.duration:.2f}s  "
            f"{s.mrays_per_sec:.1f} Mray/s  "
            f"(reps {' '.join(f'{r.duration:.2f}' for r in reps)})",
            flush=True,
        )
        return done

    base = run("baseline", None)
    d6 = run("ckpt@6s", 6)
    run("ckpt@15s", 15)
    os.environ.pop("PT_TPU_CKPT_SECS", None)
    if os.path.exists(ck):
        os.remove(ck)

    # sanity: per-pixel sample COUNTS resume exactly (normalization is
    # exact), but radiance differs by MC noise: the in-kernel hardware
    # PRNG draws depend on the execution schedule (cycle counter), so a
    # frozen-then-retraced sample gets different, equally valid randoms.
    # Expect ~0.1 max over 786K pixels at 1024 spp; gross deviations
    # (>0.5) would indicate lost/doubled samples.
    err = float(np.abs(base.image.pixels - d6.image.pixels).max())
    print(f"max |baseline - ckpt@6s| = {err:.3e} (MC-noise scale expected)")


if __name__ == "__main__":
    main()
