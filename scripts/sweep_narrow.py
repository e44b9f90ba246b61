"""Sweep the portal resolve-scheduler knobs on hardware (mesh 1024x768).

One process, warm jit: each config is (narrow_bufs, full_every[, sort]);
narrow cycles resolve the active path + narrow_bufs parked buffers, every
full_every-th cycle resolves all PARK_K buffers. narrow_bufs=-1 means the
always-full baseline. sort (default 0) permutes the resolve input:
1 = dead-lane partition, 2 = + candidate-tile-mask grouping. Reads the
knobs from env at drive time, so renders alternate in-process without
reimporting.

Usage: python scripts/sweep_narrow.py [spp] [cfg ...]
  cfg: "nb:fe[:sort]", default "-1:4 0:2 0:4 1:2 1:4 -1:4:1 -1:4:2 0:4:2"
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def main():
    os.chdir(_ROOT)
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfgs = [tuple(map(int, (a + ":0:0").split(":")[:3]))
            for a in sys.argv[2:]] or [
        (-1, 4, 0), (0, 2, 0), (0, 4, 0), (1, 2, 0), (1, 4, 0),
        (-1, 4, 1), (-1, 4, 2), (0, 4, 2)]

    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode, render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    cfg = RenderConfig(samples_per_pixel=spp, resolution=res)
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, res)
    print(f"mode = {mode}, spp = {spp}")

    def once(tag):
        t0 = time.time()
        done = render(scene, cfg, out_dir=None, device_buffers=bufs,
                      device_mode=mode, verbose=False)
        wall = time.time() - t0
        mrays = done.stats.num_rays / wall / 1e6
        print(f"  {tag}: wall {wall:.2f}s  {mrays:.1f} Mray/s", flush=True)
        return mrays

    results = {}
    for nb, fe, srt in cfgs:
        os.environ["PT_TPU_NARROW_BUFS"] = str(nb)
        os.environ["PT_TPU_FULL_EVERY"] = str(fe)
        os.environ["PT_TPU_RESOLVE_SORT"] = str(srt)
        label = f"nb={nb} fe={fe} sort={srt}"
        print(f"[{label}]", flush=True)
        once("warmup")
        vals = [once(f"rep{i}") for i in range(4)]
        results[label] = sorted(vals)[-2]
        print(f"[{label}] 2nd-best: {results[label]:.1f} Mray/s")

    print("\n== summary ==")
    for label, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {label}: {v:.1f} Mray/s")


if __name__ == "__main__":
    main()
