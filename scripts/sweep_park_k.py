"""Sweep the portal parking depth PARK_K x step cap on hardware (mesh
1024x768).

PARK_K is a module-level constant (pool row-count changes with it), so
each config runs in a fresh subprocess with PT_TPU_PARK_K set; the child
mode reuses the warm-process protocol (warmup + 4 reps, 2nd-best).
Re-run after resolve-cost changes: a cheaper resolve shifts the optimum
toward deeper parking / larger caps (fewer, fuller sweeps). The round-1
K=5 reading (66-85, monotonically decaying reps) was measured through
tunnel degradation and is not trustworthy.

Usage: python scripts/sweep_park_k.py [spp] [K:cap ...]
  default: 64 spp, configs 3:64 5:64 5:96 7:96
"""

import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_ROOT, ".jax_cache"))


def child(spp: int):
    os.chdir(_ROOT)
    import path_tracer_tpu as pt
    from path_tracer_tpu.render.pipeline import prepare_scene_and_mode, render
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    scene = pt.load_scene("mesh", "scenes")
    res = Resolution(height=768, width=1024)
    cfg = RenderConfig(samples_per_pixel=spp, resolution=res)
    bufs, mode = prepare_scene_and_mode(scene, cfg.backend, res)

    def once(tag):
        t0 = time.time()
        done = render(scene, cfg, out_dir=None, device_buffers=bufs,
                      device_mode=mode, verbose=False)
        wall = time.time() - t0
        mrays = done.stats.num_rays / wall / 1e6
        print(f"  {tag}: wall {wall:.2f}s  {mrays:.1f} Mray/s", flush=True)
        return mrays

    once("warmup")
    vals = [once(f"rep{i}") for i in range(4)]
    print(f"RESULT {sorted(vals)[-2]:.1f}", flush=True)


def main():
    if sys.argv[1:2] == ["--child"]:
        child(int(sys.argv[2]))
        return
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfgs = [tuple(map(int, a.split(":"))) for a in sys.argv[2:]] or [
        (3, 64), (5, 64), (5, 96), (7, 96)]
    results = {}
    for k, cap in cfgs:
        env = dict(os.environ, PT_TPU_PARK_K=str(k),
                   PT_TPU_STEP_CAP=str(cap))
        print(f"[K={k} cap={cap}]", flush=True)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", str(spp)],
            env=env, capture_output=True, text=True, timeout=3000)
        for ln in out.stdout.splitlines():
            print(ln, flush=True)
            if ln.startswith("RESULT "):
                results[(k, cap)] = float(ln.split()[1])
        if out.returncode:
            print(out.stderr[-2000:], flush=True)

    print("\n== summary ==")
    for (k, cap), v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  K={k} cap={cap}: {v:.1f} Mray/s")


if __name__ == "__main__":
    main()
