"""Render the BASELINE.json parity configs and report accuracy + throughput.

For each config: renders with the production backend and with the literal
reference-arithmetic backend ('exact'), reports RMSE between them at equal
spp (should be within Monte-Carlo noise — the backends share semantics but
not RNG streams), plus per-ray expectation checks against the recursive
oracle on probe rays. Writes PARITY_REPORT.md.

Usage: JAX_COMPILATION_CACHE_DIR=.jax_cache python scripts/parity_report.py
       [--scale 4] [--spp-scale 4]   (resolutions/spp divided by these)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache"))

import numpy as np

CONFIGS = [
    # (scene, width, height, spp) — BASELINE.json configs
    ("single-sphere", 256, 256, 16),
    ("two-spheres", 384, 256, 64),
    ("three-spheres", 384, 256, 64),
    ("cartesian", 384, 256, 64),
    ("cornell", 1024, 768, 1000),
    ("mesh", 1024, 768, 200),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", type=int, default=4, help="divide resolutions")
    p.add_argument("--spp-scale", type=int, default=4, help="divide spp")
    p.add_argument("--out", default="PARITY_REPORT.md")
    args = p.parse_args()

    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    import path_tracer_tpu as pt
    from path_tracer_tpu.utils.config import RenderConfig, Resolution

    lines = [
        "# Parity report",
        "",
        f"Backend platform: {jax.default_backend()}; configs from "
        f"BASELINE.json scaled 1/{args.scale} resolution, 1/{args.spp_scale} spp.",
        "",
        "RMSE is between the production backend and the literal",
        "reference-arithmetic backend ('exact') at equal spp with independent",
        "RNG streams — the expected value is pure Monte-Carlo noise",
        "(~sigma/sqrt(spp)); matching it means the backends agree in",
        "expectation. RMSE is on tone-mapped 8-bit values / 255.",
        "",
        "| scene | res | spp | wall s (warm) | Msam/s | Mray/s | RMSE(prod,exact) | MC-noise est |",
        "|---|---|---|---|---|---|---|---|",
    ]

    from path_tracer_tpu.ops.tonemap import quantize_np

    for sid, w, h, spp in CONFIGS:
        w_, h_ = max(w // args.scale, 16), max(h // args.scale, 16)
        spp_ = max(spp // args.spp_scale, 4)
        scene = pt.load_scene(sid, "scenes")
        cfg = RenderConfig(
            samples_per_pixel=spp_, resolution=Resolution(h_, w_), seed=0
        )
        # first render pays compile; a second (cached programs) measures the
        # steady-state wall/throughput the table reports
        prod = pt.render(scene, cfg, out_dir=None, verbose=False)
        prod = pt.render(scene, cfg, out_dir=None, verbose=False)
        wall = prod.duration
        exact = pt.render(
            scene, cfg.with_(backend="exact", seed=7), out_dir=None, verbose=False
        )
        q1 = quantize_np(prod.image.pixels) / 255.0
        q2 = quantize_np(exact.image.pixels) / 255.0
        rmse = float(np.sqrt(((q1 - q2) ** 2).mean()))
        # two more independent exact renders estimate the MC noise floor
        exact2 = pt.render(
            scene, cfg.with_(backend="exact", seed=13), out_dir=None, verbose=False
        )
        q3 = quantize_np(exact2.image.pixels) / 255.0
        noise = float(np.sqrt(((q2 - q3) ** 2).mean()))
        s = prod.stats
        lines.append(
            f"| {sid} | {w_}x{h_} | {spp_} | {wall:.2f} | "
            f"{s.msamples_per_sec:.1f} | {s.mrays_per_sec:.1f} | "
            f"{rmse:.4f} | {noise:.4f} |"
        )
        print(lines[-1], flush=True)

    lines += [
        "",
        "Interpretation: RMSE ≈ MC-noise est ⇒ the production kernels match",
        "the literal reference arithmetic in expectation: the RMSE of two",
        "independent estimates IS the noise floor, so any bias would show as",
        "RMSE exceeding it (at --scale 1 --spp-scale 1 these are the full",
        "BASELINE configs measured on hardware).",
        "",
        "Per-ray expectation parity against the *recursive* oracle (incl. the",
        "depth<=2 both-branch refraction) is enforced in",
        "tests/test_integrator.py::test_wavefront_matches_recursive_oracle;",
        "lane-exact equality between the XLA integrator and both Pallas",
        "kernels is enforced in tests/test_pallas.py.",
    ]
    # preserve hand-maintained sections below the generated block (the
    # literal-estimator study from scripts/parity_literal.py lives there)
    keep = ""
    if os.path.exists(args.out):
        with open(args.out) as fh:
            old = fh.read()
        idx = old.find("\n## ")
        if idx >= 0:
            keep = old[idx:]
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n" + keep)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
