"""Run the FULL pixelwise golden comparison (all four scenes at the
goldens' own spp) and write a parity report artifact.

Intended for the real TPU (hours on CPU):

    python tools/golden_report.py [--out docs/GOLDEN_TPU.md] [--mode regen]

The comparison math is identical to tests/test_golden.py::test_golden_pixelwise
(RTW_GOLDEN_FULL=1); this script additionally records the measured
frac_ok / mean-error numbers so the pass is auditable, not just green.
"""
from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/GOLDEN_TPU.md")
    ap.add_argument("--mode", default="regen",
                    choices=("regen", "tiled", "while"))
    args = ap.parse_args()

    import jax
    from test_golden import GOLDENS, load_golden
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.render import render
    from raytracingweekend_tpu.utils.config import RenderConfig

    spps = {"dielectric": 4096, "light_sample": 4096,
            "cornell_box": 8192, "random_balls": 2048,
            "cornell_smoke": 8192}
    rows = []
    ok_all = True
    for name in sorted(GOLDENS):
        golden = load_golden(GOLDENS[name])
        ny, nx, _ = golden.shape
        spp = spps[name]
        scene = make_scene(name, nx / ny)
        cfg = RenderConfig(nx=nx, ny=ny, spp=spp, max_depth=50,
                           samples_per_launch=min(spp, 256), seed=7,
                           loop_mode=args.mode)
        ours = np.asarray(render(scene, cfg), np.float64)
        g = np.asarray(golden)
        mean_rel = abs(ours.mean() - g.mean()) / max(g.mean(), 1e-6)
        err = np.abs(ours - g)
        tol = 0.05 + 4.0 * np.sqrt(np.maximum(g, 0.0) / spp)
        frac_ok = float((err <= tol).mean())
        passed = mean_rel < 0.02 and frac_ok > 0.995
        ok_all &= passed
        rows.append((name, nx, ny, spp, mean_rel, frac_ok, passed))
        print(f"{name}: mean_rel={mean_rel:.4f} frac_ok={frac_ok:.4f} "
              f"{'PASS' if passed else 'FAIL'}", flush=True)

    backend = jax.default_backend()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Pixelwise golden parity report\n\n")
        f.write(f"- date: {datetime.datetime.now().isoformat()}\n")
        f.write(f"- backend: {backend}\n")
        f.write(f"- integrator mode: {args.mode}\n")
        f.write("- oracle: tools/reference_oracle (unmodified reference "
                "headers, float64, serial)\n")
        f.write("- gate: scene-mean rel err < 2%; pixel err <= "
                "0.05 + 4*sqrt(golden/spp) for > 99.5% of pixels\n\n")
        f.write("| scene | res | spp | mean rel err | frac_ok | result |\n")
        f.write("|---|---|---|---|---|---|\n")
        for name, nx, ny, spp, mr, fo, p in rows:
            f.write(f"| {name} | {nx}x{ny} | {spp} | {mr:.4f} | {fo:.4f} | "
                    f"{'PASS' if p else 'FAIL'} |\n")
    print(f"wrote {args.out}; all pass: {ok_all}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
