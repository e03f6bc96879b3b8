"""Pixelwise golden parity for the fused megakernel path.

Renders scenes through ops/megakernel.trace_mega (the fast on-chip path)
and compares against the committed reference-oracle goldens with the same
gate as tools/golden_report.py — proving the fused kernel, not just the
wavefront integrator, matches the reference renderer.

    python tools/mega_golden_check.py [--scenes cornell_box,random_balls,dielectric]

Run on the real TPU (interpret mode on CPU takes hours at golden spp).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

SPPS = {"dielectric": 4096, "cornell_box": 8192, "random_balls": 2048,
        "cornell_smoke": 8192, "light_sample": 4096, "earth": 4096,
        "earth_rect": 4096}
MULTITILE_SPPS = {"cornell_box": 8192, "random_balls": 2048}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes",
                    default="cornell_box,random_balls,dielectric,"
                            "cornell_smoke,light_sample,earth,earth_rect")
    ap.add_argument("--multitile", action="store_true",
                    help="gate the 128x128 goldens (4 T=4096 tiles) instead "
                         "of the single-tile 32x32 set — proves tile "
                         "layout/inv permutation/per-tile RNG/overdraw "
                         "renormalization pixelwise on hardware")
    ap.add_argument("--launch-spp", type=int, default=512)
    ap.add_argument("--SB", type=int, default=0,
                    help="0 = measured auto plan")
    ap.add_argument("--chunks", type=int, default=1)
    ap.add_argument("--idx", action="store_true",
                    help="index-based winner extraction")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from test_golden import GOLDENS, GOLDENS_MULTITILE, load_golden
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    goldens, spps = ((GOLDENS_MULTITILE, MULTITILE_SPPS) if args.multitile
                     else (GOLDENS, SPPS))
    interp = jax.default_backend() in ("cpu", "gpu")
    ok_all = True
    for name in args.scenes.split(","):
        if name not in goldens:
            continue
        golden = np.asarray(load_golden(goldens[name]), np.float64)
        ny, nx, _ = golden.shape
        spp = spps[name]
        scene = make_scene(name, nx / ny)
        assert mk.supports_scene(scene), name
        acc = np.zeros((ny, nx, 3), np.float64)
        done = 0
        key = jax.random.key(7)
        while done < spp:
            step = min(args.launch_spp, spp - done)
            img, _ = mk.trace_mega(jax.random.fold_in(key, done), scene,
                                   nx, ny, step, max_depth=50,
                                   SB=args.SB or None, chunks=args.chunks,
                                   idx_extract=args.idx,
                                   interpret=interp)
            acc += np.asarray(img, np.float64)
            done += step
        ours = acc / spp  # goldens are linear radiance, row 0 = bottom
        mean_rel = abs(ours.mean() - golden.mean()) / max(golden.mean(), 1e-6)
        err = np.abs(ours - golden)
        tol = 0.05 + 4.0 * np.sqrt(np.maximum(golden, 0.0) / spp)
        frac_ok = float((err <= tol).mean())
        passed = mean_rel < 0.02 and frac_ok > 0.995
        ok_all &= passed
        print(f"mega {name} {nx}x{ny}: mean_rel={mean_rel:.4f} "
              f"frac_ok={frac_ok:.4f} {'PASS' if passed else 'FAIL'}",
              flush=True)
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
