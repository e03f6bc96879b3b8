"""Per-phase on-chip breakdown of the megakernel iteration (real TPU).

    python tools/mega_phase.py --scene random_balls --nx 1200 --ny 800

Methodology: compile variants of the SAME kernel with one phase stubbed to
a constant (cfg.phase_stub, see ops/megakernel.py) so Mosaic dead-code-
eliminates exactly that phase, then normalize wall time per executed
tile-iteration (out row R_ITERS sums per-lane loop trips; time/iter =
dt * T / lane_iters). The deltas against the full kernel locate where the
microseconds go — the evidence VERDICT r2 asked for behind the "VPU
speed-of-light" claim. Stubs change radiance and therefore iteration
counts; per-iteration normalization makes the variants comparable.

Phases:
  full           — production kernel
  -extract       — sweep runs, winner-attribute one-hot dots dropped
  -quad          — whole sphere sweep dropped (every ray misses)
  -shade         — fixed bounce-back direction, constant weights: RNG,
                   ONB, samplers, and material math dead-coded
  -quad -shade   — residual: camera gen + state-row bookkeeping + loop
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="random_balls")
    ap.add_argument("--nx", type=int, default=1200)
    ap.add_argument("--ny", type=int, default=800)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=50)
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--T", type=int, default=0)
    ap.add_argument("--SB", type=int, default=0)
    ap.add_argument("--fe", type=int, default=-1)
    ap.add_argument("--json", default="", help="append JSONL here")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    scene = make_scene(args.scene, args.nx / args.ny)
    assert mk.supports_scene(scene), args.scene
    _, cfg, T, _ = mk.make_plan(scene, args.nx, args.ny, args.spp,
                                max_depth=args.max_depth,
                                T=args.T or None, SB=args.SB or None,
                                fuse_extract=None if args.fe < 0 else args.fe)

    variants = [("full", ()), ("-extract", ("extract",)),
                ("-quad", ("quad",)), ("-shade", ("shade",)),
                ("-regen", ("regen",)),
                ("-quad-shade", ("quad", "shade")),
                ("-quad-shade-regen", ("quad", "shade", "regen"))]
    key = jax.random.key(0)
    rows = []
    for name, stub in variants:
        def launch(k, stub=stub):
            return mk.trace_mega(k, scene, args.nx, args.ny, args.spp,
                                 max_depth=args.max_depth,
                                 T=args.T or None, SB=args.SB or None,
                                 fuse_extract=(None if args.fe < 0
                                               else args.fe),
                                 phase_stub=stub, return_stats=True)

        for w in range(2):
            _, seg, _, _ = launch(jax.random.fold_in(key, 900 + w))
            _ = float(seg)
        total_seg = 0.0
        total_li = 0.0
        t0 = time.perf_counter()
        for i in range(args.launches):
            _, seg, li, _ = launch(jax.random.fold_in(key, i))
            total_seg += float(seg)
            total_li += float(li)
        dt = time.perf_counter() - t0
        # per-lane iteration count -> tile iterations
        tile_iters = total_li / T
        us_per_iter = dt * 1e6 / max(tile_iters, 1.0)
        rows.append((name, total_seg / dt / 1e6, us_per_iter))
        print(f"{name:12s} {total_seg / dt / 1e6:8.1f} M seg/s   "
              f"{us_per_iter:7.3f} us/tile-iter  (T={T})", flush=True)

    full = rows[0][2]
    print("\nphase deltas (us/tile-iter):")
    out = {"scene": args.scene, "T": T, "full_us": full}
    for name, _, us in rows[1:]:
        print(f"  {name:12s} {full - us:7.3f}")
        out[name] = full - us
    out["residual_us"] = rows[-1][2]
    if args.json:
        with open(args.json, "a") as f:
            f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
