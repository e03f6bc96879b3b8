"""Multi-scene megakernel benchmark -> one JSONL artifact (real TPU).

    python tools/bench_all.py --out docs/bench_r03.jsonl

One line per scene with >= 5 timed launches, per-launch rates, and spread
(min/median/max), so per-scene regressions are visible in-repo instead of
living in hand-edited PERF.md tables (VERDICT r2 weak #6). bench.py stays
the driver's single-number headline; this is the coverage artifact.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENES = [
    # (scene, nx, ny, spp) — the BASELINE.md benchmark configs
    ("random_balls", 1200, 800, 64),       # book-1 final (headline)
    ("cornell_box", 400, 400, 256),        # book-3 MIS
    ("cornell_smoke", 400, 400, 256),      # book-2 volumes
    ("earth", 800, 600, 64),               # book-2 image texture
    ("earth_rect", 800, 600, 64),          # image texture on a rect (fused)
    ("random_balls_large", 1200, 800, 32),  # 3.6k-sphere stress
    ("random_balls_huge", 1200, 800, 16),   # 14.4k-sphere stress
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/bench_all.jsonl")
    ap.add_argument("--launches", type=int, default=5)
    ap.add_argument("--max-depth", type=int, default=50)
    ap.add_argument("--scenes", default=None,
                    help="comma list to bench a subset of SCENES")
    args = ap.parse_args()
    scenes = SCENES
    if args.scenes:
        pick = set(args.scenes.split(","))
        unknown = pick - {s[0] for s in SCENES}
        if unknown:
            raise SystemExit(f"unknown scene(s): {sorted(unknown)}; "
                             f"choices: {[s[0] for s in SCENES]}")
        scenes = [s for s in SCENES if s[0] in pick]
        if args.out == "docs/bench_all.jsonl":
            raise SystemExit("--scenes subset would clobber the full "
                             "artifact; pass an explicit --out")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    key = jax.random.key(0)
    rows = []
    for name, nx, ny, spp in scenes:
        scene = make_scene(name, nx / ny)
        assert mk.supports_scene(scene), name

        def launch(k):
            return mk.trace_mega(k, scene, nx, ny, spp,
                                 max_depth=args.max_depth)

        for w in range(2):
            _, seg = launch(jax.random.fold_in(key, 900 + w))
            _ = float(seg)
        rates = []
        for i in range(args.launches):
            t0 = time.perf_counter()
            _, seg = launch(jax.random.fold_in(key, i))
            segs = float(seg)  # host transfer forces the sync
            rates.append(segs / (time.perf_counter() - t0))
        row = dict(scene=name, nx=nx, ny=ny, spp=spp,
                   launches=args.launches,
                   rays_per_s_median=statistics.median(rates),
                   rays_per_s_min=min(rates), rays_per_s_max=max(rates),
                   rays_per_s_all=[round(r) for r in rates])
        rows.append(row)
        print(f"{name:20s} {statistics.median(rates) / 1e6:8.1f} M seg/s "
              f"(min {min(rates) / 1e6:.1f}, max {max(rates) / 1e6:.1f})",
              flush=True)
    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
