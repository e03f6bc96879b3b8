"""On-chip A/B of regen-time cluster-coherence pixel binning (round-5).

Measures the large-S stress scenes with the block-linear layout vs the
cluster-binned layout (`megakernel._coherent_pixel_layout`): throughput,
cull survival (executed blocks / (lane-iters x C)), and lane utilization
(segments / lane-iters) — the three numbers that tell whether binning
moved SURVIVAL (the remaining large-S multiplier per docs/PERF.md) and
whether it paid for any extra tile-drain tail it created.

    python tools/coherence_sweep.py [--scenes ...] [--spp 16]

Appends one JSON line per (scene, layout) to docs/coherence_sweep_r05.jsonl.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="random_balls_large,"
                                        "random_balls_huge")
    ap.add_argument("--nx", type=int, default=1200)
    ap.add_argument("--ny", type=int, default=800)
    ap.add_argument("--spp", type=int, default=0,
                    help="0 = per-scene default matching tools/bench_all.py "
                         "shapes (large: 32, huge: 16) so the runs ride the "
                         "persistent compile cache")
    ap.add_argument("--launches", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "docs",
        "coherence_sweep_r05.jsonl"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    key = jax.random.key(5)
    spp_default = {"random_balls_large": 32, "random_balls_huge": 16}
    rows = []
    for name in args.scenes.split(","):
        scene = make_scene(name, args.nx / args.ny)
        spp = args.spp or spp_default.get(name, 16)
        for coh in (False, True):
            def run(k):
                return mk.trace_mega(k, scene, args.nx, args.ny, spp,
                                     max_depth=50, coherent=coh,
                                     return_stats=True)

            img, seg, li, bl = run(key)
            _ = float(seg)  # sync (block_until_ready does not, CLAUDE.md)
            # keys pre-folded OUTSIDE the timed region: an eager fold_in
            # inside it costs a ~28-60 ms dispatch round-trip per sample
            # (CLAUDE.md measurement rules)
            keys = [jax.random.fold_in(key, i + 1)
                    for i in range(args.launches)]
            best = None
            stats = None
            for i in range(args.launches):
                t0 = time.perf_counter()
                img, seg, li, bl = run(keys[i])
                segs = float(seg)  # sync
                dt = time.perf_counter() - t0
                rate = segs / dt
                if best is None or rate > best:
                    best = rate
                    stats = (segs, float(li), float(bl))
            segs, lane_iters, blocks = stats
            # the plan's OWN meta: a hardcoded SB would silently divide
            # by the C of a clustering the auto plan never executed for
            # scenes under the 512-live-sphere dense knee
            meta = mk.make_plan(scene, args.nx, args.ny, spp,
                                max_depth=50)[0][-1]
            C = meta["C"]
            row = {"scene": name, "coherent": coh,
                   "nx": args.nx, "ny": args.ny, "spp": spp,
                   "rays_per_s": best,
                   "survival": blocks / max(lane_iters * C, 1.0),
                   "utilization": segs / max(lane_iters, 1.0),
                   "C": C}
            rows.append(row)
            print(json.dumps(row), flush=True)
    with open(args.out, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
