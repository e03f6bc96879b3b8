"""Megakernel throughput on any supported scene (real TPU).

    python tools/mega_perf.py --scene cornell_box --nx 400 --ny 400 --spp 256

Reports path segments/s using the tunnel-safe discipline (host transfer of
the segment count forces the sync; steady state after two warmup launches).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell_box")
    ap.add_argument("--nx", type=int, default=400)
    ap.add_argument("--ny", type=int, default=400)
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--max-depth", type=int, default=50)
    ap.add_argument("--launches", type=int, default=2)
    ap.add_argument("--T", type=int, default=0, help="0 = measured auto")
    ap.add_argument("--SB", type=int, default=0,
                    help="sphere cluster size (0 = measured auto)")
    ap.add_argument("--chunks", type=int, default=1,
                    help="lane-chunks per tile for cluster-skip votes")
    ap.add_argument("--idx", action="store_true",
                    help="index-based winner extraction (no (S,T) scratch)")
    ap.add_argument("--cull", type=int, default=-1,
                    help="1/0 force voted/vote-free blocking (-1 = auto)")
    ap.add_argument("--eb", type=int, default=0,
                    help="idx extraction block size (0 = auto)")
    ap.add_argument("--fe", type=int, default=-1,
                    help="fused-extraction sub-block rows (-1 = auto, "
                         "0 = off)")
    ap.add_argument("--bv", type=int, default=-1,
                    help="batched cluster votes (1/0, -1 = auto)")
    ap.add_argument("--sg", type=int, default=0,
                    help="super-cluster group size (0 = off)")
    ap.add_argument("--dyn", type=int, default=-1,
                    help="dynamic survivor-list sweep (1/0, -1 = auto)")
    ap.add_argument("--dord", type=int, default=-1,
                    help="near-to-far survivor order buckets "
                         "(0 = off, -1 = auto)")
    ap.add_argument("--unroll", type=int, default=0,
                    help="bounce iterations per while-loop trip (0 = auto)")
    ap.add_argument("--stats", action="store_true",
                    help="also report utilization and cull-survival rate")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    scene = make_scene(args.scene, args.nx / args.ny)
    assert mk.supports_scene(scene), args.scene

    def launch(k):
        return mk.trace_mega(k, scene, args.nx, args.ny, args.spp,
                             max_depth=args.max_depth, T=args.T or None,
                             SB=args.SB or None,
                             chunks=args.chunks, idx_extract=args.idx,
                             cull=None if args.cull < 0 else bool(args.cull),
                             extract_block=args.eb or None,
                             fuse_extract=None if args.fe < 0 else args.fe,
                             batch_votes=(None if args.bv < 0
                                          else bool(args.bv)),
                             super_group=args.sg,
                             dyn_cull=(None if args.dyn < 0
                                       else bool(args.dyn)),
                             dyn_order=(None if args.dord < 0
                                        else args.dord),
                             unroll=args.unroll or None,
                             return_stats=True)

    key = jax.random.key(0)
    for w in range(2):  # compile, then absorb one-time dispatch
        _, seg, _, _ = launch(jax.random.fold_in(key, 900 + w))
        _ = float(seg)
    total = 0.0
    stats = []
    t0 = time.perf_counter()
    for i in range(args.launches):
        _, seg, li, blk = launch(jax.random.fold_in(key, i))
        total += float(seg)  # ONE host transfer forces the sync
        stats.append((li, blk))
    dt = time.perf_counter() - t0
    rate = total / dt
    extra = ""
    if args.stats:
        # stats transfers stay outside the timed window (~28 ms each)
        iters = sum(float(li) for li, _ in stats)
        blocks = sum(float(blk) for _, blk in stats)
        _, cfg, _, _ = mk.make_plan(scene, args.nx, args.ny, args.spp,
                                    max_depth=args.max_depth,
                                    T=args.T or None, SB=args.SB or None,
                                    chunks=args.chunks,
                                    idx_extract=args.idx,
                                    cull=(None if args.cull < 0
                                          else bool(args.cull)),
                                    extract_block=args.eb or None,
                                    fuse_extract=(None if args.fe < 0
                                                  else args.fe))
        C = cfg.C
        surv = blocks / max(iters * C, 1.0)
        extra = (f" util={total / max(iters, 1.0):.3f}"
                 f" cull_survival={surv:.3f} (C={C})")
    print(f"{args.scene} {args.nx}x{args.ny}@{args.spp}spp T={args.T} "
          f"SB={args.SB} chunks={args.chunks} idx={int(args.idx)}: "
          f"{total / 1e6:.1f}M segments in {dt:.3f}s = "
          f"{rate / 1e6:.1f} M segments/s{extra}", flush=True)


if __name__ == "__main__":
    main()
