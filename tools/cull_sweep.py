"""Sweep megakernel (SB, chunks, idx_extract, T) configs in ONE process
(real TPU).

    python tools/cull_sweep.py --scene random_balls --nx 1200 --ny 800 \
        --spp 64 --configs 512:1 64:8 64:8:1 32:8:1:4096 512:1:1:2048:0 \
        512:1:1:2048:1:512

Config spec is SB:chunks[:idx[:T[:cull[:eb[:dyn]]]]] — idx=1 switches on
index-based winner extraction (no (S,T) scratch), T overrides the tile
width, cull=0/1 forces vote-free/voted blocking (empty = auto), eb forces
the idx extraction block size (128-multiple divisor of S), dyn=0/1 forces
the dynamic survivor-list sweep off/on (empty = auto, C >= 8).
One process = one TPU job (tunnel discipline) and the runtime init is paid
once; each config still compiles its own kernel (server-side, cached in
.jax_cache). Reports M segments/s, lane utilization, and cull-survival rate
(executed quadratic lane-blocks / possible) per config.
"""
from __future__ import annotations

import argparse
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
    ap.add_argument("--launches", type=int, default=2)
    ap.add_argument("--T", type=int, default=2048)
    ap.add_argument("--configs", nargs="+", default=["512:1", "64:1", "64:8"],
                    help="SB:chunks[:idx[:T]] specs (idx=1 -> index-based "
                         "winner extraction; T = per-config tile width)")
    ap.add_argument("--json", default="", help="append one JSON line per "
                    "config here (the committed-artifact form)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    scene = make_scene(args.scene, args.nx / args.ny)
    assert mk.supports_scene(scene), args.scene
    key = jax.random.key(0)

    for spec in args.configs:
        parts = spec.split(":")
        SB, chunks = int(parts[0]), int(parts[1])
        idx = bool(int(parts[2])) if len(parts) > 2 else False
        T_cfg = int(parts[3]) if len(parts) > 3 else args.T
        cull = (bool(int(parts[4])) if len(parts) > 4
                and parts[4] != "" else None)
        eb = (int(parts[5]) if len(parts) > 5 and parts[5] != ""
              else None)
        dyn = (bool(int(parts[6])) if len(parts) > 6 and parts[6] != ""
               else None)

        def launch(k):
            return mk.trace_mega(k, scene, args.nx, args.ny, args.spp,
                                 max_depth=args.max_depth, T=T_cfg,
                                 SB=SB, chunks=chunks, idx_extract=idx,
                                 cull=cull, extract_block=eb, dyn_cull=dyn,
                                 return_stats=True)

        t_c = time.perf_counter()
        for w in range(2):  # compile, then absorb one-time dispatch
            _, seg, _, _ = launch(jax.random.fold_in(key, 900 + w))
            _ = float(seg)
        c_dt = time.perf_counter() - t_c
        total = 0.0
        stats = []
        t0 = time.perf_counter()
        for i in range(args.launches):
            _, seg, li, blk = launch(jax.random.fold_in(key, i))
            total += float(seg)  # ONE host transfer forces the sync
            stats.append((li, blk))
        dt = time.perf_counter() - t0
        # stats transfers happen outside the timed window (each float() is
        # a ~28 ms tunnel round-trip)
        iters = sum(float(li) for li, _ in stats)
        blocks = sum(float(blk) for _, blk in stats)
        # the kernel's own clamp/dedupe decide SB and C — read them back
        _, cfg, T_eff, _ = mk.make_plan(scene, args.nx, args.ny, args.spp,
                                        max_depth=args.max_depth, T=T_cfg,
                                        SB=SB, chunks=chunks,
                                        idx_extract=idx, cull=cull,
                                        extract_block=eb, dyn_cull=dyn)
        C = cfg.C
        surv = blocks / max(iters * C, 1.0)
        print(f"SB={SB:<4d} chunks={chunks:<3d} idx={int(idx)} "
              f"cull={int(cfg.cull)} eb={cfg.eb:<4d} "
              f"T={T_eff:<5d} "
              f"{total / dt / 1e6:8.1f} M seg/s  "
              f"util={total / max(iters, 1.0):.3f} "
              f"cull_survival={surv:.3f} (C={C})  "
              f"[warm {c_dt:.0f}s, timed {dt:.2f}s]", flush=True)
        if args.json:
            import json
            with open(args.json, "a") as f:
                f.write(json.dumps({
                    "scene": args.scene, "nx": args.nx, "ny": args.ny,
                    "spp": args.spp, "SB": SB, "chunks": chunks,
                    "idx": int(idx), "cull": int(cfg.cull),
                    "dyn": int(getattr(cfg, "dyn", False)),
                    "eb": cfg.eb, "T": T_eff, "C": C,
                    "m_seg_per_s": round(total / dt / 1e6, 2),
                    "util": round(total / max(iters, 1.0), 4),
                    "cull_survival": round(surv, 4)}) + "\n")


if __name__ == "__main__":
    main()
