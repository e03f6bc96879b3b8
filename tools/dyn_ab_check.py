"""On-chip dense-vs-dyn A/B: pixel-certify the dynamic survivor-list path.

The round-4 SMEM-compaction + runtime-trip-count survivor sweep
(`megakernel.py` cfg.dyn) is the most intricate Mosaic code in the repo,
yet every golden scene compiles to a C=1 plan where make_plan keeps dyn
off — on hardware it was exercised only by throughput benches that check
no pixels (VERDICT r4 weak #4). This tool runs the stress scenes on the
REAL chip and asserts bitwise radiance equality across the three
closest-hit execution strategies that must be result-preserving by
construction (votes and survivor lists only SKIP provably-losing
clusters; the strictly-better merge keeps cross-block tie resolution
identical — see tests/test_megakernel.py::test_dyn_cull_is_bitwise_exact
for the interpret-mode statement of the same invariant):

  dense  — cull=False: unconditional sweep of every cluster
  voted  — cull=True, dyn off: interleaved per-cluster slab votes
  dyn    — the SHIPPING auto plan (dyn_cull=True, dyn_order=16 at these
           cluster counts) and the chunked + id-ordered variants

Any divergence is a real Mosaic miscompile of the dyn path (the class
tools/mosaic_repros/ catalogues), not tolerance noise.

    python tools/dyn_ab_check.py [--nx 64] [--ny 64] [--spp 8]

Reference behavior being certified: the closest-hit sweep of
/root/reference/RayTracingWeekend/hittable_list.h:11-37 at scales the
reference's linear scan could not reach.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=64)
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--scenes", default="random_balls_large,"
                                        "random_balls_huge")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    key = jax.random.key(11)
    ok_all = True
    for name in args.scenes.split(","):
        scene = make_scene(name, args.nx / args.ny)
        variants = {
            "dense": dict(cull=False),
            "voted": dict(cull=True, dyn_cull=False),
            "dyn-auto": dict(),  # shipping plan: dyn_cull=True, dord=16
            "dyn-id": dict(dyn_cull=True, dyn_order=0),
            "dyn-chunk2": dict(dyn_cull=True, chunks=2),
        }
        imgs = {}
        segs = {}
        for vname, kw in variants.items():
            img, s = mk.trace_mega(key, scene, args.nx, args.ny, args.spp,
                                   max_depth=args.max_depth, **kw)
            imgs[vname] = np.asarray(img)
            segs[vname] = float(s)
        base = imgs["dense"]
        for vname in variants:
            if vname == "dense":
                continue
            same = np.array_equal(base, imgs[vname])
            seg_same = segs[vname] == segs["dense"]
            ok = same and seg_same
            ok_all &= ok
            print(f"dyn-ab {name} {args.nx}x{args.ny}x{args.spp}spp "
                  f"dense-vs-{vname}: bitwise={'EQUAL' if same else 'DIFF'} "
                  f"segs={segs[vname]:.0f}/{segs['dense']:.0f} "
                  f"{'PASS' if ok else 'FAIL'}", flush=True)
            if not same:
                d = np.abs(base - imgs[vname])
                print(f"  max|d|={d.max():.3e} n_diff="
                      f"{int((d > 0).sum())}/{d.size}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
