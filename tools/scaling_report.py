"""Round-4 scaling artifact: measured virtual-mesh rows + predicted ICI model.

Two halves (VERDICT round-3 item 8):

1. MEASURED: dp_scaling_report over the 8-device virtual CPU mesh for both
   renderer paths, including the mega dp=4 row round 3 skipped (reduced
   shapes keep the interpreter compile inside the process budget). Absolute
   numbers are meaningless on CPU — the rows certify the mesh/shard_map/
   psum program compiles and executes at every width.

2. PREDICTED: the psum payload per launch is computable from the program
   (render_sharded_mega psums radiance sums (lanes,3) f32 + done counts
   (lanes,) f32 over "sp"; dp adds NO collective — row tiles are
   independent), so the expected efficiency on real ICI is arithmetic, not
   speculation. Uses the measured single-chip rate from BENCH and public
   TPU ICI figures at three bandwidth assumptions.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_report.py [--out docs/scaling_r04.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))


def predicted_ici_model(nx=1200, ny=800, launch_spp=512, T=4096,
                        single_chip_rays_per_s=241.2e6,
                        mean_bounces_per_sample=None):
    """Analytic forward-render scaling model for a (dp, sp) mesh on a real
    slice. Per launch, per chip:

      compute  t_c = nx*ny*launch_spp/(dp*sp) / rate_single_chip
      collective t_m = ring-allreduce(sums+dones over "sp")
                     = 2*(sp-1)/sp * payload / bw
      payload      = lanes*16 bytes, lanes = ceil(nx*(ny/dp)/T)*T
                     (3 f32 radiance sums + 1 f32 done count per lane slot)

    dp contributes no collective in forward rendering (row tiles are
    device-local; the canvas stays sharded). Inverse rendering adds one
    pmean of scene-parameter grads (~tens of KB for book-1: 488 spheres x
    ~14 f32 params ~ 27 KB) — 3 orders of magnitude below the canvas psum,
    ignored here. Efficiency assumes NO compute/comm overlap (worst case).
    """
    import math

    bw_assumptions = {
        # one ICI link, one direction (pessimistic: ring confined to a
        # single link pair at v4-era per-link rates)
        "ici_1link_90GBs": 90e9,
        # bidirectional ring over one torus axis at v5p per-link rates
        "ici_axis_200GBs": 200e9,
        # v5p aggregate per-chip ICI (4,800 Gbps = 600 GB/s; upper bound)
        "ici_aggregate_600GBs": 600e9,
    }
    rows = []
    for dp, sp in [(1, 2), (1, 4), (1, 8), (2, 2), (4, 2), (2, 4), (8, 8)]:
        lanes = math.ceil(nx * (ny // dp) / T) * T
        payload = lanes * 16  # bytes psum'd over "sp" per launch
        t_c = nx * ny * launch_spp / (dp * sp) / single_chip_rays_per_s
        row = {"dp": dp, "sp": sp, "chips": dp * sp,
               "psum_payload_bytes": payload,
               "compute_s_per_launch": t_c}
        for name, bw in bw_assumptions.items():
            t_m = 2.0 * (sp - 1) / sp * payload / bw
            row[f"efficiency_{name}"] = t_c / (t_c + t_m)
        rows.append(row)
    return {
        "config": {"nx": nx, "ny": ny, "launch_spp": launch_spp, "T": T,
                   "single_chip_rays_per_s": single_chip_rays_per_s,
                   "source": "BENCH_r04.json book-1 median"},
        "note": ("Forward-render psum payload is lanes*16 B per launch per "
                 "chip, ring-allreduced over the sp axis only; dp shards "
                 "are collective-free. At the flagship config the payload "
                 "is ~15 MB vs ~2 s of compute per launch, so predicted "
                 "efficiency is >99.9% at every ICI assumption — the "
                 "design scales because the ONLY cross-chip traffic is one "
                 "canvas-sized reduction per 512-sample launch. Inverse "
                 "rendering adds a ~27 KB grad pmean per step (negligible)."),
        "rows": rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "docs",
        "scaling_r04.json"))
    ap.add_argument("--skip-measured", action="store_true")
    ap.add_argument("--row", default=None,
                    help="'path:dp' — measure ONE row and dump it as JSON "
                         "to --out (interpreter compiles are slow enough "
                         "that the full sweep is run as parallel "
                         "single-row processes)")
    ap.add_argument("--merge", nargs="*", default=None,
                    help="row-JSON files to merge into the artifact")
    args = ap.parse_args()

    if args.row:
        import jax
        from raytracingweekend_tpu.models.scenes import make_scene
        from raytracingweekend_tpu.parallel.scaling import dp_scaling_report

        path, dp = args.row.split(":")
        scene = make_scene("cornell_box", 1.0)
        # Mega rows run under the Pallas TPU interpreter at tiny shapes
        # (compile-and-execute certificates; CPU timings carry no
        # throughput meaning) on a FULL 8-device (dp, 8/dp) mesh: a
        # PARTIAL host mesh (2 or 4 of 8 devices) with actual partitioning
        # wedges XLA CPU for >9 min at shapes the full mesh finishes in
        # 60 s (probed 2026-08-20; dp=1 and dp=8 are unaffected). Real
        # chips never see this: the hardware mesh is sized to the slice.
        if path == "mega":
            sp = 8 // int(dp)
            rows = dp_scaling_report(scene, 8, 64, 2 * sp, dps=(int(dp),),
                                     sp=sp, max_depth=3, path="mega",
                                     T=128)
        else:
            rows = dp_scaling_report(scene, 32, 32, 8, dps=(int(dp),),
                                     max_depth=8, path="wavefront")
        with open(args.out, "w") as f:
            json.dump(rows, f)
        print(f"wrote {args.out}")
        return

    doc = {
        "note": ("8-device VIRTUAL host-CPU mesh: exercises the exact "
                 "mesh/shard_map/psum program that runs on hardware; "
                 "absolute CPU numbers are meaningless (the mega rows run "
                 "under the TPU interpreter). Mega rows use full (dp, "
                 "8/dp) meshes: XLA CPU wedges >9 min on a PARTIAL host "
                 "mesh (2 or 4 of 8 devices) with real partitioning at "
                 "shapes the full mesh finishes in 60 s — a virtual-mesh "
                 "quirk real slices never see (hardware meshes are sized "
                 "to the slice). Real multi-chip hardware is unavailable "
                 "in this environment; predicted_ici is the computable "
                 "model of what the same program costs on a real slice."),
        "predicted_ici": predicted_ici_model(),
    }

    if args.merge:
        rows = []
        for p in args.merge:
            with open(p) as f:
                rows += json.load(f)
        # efficiency_vs_dp1 is per-process when rows are measured solo;
        # recompute against each path's dp=1 row.
        base = {r["path"]: r["samples_per_s_per_device"]
                for r in rows if r["dp"] == 1}
        for r in rows:
            r["efficiency_vs_dp1"] = (r["samples_per_s_per_device"]
                                      / base[r["path"]])
        doc["rows"] = sorted(rows, key=lambda r: (r["path"], r["dp"]))
    elif not args.skip_measured:
        import jax
        from raytracingweekend_tpu.models.scenes import make_scene
        from raytracingweekend_tpu.parallel.scaling import dp_scaling_report

        assert len(jax.devices()) >= 8, "run with 8 virtual CPU devices"
        scene = make_scene("cornell_box", 1.0)
        rows = dp_scaling_report(scene, 32, 32, 8, dps=(1, 2, 4, 8),
                                 max_depth=8, path="wavefront")
        # Reduced shapes (T=256, spp=8, depth 6) keep the dp=4 interpreter
        # compile inside the process budget — the row round 3 delegated.
        rows += dp_scaling_report(scene, 32, 32, 8, dps=(1, 2, 4, 8),
                                  max_depth=6, path="mega", T=256)
        doc["rows"] = rows

    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {args.out}")
    if "rows" in doc:
        for r in doc["rows"]:
            print(f"  {r['path']} dp={r['dp']}: {r['seconds']:.2f}s")


if __name__ == "__main__":
    main()
