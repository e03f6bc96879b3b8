"""Upper-bound twin of the book-1 dense sweep (round-5, VERDICT #4).

The per-phase stub instrument hit its resolution floor in round 4 (most
stubs measure *slower* than the full kernel on this schedule-bound
Mosaic loop), leaving the 241 M seg/s ~= 90-95%-of-VPU-ceiling claim
resting on one aggregate op-count model. This tool is the second,
independent instrument: a standalone Pallas kernel with the SAME shapes,
tables, unroll structure, and dependency pattern as the shipping book-1
megakernel iteration — but executing ONLY the sweep:

  quad — per 128-sphere block: uniform-time y-motion FMA, sign-flipped
         fma quadratic, rsqrt root, near-else-far select, block min,
         running-best merge (the irreducible cost of ANY dense design)
  ext  — quad + the fused strictly-better one-hot extraction
         ((A_ROWS, EE) @ (EE, T) MXU dot + select merge): the shipping
         sweep in full

Each iteration's rays derive from the previous iteration's sweep output
(a ~12-op coupling stand-in for shade/regen), so the compiler can hoist
nothing and the loop carries the same serial dependency the real bounce
loop does; the while condition re-creates the real cross-lane
any()+scalar-branch check. The twin's us/iteration is a floor for the
full kernel's: full - twin = what camera-regen + shade + RNG + state
writes REALLY cost after overlap, locating any unharvested headroom.

    python tools/sweep_twin.py [--iters 2000] [--grid 8]

Appends rows to docs/sweep_twin_r05.jsonl. Hot loop being bounded:
/root/reference/RayTracingWeekend/RayTracingWeekend.cpp:45-160 +
sphere.h:46-81.
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
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--grid", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default="quad,ext")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir, "docs",
        "sweep_twin_r05.jsonl"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops import megakernel as mk

    scene = make_scene("random_balls", 1.5)
    tabs, cfg, T, _k = mk.make_plan(scene, 1200, 800, 64, max_depth=50)
    sph_tab, attr_tab = tabs[0], tabs[1]
    S, EE = cfg.S, (cfg.fe or cfg.S)
    BIG = mk.BIG
    print(f"twin shapes: S={S} EE={EE} T={T} unroll={cfg.unroll} "
          f"uniform_time={cfg.uniform_time} moving={cfg.clus_moving}")

    def make_fn(variant: str, K: int, G: int):
        do_ext = variant == "ext"

        def kern(sph_ref, attr_ref, out_ref, sf_ref, af_ref):
            # int iota + cast: Mosaic's tpu.iota verifier rejects float
            # results on-chip (megakernel.py has the same workaround)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(
                jnp.float32)
            # book-1-like camera: origin cluster, downward-ish fanned dirs
            sf_ref[0:1, :] = 13.0 + lane * 1e-4            # ox
            sf_ref[1:2, :] = 2.0 + lane * 3e-5             # oy
            sf_ref[2:3, :] = 3.0 - lane * 2e-5             # oz
            inv = jax.lax.rsqrt(3.0 + lane * 1e-4 * lane * 1e-4)
            sf_ref[3:4, :] = -inv                          # dx
            sf_ref[4:5, :] = -inv * (0.3 + lane * 1e-5)    # dy
            sf_ref[5:6, :] = -inv                          # dz
            sf_ref[6:7, :] = lane * (1.0 / T)              # time
            sf_ref[7:8, :] = jnp.zeros((1, T), jnp.float32)  # iter count
            af_ref[:, :] = jnp.zeros((mk.A_ROWS, T), jnp.float32)

            def body(carry):
                it, _go = carry
                ox = sf_ref[0:1, :]
                oy = sf_ref[1:2, :]
                oz = sf_ref[2:3, :]
                dx = sf_ref[3:4, :]
                dy = sf_ref[4:5, :]
                dz = sf_ref[5:6, :]
                tm = sf_ref[6:7, :]
                best = jnp.full((1, T), BIG, jnp.float32)
                af_vals = af_ref[:, :]
                for e0 in range(0, S, EE):
                    cy = sph_ref[e0:e0 + EE, mk.C_CY:mk.C_CY + 1]
                    # book-1 motion is y-only + uniform time window
                    frac = (tm - cfg.ut_t0) * cfg.ut_idt
                    cy = cy + frac * sph_ref[e0:e0 + EE,
                                             mk.C_DCY:mk.C_DCY + 1]
                    cox = sph_ref[e0:e0 + EE, mk.C_CX:mk.C_CX + 1] - ox
                    coy = cy - oy
                    coz = sph_ref[e0:e0 + EE, mk.C_CZ:mk.C_CZ + 1] - oz
                    nb = cox * dx + coy * dy + coz * dz
                    cc = (cox * cox + (coy * coy + (coz * coz
                          + sph_ref[e0:e0 + EE, mk.C_NR2:mk.C_NR2 + 1])))
                    disc = nb * nb - cc
                    sq = disc * jax.lax.rsqrt(disc)
                    tn = nb - sq
                    tf = nb + sq
                    tcv = jnp.where(tn > 0.001, tn,
                                    jnp.where(tf > 0.001, tf, BIG))
                    blk_min = jnp.min(tcv, axis=0, keepdims=True)
                    if do_ext:
                        upd = blk_min < best
                        m_e = (tcv == blk_min).astype(jnp.float32)
                        cand = jax.lax.dot_general(
                            attr_ref[:, e0:e0 + EE], m_e,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        af_vals = jnp.where(upd, cand, af_vals)
                    best = jnp.minimum(best, blk_min)
                # ---- coupling stand-in: next rays from this sweep's
                # output (prevents hoisting; carries the serial bounce
                # dependency) ----
                tcl = jnp.minimum(best, 100.0)
                sf_ref[0:1, :] = ox * 0.999 + 0.001 * tcl
                sf_ref[1:2, :] = oy * 0.999 + 0.0003 * tcl
                sf_ref[2:3, :] = oz * 0.999 - 0.0002 * tcl
                sf_ref[3:4, :] = dx * 0.9999 + 1e-5 * tcl
                sf_ref[4:5, :] = dy * 0.9999 - 1e-5 * tcl
                sf_ref[5:6, :] = dz
                sf_ref[6:7, :] = jnp.minimum(tm + 1e-4, 1.0)
                if do_ext:
                    af_ref[:, :] = af_vals
                # real while check: cross-lane any() reduce + scalar
                # branch. The conjunct is genuinely data-dependent (the
                # synthetic rays aim below the horizon so the ground
                # sphere keeps hitting; sf_ref[7] proves K iterations
                # executed) — an always-true form like `alive >= 0`
                # would let the compiler fold the conjunct and DCE the
                # reduce the twin exists to measure.
                alive = jnp.any(best < BIG).astype(jnp.int32)
                sf_ref[7:8, :] = sf_ref[7:8, :] + 1.0
                return it + 1, alive

            jax.lax.while_loop(lambda c: (c[0] < K) & (c[1] > 0), body,
                               (jnp.zeros((), jnp.int32),
                                jnp.ones((), jnp.int32)))
            out_ref[0, 0:1, :] = sf_ref[0:1, :]
            out_ref[0, 1:2, :] = sf_ref[7:8, :]

        grid = (G,)
        fn = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((S, mk.SPH_LANES), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mk.A_ROWS, S), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 2, T), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((G, 2, T), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((8, T), jnp.float32),
                pltpu.VMEM((mk.A_ROWS, T), jnp.float32),
            ],
            interpret=pltpu.InterpretParams() if args.interpret else False,
        )
        return jax.jit(fn)

    rows = []
    for variant in args.variants.split(","):
        K, G = args.iters, args.grid
        if args.interpret:
            K, G = 4, 1
        fn = make_fn(variant, K, G)
        out = fn(sph_tab, attr_tab)
        _sync = float(jnp.sum(out))
        best_dt = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = fn(sph_tab, attr_tab)
            _sync = float(jnp.sum(out))
            dt = time.perf_counter() - t0
            best_dt = dt if best_dt is None else min(best_dt, dt)
        us_per_iter = best_dt / (K * G) * 1e6
        implied = T / (us_per_iter * 1e-6)
        iters_done = float(out[0, 1, 0])
        assert iters_done == K, (iters_done, K)  # no early exit
        row = {"variant": variant, "S": S, "EE": EE, "T": T,
               "iters": K, "grid": G, "us_per_iter": us_per_iter,
               "implied_ceiling_seg_per_s": implied,
               "iters_done": iters_done,
               "checksum": _sync}
        rows.append(row)
        print(json.dumps(row), flush=True)
    if not args.interpret:
        with open(args.out, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    raise SystemExit(main())
