"""Microbenchmark of in-kernel dot_general formulations on the real TPU.

Times the candidate MXU formulations for the megakernel's per-bounce
linear algebra, each repeated in-kernel under a dependency chain so the
compiler cannot hoist or dedup them:

  lane16   : (S,16) @ (16,T)   lane-dim contraction (K pads to 128?)
  sub16    : (16,S)^T contraction on sublanes -> (S,T) (native lhsT)
  extract  : (24,S) @ (S,T)    the attribute-extraction shape
  elemq    : the elementwise moving-sphere quadratic (~25 VPU ops) as the
             baseline the MXU variants have to beat
Each at f32 default / f32 HIGHEST / bf16 where applicable.

    python tools/dot_microbench.py [--S 512] [--T 2048] [--iters 64]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=512)
    ap.add_argument("--T", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--json", default="", help="append one JSON line per "
                    "measurement here (the committed-artifact form)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, T, N = args.S, args.T, args.iters
    HI = jax.lax.Precision.HIGHEST

    # Two-point slope measurement: each kernel is compiled at N and 4N
    # in-kernel iterations and the per-iter cost is the SLOPE between
    # their best wall times. This cancels the dispatch + sync round-trip
    # entirely — the tunnel constant has varied across rounds (~28 ms in
    # r3, ~26 ms with several-ms jitter in r4), and subtracting a stale or
    # even freshly measured constant leaves µs-scale N=64 loops negative
    # in the noise. Kernel bodies read the trip count from _cur_n at
    # trace time (body_loop below).
    _cur_n = [N]

    def timed(name, kernel, *tabs):
        runs = []
        for n in (N, 4 * N):
            _cur_n[0] = n

            def run(*tabs):
                return pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((8, T), jnp.float32),
                    scratch_shapes=[pltpu.VMEM((S, T), jnp.float32)],
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 << 20),
                )(*tabs)

            compiled = jax.jit(run).lower(*tabs).compile()
            _ = float(jnp.sum(compiled(*tabs)))  # absorb first dispatch
            runs.append((n, compiled))
        best = {n: 1e9 for n, _r in runs}
        for _rep in range(args.reps):
            for n, run_c in runs:
                t0 = time.perf_counter()
                out = run_c(*tabs)
                _ = float(jnp.sum(out))
                best[n] = min(best[n], time.perf_counter() - t0)
        per = (best[4 * N] - best[N]) / (3 * N)
        print(f"{name:34s}: {per * 1e6:8.1f} us/iter "
              f"({per * 940e6:9.0f} cyc @940MHz)", flush=True)
        if args.json:
            import json
            with open(args.json, "a") as f:
                f.write(json.dumps({"name": name.strip(), "S": S, "T": T,
                                    "iters": [N, 4 * N],
                                    "us_per_iter": round(per * 1e6, 2),
                                    "cycles_at_940MHz":
                                        int(per * 940e6)}) + "\n")

    rng = np.random.default_rng(0)

    def body_loop(n, f, acc_init, out_ref, acc):
        acc[...] = acc_init
        def step(i, _):
            acc[...] = f(acc[...], i)
            return 0
        jax.lax.fori_loop(0, n, step, 0)
        out_ref[...] = acc[0:8, :]

    # ---- lane16: (S,16) @ (16,T) ----
    mx = jnp.asarray(rng.normal(size=(S, 16)), jnp.float32)

    def k_lane16(prec):
        def kern(mx_ref, out_ref, acc):
            def f(a, i):
                rhs = a[0:16, :] * 1e-30 + 1.0
                return jax.lax.dot_general(
                    mx_ref[...], rhs, (((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
            body_loop(_cur_n[0], f, jnp.zeros((S, T), jnp.float32), out_ref, acc)
        return kern

    timed("lane16 f32 default", k_lane16(None), mx)
    timed("lane16 f32 HIGHEST", k_lane16(HI), mx)

    # ---- sub16: contraction on sublane dim, lhs (16,S) ----
    mxt = jnp.asarray(rng.normal(size=(16, S)), jnp.float32)

    def k_sub16(prec):
        def kern(mxt_ref, out_ref, acc):
            def f(a, i):
                rhs = a[0:16, :] * 1e-30 + 1.0
                return jax.lax.dot_general(
                    mxt_ref[...], rhs, (((0,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
            body_loop(_cur_n[0], f, jnp.zeros((S, T), jnp.float32), out_ref, acc)
        return kern

    try:
        timed("sub16 f32 default ", k_sub16(None), mxt)
        timed("sub16 f32 HIGHEST ", k_sub16(HI), mxt)
    except Exception as e:  # Mosaic may reject dim-0 contraction
        print(f"sub16: UNSUPPORTED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)

    # ---- extract: (24,S) @ (S,T) one-hot f32 vs bf16 ----
    at = jnp.asarray(rng.normal(size=(24, S)), jnp.float32)

    def k_extract(prec):
        def kern(at_ref, out_ref, acc):
            def f(a, i):
                m = (a == 0.0).astype(jnp.float32)
                r = jax.lax.dot_general(
                    at_ref[...], m, (((1,), (0,)), ((), ())),
                    precision=prec, preferred_element_type=jnp.float32)
                return a * 0.5 + jnp.pad(r, ((0, S - 24), (0, 0)))
            body_loop(_cur_n[0], f, jnp.zeros((S, T), jnp.float32), out_ref, acc)
        return kern

    atb = at.astype(jnp.bfloat16)

    def k_extract_bf16(at_ref, out_ref, acc):
        def f(a, i):
            m = (a == 0.0).astype(jnp.bfloat16)
            r = jax.lax.dot_general(
                at_ref[...], m, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return a * 0.5 + jnp.pad(r, ((0, S - 24), (0, 0)))
        body_loop(_cur_n[0], f, jnp.zeros((S, T), jnp.float32), out_ref, acc)

    timed("extract f32 default", k_extract(None), at)
    timed("extract f32 HIGHEST", k_extract(HI), at)
    timed("extract bf16       ", k_extract_bf16, atb)

    # ---- elemq: elementwise moving quadratic, ~25 VPU ops/(sphere,ray) ----
    sph = jnp.asarray(rng.normal(size=(S, 128)), jnp.float32)

    def k_elemq(sph_ref, out_ref, acc):
        def f(a, i):
            ox = a[0:1, :] * 1e-30 + 1.0
            oy, oz = ox, ox
            dx = ox * 0.5
            dy, dz = dx, dx
            tmv = ox * 0.1
            cx = sph_ref[:, 0:1]
            cy = sph_ref[:, 1:2]
            cz = sph_ref[:, 2:3]
            frac = (tmv - sph_ref[:, 6:7]) * sph_ref[:, 7:8]
            cx = cx + frac * sph_ref[:, 3:4]
            cy = cy + frac * sph_ref[:, 4:5]
            cz = cz + frac * sph_ref[:, 5:6]
            ocx = ox - cx
            ocy = oy - cy
            ocz = oz - cz
            b = ocx * dx + ocy * dy + ocz * dz
            cc = (ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[:, 8:9])
            disc = b * b - cc
            sq = jnp.sqrt(disc)
            tn = -b - sq
            tc = jnp.where(tn > 1e-3, tn, -b + sq)
            return jnp.where(tc > 1e-3, tc, 3e37)
        body_loop(_cur_n[0], f, jnp.zeros((S, T), jnp.float32), out_ref, acc)

    timed("elemq ~25 VPU ops  ", k_elemq, sph)

    # ---- min-reduce + eq-mask cost ----
    def k_minmask(sph_ref, out_ref, acc):
        def f(a, i):
            m = jnp.min(a, axis=0, keepdims=True)
            return a + (a == m).astype(jnp.float32)
        body_loop(_cur_n[0], f, jnp.ones((S, T), jnp.float32), out_ref, acc)

    timed("min+eqmask         ", k_minmask, sph)


if __name__ == "__main__":
    main()
