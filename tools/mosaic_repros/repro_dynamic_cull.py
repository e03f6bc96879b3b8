"""Mosaic feasibility probes for the dynamic-trip survivor-list sweep
(round-4 large-S culling design, VERDICT r3 #1).

The design replaces the per-cluster `any() -> scalar -> pl.when` vote
chain (measured ~60% of the 14.4k-sphere iteration) with:

  1. one batched (C, T) slab-test block + row-wise any  -> (C, 1) votes
  2. a scalar compaction loop writing surviving cluster ids to SMEM
  3. `lax.fori_loop(0, n_survivors, body)` with a DYNAMIC trip count,
     whose body reads the survivor id from SMEM and sweeps that cluster
     via DYNAMIC sublane/lane slices of the VMEM tables.

Each probe below isolates one Mosaic capability the design needs; the
runtime scalars come from an SMEM input so nothing constant-folds:

  A. dynamic SUBLANE slice of a VMEM ref (sph_tab rows at k*8)
  B. dynamic LANE slice of a VMEM ref (attr_tab cols at k*128)
  C. fori_loop with a runtime trip count + dynamic SMEM loads in the body
  D. scalar compaction loop: dynamic SMEM store index (count carry)

Run ON THE TPU (one job at a time):

    python tools/mosaic_repros/repro_dynamic_cull.py

Each probe prints OK (compiles + matches numpy) or the Mosaic error.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn, expect):
    try:
        out = np.asarray(jax.jit(fn)())
        ok = np.allclose(out, expect)
        print(f"{name}: {'OK' if ok else 'WRONG VALUES'} "
              f"(got {out.ravel()[:4]} want "
              f"{np.asarray(expect).ravel()[:4]})", flush=True)
        return ok
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return False


_SCALARS = np.asarray([3, 2, 3, 0], np.int32)  # runtime (SMEM input)


def _smem_in():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _interp():
    # semantics-checkable on CPU via the TPU interpreter; the point of the
    # probe is the MOSAIC compile, so run it on the chip for the verdict
    return (pltpu.InterpretParams()
            if jax.default_backend() in ("cpu", "gpu") else False)


def main():
    S = 64
    tab = np.arange(S * 128, dtype=np.float32).reshape(S, 128)
    att = np.arange(8 * 512, dtype=np.float32).reshape(8, 512)

    # ---- A: dynamic sublane slice, offset = runtime scalar * 8 ----
    def kern_a(s_ref, x_ref, o_ref):
        k = s_ref[0]
        o_ref[:, :] = x_ref[pl.ds(k * 8, 8), :]

    def fa():
        return pl.pallas_call(
            kern_a,
            in_specs=[_smem_in(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=_interp(),
        )(_SCALARS, tab)

    run("A dynamic-sublane-slice", fa, tab[24:32])

    # ---- B: dynamic lane slice, offset = runtime scalar * 128 ----
    def kern_b(s_ref, x_ref, o_ref):
        k = s_ref[1]
        o_ref[:, :] = x_ref[:, pl.ds(k * 128, 128)]

    def fb():
        return pl.pallas_call(
            kern_b,
            in_specs=[_smem_in(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            interpret=_interp(),
        )(_SCALARS, att)

    run("B dynamic-lane-slice", fb, att[:, 256:384])

    # ---- C: fori_loop with runtime trip count + SMEM-indexed body ----
    def kern_c(s_ref, x_ref, o_ref, smem, acc):
        smem[0] = s_ref[0] - 2          # 1
        smem[1] = s_ref[0]              # 3
        smem[2] = s_ref[1] + s_ref[2]   # 5
        n = s_ref[2]                    # 3
        acc[:, :] = jnp.zeros((8, 128), jnp.float32)

        def body(i, carry):
            c = smem[i]                 # dynamic SMEM load
            acc[:, :] = acc[:, :] + x_ref[pl.ds(c * 8, 8), :]
            return carry

        jax.lax.fori_loop(0, n, body, 0)
        o_ref[:, :] = acc[:, :]

    def fc():
        return pl.pallas_call(
            kern_c,
            in_specs=[_smem_in(),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            scratch_shapes=[pltpu.SMEM((8,), jnp.int32),
                            pltpu.VMEM((8, 128), jnp.float32)],
            interpret=_interp(),
        )(_SCALARS, tab)

    run("C dynamic-trip-fori+smem", fc,
        tab[8:16] + tab[24:32] + tab[40:48])

    # ---- D: scalar compaction (dynamic SMEM store index); the id list
    # comes back through an SMEM output (a vector .at[].set scatter is NOT
    # lowered on TPU — first probe version died there, not in the
    # compaction) ----
    def kern_d(v_ref, o_ref):
        for i in range(8):
            o_ref[i] = jnp.int32(-1)

        def body(c, cnt):
            vote = v_ref[c, 0] > 0.0

            def store():
                o_ref[cnt] = c

            pl.when(vote)(store)
            return cnt + jnp.where(vote, 1, 0)

        jax.lax.fori_loop(0, 8, body, jnp.int32(0))

    votes = np.zeros((8, 128), np.float32)
    votes[[1, 4, 6], 0] = 1.0
    expect = np.asarray([1, 4, 6, -1, -1, -1, -1, -1], np.int32)

    def fd():
        return pl.pallas_call(
            kern_d,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((8,), jnp.int32),
            interpret=_interp(),
        )(votes)

    run("D scalar-compaction-smem", fd, expect)


if __name__ == "__main__":
    main()
