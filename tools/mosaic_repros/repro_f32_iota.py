"""Minimized repro for Mosaic landmine (c): float-dtype broadcasted_iota
fails kernel verification on TPU.

Context (found in round 2): the megakernel's index-based winner extraction
(ops/megakernel.py, cfg.idx_extract) originally built its sub-row index
vector with `jax.lax.broadcasted_iota(jnp.float32, (SB, W), 0)`. That
traces and runs fine in interpret mode and on CPU, but Mosaic's verifier
rejects it at lowering time:

    'tpu.iota' op result #0 must be vector of integer or index values,
    but got 'vector<...xf32>'

i.e. f32 iota is never lowered as int-iota + sitofp; it is emitted as an
(invalid) float tpu.iota directly. The production kernel now generates an
int32 iota and casts (`.astype(jnp.float32)`), which this script shows
compiles and matches.

Run ON THE TPU (one job at a time):

    python tools/mosaic_repros/repro_f32_iota.py

Expected (bug present): the f32-iota variant raises VerificationError at
compile; the int-iota+cast variant compiles and returns the exact iota.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS, T = 24, 256


def _kernel_f32_iota(out_ref):
    out_ref[...] = jax.lax.broadcasted_iota(jnp.float32, (ROWS, T), 0)


def _kernel_int_iota_cast(out_ref):
    out_ref[...] = jax.lax.broadcasted_iota(
        jnp.int32, (ROWS, T), 0).astype(jnp.float32)


def _run(kernel):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, T), jnp.float32),
    )()


def main():
    expect = np.broadcast_to(np.arange(ROWS, dtype=np.float32)[:, None],
                             (ROWS, T))

    ok = np.asarray(_run(_kernel_int_iota_cast))
    assert np.array_equal(ok, expect), "int-iota+cast variant is wrong"
    print("int32 iota + astype(f32): compiles, exact")

    try:
        bad = np.asarray(_run(_kernel_f32_iota))
    except Exception as e:  # VerificationError (Mosaic) expected
        print(f"f32 iota: FAILS to compile ({type(e).__name__}) — "
              "bug present, keep the int-iota+cast form")
        return 0
    if np.array_equal(bad, expect):
        print("f32 iota: compiles and is exact — landmine fixed upstream; "
              "the cast workaround can be dropped")
    else:
        print("f32 iota: compiles but WRONG — worse than before")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
