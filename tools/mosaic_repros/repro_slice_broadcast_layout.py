"""Minimized repro for Mosaic landmine (d): sublane-broadcasting a
lane-OFFSET register slice fails backend compilation ("Invalid input
layout" on vector.broadcast).

Context (found in round 2): the megakernel's chunked cluster culling
(ops/megakernel.py, cfg.chunks > 1) sliced full-width (1, T) ray-state
register vectors per 128-aligned lane chunk (`row[:, ch*W:(ch+1)*W]`) and
combined them with (SB, 1) sphere columns. The elementwise combine needs a
(1, W) -> (SB, W) sublane broadcast, and when the slice starts at lane
offset >= 128 Mosaic keeps the offset in the vector layout
(#tpu.vpad<"32,{*,OFF},(8,128)">) and the backend rejects the broadcast:

    Mosaic failed to compile TPU kernel: Invalid input layout
    %N = "vector.broadcast"(...) : (vector<1xWxf32>) -> vector<SBxWxf32>

Interpret mode and CPU never see this. The production kernel now re-LOADS
the chunk slice straight from the VMEM ref inside the chunk body
(`ref[r:r+1, ch*W:(ch+1)*W]`) — loads at 128-aligned offsets come back
tile-aligned (lane offset 0) and broadcast fine; this script shows both
variants.

Run ON THE TPU (one job at a time):

    python tools/mosaic_repros/repro_slice_broadcast_layout.py

Expected (bug present): the register-slice variant fails to compile; the
ref-load variant compiles and matches the XLA answer exactly.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

SB, T, W = 64, 512, 256  # two chunks; the ch=1 slice has lane offset 256


def _kernel_reg_slice(row_ref, col_ref, out_ref):
    row = row_ref[...]                       # (1, T) register vector
    for ch in range(T // W):
        sl = slice(ch * W, (ch + 1) * W)
        out_ref[:, sl] = row[:, sl] * col_ref[...]   # (1,W)x(SB,1)->(SB,W)


def _kernel_ref_load(row_ref, col_ref, out_ref):
    for ch in range(T // W):
        sl = slice(ch * W, (ch + 1) * W)
        row = row_ref[0:1, sl]               # fresh tile-aligned load
        out_ref[:, sl] = row * col_ref[...]


def _run(kernel, row, col):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SB, T), jnp.float32),
    )(row, col)


def main():
    rng = np.random.default_rng(0)
    row = jnp.asarray(rng.standard_normal((1, T)), jnp.float32)
    col = jnp.asarray(rng.standard_normal((SB, 1)), jnp.float32)
    expect = np.asarray(row) * np.asarray(col)

    got = np.asarray(_run(_kernel_ref_load, row, col))
    assert np.array_equal(got, expect), "ref-load variant is wrong"
    print("ref-load per chunk: compiles, exact")

    try:
        bad = np.asarray(_run(_kernel_reg_slice, row, col))
    except Exception as e:
        print(f"register-slice per chunk: FAILS to compile "
              f"({type(e).__name__}) — bug present, keep the ref-load form")
        return 0
    if np.array_equal(bad, expect):
        print("register-slice: compiles and is exact — landmine fixed "
              "upstream; the ref-load workaround can be dropped")
    else:
        print("register-slice: compiles but WRONG — worse than before")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
