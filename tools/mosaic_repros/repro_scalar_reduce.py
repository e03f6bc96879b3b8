"""Mosaic feasibility probe: rank-0 (scalar) reductions of VMEM vectors,
stored to and read back from SMEM scratch, driving scalar control flow.

The round-4 ordered-survivor break needs three scalar facts inside the
kernel: kmin/kspan of the per-cluster slab-entry keys, and the running
max-over-lanes best-t. All are cross-lane/cross-sublane reductions of
VMEM-resident vectors that must land in SREGs (SMEM) to gate a
lax.while_loop. This repro proves the whole chain compiles and runs on
hardware: jnp.min/jnp.max to rank-0 -> SMEM store -> scalar read ->
arithmetic -> while_loop trip count.

Measured 2026-08-20 on the working chip: PASS (out = [7.0, 42.0, 3.0]
matches the interpreter and numpy).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def kernel(x_ref, o_ref, s_ref):
    # rank-0 reductions of a (8, 128) VMEM block
    kmin = jnp.min(x_ref[...])
    kmax = jnp.max(x_ref[...])
    s_ref[0] = kmin
    s_ref[1] = kmax
    # scalar arithmetic on the read-back values gates a while_loop
    lo = s_ref[0]
    hi = s_ref[1]
    span = hi - lo

    def cond(c):
        i, acc = c
        return (i.astype(jnp.float32) * 13.0 < span) & (i < 100)

    def body(c):
        i, acc = c
        return i + 1, acc + 1

    trips, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    o_ref[0:1, :] = jnp.full((1, 128), lo, jnp.float32)
    o_ref[1:2, :] = jnp.full((1, 128), hi, jnp.float32)
    o_ref[2:3, :] = jnp.full((1, 128), trips.astype(jnp.float32))


def main():
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128) % 36.0 + 7.0
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )(x)
    got = np.asarray(out)[:3, 0]
    want = [float(x.min()), float(x.max()),
            float(-(-int(x.max() - x.min()) // 13))]
    # trips: smallest i with i*13 >= span; span=35 -> i=3
    print("got", got, "want", want)
    assert got[0] == want[0] and got[1] == want[1], got
    assert got[2] == 3.0, got
    print("PASS")


if __name__ == "__main__":
    main()
