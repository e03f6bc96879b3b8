"""Small-table row lookup tuned for TPU.

``table[idx]`` gathers on this TPU class cost nanoseconds-per-element with
a large constant and poor scaling on some patterns; routing the lookup
through a chunked one-hot matmul puts it on the MXU instead, which is both
fast and differentiable w.r.t. the table. CPU/GPU keep the plain gather.

Used for the packed per-primitive attribute rows (ops/packing.py) and the
Perlin tables (ops/noise.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_CHUNK = 1 << 16


def use_onehot() -> bool:
    if os.environ.get("RTW_NO_ONEHOT_LOOKUP"):
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # pragma: no cover
        return False


def table_lookup(table, idx):
    """table[idx] for a small (R,) or (R, C) table, idx int32 of any shape.

    One-hot matmul on TPU (exact for integer tables with values <= 2^8 —
    small ints are bf16-exact; float tables see ~1e-3 MXU rounding), plain
    gather elsewhere.
    """
    if not use_onehot():
        return table[idx]
    R = table.shape[0]
    tab = table.astype(jnp.float32)
    squeeze = tab.ndim == 1
    if squeeze:
        tab = tab[:, None]
    flat = idx.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % _CHUNK
    flat = jnp.pad(flat, (0, pad))

    def chunk(c):
        oh = jax.nn.one_hot(c, R, dtype=jnp.float32)
        # HIGHEST: single-pass bf16 would corrupt integer lanes > 256
        # (material indices) and geometry at ~1e-3; 3-pass is still trivial.
        return jnp.matmul(oh, tab, precision=jax.lax.Precision.HIGHEST)

    out = jax.lax.map(chunk, flat.reshape(-1, _CHUNK))
    out = out.reshape(-1, tab.shape[1])[:n]
    if squeeze:
        out = out[:, 0].reshape(idx.shape)
    else:
        out = out.reshape(idx.shape + (table.shape[-1],))
    if jnp.issubdtype(table.dtype, jnp.integer):
        out = out.astype(table.dtype)
    return out
