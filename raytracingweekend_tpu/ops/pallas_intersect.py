"""Pallas TPU kernel for wavefront ray-sphere closest-hit.

This is the renderer's hottest op (reference analogue: the linear scan in
hittable_list.h:11-37 calling sphere.h:46-81 per object). The XLA version in
`geometry.hit_spheres` streams (N, S)-shaped intermediates through HBM; this
kernel keeps the whole (ray-tile x sphere-table) working set in VMEM so the
only HBM traffic is the packed ray block in and the (t, index) result out —
an arithmetic-intensity flip from O(1) to O(S) flops per byte.

Layout contract (see `pack_rays` / `pack_spheres`):
- rays   : (8, N) float32, rows = [ox oy oz dx dy dz time pad], N % TILE == 0
- spheres: (S, 128) float32, lanes = [cx cy cz dcx dcy dcz t0 inv_dt r r2
           active pad...] — sublane dim is the sphere table so per-sphere
           columns broadcast against (1, TILE) ray rows on the VPU.
- out    : best_t (1, N) float32 (BIG where no hit), best_i (1, N) int32.

The quadratic solve matches sphere.h:46-81 exactly (near root else far root,
t in (t_min, inf), negative radius allowed — r^2 is what enters the math).
Moving spheres lerp their center per-ray-time (sphere.h:22-25) via the
precomputed (dc, t0, 1/dt) columns.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import scene_types as st

BIG = 3.0e37  # python float: jnp scalars would be captured consts in pallas

# Sphere-table lane indices.
(_CX, _CY, _CZ, _DCX, _DCY, _DCZ, _T0, _IDT, _R, _R2, _ACT,
 _K0, _K1, _K2) = range(14)
# _K0 = |c0|^2 - r^2, _K1 = 2 c0.dc, _K2 = |dc|^2 — precomputed so the
# per-(ray, sphere) quadratic setup decomposes into MXU matmuls plus a few
# VPU passes (see _kernel).
_SPH_LANES = 128  # pad attr lanes to the TPU lane width


def pack_spheres(spheres: st.Spheres) -> np.ndarray:
    """Pack the Spheres SoA into the kernel's (S, 128) float32 table."""
    S = spheres.count()
    tab = jnp.zeros((S, _SPH_LANES), jnp.float32)
    c0 = spheres.center0
    dc = spheres.center1 - spheres.center0
    dt = spheres.time1 - spheres.time0
    inv_dt = jnp.where(dt != 0, 1.0 / jnp.where(dt != 0, dt, 1.0), 0.0)
    cols = {
        _CX: c0[:, 0], _CY: c0[:, 1], _CZ: c0[:, 2],
        _DCX: dc[:, 0], _DCY: dc[:, 1], _DCZ: dc[:, 2],
        _T0: spheres.time0, _IDT: inv_dt,
        _R: spheres.radius, _R2: spheres.radius ** 2,
        _ACT: spheres.active.astype(jnp.float32),
        _K0: jnp.sum(c0 * c0, axis=-1) - spheres.radius ** 2,
        _K1: 2.0 * jnp.sum(c0 * dc, axis=-1),
        _K2: jnp.sum(dc * dc, axis=-1),
    }
    for lane, v in cols.items():
        tab = tab.at[:, lane].set(v.astype(jnp.float32))
    return tab


def pack_rays(o, d, time) -> jnp.ndarray:
    """Pack rays into the kernel's (8, N) float32 block."""
    N = o.shape[0]
    pad = jnp.zeros((1, N), jnp.float32)
    return jnp.concatenate(
        [o.T.astype(jnp.float32), d.T.astype(jnp.float32),
         time[None].astype(jnp.float32), pad], axis=0)


def _kernel(ray_ref, sph_ref, t_ref, i_ref, *, moving: bool, t_min: float):
    """Elementwise quadratic setup over (S, T) broadcasts.

    NOTE an MXU variant decomposing b/cc into (S,3)x(3,T) dot_generals was
    tried and produces wrong results on-device (and in interpret mode) even
    though the identical math is correct as plain XLA ops — the K=3
    contraction of VMEM sub-slices appears to pick up neighboring lanes.
    The measured upside was only ~20%, so the proven elementwise form stays.
    """
    rays = ray_ref[...]                       # (8, T)
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    a = dx * dx + dy * dy + dz * dz           # (1, T)
    inv_a = 1.0 / a

    sph = sph_ref[...]                        # (S, 128)
    cx = sph[:, _CX:_CX + 1]                  # (S, 1)
    cy = sph[:, _CY:_CY + 1]
    cz = sph[:, _CZ:_CZ + 1]
    if moving:
        time = rays[6:7]                      # (1, T)
        frac = (time - sph[:, _T0:_T0 + 1]) * sph[:, _IDT:_IDT + 1]  # (S, T)
        cx = cx + frac * sph[:, _DCX:_DCX + 1]
        cy = cy + frac * sph[:, _DCY:_DCY + 1]
        cz = cz + frac * sph[:, _DCZ:_DCZ + 1]

    ocx = ox - cx                             # (S, T)
    ocy = oy - cy
    ocz = oz - cz
    b = ocx * dx + ocy * dy + ocz * dz
    cc = ocx * ocx + ocy * ocy + ocz * ocz - sph[:, _R2:_R2 + 1]
    disc = b * b - a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_near = (-b - sq) * inv_a
    t_far = (-b + sq) * inv_a
    t_cand = jnp.where(t_near > t_min, t_near, t_far)
    valid = (disc > 0) & (t_cand > t_min) & (sph[:, _ACT:_ACT + 1] > 0)
    t_cand = jnp.where(valid, t_cand, BIG)

    t_ref[0, :] = jnp.min(t_cand, axis=0)
    i_ref[0, :] = jnp.argmin(t_cand, axis=0).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("moving", "t_min", "tile", "interpret"))
def hit_spheres_pallas(rays_packed, sphere_table, *, moving: bool,
                       t_min: float = 0.001, tile: int = 512,
                       interpret: bool = False):
    """Closest sphere hit over packed inputs.

    rays_packed: (8, N) from `pack_rays`, N a multiple of `tile`.
    sphere_table: (S, 128) from `pack_spheres`.
    Returns (best_t (N,), best_i (N,) int32) with best_t == BIG on miss.
    """
    _, N = rays_packed.shape
    S = sphere_table.shape[0]
    assert N % tile == 0, (N, tile)
    grid = (N // tile,)

    kern = functools.partial(_kernel, moving=moving, t_min=float(t_min))
    # VMEM: sphere table (S*512B) + ~6 live (S, tile) temps.
    vmem = (S * _SPH_LANES + 8 * tile + 8 * S * tile + 2 * tile) * 4
    best_t, best_i = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, _SPH_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, N), jnp.float32),
            jax.ShapeDtypeStruct((1, N), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(vmem + (1 << 20), 128 << 20)),
        cost_estimate=pl.CostEstimate(
            flops=N * S * (30 if moving else 22),
            bytes_accessed=(8 * N + S * _SPH_LANES + 2 * N) * 4,
            transcendentals=N * S,
        ),
        interpret=interpret,
    )(rays_packed, sphere_table)
    return best_t[0], best_i[0]
