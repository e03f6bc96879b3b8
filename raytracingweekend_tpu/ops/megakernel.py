"""Pallas TPU megakernel: the whole path-trace loop fused in VMEM.

The wavefront integrator (ops/integrator.py) runs one XLA launch per bounce:
intersect (Pallas) -> packed-row lookups -> masked shade -> while-loop
bookkeeping, round-tripping every (1, N) state row through HBM each bounce.
Measured on this chip that caps the whole renderer at ~23 M path segments/s
(see CLAUDE.md). This module is the round-2 answer: ONE kernel per frame that
keeps a tile of rays' full bounce state in VMEM and runs

    camera-gen -> cluster-culled sphere intersect -> one-hot MXU attribute
    extraction -> masked shade (lambertian / metal / dielectric) -> Russian
    roulette -> per-slot sample regeneration

entirely on-chip, with in-kernel RNG (pltpu.prng_*). It is the TPU-native
rebuild of the reference's hot loop — the recursive color() at
RayTracingWeekend.cpp:45-160 over hittable_list.h:11-37 — covering sphere
scenes (random_balls / dielectric), rect/light scenes with one-sample
MIS (cornell_box and variants), checker + Perlin-noise textures (all three
display modes), image textures on spheres (gather-free one-hot texel
fetch over a VMEM-resident hi/lo-bf16 atlas, on spheres, rects, AND
media), and constant media (cornell_smoke). BVH scenes and debug
render modes keep the wavefront path (see supports_scene).

Design notes:
- Rays live as (1, T) lane rows (T = tile width). Sphere intersection is
  (SB, T) blocks (sphere sub-table in sublanes), the same broadcast layout
  as ops/pallas_intersect.py.
- Directions are kept unit-length (the camera normalizes, camera.h:48-49,
  and every scatter re-normalizes), so the sphere quadratic runs with a = 1.
- Spheres are Morton-sorted into C clusters of SB; each bounce slab-tests
  the tile against every cluster AABB and *skips whole clusters* no active
  ray can touch (@pl.when) — the tile-coherent analogue of a BVH's top
  levels, with zero per-ray divergence cost.
- The winner's shading attributes come from ONE (16, S) @ (S, T) one-hot
  matmul on the otherwise idle MXU — no gathers anywhere in the loop.
- Each slot is bound to one pixel (the scatter-free accumulation scheme of
  integrator.trace_tiled) and serially regenerates its next jittered sample
  the moment its path dies, so lanes stay ~fully utilized.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import scene_types as st

BIG = 3.0e37
_HIT_CUT = 1.0e30  # best_t above this == miss

# The dord survivor cut (`bkey < 0.5 * BIG`) may classify a cluster whose
# min masked slab entry is >= 0.5*BIG as a non-survivor even though the
# id-ordered walk would still sweep it. That reclassification is only
# radiance-safe because any hit such a cluster could produce has
# t >= 0.5*BIG > _HIT_CUT and is therefore discarded as a miss anyway —
# the two constants are coupled, and this assert keeps a future edit to
# either from silently breaking dord's bitwise-exactness guarantee.
assert 0.5 * BIG > _HIT_CUT, "dord survivor cut must exceed the miss cut"

# ---- attribute-extraction table rows: (24, S), attribute-major ----
# Rows 16-23 carry the checker-texture children (texture.h:29-50): CHK is
# 1.0 on checker-textured primitives, EVEN/ODD their baked child colors.
# A_NOISE encodes the noise display mode as 1 + NOISE_* (0 = not noise):
# small ints survive the one-hot f32 extraction dot exactly.
# A_IMG is 1 + atlas id on image-textured spheres (texture.h:73-98 via the
# native decoder the reference never wrote): the kernel fetches the texel
# with a separable one-hot (column dot + row mask-reduce) over the resident
# hi/lo-bf16 image planes. A_MPARAM carries metal fuzz OR dielectric IOR —
# a primitive is at most one material, so the lanes never collide — which
# keeps the table at the measured-fast 24-row shape (A_ROWS=32 reproducibly
# costs ~10% on book-1; Mosaic picks a slower extraction-dot schedule).
(A_CX, A_CY, A_CZ, A_DCX, A_DCY, A_DCZ, A_T0, A_IDT, A_RINV, A_MTYPE,
 A_ALBX, A_ALBY, A_ALBZ, A_MPARAM, A_NSCALE,
 A_CHK, A_EVENX, A_EVENY, A_EVENZ, A_ODDX, A_ODDY, A_ODDZ,
 A_NOISE, A_IMG) = range(24)
A_ROWS = 24

# ---- intersect-table lanes: (S, 128), sphere-major (pallas_intersect) ----
(C_CX, C_CY, C_CZ, C_DCX, C_DCY, C_DCZ, C_T0, C_IDT, C_R2, C_ACT,
 C_NR2) = range(11)
SPH_LANES = 128

# ---- cluster AABB lanes: (C, 128) ----
(K_MINX, K_MINY, K_MINZ, K_MAXX, K_MAXY, K_MAXZ) = range(6)
CLUS_LANES = 128

# ---- rect-table lanes: (R, 128), rect-major ----
# Axis code, rotation/translation presence, and flip sign are STATIC per
# rect (cfg tuples): the per-rect intersection is Python-unrolled, so the
# axis permutation costs zero ops and the world normal (constant per rect
# after baking flip+rotate_y) is three table lanes.
(RT_A0, RT_A1, RT_B0, RT_B1, RT_K, RT_COS, RT_SIN, RT_OFFX, RT_OFFY,
 RT_OFFZ, RT_NX, RT_NY, RT_NZ, RT_MTYPE, RT_ALBX, RT_ALBY, RT_ALBZ,
 RT_FUZZ, RT_RIDX, RT_CHK, RT_EVENX, RT_EVENY, RT_EVENZ, RT_ODDX,
 RT_ODDY, RT_ODDZ, RT_NOI, RT_NSC, RT_IMG, RT_IDA, RT_IDB) = range(31)
RECT_LANES = 128

# ---- light-table lanes: (L, 128), light-major (kind/axis are static) ----
(LT_A0, LT_A1, LT_B0, LT_B1, LT_K, LT_COS, LT_SIN, LT_OFFX, LT_OFFY,
 LT_OFFZ, LT_AREA, LT_CX, LT_CY, LT_CZ, LT_RAD) = range(15)
LIGHT_LANES = 128

# ---- constant-medium lanes: (V, 128), medium-major (kind/transform
# presence static per medium). P0/P1 = sphere center/(radius,0,0) or box
# min/max; NIRHO = -1/density. ----
(MD_P0X, MD_P0Y, MD_P0Z, MD_P1X, MD_P1Y, MD_P1Z, MD_COS, MD_SIN,
 MD_OFFX, MD_OFFY, MD_OFFZ, MD_NIRHO, MD_ALBX, MD_ALBY,
 MD_ALBZ, MD_NOI, MD_NSC, MD_IMG) = range(18)
MED_LANES = 128

# ---- camera parameter lanes: (1, 128) ----
(CAM_OX, CAM_OY, CAM_OZ, CAM_LLX, CAM_LLY, CAM_LLZ, CAM_HX, CAM_HY, CAM_HZ,
 CAM_VX, CAM_VY, CAM_VZ, CAM_UX, CAM_UY, CAM_UZ, CAM_WX, CAM_WY, CAM_WZ,
 CAM_LENS, CAM_T0, CAM_T1) = range(21)

# ---- f32 state scratch rows: (24, T) ----
# R_BEST: running closest-t during the cluster sweep (tightens the slab
# gate cluster-over-cluster). R_BLK: executed (cluster, chunk) block count
# per lane — the on-chip cull-rate instrument (out row 6). R_BIDX: winning
# sphere slot as f32 (cfg.idx_extract mode; S = miss sentinel) — replaces
# the (S, T) candidate-t scratch entirely.
(R_OX, R_OY, R_OZ, R_DX, R_DY, R_DZ, R_TIME, R_TPX, R_TPY, R_TPZ,
 R_RX, R_RY, R_RZ, R_AX, R_AY, R_AZ, R_SEGS, R_DEPTH, R_DONE, R_ITERS,
 R_BEST, R_BLK, R_BIDX) = range(23)
STATE_ROWS = 24


def _uniforms(n_rows, T, seed, tile, it, salt: int,
              bitcast=pltpu.bitcast):
    """U[0, 1) rows from a counter-based hash RNG.

    Stateless: every value is lowbias32(seed, tile, iteration, draw-site
    salt, row, lane) — the in-kernel analogue of the renderer's keyed
    threefry streams (no mutable PRNG state, bitwise reproducible, and runs
    identically under the TPU interpreter, unlike pltpu.prng_* which the
    interpreter stubs out). Two xor-multiply rounds give full avalanche;
    mantissa-fill bit trick converts to [0, 1).
    """
    # All-int32 arithmetic (wrapping adds/muls + logical shifts): Mosaic's
    # unsigned support is partial, and the bit patterns are identical.
    def c32(v):
        return jnp.int32(v - (1 << 32) if v >= (1 << 31) else v)

    # int32-pinned shift counts: under jax_enable_x64 (the f64 replay
    # twin's process) a bare Python literal reaches lax as int64 and
    # shift_right_logical rejects the mixed dtypes
    def shr(v, k):
        return jax.lax.shift_right_logical(v, jnp.int32(k))
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, T), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_rows, T), 0)
    x = (seed
         + lane * c32(0x9E3779B1)
         + row * c32(0x85EBCA77)
         + it * c32(0xC2B2AE3D)
         + tile * c32(0x27D4EB2F)
         + c32((salt * 0x165667B1) & 0xFFFFFFFF))
    x = x ^ shr(x, 16)
    x = x * c32(0x7FEB352D)
    x = x ^ shr(x, 15)
    x = x * c32(0x846CA68B)
    x = x ^ shr(x, 16)
    # bitcast is pltpu.bitcast in-kernel; the XLA replay (ops/mega_grad.py)
    # passes lax.bitcast_convert_type — identical int32 -> f32 bits.
    return bitcast(shr(x, 9) | c32(0x3F800000), jnp.float32) - 1.0


# ---- in-kernel Perlin marble (texture.h:55-69 over noise.h:89-151) ----
# The 256-entry tables (ops/noise.NOISE_TABLES: exact libstdc++ minstd
# streams, perm_x == perm_y == perm_z) are passed as two tiny VMEM inputs
# in hi/lo-nibble form: a 256-lookup becomes a two-level select — a (16,T)
# one-hot over the low nibble contracted with 16 column vectors (vector
# FMAs), then a one-hot row-reduce over the high nibble. All VPU: no
# dot_general (sidestepping both Mosaic matmul landmines) and exact f32
# table values (the wavefront's lookup-precision hazard, ADVICE r1 #2).


def _noise_consts():
    from .noise import NOISE_TABLES
    ranfloat, ranvec, perm, _, _ = NOISE_TABLES
    perm_cols = np.asarray(perm, np.float32).reshape(16, 16)   # [hi, lo]
    rv = np.asarray(ranvec, np.float32)                        # (256, 3)
    # rows comp*16 + hi, cols lo
    rv_cols = np.concatenate([rv[:, c].reshape(16, 16) for c in range(3)],
                             axis=0)                           # (48, 16)
    # bf16 forms for the in-kernel MXU contraction: perm values (integers
    # 0..255) are EXACT in bf16; the unit-gradient table is hi/lo-split so
    # two single-pass bf16 dots reconstruct f32 accuracy (the lookup-
    # precision hazard of ADVICE r1 #2).
    perm_b = perm_cols.astype(jnp.bfloat16)
    rv_hi = rv_cols.astype(jnp.bfloat16)
    rv_lo = (rv_cols - np.asarray(rv_hi, np.float32)).astype(jnp.bfloat16)
    return perm_cols, rv_cols, perm_b, rv_hi, rv_lo


(_PERM_COLS, _RV_COLS, _PERM_B, _RV_HI, _RV_LO) = _noise_consts()


def _lut2(tabs, idx, T):
    """Two-level table lookup: tabs is a list of (R, 16) bf16 arrays whose
    f32 sum is the table (row = block*16 + hi, col = lo), R = 16*m; idx
    (1, T) int32 in [0, 256). The low-nibble contraction runs as one
    single-pass bf16 dot per part (one-hots are exact in bf16; K=16 dense
    LHS is the repro-proven-safe dot shape), the high-nibble select as a
    masked row-reduce on the VPU. Returns (m, T) float32."""
    R = tabs[0].shape[0]
    m = R // 16
    lo = idx & 15
    hi = jax.lax.shift_right_logical(idx, 4)
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, T), 0)
    olb = (iota == lo).astype(jnp.bfloat16)                    # (16, T)
    oh = (iota == hi).astype(jnp.float32)
    dims = (((1,), (0,)), ((), ()))
    tmp = sum(jax.lax.dot_general(t, olb, dims,
                                  preferred_element_type=jnp.float32)
              for t in tabs)                                   # (R, T) f32
    outs = [jnp.sum(tmp[b * 16:(b + 1) * 16, :] * oh, axis=0,
                    keepdims=True) for b in range(m)]
    return outs[0] if m == 1 else jnp.concatenate(outs, axis=0)


def _perlin_noise(px, py, pz, T,
                  perm_cols=None, rv_cols=None):
    """Gradient Perlin in [-1, 1] (noise.h:89-151, hermite smoothstep) for
    (1, T) coordinate rows."""
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    fz = jnp.floor(pz)
    u = px - fx
    v = py - fy
    w = pz - fz
    i = fx.astype(jnp.int32)
    j = fy.astype(jnp.int32)
    k = fz.astype(jnp.int32)
    uu = u * u * (3.0 - 2.0 * u)
    vv = v * v * (3.0 - 2.0 * v)
    ww = w * w * (3.0 - 2.0 * w)
    pc_ = ([jnp.asarray(_PERM_B)] if perm_cols is None else perm_cols)
    rc_ = ([jnp.asarray(_RV_HI), jnp.asarray(_RV_LO)]
           if rv_cols is None else rv_cols)
    pi0 = _lut2(pc_, i & 255, T).astype(jnp.int32)
    pi1 = _lut2(pc_, (i + 1) & 255, T).astype(jnp.int32)
    pj0 = _lut2(pc_, j & 255, T).astype(jnp.int32)
    pj1 = _lut2(pc_, (j + 1) & 255, T).astype(jnp.int32)
    pk0 = _lut2(pc_, k & 255, T).astype(jnp.int32)
    pk1 = _lut2(pc_, (k + 1) & 255, T).astype(jnp.int32)
    acc = jnp.zeros((1, T), jnp.float32)
    for di, pa in ((0, pi0), (1, pi1)):
        wu = uu if di else 1.0 - uu
        ru = u - float(di)
        for dj, pb in ((0, pj0), (1, pj1)):
            wv = vv if dj else 1.0 - vv
            rv_ = v - float(dj)
            for dk, pc in ((0, pk0), (1, pk1)):
                wwk = ww if dk else 1.0 - ww
                rw = w - float(dk)
                g = _lut2(rc_, pa ^ pb ^ pc, T)                # (3, T)
                dot = (g[0:1] * ru + g[1:2] * rv_ + g[2:3] * rw)
                acc = acc + (wu * wv * wwk) * dot
    return acc


def _turb(px, py, pz, T, depth: int = 7, perm_cols=None, rv_cols=None):
    """7-octave |fBm| turbulence (noise.h:74-86): abs of the weighted
    octave sum."""
    t_acc = jnp.zeros((1, T), jnp.float32)
    wgt = 1.0
    sc = 1.0
    for _o in range(depth):
        t_acc = t_acc + wgt * _perlin_noise(px * sc, py * sc, pz * sc, T,
                                            perm_cols, rv_cols)
        wgt *= 0.5
        sc *= 2.0
    return jnp.abs(t_acc)


def _marble(px, py, pz, scale, T, depth: int = 7,
            perm_cols=None, rv_cols=None):
    """0.5*(1 + sin(scale*z + 10*turb(p))) marble (texture.h:67): the
    turbulence is evaluated at the UNSCALED point."""
    turbv = _turb(px, py, pz, T, depth, perm_cols, rv_cols)
    return 0.5 * (1.0 + jnp.sin(scale * pz + 10.0 * turbv))


def _onb(wx, wy, wz):
    """Branchless per-lane ONB about unit w (onb.h:32-38): helper axis ey
    when |w.x| > 0.9 else ex; v = normalize(w x a); u = w x v."""
    bigx = jnp.abs(wx) > 0.9
    zero = jnp.zeros_like(wx)
    vx = jnp.where(bigx, -wz, zero)
    vy = jnp.where(bigx, zero, wz)
    vz = jnp.where(bigx, wx, -wy)
    vinv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz + 1e-30)
    vx = vx * vinv
    vy = vy * vinv
    vz = vz * vinv
    ux = wy * vz - wz * vy
    uy = wz * vx - wx * vz
    uz = wx * vy - wy * vx
    return ux, uy, uz, vx, vy, vz


_PI = 3.14159265358979
# atan(a) ~ a * P(a*a) on [0, 1] (degree-6 Chebyshev-node LSQ fit, max abs
# err 5.8e-7 — u-coordinate error ~1e-7, far below one texel at any
# practical image width). Mosaic has no atan/atan2/asin lowering
# (NotImplementedError on-chip), so sphere UV is polynomial here.
_ATAN_C = (0.9999997, -0.33327976, 0.19895026, -0.13537675,
           0.0847597, -0.03775171, 0.008097295)


# cos/sin of 2*pi*u: Mosaic's native sine/cosine lowerings are VERY
# expensive — stubbing the two azimuth pairs out measured 650 -> 906
# M seg/s on cornell_box (39% of the whole iteration). Every angle the
# kernel draws is a random azimuth of the form 2*pi*U with U uniform in
# [0, 1), so a single full-period LSQ pair on x = u - 1/2 (Horner over
# x^2, max abs err 7e-7 — orders below MC noise) replaces them with ~16
# FMAs and no range reduction.
_COS2PI_C = (0.99999999989, -19.739208743454, 64.939389075891,
             -85.456658314741, 60.242131337726, -26.404668183602,
             7.8001314261587, -1.4531123022253)
_SIN2PI_C = (6.2831853068171, -41.34170217066, 81.605245360302,
             -76.705760951618, 42.057370069181, -15.084554762991,
             3.7759575468553, -0.61505995531992)


def _cossin2pi(u):
    """(cos(2*pi*u), sin(2*pi*u)) for u in [0, 1)."""
    x = u - 0.5
    x2 = x * x
    cp = jnp.float32(_COS2PI_C[-1])
    for c in _COS2PI_C[-2::-1]:
        cp = cp * x2 + c
    sp = jnp.float32(_SIN2PI_C[-1])
    for c in _SIN2PI_C[-2::-1]:
        sp = sp * x2 + c
    # the fit is about x = u - 1/2: cos(2*pi*u) = -cos(2*pi*x)
    return -cp, -(x * sp)


def _atan2(y, x):
    """Octant-reduced polynomial atan2 matching jnp.arctan2 conventions
    (range (-pi, pi]; atan2(0, 0) = 0) to ~6e-7 abs."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    a = lo / jnp.maximum(hi, 1e-30)          # [0, 1]; (0,0) -> 0
    s = a * a
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * s + c
    r = a * p
    r = jnp.where(ay > ax, 0.5 * _PI - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    # signbit (not < 0) so y == -0.0 lands on the -pi side of the branch
    # cut exactly like jnp.arctan2
    return jnp.where(jnp.signbit(y), -r, r)


def _asin(y):
    """asin(y) = atan2(y, sqrt(1 - y^2)), y pre-clipped to [-1, 1]."""
    y = jnp.clip(y, -1.0, 1.0)
    return _atan2(y, jnp.sqrt(jnp.maximum(1.0 - y * y, 0.0)))


def _kernel(pixf_ref, cam_ref, sph_ref, attr_ref, clus_ref, rect_ref,
            light_ref, med_ref, nperm_ref, nrvh_ref, nrvl_ref, img_ref,
            seed_ref, out_ref, *scratch, cfg):
    """One tile: T per-pixel slots, each tracing cfg.spp full paths."""
    af_ref = tc_ref = vote_ref = ids_ref = cnt_ref = None
    scratch = list(scratch)
    if cfg.batch_votes or cfg.dyn:
        vote_ref = scratch.pop(0)
    if cfg.dyn and cfg.dord:
        cnt_ref = scratch.pop()            # SMEM bucket counts/offsets
    if cfg.dyn:
        ids_ref = scratch.pop()            # SMEM survivor-id list
    if cfg.fe:
        af_ref, sf_ref = scratch
    elif cfg.idx_extract:
        (sf_ref,) = scratch
    else:
        tc_ref, sf_ref = scratch
    T = cfg.T
    SB = cfg.SB
    C = cfg.C
    t_min = cfg.t_min
    spp = float(cfg.spp)

    seed = seed_ref[0, 0]
    tile = pl.program_id(0)

    px_i = pixf_ref[0, 0:1, :]
    px_j = pixf_ref[0, 1:2, :]
    valid = pixf_ref[0, 2:3, :] > 0.0

    # camera scalars (traced values read once)
    def cam(k):
        return cam_ref[0, k]

    c_ox, c_oy, c_oz = cam(CAM_OX), cam(CAM_OY), cam(CAM_OZ)
    c_llx, c_lly, c_llz = cam(CAM_LLX), cam(CAM_LLY), cam(CAM_LLZ)
    c_hx, c_hy, c_hz = cam(CAM_HX), cam(CAM_HY), cam(CAM_HZ)
    c_vx, c_vy, c_vz = cam(CAM_VX), cam(CAM_VY), cam(CAM_VZ)
    c_ux, c_uy, c_uz = cam(CAM_UX), cam(CAM_UY), cam(CAM_UZ)
    c_vvx, c_vvy, c_vvz = cam(CAM_WX), cam(CAM_WY), cam(CAM_WZ)
    c_lens, c_t0, c_t1 = cam(CAM_LENS), cam(CAM_T0), cam(CAM_T1)

    def gen_rays(it):
        """Fresh jittered camera rays for every lane (camera.h:36-50)."""
        u = _uniforms(8, T, seed, tile, it, salt=1)
        s = (px_i + u[0:1]) * (1.0 / cfg.nx)
        t = (px_j + u[1:2]) * (1.0 / cfg.ny)
        time = c_t0 + u[2:3] * (c_t1 - c_t0)
        if cfg.lens:
            r = c_lens * jnp.sqrt(u[3:4])
            cph, sph2 = _cossin2pi(u[4:5])
            rdx = r * cph
            rdy = r * sph2
            offx = c_ux * rdx + c_vvx * rdy
            offy = c_uy * rdx + c_vvy * rdy
            offz = c_uz * rdx + c_vvz * rdy
        else:
            offx = offy = offz = jnp.zeros((1, T), jnp.float32)
        ox = c_ox + offx
        oy = c_oy + offy
        oz = c_oz + offz
        dx = c_llx + s * c_hx + t * c_vx - ox
        dy = c_lly + s * c_hy + t * c_vy - oy
        dz = c_llz + s * c_hz + t * c_vz - oz
        inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
        return ox, oy, oz, dx * inv, dy * inv, dz * inv, time

    # ---- init ----
    ox0, oy0, oz0, dx0, dy0, dz0, tm0 = gen_rays(jnp.int32(-1))
    sf_ref[R_OX:R_OX + 1, :] = ox0
    sf_ref[R_OY:R_OY + 1, :] = oy0
    sf_ref[R_OZ:R_OZ + 1, :] = oz0
    sf_ref[R_DX:R_DX + 1, :] = dx0
    sf_ref[R_DY:R_DY + 1, :] = dy0
    sf_ref[R_DZ:R_DZ + 1, :] = dz0
    sf_ref[R_TIME:R_TIME + 1, :] = tm0
    one = jnp.ones((1, T), jnp.float32)
    zero = jnp.zeros((1, T), jnp.float32)
    for r in (R_TPX, R_TPY, R_TPZ):
        sf_ref[r:r + 1, :] = one
    for r in (R_RX, R_RY, R_RZ, R_AX, R_AY, R_AZ, R_SEGS, R_DEPTH, R_ITERS,
              R_BLK):
        sf_ref[r:r + 1, :] = zero
    sf_ref[R_DONE:R_DONE + 1, :] = jnp.where(valid, 0.0, spp)
    if cfg.tape:
        # Decision-tape rows (one winner code per bounce iteration) start
        # at the miss sentinel so the XLA replay (ops/mega_grad.py) reads
        # defined values even past the tile's last live iteration.
        out_ref[0, 8:8 + cfg.n_iters, :] = jnp.full(
            (cfg.n_iters, T), -1.0, jnp.float32)

    def one_iter(it):
        ox = sf_ref[R_OX:R_OX + 1, :]
        oy = sf_ref[R_OY:R_OY + 1, :]
        oz = sf_ref[R_OZ:R_OZ + 1, :]
        dx = sf_ref[R_DX:R_DX + 1, :]
        dy = sf_ref[R_DY:R_DY + 1, :]
        dz = sf_ref[R_DZ:R_DZ + 1, :]
        time = sf_ref[R_TIME:R_TIME + 1, :]
        tpx = sf_ref[R_TPX:R_TPX + 1, :]
        tpy = sf_ref[R_TPY:R_TPY + 1, :]
        tpz = sf_ref[R_TPZ:R_TPZ + 1, :]
        rx = sf_ref[R_RX:R_RX + 1, :]
        ry = sf_ref[R_RY:R_RY + 1, :]
        rz = sf_ref[R_RZ:R_RZ + 1, :]
        depth = sf_ref[R_DEPTH:R_DEPTH + 1, :]
        done = sf_ref[R_DONE:R_DONE + 1, :]

        # Overdraw load balancing: every VALID lane keeps tracing until the
        # tile's while-loop ends (i.e. until the slowest lane reaches its
        # spp), so lanes that finish early contribute EXTRA samples of
        # their own pixel instead of idling — measured 30% of all
        # lane-cycles on random_balls. The epilogue renormalizes by the
        # actual per-lane sample count (R_DONE), so the estimate stays a
        # plain per-pixel mean. (Sample counts are weakly correlated with
        # sample values, a ratio-estimator bias of relative order 1/spp —
        # orders below MC noise at any practical spp.)
        # Tape mode (the differentiable path, ops/mega_grad.py) disables
        # overdraw: a lane idles once it has traced exactly spp samples, so
        # the XLA replay's per-lane state machine mirrors the kernel's
        # deterministically.
        active = (valid & (done < spp)) if cfg.tape else valid
        sf_ref[R_SEGS:R_SEGS + 1, :] = (sf_ref[R_SEGS:R_SEGS + 1, :]
                                        + jnp.where(active, 1.0, 0.0))

        # ---- cluster-culled sphere intersection (a = 1, unit dirs) ----
        # (uniform-time motion fraction is recomputed per chunk from the
        # time slice — 2 VPU ops — rather than precomputed full-width and
        # re-sliced, which trips the Mosaic broadcast-layout hazard noted
        # in the chunk body)
        idx_ = 1.0 / dx
        idy_ = 1.0 / dy
        idz_ = 1.0 / dz
        if cfg.has_spheres:
            sf_ref[R_BEST:R_BEST + 1, :] = jnp.full((1, T), BIG, jnp.float32)
            if cfg.fe:
                # fused extraction: running winner-attribute rows start at
                # zero (the all-miss value the epilogue expects)
                af_ref[:, :] = jnp.zeros((A_ROWS, T), jnp.float32)
            if cfg.idx_extract:
                sf_ref[R_BIDX:R_BIDX + 1, :] = jnp.full(
                    (1, T), float(cfg.S), jnp.float32)
        # Votes are per (cluster, lane-chunk): coherent sub-groups of the
        # tile skip whole quadratic blocks a whole-tile any() could not.
        NCH = cfg.chunks
        W = T // NCH
        # "quad" phase stub (tools/mega_phase.py): drop the whole sphere
        # sweep so its per-iteration cost shows up as a timing delta.
        run_spheres = cfg.has_spheres and "quad" not in cfg.stub
        if cfg.batch_votes and run_spheres and cfg.cull:
            # ---- batched cluster votes: ALL slab tests as one (C, T)
            # vectorized block + ONE cross-lane reduce, then scalar reads
            # per cluster. The interleaved reduce->scalar->branch chain of
            # the per-cluster vote serializes the pipeline (~27% of the
            # 3.6k-sphere iteration); batching trades the running-best
            # tightening (votes here are geometric-only, against t_min)
            # for reduce pipelining. The per-lane min-merge inside the
            # blocks is unchanged, so radiance is exact either way. ----
            # member-cluster rows only: with super_group > 0 clus_ref also
            # carries Cg appended union rows, and vote_ref is (C, 1)
            bminx = clus_ref[:C, K_MINX:K_MINX + 1]
            bmaxx = clus_ref[:C, K_MAXX:K_MAXX + 1]
            bminy = clus_ref[:C, K_MINY:K_MINY + 1]
            bmaxy = clus_ref[:C, K_MAXY:K_MAXY + 1]
            bminz = clus_ref[:C, K_MINZ:K_MINZ + 1]
            bmaxz = clus_ref[:C, K_MAXZ:K_MAXZ + 1]
            btx0 = (bminx - ox) * idx_
            btx1 = (bmaxx - ox) * idx_
            bty0 = (bminy - oy) * idy_
            bty1 = (bmaxy - oy) * idy_
            btz0 = (bminz - oz) * idz_
            btz1 = (bmaxz - oz) * idz_
            btlo = jnp.maximum(jnp.maximum(jnp.minimum(btx0, btx1),
                                           jnp.minimum(bty0, bty1)),
                               jnp.maximum(jnp.minimum(btz0, btz1), t_min))
            bthi = jnp.minimum(jnp.minimum(jnp.maximum(btx0, btx1),
                                           jnp.maximum(bty0, bty1)),
                               jnp.maximum(btz0, btz1))
            bamask = (btlo <= bthi) & active
            vote_ref[:, 0:1] = jnp.any(bamask, axis=1,
                                       keepdims=True).astype(jnp.float32)
        def slab_mask(row):
            """(1, T) per-lane pass mask for AABB table row `row` (cluster
            or super-cluster union) against t_min AND the running best: a
            box whose slab ENTRY is behind the closest hit already found
            cannot produce the winner — the tile-coherent analogue of
            ordered BVH traversal. tlo is scaled down a few ulps so
            slab-chain rounding can never skip a box whose true hit ties
            the running best within float noise (tlo >= t_min > 0, so the
            scale is direction-safe)."""
            tx0 = (clus_ref[row, K_MINX] - ox) * idx_
            tx1 = (clus_ref[row, K_MAXX] - ox) * idx_
            ty0 = (clus_ref[row, K_MINY] - oy) * idy_
            ty1 = (clus_ref[row, K_MAXY] - oy) * idy_
            tz0 = (clus_ref[row, K_MINZ] - oz) * idz_
            tz1 = (clus_ref[row, K_MAXZ] - oz) * idz_
            tlo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                          jnp.minimum(ty0, ty1)),
                              jnp.maximum(jnp.minimum(tz0, tz1), t_min))
            thi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                          jnp.maximum(ty0, ty1)),
                              jnp.maximum(tz0, tz1))
            return ((tlo <= thi)
                    & (tlo * (1.0 - 2.4e-7)
                       < sf_ref[R_BEST:R_BEST + 1, :]) & active)

        def sweep_cluster(c, force=False):
            if cfg.cull and not cfg.batch_votes and not force:
                amask = slab_mask(c)
            # Static clusters/axes skip their motion FMAs: clus_moving is a
            # per-cluster (x, y, z) any-moving triple, so e.g. book-1's
            # y-only motion blur pays 2 (SB, T) FMAs per chunk, not 6.
            c_mov = (cfg.clus_moving[c] if cfg.moving
                     else (False, False, False))
            lo = c * SB
            for ch in range(NCH):
                sl = slice(ch * W, (ch + 1) * W)

                def blk(lo=lo, sl=sl, c_mov=c_mov):
                    # Chunked mode (NCH > 1) re-loads the ray-state slices
                    # straight from the ref: slicing the full-width register
                    # vectors instead keeps a nonzero lane-offset layout
                    # that Mosaic cannot sublane-broadcast against the
                    # (SB, 1) sphere columns ("Invalid input layout" on
                    # vector.broadcast 1xW -> SBxW at lane offset >= 128).
                    # Ref loads at W-aligned offsets come back tile-aligned.
                    if NCH > 1:
                        ox_s = sf_ref[R_OX:R_OX + 1, sl]
                        oy_s = sf_ref[R_OY:R_OY + 1, sl]
                        oz_s = sf_ref[R_OZ:R_OZ + 1, sl]
                        dx_s = sf_ref[R_DX:R_DX + 1, sl]
                        dy_s = sf_ref[R_DY:R_DY + 1, sl]
                        dz_s = sf_ref[R_DZ:R_DZ + 1, sl]
                        tm_s = sf_ref[R_TIME:R_TIME + 1, sl]
                    else:
                        ox_s, oy_s, oz_s = ox, oy, oz
                        dx_s, dy_s, dz_s = dx, dy, dz
                        tm_s = time
                    # Fused-extraction mode (cfg.fe = EE) runs the cluster
                    # as SB/EE sub-blocks, merging each sub-block's one-hot
                    # attribute dot into a running (best_t, attr-rows) pair:
                    # no (S, T) candidate scratch, no post-sweep global
                    # mask, and the MXU dot of block e overlaps the VPU
                    # quadratic of block e+1.
                    EE = cfg.fe if cfg.fe else SB
                    af_vals = af_ref[:, sl] if cfg.fe else None
                    for e0 in range(0, SB, EE):
                        elo = lo + e0
                        cx = sph_ref[elo:elo + EE, C_CX:C_CX + 1]
                        cy = sph_ref[elo:elo + EE, C_CY:C_CY + 1]
                        cz = sph_ref[elo:elo + EE, C_CZ:C_CZ + 1]
                        if any(c_mov):
                            if cfg.uniform_time:
                                # 2 extra VPU ops per chunk beat re-slicing
                                # the precomputed fracu row (layout hazard
                                # above).
                                frac = (tm_s - cfg.ut_t0) * cfg.ut_idt
                            else:
                                frac = ((tm_s
                                         - sph_ref[elo:elo + EE,
                                                   C_T0:C_T0 + 1])
                                        * sph_ref[elo:elo + EE,
                                                  C_IDT:C_IDT + 1])
                            if c_mov[0]:
                                cx = cx + frac * sph_ref[elo:elo + EE,
                                                         C_DCX:C_DCX + 1]
                            if c_mov[1]:
                                cy = cy + frac * sph_ref[elo:elo + EE,
                                                         C_DCY:C_DCY + 1]
                            if c_mov[2]:
                                cz = cz + frac * sph_ref[elo:elo + EE,
                                                         C_DCZ:C_DCZ + 1]
                        # Sign-flipped half-b form: co = c - o gives
                        # nb = dot(co, d) = -b, so both roots are plain
                        # add/sub (nb -+ sq) with no negation op; the
                        # nr2 table lane (= -r2; +1 on inactive rows so
                        # disc < 0 masks them for free) seeds the |co|^2
                        # accumulator so the whole cc chain is three
                        # fmas — two fewer VPU ops per (sphere, ray) on
                        # the hottest line of the renderer (224.4 ->
                        # 229.1 M seg/s on book-1; the rsqrt form below
                        # then takes it to 240).
                        cox = cx - ox_s
                        coy = cy - oy_s
                        coz = cz - oz_s
                        nb = cox * dx_s + coy * dy_s + coz * dz_s
                        cc = (cox * cox + (coy * coy + (coz * coz
                              + sph_ref[elo:elo + EE, C_NR2:C_NR2 + 1])))
                        disc = nb * nb - cc
                        # Unguarded sqrt: disc < 0 yields NaN, every
                        # comparison with NaN is false, so the two selects
                        # funnel misses to BIG — three fewer VPU ops per
                        # (sphere, ray) than the max+compare+and form.
                        # disc * rsqrt(disc) == sqrt(disc): the VPU's sqrt
                        # is NOT full-throughput while rsqrt + mul is
                        # (measured +4.6% whole-kernel on book-1, 229.1 ->
                        # 240.1 M seg/s; golden parity holds incl. glass).
                        # disc == 0 becomes 0 * inf = NaN -> miss: a
                        # measure-zero exact-tangency that the reference's
                        # own [0.001, inf) interval treats as noise.
                        sq = disc * jax.lax.rsqrt(disc)
                        tn = nb - sq
                        # Flattened near-else-far select (sphere.h:56-77):
                        # tn > t_min already implies the validity test, so
                        # the two selects nest on independent compares
                        # (shorter dependency chain, same op count/values).
                        tf = nb + sq
                        tcv = jnp.where(tn > t_min, tn,
                                        jnp.where(tf > t_min, tf, BIG))
                        blk_min = jnp.min(tcv, axis=0, keepdims=True)
                        old_best = sf_ref[R_BEST:R_BEST + 1, sl]
                        if cfg.fe and "extract" in cfg.stub:
                            pass  # phase stub: sweep without extraction
                        elif cfg.fe:
                            # Strictly-better merge: earlier (importance-
                            # ordered) blocks keep exact cross-block ties,
                            # mirroring the reference's strict `t < closest`
                            # list sweep; in-block ties sum attribute rows
                            # exactly like the global one-hot did (exact
                            # geometric duplicates are deduped at build).
                            # A blk_min == BIG sub-block makes the one-hot
                            # all-ones, but upd is false there so the
                            # garbage candidate is discarded.
                            upd = blk_min < old_best
                            m_e = (tcv == blk_min).astype(jnp.float32)
                            cand = jax.lax.dot_general(
                                attr_ref[:, elo:elo + EE], m_e,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                            af_vals = jnp.where(upd, cand, af_vals)
                        elif cfg.idx_extract:
                            # Running (best_t, winner-slot) merge: the
                            # block's argmin (equality against the block
                            # min; smallest sub-row wins in-block ties)
                            # replaces the winner iff it strictly beats the
                            # running best.
                            upd = blk_min < old_best
                            # int iota + cast: Mosaic's tpu.iota verifier
                            # rejects float results on-chip (f32 iota
                            # compiles in interpret mode only).
                            sub = jax.lax.broadcasted_iota(
                                jnp.int32, (EE, W), 0).astype(jnp.float32)
                            cand = jnp.min(
                                jnp.where(tcv == blk_min, sub,
                                          float(cfg.S)),
                                axis=0, keepdims=True) + float(elo)
                            sf_ref[R_BIDX:R_BIDX + 1, sl] = jnp.where(
                                upd, cand, sf_ref[R_BIDX:R_BIDX + 1, sl])
                        else:
                            tc_ref[elo:elo + EE, sl] = tcv
                        sf_ref[R_BEST:R_BEST + 1, sl] = jnp.minimum(
                            old_best, blk_min)
                    if cfg.fe:
                        af_ref[:, sl] = af_vals
                    sf_ref[R_BLK:R_BLK + 1, sl] = (
                        sf_ref[R_BLK:R_BLK + 1, sl] + 1.0)

                if not cfg.cull or force:
                    # Vote-free mode (or a dyn-mode warm-start cluster):
                    # every block runs unconditionally — on-chip sweeps
                    # measured the pl.when vote costing more than the
                    # skipped quadratic work saves on the book-1 scene
                    # (144 dense vs 86-136 M seg/s culled); blocking
                    # still bounds the (SB, W) register intermediates.
                    blk()
                    continue
                if cfg.batch_votes:
                    vote = vote_ref[c, 0] > 0.0
                else:
                    vote = jnp.any(amask[:, sl] if NCH > 1 else amask)
                pl.when(vote)(blk)

                if tc_ref is not None:
                    @pl.when(jnp.logical_not(vote))
                    def _(lo=lo, sl=sl):
                        # BIG-fill is load-bearing: the one-hot extraction
                        # tests tc == best, and stale floats from a
                        # previous bounce would collide at ~2^-23 per pair.
                        tc_ref[lo:lo + SB, sl] = jnp.full((SB, W), BIG,
                                                          jnp.float32)

        if cfg.dyn and run_spheres:
            # ---- dynamic survivor-list sweep (round-4 large-S design,
            # VERDICT r3 #1). Per lane-chunk: one batched (C, W) slab block
            # -> geometric votes; a scalar compaction loop writes surviving
            # cluster ids to SMEM; ONE fori_loop with a RUNTIME trip count
            # sweeps only survivors through dynamic VMEM slices (Mosaic
            # feasibility proven on-chip:
            # tools/mosaic_repros/repro_dynamic_cull.py). A non-survivor
            # costs ~4 scalar ops here instead of the cross-lane reduce ->
            # scalar -> vector-branch chain of the interleaved vote
            # (measured ~60% of the 14.4k-sphere iteration: 15.9 -> 33.2 M
            # seg/s whole-tile). Each survivor is re-voted against the
            # CURRENT running best before its sweep — the batched votes are
            # geometric-only (R_BEST is BIG at vote time; measured survival
            # 0.364 vs 0.186 tightened at 14.4k), and the re-vote chain is
            # paid per geometric survivor, not per cluster. Chunked votes
            # (NCH > 1) cut sweep work further (whole-tile any() keeps
            # blocks a coherent sub-group never touches: measured survival
            # 0.186 -> 0.114 at NCH=4, 0.093 at NCH=8). With cfg.dord
            # survivors are visited near-to-far (bucket-sorted mean slab
            # entry) instead of ascending cluster id; the strictly-better
            # merge then resolves exact-t ties to the NEAREST-cluster
            # visitor — a measure-zero difference post-dedup.

            # Conservative per-axis motion flags: a runtime cluster id
            # cannot select its static per-cluster (x, y, z) triple, so
            # every survivor pays the union of all clusters' moving axes.
            dmov = (tuple(any(m[ax] for m in cfg.clus_moving)
                          for ax in range(3)) if cfg.moving
                    else (False, False, False))
            DEE = cfg.fe
            for ch in range(NCH):
                sl = slice(ch * W, (ch + 1) * W)
                # Chunk ray rows re-loaded from the ref (W-aligned ref
                # loads come back tile-aligned; slicing full-width register
                # vectors instead trips the Mosaic broadcast-layout hazard
                # noted in blk above).
                if NCH > 1:
                    ox_c = sf_ref[R_OX:R_OX + 1, sl]
                    oy_c = sf_ref[R_OY:R_OY + 1, sl]
                    oz_c = sf_ref[R_OZ:R_OZ + 1, sl]
                    dx_c = sf_ref[R_DX:R_DX + 1, sl]
                    dy_c = sf_ref[R_DY:R_DY + 1, sl]
                    dz_c = sf_ref[R_DZ:R_DZ + 1, sl]
                    idx_c = 1.0 / dx_c
                    idy_c = 1.0 / dy_c
                    idz_c = 1.0 / dz_c
                    act_c = pixf_ref[0, 2:3, sl] > 0.0
                    if cfg.tape:
                        act_c = act_c & (sf_ref[R_DONE:R_DONE + 1, sl]
                                         < spp)
                else:
                    ox_c, oy_c, oz_c = ox, oy, oz
                    dx_c, dy_c, dz_c = dx, dy, dz
                    idx_c, idy_c, idz_c = idx_, idy_, idz_
                    act_c = active

                # ---- batched geometric votes: all C slab tests as one
                # (C, W) vectorized block + ONE row-reduce ----
                bminx = clus_ref[:C, K_MINX:K_MINX + 1]
                bmaxx = clus_ref[:C, K_MAXX:K_MAXX + 1]
                bminy = clus_ref[:C, K_MINY:K_MINY + 1]
                bmaxy = clus_ref[:C, K_MAXY:K_MAXY + 1]
                bminz = clus_ref[:C, K_MINZ:K_MINZ + 1]
                bmaxz = clus_ref[:C, K_MAXZ:K_MAXZ + 1]
                btx0 = (bminx - ox_c) * idx_c
                btx1 = (bmaxx - ox_c) * idx_c
                bty0 = (bminy - oy_c) * idy_c
                bty1 = (bmaxy - oy_c) * idy_c
                btz0 = (bminz - oz_c) * idz_c
                btz1 = (bmaxz - oz_c) * idz_c
                btlo = jnp.maximum(jnp.maximum(jnp.minimum(btx0, btx1),
                                               jnp.minimum(bty0, bty1)),
                                   jnp.maximum(jnp.minimum(btz0, btz1),
                                               t_min))
                bthi = jnp.minimum(jnp.minimum(jnp.maximum(btx0, btx1),
                                               jnp.maximum(bty0, bty1)),
                                   jnp.maximum(btz0, btz1))
                bamask = (btlo <= bthi) & act_c
                if cfg.dord:
                    # ---- NEAR-TO-FAR survivor order (round-4): sweeping
                    # survivors in ascending slab-entry order tightens
                    # R_BEST early, so surv_body's re-vote (slab entry
                    # behind the running best loses) kills far clusters
                    # the id-ordered walk would still sweep. Key = MIN
                    # masked slab entry per cluster (mean measured the
                    # same survival for one more reduce); quantized into
                    # cfg.dord buckets and counting-sorted in scalar SMEM
                    # code (~8 scalar ops/cluster — the sweep it reorders
                    # is ~5 orders of magnitude bigger). Bucket NB is the
                    # non-survivor sentinel; ascending cluster id breaks
                    # ties inside a bucket (stable placement pass). A
                    # monotone BREAK on the sorted walk (bucket floor >=
                    # max-over-lanes best => every later survivor fails)
                    # is a measured dead end: the while_loop + value-
                    # returning cond + per-sweep masked max-reduce cost
                    # more than the skipped far-tail votes saved (39.2 ->
                    # 36.9 M at 14.4k, 65.1 -> 60.1 M at 3.6k; docs/
                    # PERF.md; scalar-reduce feasibility stays proven in
                    # tools/mosaic_repros/repro_scalar_reduce.py).
                    NB = cfg.dord
                    bkey = jnp.min(jnp.where(bamask, btlo, BIG), axis=1,
                                   keepdims=True)              # (C, 1)
                    surv = bkey < 0.5 * BIG
                    kmin = jnp.min(bkey)                       # rank-0
                    kmax = jnp.max(jnp.where(surv, bkey, -BIG))
                    scale = float(NB) / jnp.maximum(kmax - kmin, 1e-20)
                    bf = jnp.clip((bkey - kmin) * scale, 0.0,
                                  float(NB - 1))
                    vote_ref[:, 0:1] = jnp.where(surv, bf, float(NB))

                    def zero(b, acc):
                        cnt_ref[b] = jnp.int32(0)
                        return acc

                    jax.lax.fori_loop(0, NB + 1, zero, jnp.int32(0))

                    def count(c, acc):
                        b = vote_ref[c, 0].astype(jnp.int32)
                        cnt_ref[b] = cnt_ref[b] + 1
                        return acc

                    jax.lax.fori_loop(0, C, count, jnp.int32(0))

                    def prefix(b, acc):
                        t = cnt_ref[b]
                        cnt_ref[b] = acc
                        return acc + t

                    n_surv = jax.lax.fori_loop(0, NB, prefix, jnp.int32(0))

                    def place(c, acc):
                        b = vote_ref[c, 0].astype(jnp.int32)

                        def put():
                            o = cnt_ref[b]
                            ids_ref[o] = c
                            cnt_ref[b] = o + 1

                        pl.when(b < NB)(put)
                        return acc

                    jax.lax.fori_loop(0, C, place, jnp.int32(0))
                else:
                    vote_ref[:, 0:1] = jnp.any(
                        bamask, axis=1, keepdims=True).astype(jnp.float32)

                    # ---- scalar compaction: survivor ids -> SMEM ----
                    def compact(c, cnt):
                        vote = vote_ref[c, 0] > 0.0

                        def store():
                            ids_ref[cnt] = c

                        pl.when(vote)(store)
                        return cnt + jnp.where(vote, 1, 0).astype(jnp.int32)

                    n_surv = jax.lax.fori_loop(0, C, compact, jnp.int32(0))

                def dyn_sweep(lo, sl=sl):
                    af_vals = af_ref[:, sl]
                    for e0 in range(0, SB, DEE):
                        sub = pl.ds(lo + e0, DEE)
                        cx = sph_ref[sub, C_CX:C_CX + 1]
                        cy = sph_ref[sub, C_CY:C_CY + 1]
                        cz = sph_ref[sub, C_CZ:C_CZ + 1]
                        if any(dmov):
                            if cfg.uniform_time:
                                frac = ((sf_ref[R_TIME:R_TIME + 1, sl]
                                         - cfg.ut_t0) * cfg.ut_idt)
                            else:
                                frac = ((sf_ref[R_TIME:R_TIME + 1, sl]
                                         - sph_ref[sub, C_T0:C_T0 + 1])
                                        * sph_ref[sub, C_IDT:C_IDT + 1])
                            if dmov[0]:
                                cx = cx + frac * sph_ref[sub,
                                                         C_DCX:C_DCX + 1]
                            if dmov[1]:
                                cy = cy + frac * sph_ref[sub,
                                                         C_DCY:C_DCY + 1]
                            if dmov[2]:
                                cz = cz + frac * sph_ref[sub,
                                                         C_DCZ:C_DCZ + 1]
                        # Same sign-flipped fma-chained quadratic as the
                        # static sweep above (bitwise-identical results).
                        cox = cx - ox_c
                        coy = cy - oy_c
                        coz = cz - oz_c
                        nb = cox * dx_c + coy * dy_c + coz * dz_c
                        cc = (cox * cox + (coy * coy + (coz * coz
                              + sph_ref[sub, C_NR2:C_NR2 + 1])))
                        disc = nb * nb - cc
                        sq = disc * jax.lax.rsqrt(disc)
                        tn = nb - sq
                        tf = nb + sq
                        tcv = jnp.where(tn > t_min, tn,
                                        jnp.where(tf > t_min, tf, BIG))
                        blk_min = jnp.min(tcv, axis=0, keepdims=True)
                        old_best = sf_ref[R_BEST:R_BEST + 1, sl]
                        upd = blk_min < old_best
                        m_e = (tcv == blk_min).astype(jnp.float32)
                        cand = jax.lax.dot_general(
                            attr_ref[:, pl.ds(lo + e0, DEE)], m_e,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        af_vals = jnp.where(upd, cand, af_vals)
                        sf_ref[R_BEST:R_BEST + 1, sl] = jnp.minimum(
                            old_best, blk_min)
                    af_ref[:, sl] = af_vals
                    sf_ref[R_BLK:R_BLK + 1, sl] = (
                        sf_ref[R_BLK:R_BLK + 1, sl] + 1.0)

                def revote(c, sl=sl):
                    # Tightened re-vote against the CURRENT running best
                    # (slab entry behind the closest hit already found
                    # cannot win; same epsilon discipline as slab_mask).
                    tx0 = (clus_ref[c, K_MINX] - ox_c) * idx_c
                    tx1 = (clus_ref[c, K_MAXX] - ox_c) * idx_c
                    ty0 = (clus_ref[c, K_MINY] - oy_c) * idy_c
                    ty1 = (clus_ref[c, K_MAXY] - oy_c) * idy_c
                    tz0 = (clus_ref[c, K_MINZ] - oz_c) * idz_c
                    tz1 = (clus_ref[c, K_MAXZ] - oz_c) * idz_c
                    tlo = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                                  jnp.minimum(ty0, ty1)),
                                      jnp.maximum(jnp.minimum(tz0, tz1),
                                                  t_min))
                    thi = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                                  jnp.maximum(ty0, ty1)),
                                      jnp.maximum(tz0, tz1))
                    return ((tlo <= thi)
                            & (tlo * (1.0 - 2.4e-7)
                               < sf_ref[R_BEST:R_BEST + 1, sl]) & act_c)

                def surv_body(si, carry, sl=sl):
                    c = ids_ref[si]

                    def sweep():
                        dyn_sweep(c * SB)

                    pl.when(jnp.any(revote(c)))(sweep)
                    return carry

                jax.lax.fori_loop(0, n_surv, surv_body, jnp.int32(0))
        elif cfg.sg and run_spheres:
            # ---- two-level vote: ONE super-cluster slab test (union AABB
            # of cfg.sg Morton-consecutive clusters, rows [C:C+Cg] of the
            # table) gates the whole group's member votes + blocks. Exact:
            # any sphere's hit lies inside its cluster AABB, which lies
            # inside the super union. Requires fused/idx extraction (no
            # candidate scratch rows to BIG-fill on a group skip). ----
            for g0 in range(0, C, cfg.sg):
                smask = slab_mask(C + g0 // cfg.sg)

                def grp(g0=g0):
                    for c in range(g0, min(g0 + cfg.sg, C)):
                        sweep_cluster(c)

                pl.when(jnp.any(smask))(grp)
        else:
            for c in range(C if run_spheres else 0):
                sweep_cluster(c)

        if cfg.has_spheres:
            # The per-block mins folded into R_BEST ARE the global min:
            # skipped blocks are provably behind it (or BIG-filled).
            s_best = sf_ref[R_BEST:R_BEST + 1, :]
        else:
            s_best = jnp.full((1, T), BIG, jnp.float32)

        # ---- unrolled rect intersection (hittable.h:142-267, baked
        # flip/rotate_y/translate; axis + transform presence are static per
        # rect so the permutation and identity transforms cost zero ops) ----
        if cfg.R:
            rb_t = jnp.full((1, T), BIG, jnp.float32)
            zz1 = jnp.zeros((1, T), jnp.float32)
            r_mt = zz1
            r_nxa = zz1
            r_nya = zz1
            r_nza = zz1
            r_abx = zz1
            r_aby = zz1
            r_abz = zz1
            r_fz = zz1
            r_ri = zz1
            r_noi = zz1
            r_nsc = zz1
            r_chk = zz1
            r_evx = zz1
            r_evy = zz1
            r_evz = zz1
            r_odx = zz1
            r_ody = zz1
            r_odz = zz1
            r_ridx = zz1  # winning rect's table row (tape mode)
            r_img = zz1   # 1 + atlas id on image-textured rects
            r_u = zz1     # winning rect's (u, v) for the texel fetch
            r_v = zz1
            # Transform groups: every rect sharing one baked
            # (rotate_y, translate) — e.g. the 6 faces of a rotated box —
            # computes its object-space ray AND the reciprocal direction
            # components the plane tests need exactly ONCE per bounce
            # (cfg.rect_tf[ri] is the static group id assigned by
            # build_tables; params are read from the group's first member).
            # This turns the per-rect divide into a multiply and drops the
            # redundant per-face rotations.
            tf_cache = {}

            def rect_ray(ri):
                g = cfg.rect_tf[ri]
                if g in tf_cache:
                    return tf_cache[g]

                def rl(kk, ri=ri):
                    return rect_ref[ri, kk]

                if cfg.rect_rot[ri]:
                    cth = rl(RT_COS)
                    sth = rl(RT_SIN)
                    shx = ox - rl(RT_OFFX)
                    roy = oy - rl(RT_OFFY)
                    shz = oz - rl(RT_OFFZ)
                    rox = cth * shx - sth * shz
                    roz = sth * shx + cth * shz
                    rdx = cth * dx - sth * dz
                    rdz = sth * dx + cth * dz
                    rdy = dy
                    ir = (1.0 / rdx, idy_, 1.0 / rdz)
                elif cfg.rect_trans[ri]:
                    rox = ox - rl(RT_OFFX)
                    roy = oy - rl(RT_OFFY)
                    roz = oz - rl(RT_OFFZ)
                    rdx, rdy, rdz = dx, dy, dz
                    ir = (idx_, idy_, idz_)
                else:
                    rox, roy, roz = ox, oy, oz
                    rdx, rdy, rdz = dx, dy, dz
                    ir = (idx_, idy_, idz_)
                out = (rox, roy, roz, rdx, rdy, rdz) + ir
                tf_cache[g] = out
                return out

            for ri in range(cfg.R):
                def rl(kk, ri=ri):
                    return rect_ref[ri, kk]

                (rox, roy, roz, rdx, rdy, rdz,
                 irx, iry, irz) = rect_ray(ri)
                axc = cfg.rect_axes[ri]
                if axc == 0:        # XY: plane z = k
                    o_a, o_b, o_n = rox, roy, roz
                    d_a, d_b, id_n = rdx, rdy, irz
                elif axc == 1:      # XZ: plane y = k
                    o_a, o_b, o_n = rox, roz, roy
                    d_a, d_b, id_n = rdx, rdz, iry
                else:               # YZ: plane x = k
                    o_a, o_b, o_n = roy, roz, rox
                    d_a, d_b, id_n = rdy, rdz, irx
                # d_n == 0 gives 1/d_n = inf, t = +-inf (or NaN when the
                # origin sits on the plane); all comparisons then fail, so
                # parallel rays fall through with no explicit guard.
                t_r = (rl(RT_K) - o_n) * id_n
                pa_ = o_a + t_r * d_a
                pb_ = o_b + t_r * d_b
                okr = ((t_r > t_min) & (t_r < rb_t)
                       & (pa_ >= rl(RT_A0)) & (pa_ <= rl(RT_A1))
                       & (pb_ >= rl(RT_B0)) & (pb_ <= rl(RT_B1)))
                rb_t = jnp.where(okr, t_r, rb_t)
                if cfg.tape:
                    r_ridx = jnp.where(okr, float(ri), r_ridx)
                r_mt = jnp.where(okr, rl(RT_MTYPE), r_mt)
                r_nxa = jnp.where(okr, rl(RT_NX), r_nxa)
                r_nya = jnp.where(okr, rl(RT_NY), r_nya)
                r_nza = jnp.where(okr, rl(RT_NZ), r_nza)
                r_abx = jnp.where(okr, rl(RT_ALBX), r_abx)
                r_aby = jnp.where(okr, rl(RT_ALBY), r_aby)
                r_abz = jnp.where(okr, rl(RT_ALBZ), r_abz)
                if cfg.has_metal:
                    r_fz = jnp.where(okr, rl(RT_FUZZ), r_fz)
                if cfg.has_dielectric:
                    r_ri = jnp.where(okr, rl(RT_RIDX), r_ri)
                if cfg.has_noise:
                    r_noi = jnp.where(okr, rl(RT_NOI), r_noi)
                    r_nsc = jnp.where(okr, rl(RT_NSC), r_nsc)
                if cfg.has_image:
                    # rect uv = planar offset / extent (hittable.h:160-172
                    # et al.), with the reciprocal extents baked per rect
                    r_img = jnp.where(okr, rl(RT_IMG), r_img)
                    r_u = jnp.where(okr, (pa_ - rl(RT_A0)) * rl(RT_IDA),
                                    r_u)
                    r_v = jnp.where(okr, (pb_ - rl(RT_B0)) * rl(RT_IDB),
                                    r_v)
                if cfg.has_checker:
                    r_chk = jnp.where(okr, rl(RT_CHK), r_chk)
                    r_evx = jnp.where(okr, rl(RT_EVENX), r_evx)
                    r_evy = jnp.where(okr, rl(RT_EVENY), r_evy)
                    r_evz = jnp.where(okr, rl(RT_EVENZ), r_evz)
                    r_odx = jnp.where(okr, rl(RT_ODDX), r_odx)
                    r_ody = jnp.where(okr, rl(RT_ODDY), r_ody)
                    r_odz = jnp.where(okr, rl(RT_ODDZ), r_odz)
            use_rect = rb_t < s_best
            best_t = jnp.minimum(s_best, rb_t)
        else:
            best_t = s_best

        # ---- unrolled constant-medium candidates (hittable.h:430-479):
        # stochastic scatter distance inside a convex boundary; competition
        # with surfaces happens through the global min exactly like the
        # wavefront hit_media ----
        if cfg.V:
            md_t = jnp.full((1, T), BIG, jnp.float32)
            zzm = jnp.zeros((1, T), jnp.float32)
            m_abx = zzm
            m_aby = zzm
            m_abz = zzm
            m_noi = zzm
            m_nsc = zzm
            m_vidx = zzm  # winning medium's table row (tape mode)
            m_img = zzm   # 1 + atlas id on image-textured media
            um = _uniforms(cfg.V, T, seed, tile, it, salt=4)
            for vi in range(cfg.V):
                def ml(kk, vi=vi):
                    return med_ref[vi, kk]

                if cfg.med_rot[vi]:
                    cth = ml(MD_COS)
                    sth = ml(MD_SIN)
                    shx = ox - ml(MD_OFFX)
                    moy = oy - ml(MD_OFFY)
                    shz = oz - ml(MD_OFFZ)
                    mox = cth * shx - sth * shz
                    moz = sth * shx + cth * shz
                    mdx = cth * dx - sth * dz
                    mdz = sth * dx + cth * dz
                    mdy = dy
                elif cfg.med_trans[vi]:
                    mox = ox - ml(MD_OFFX)
                    moy = oy - ml(MD_OFFY)
                    moz = oz - ml(MD_OFFZ)
                    mdx, mdy, mdz = dx, dy, dz
                else:
                    mox, moy, moz = ox, oy, oz
                    mdx, mdy, mdz = dx, dy, dz
                if cfg.med_kinds[vi] == 0:  # sphere boundary (a = 1)
                    ocx = mox - ml(MD_P0X)
                    ocy = moy - ml(MD_P0Y)
                    ocz = moz - ml(MD_P0Z)
                    bq = ocx * mdx + ocy * mdy + ocz * mdz
                    rq = ml(MD_P1X)
                    ccq = ocx * ocx + ocy * ocy + ocz * ocz - rq * rq
                    dq = bq * bq - ccq
                    sqq = jnp.sqrt(jnp.maximum(dq, 0.0))
                    m_in = -bq - sqq
                    m_out = -bq + sqq
                    m_bh = dq > 0.0
                else:  # box boundary: signed-range slab (aabb.h:17-47)
                    # translate leaves the direction alone and rotate_y
                    # leaves y alone: reuse the reciprocals already paid
                    # for the cluster slabs wherever the component is dx/dy/dz
                    ivx = 1.0 / mdx if cfg.med_rot[vi] else idx_
                    ivy = idy_
                    ivz = 1.0 / mdz if cfg.med_rot[vi] else idz_
                    tx0 = (ml(MD_P0X) - mox) * ivx
                    tx1 = (ml(MD_P1X) - mox) * ivx
                    ty0 = (ml(MD_P0Y) - moy) * ivy
                    ty1 = (ml(MD_P1Y) - moy) * ivy
                    tz0 = (ml(MD_P0Z) - moz) * ivz
                    tz1 = (ml(MD_P1Z) - moz) * ivz
                    m_in = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                                   jnp.minimum(ty0, ty1)),
                                       jnp.minimum(tz0, tz1))
                    m_out = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                                    jnp.maximum(ty0, ty1)),
                                        jnp.maximum(tz0, tz1))
                    m_bh = m_out > m_in
                m_in = jnp.maximum(m_in, t_min)
                tci = m_in + ml(MD_NIRHO) * jnp.log(
                    jnp.maximum(um[vi:vi + 1], 1e-38))
                okm = (m_bh & (m_in < m_out) & (tci < m_out)
                       & (tci < md_t))
                md_t = jnp.where(okm, tci, md_t)
                if cfg.tape:
                    m_vidx = jnp.where(okm, float(vi), m_vidx)
                m_abx = jnp.where(okm, ml(MD_ALBX), m_abx)
                m_aby = jnp.where(okm, ml(MD_ALBY), m_aby)
                m_abz = jnp.where(okm, ml(MD_ALBZ), m_abz)
                if cfg.has_noise:
                    m_noi = jnp.where(okm, ml(MD_NOI), m_noi)
                    m_nsc = jnp.where(okm, ml(MD_NSC), m_nsc)
                if cfg.has_image:
                    m_img = jnp.where(okm, ml(MD_IMG), m_img)
            use_med = md_t < best_t
            best_t = jnp.minimum(best_t, md_t)
        hit = best_t < _HIT_CUT

        if cfg.tape:
            # ---- decision tape: the winner primitive per (lane, bounce).
            # Everything else the replay needs (uniform draws, branch
            # coins, roots) is recomputable from the counter RNG + scene
            # params; the winner is the one quantity whose recomputation
            # would cost the full S-scan. Encoding: -1 miss; [0, S) sphere
            # slot; [S, S+R) rect row; [S+R, S+R+V) medium row.
            wcode = jnp.full((1, T), -1.0, jnp.float32)
            if cfg.has_spheres:
                wcode = sf_ref[R_BIDX:R_BIDX + 1, :]  # slot (S on miss)
            if cfg.R:
                wcode = jnp.where(use_rect, float(cfg.S) + r_ridx, wcode)
            if cfg.V:
                wcode = jnp.where(use_med, float(cfg.S + cfg.R) + m_vidx,
                                  wcode)
            wcode = jnp.where(active & hit, wcode, -1.0)
            if "notape" not in cfg.stub:  # stub isolates the store cost
                out_ref[0, pl.ds(8 + it, 1), :] = wcode

        px_ = ox + best_t * dx
        py_ = oy + best_t * dy
        pz_ = oz + best_t * dz

        if cfg.has_spheres:
            # ---- one-hot MXU attribute extraction ----
            if cfg.fe:
                # fused mode already merged the winner's rows in the sweep
                attrs = af_ref[...]
            elif "extract" in cfg.stub:
                attrs = jnp.zeros((A_ROWS, T), jnp.float32)
            elif cfg.idx_extract and cfg.eb < cfg.S:
                # Blocked extraction: the one-shot (S, T) one-hot
                # intermediate costs S*T*4 bytes of VMEM (29 MB at
                # S=3.6k, T=2048 — the backend refuses to compile);
                # accumulating (A_ROWS, EB) x (EB, T) partial dots bounds
                # it at EB*T*4. At most one block matches the winner slot
                # (miss lanes carry the sentinel S and match none), so the
                # sum is the exact f32 attribute row either way. EB is a
                # 128-multiple divisor of S: every attr_ref lane slice is
                # a full-tile slice (see tools/mosaic_repros for why
                # partial-tile dot operands are off-limits).
                bidx = sf_ref[R_BIDX:R_BIDX + 1, :]
                attrs = None
                for e in range(cfg.S // cfg.eb):
                    lo_e = e * cfg.eb
                    iota_e = jax.lax.broadcasted_iota(
                        jnp.int32, (cfg.eb, T), 0).astype(jnp.float32)
                    m_e = (iota_e == bidx - float(lo_e)).astype(jnp.float32)
                    part = jax.lax.dot_general(
                        attr_ref[:, lo_e:lo_e + cfg.eb], m_e,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    attrs = part if attrs is None else attrs + part
            else:
                if cfg.idx_extract:
                    # winner one-hot from the slot-index row; miss lanes
                    # carry the out-of-range sentinel S, so the one-hot
                    # (and thus every extracted attribute) is all-zero
                    # there
                    iota_s = jax.lax.broadcasted_iota(
                        jnp.int32, (cfg.S, T), 0).astype(jnp.float32)
                    maskf = (iota_s
                             == sf_ref[R_BIDX:R_BIDX + 1, :]).astype(
                                 jnp.float32)
                else:
                    maskf = ((tc_ref[...] == s_best)
                             & (s_best < _HIT_CUT)).astype(jnp.float32)
                attrs = jax.lax.dot_general(
                    attr_ref[...], maskf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)      # (A_ROWS, T)

            def at(r):
                return attrs[r:r + 1, :]

            # ---- sphere normal ((p - c(t)) / r, sphere.h:56-66) ----
            scx = at(A_CX)
            scy = at(A_CY)
            scz = at(A_CZ)
            if cfg.moving:
                frac = (time - at(A_T0)) * at(A_IDT)
                scx = scx + frac * at(A_DCX)
                scy = scy + frac * at(A_DCY)
                scz = scz + frac * at(A_DCZ)
            rinv = at(A_RINV)
            nx_ = (px_ - scx) * rinv
            ny_ = (py_ - scy) * rinv
            nz_ = (pz_ - scz) * rinv
            mtype = at(A_MTYPE)
            albx = at(A_ALBX)
            alby = at(A_ALBY)
            albz = at(A_ALBZ)
            # A_MPARAM is fuzz on metal rows, IOR on dielectric rows: the
            # off-material value is garbage but every use is masked by the
            # material select below.
            fuzz_v = at(A_MPARAM) if cfg.has_metal else None
            ridx_v = at(A_MPARAM) if cfg.has_dielectric else None
            if cfg.has_noise:
                nf_v = at(A_NOISE)
                nsc_v = at(A_NSCALE)
            if cfg.has_checker:
                chk_v = at(A_CHK)
                evx_v, evy_v, evz_v = at(A_EVENX), at(A_EVENY), at(A_EVENZ)
                odx_v, ody_v, odz_v = at(A_ODDX), at(A_ODDY), at(A_ODDZ)
            if cfg.has_image:
                img_v = at(A_IMG)
            if cfg.R:
                nx_ = jnp.where(use_rect, r_nxa, nx_)
                ny_ = jnp.where(use_rect, r_nya, ny_)
                nz_ = jnp.where(use_rect, r_nza, nz_)
                mtype = jnp.where(use_rect, r_mt, mtype)
                albx = jnp.where(use_rect, r_abx, albx)
                alby = jnp.where(use_rect, r_aby, alby)
                albz = jnp.where(use_rect, r_abz, albz)
                if cfg.has_metal:
                    fuzz_v = jnp.where(use_rect, r_fz, fuzz_v)
                if cfg.has_dielectric:
                    ridx_v = jnp.where(use_rect, r_ri, ridx_v)
                if cfg.has_noise:
                    nf_v = jnp.where(use_rect, r_noi, nf_v)
                    nsc_v = jnp.where(use_rect, r_nsc, nsc_v)
                if cfg.has_checker:
                    chk_v = jnp.where(use_rect, r_chk, chk_v)
                    evx_v = jnp.where(use_rect, r_evx, evx_v)
                    evy_v = jnp.where(use_rect, r_evy, evy_v)
                    evz_v = jnp.where(use_rect, r_evz, evz_v)
                    odx_v = jnp.where(use_rect, r_odx, odx_v)
                    ody_v = jnp.where(use_rect, r_ody, ody_v)
                    odz_v = jnp.where(use_rect, r_odz, odz_v)
                if cfg.has_image:
                    img_v = jnp.where(use_rect, r_img, img_v)
        else:
            nx_, ny_, nz_ = r_nxa, r_nya, r_nza
            mtype = r_mt
            albx, alby, albz = r_abx, r_aby, r_abz
            fuzz_v = r_fz
            ridx_v = r_ri
            if cfg.has_noise:
                nf_v = r_noi
                nsc_v = r_nsc
            if cfg.has_checker:
                chk_v = r_chk
                evx_v, evy_v, evz_v = r_evx, r_evy, r_evz
                odx_v, ody_v, odz_v = r_odx, r_ody, r_odz
            if cfg.has_image:
                img_v = r_img

        if cfg.V:
            # medium scatter vertex: isotropic material, arbitrary normal
            # (hittable.h:469-473); albedo from the medium row
            mtype = jnp.where(use_med, float(4), mtype)
            albx = jnp.where(use_med, m_abx, albx)
            alby = jnp.where(use_med, m_aby, alby)
            albz = jnp.where(use_med, m_abz, albz)
            if cfg.has_noise:
                # noise-textured isotropic media (hittable.h:469-473 with a
                # noise phase texture): evaluated at the scatter vertex
                nf_v = jnp.where(use_med, m_noi, nf_v)
                nsc_v = jnp.where(use_med, m_nsc, nsc_v)
            if cfg.has_checker:
                chk_v = jnp.where(use_med, 0.0, chk_v)
            if cfg.has_image:
                img_v = jnp.where(use_med, m_img, img_v)

        if cfg.has_noise:
            # noise-texture albedo (texture.h:55-69): gray Perlin value on
            # noise-textured primitives, all three display modes. Only the
            # modes the scene actually uses are compiled in (static
            # cfg.noise_modes); scenes with one mode pay nothing extra.
            # nf_v encodes 1 + NOISE_* per lane. (In noise scenes nearly
            # every bounce has such lanes, so no divergence gating.)
            pc_n = [nperm_ref[...]]
            rc_n = [nrvh_ref[...], nrvl_ref[...]]
            mval = jnp.zeros((1, T), jnp.float32)
            if st.NOISE_MARBLE in cfg.noise_modes:
                mar = _marble(px_, py_, pz_, nsc_v, T,
                              perm_cols=pc_n, rv_cols=rc_n)
                mval = jnp.where(nf_v == float(1 + st.NOISE_MARBLE),
                                 mar, mval)
            if st.NOISE_SMOOTH in cfg.noise_modes:
                # 0.5*(1 + noise(scale*p)) (texture.h:63)
                smv = 0.5 * (1.0 + _perlin_noise(px_ * nsc_v, py_ * nsc_v,
                                                 pz_ * nsc_v, T,
                                                 pc_n, rc_n))
                mval = jnp.where(nf_v == float(1 + st.NOISE_SMOOTH),
                                 smv, mval)
            if st.NOISE_TURB in cfg.noise_modes:
                # turb(scale*p) (texture.h:65)
                tbv = _turb(px_ * nsc_v, py_ * nsc_v, pz_ * nsc_v, T,
                            perm_cols=pc_n, rv_cols=rc_n)
                mval = jnp.where(nf_v == float(1 + st.NOISE_TURB),
                                 tbv, mval)
            use_n = nf_v > 0.5
            albx = jnp.where(use_n, mval, albx)
            alby = jnp.where(use_n, mval, alby)
            albz = jnp.where(use_n, mval, albz)

        if cfg.has_checker:
            # checker::value (texture.h:35-46): the sign of the product of
            # sines at the hit point picks the child color
            sines = (jnp.sin(10.0 * px_) * jnp.sin(10.0 * py_)
                     * jnp.sin(10.0 * pz_))
            is_chk = chk_v > 0.5
            use_odd = is_chk & (sines < 0.0)
            albx = jnp.where(use_odd, odx_v,
                             jnp.where(is_chk, evx_v, albx))
            alby = jnp.where(use_odd, ody_v,
                             jnp.where(is_chk, evy_v, alby))
            albz = jnp.where(use_odd, odz_v,
                             jnp.where(is_chk, evz_v, albz))

        if cfg.has_image:
            # ---- image-texture albedo (texture.h:73-98 nearest-texel
            # lookup; sphere UV per sphere.h:115-122 from the unit normal,
            # already in nx_/ny_/nz_ for sphere-winner lanes — rect/media
            # lanes carry img_v == 0 so their garbage UV is masked out).
            # The texel fetch is gather-free: a (Hp, Wp) @ (Wp, T) bf16
            # column one-hot dot on the MXU picks column i per lane, then a
            # (Hp, T) one-hot mask-reduce on the VPU picks row j; hi+lo
            # bf16 planes reconstruct the f32 texel to ~2^-16 (the same
            # split as the Perlin gradient tables above).
            phi = _atan2(nz_, nx_)
            theta = _asin(ny_)
            u_img = 1.0 - (phi + _PI) * (0.5 / _PI)
            v_img = (theta + 0.5 * _PI) * (1.0 / _PI)
            if cfg.R:
                # rect winners carry their planar uv (hittable.h:160-172)
                u_img = jnp.where(use_rect, r_u, u_img)
                v_img = jnp.where(use_rect, r_v, v_img)
            if cfg.V:
                # media sample at uv = (0, 0) (unset in the reference)
                u_img = jnp.where(use_med, 0.0, u_img)
                v_img = jnp.where(use_med, 0.0, v_img)
            Hp = cfg.img_hp
            Wp = cfg.img_wp
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (Wp, T), 0)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (Hp, T), 0)
            dims_i = (((1,), (0,)), ((), ()))
            texr = texg = texb = jnp.zeros((1, T), jnp.float32)
            for ii in range(cfg.n_img):
                ny_i, nx_i = cfg.img_hw[ii]
                i_t = (u_img * float(nx_i)).astype(jnp.int32)
                j_t = ((1.0 - v_img) * float(ny_i) - 0.001).astype(jnp.int32)
                i_t = jnp.clip(i_t, 0, nx_i - 1)
                j_t = jnp.clip(j_t, 0, ny_i - 1)
                oh_i = (iota_w == i_t).astype(jnp.bfloat16)     # (Wp, T)
                oh_j = (iota_h == j_t).astype(jnp.float32)      # (Hp, T)
                ch_v = []
                if cfg.img_byte:
                    # byte atlas (_atlas_dims): one plane per channel
                    # holding EXACT round(x*255) in bf16 — 3 MXU dots per
                    # bounce instead of 6 (the dots ARE the earth-scene
                    # bound, docs/PERF.md round 5), reconstructed by one
                    # f32 multiply to ~2^-24
                    base = ii * 3 * Hp
                    for ch in range(3):
                        d = jax.lax.dot_general(
                            img_ref[base + ch * Hp:base + (ch + 1) * Hp,
                                    :],
                            oh_i, dims_i,
                            preferred_element_type=jnp.float32)
                        ch_v.append(jnp.sum(d * oh_j, axis=0,
                                            keepdims=True)
                                    * np.float32(1.0 / 255.0))
                else:
                    base = ii * 6 * Hp
                    for ch in range(3):
                        hi_d = jax.lax.dot_general(
                            img_ref[base + ch * Hp:base + (ch + 1) * Hp,
                                    :],
                            oh_i, dims_i,
                            preferred_element_type=jnp.float32)
                        lo_d = jax.lax.dot_general(
                            img_ref[base + (3 + ch) * Hp:
                                    base + (4 + ch) * Hp, :],
                            oh_i, dims_i,
                            preferred_element_type=jnp.float32)
                        ch_v.append(jnp.sum((hi_d + lo_d) * oh_j, axis=0,
                                            keepdims=True))
                if cfg.n_img == 1:
                    texr, texg, texb = ch_v
                else:
                    sel = img_v == float(1 + ii)
                    texr = jnp.where(sel, ch_v[0], texr)
                    texg = jnp.where(sel, ch_v[1], texg)
                    texb = jnp.where(sel, ch_v[2], texb)
            use_img = img_v > 0.5
            albx = jnp.where(use_img, texr, albx)
            alby = jnp.where(use_img, texg, alby)
            albz = jnp.where(use_img, texb, albz)

        u = _uniforms(8, T, seed, tile, it, salt=2)

        # ---- lambertian: cosine sample about the normal ----
        # (with no lights list pdf == scattering_pdf, so weight == albedo;
        # material.h:77-122 + pdf.h:15-33 degenerate mixture)
        r2 = u[1:2]
        z = jnp.sqrt(jnp.maximum(1.0 - r2, 0.0))
        sq_ = jnp.sqrt(r2)
        cphi, sphi = _cossin2pi(u[0:1])
        lx_t = cphi * sq_
        ly_t = sphi * sq_
        ux_, uy_, uz_, vx, vy, vz = _onb(nx_, ny_, nz_)
        lamx = lx_t * ux_ + ly_t * vx + z * nx_
        lamy = lx_t * uy_ + ly_t * vy + z * ny_
        lamz = lx_t * uz_ + ly_t * vz + z * nz_
        lam_ok = z > 0.0
        lam_w = None

        if cfg.L:
            # ---- one-sample MIS: mixture(cosine_pdf, hittable_pdf(lights))
            # (RayTracingWeekend.cpp:117-124, pdf.h:55-75; light kinds/axes
            # are static so each light's sampler and pdf are unrolled) ----
            ul = _uniforms(4, T, seed, tile, it, salt=3)
            pickf = ul[0:1] * float(cfg.L)
            ldx = jnp.zeros((1, T), jnp.float32)
            ldy = jnp.zeros((1, T), jnp.float32)
            ldz = jnp.zeros((1, T), jnp.float32)
            for li in range(cfg.L):
                def ll(kk, li=li):
                    return light_ref[li, kk]

                if cfg.light_kinds[li] == 0:
                    # rect light: uniform point on the rect, through the
                    # baked transform (hittable.h:224-228)
                    pa_s = ll(LT_A0) + ul[1:2] * (ll(LT_A1) - ll(LT_A0))
                    pb_s = ll(LT_B0) + ul[2:3] * (ll(LT_B1) - ll(LT_B0))
                    kk_s = ll(LT_K)
                    one_t = jnp.ones((1, T), jnp.float32)
                    axl = cfg.light_axes[li]
                    if axl == 0:
                        ppx, ppy, ppz = pa_s, pb_s, kk_s * one_t
                    elif axl == 1:
                        ppx, ppy, ppz = pa_s, kk_s * one_t, pb_s
                    else:
                        ppx, ppy, ppz = kk_s * one_t, pa_s, pb_s
                    if cfg.light_rot[li]:
                        cth = ll(LT_COS)
                        sth = ll(LT_SIN)
                        wpx = cth * ppx + sth * ppz
                        wpz = -sth * ppx + cth * ppz
                        ppx, ppz = wpx, wpz
                    if cfg.light_trans[li]:
                        ppx = ppx + ll(LT_OFFX)
                        ppy = ppy + ll(LT_OFFY)
                        ppz = ppz + ll(LT_OFFZ)
                    dlx = ppx - px_
                    dly = ppy - py_
                    dlz = ppz - pz_
                else:
                    # sphere light: cone sample (sphere.h:101-108,
                    # utility.h:69-82)
                    tcx = ll(LT_CX) - px_
                    tcy = ll(LT_CY) - py_
                    tcz = ll(LT_CZ) - pz_
                    dist2 = tcx * tcx + tcy * tcy + tcz * tcz
                    radl = ll(LT_RAD)
                    ctm = jnp.sqrt(jnp.maximum(
                        1.0 - radl * radl / jnp.maximum(dist2, 1e-20), 0.0))
                    zc = 1.0 + ul[2:3] * (ctm - 1.0)
                    cpl, spl = _cossin2pi(ul[1:2])
                    sc = jnp.sqrt(jnp.maximum(1.0 - zc * zc, 0.0))
                    winv = jax.lax.rsqrt(jnp.maximum(dist2, 1e-20))
                    wlx = tcx * winv
                    wly = tcy * winv
                    wlz = tcz * winv
                    lux, luy, luz, lvx, lvy, lvz = _onb(wlx, wly, wlz)
                    cph = cpl * sc
                    sph_ = spl * sc
                    dlx = cph * lux + sph_ * lvx + zc * wlx
                    dly = cph * luy + sph_ * lvy + zc * wly
                    dlz = cph * luz + sph_ * lvz + zc * wlz
                if cfg.L == 1:
                    ldx, ldy, ldz = dlx, dly, dlz
                else:
                    sel = (pickf >= float(li)) & (pickf < float(li + 1))
                    ldx = jnp.where(sel, dlx, ldx)
                    ldy = jnp.where(sel, dly, ldy)
                    ldz = jnp.where(sel, dlz, ldz)
            coin_l = ul[3:4] < 0.5  # pdf.h:69-75
            mdx = jnp.where(coin_l, lamx, ldx)
            mdy = jnp.where(coin_l, lamy, ldy)
            mdz = jnp.where(coin_l, lamz, ldz)
            # pdf evaluation needs the unit direction (pdf.h:20-24)
            minv = jax.lax.rsqrt(
                jnp.maximum(mdx * mdx + mdy * mdy + mdz * mdz, 1e-30))
            mux = mdx * minv
            muy = mdy * minv
            muz = mdz * minv
            cosi = mux * nx_ + muy * ny_ + muz * nz_
            cpdf = jnp.where(cosi <= 0.0, 0.0, cosi * (1.0 / math.pi))
            # hittable_list::pdf_value: uniform average of per-light pdfs,
            # each re-intersecting its shape (hittable.h:208-222,
            # sphere.h:88-99)
            acc = jnp.zeros((1, T), jnp.float32)
            for li in range(cfg.L):
                def ll(kk, li=li):
                    return light_ref[li, kk]

                if cfg.light_kinds[li] == 0:
                    if cfg.light_rot[li]:
                        cth = ll(LT_COS)
                        sth = ll(LT_SIN)
                        shx = px_ - ll(LT_OFFX)
                        qoy = py_ - ll(LT_OFFY)
                        shz = pz_ - ll(LT_OFFZ)
                        qox = cth * shx - sth * shz
                        qoz = sth * shx + cth * shz
                        qdx = cth * mux - sth * muz
                        qdz = sth * mux + cth * muz
                        qdy = muy
                    elif cfg.light_trans[li]:
                        qox = px_ - ll(LT_OFFX)
                        qoy = py_ - ll(LT_OFFY)
                        qoz = pz_ - ll(LT_OFFZ)
                        qdx, qdy, qdz = mux, muy, muz
                    else:
                        qox, qoy, qoz = px_, py_, pz_
                        qdx, qdy, qdz = mux, muy, muz
                    axl = cfg.light_axes[li]
                    if axl == 0:
                        q_a, q_b, q_n = qox, qoy, qoz
                        w_a, w_b, w_n = qdx, qdy, qdz
                    elif axl == 1:
                        q_a, q_b, q_n = qox, qoz, qoy
                        w_a, w_b, w_n = qdx, qdz, qdy
                    else:
                        q_a, q_b, q_n = qoy, qoz, qox
                        w_a, w_b, w_n = qdy, qdz, qdx
                    t_l = (ll(LT_K) - q_n) / w_n
                    hpa = q_a + t_l * w_a
                    hpb = q_b + t_l * w_b
                    lh = ((t_l > t_min)
                          & (hpa >= ll(LT_A0)) & (hpa <= ll(LT_A1))
                          & (hpb >= ll(LT_B0)) & (hpb <= ll(LT_B1)))
                    # unit probe dir: dist2 = t^2, cosine = |d_n|
                    pdf_l = (t_l * t_l) / jnp.maximum(
                        jnp.abs(w_n) * ll(LT_AREA), 1e-20)
                else:
                    ocxl = px_ - ll(LT_CX)
                    ocyl = py_ - ll(LT_CY)
                    oczl = pz_ - ll(LT_CZ)
                    radl = ll(LT_RAD)
                    b_l = ocxl * mux + ocyl * muy + oczl * muz
                    d2l = ocxl * ocxl + ocyl * ocyl + oczl * oczl
                    cc_l = d2l - radl * radl
                    disc_l = b_l * b_l - cc_l
                    sq_l = jnp.sqrt(jnp.maximum(disc_l, 0.0))
                    tn_l = -b_l - sq_l
                    t_l = jnp.where(tn_l > t_min, tn_l, -b_l + sq_l)
                    lh = (disc_l > 0.0) & (t_l > t_min)
                    ctm = jnp.sqrt(jnp.maximum(
                        1.0 - radl * radl / jnp.maximum(d2l, 1e-20), 0.0))
                    solid = (2.0 * math.pi) * (1.0 - ctm)
                    pdf_l = 1.0 / jnp.maximum(solid, 1e-20)
                acc = acc + jnp.where(lh, pdf_l, 0.0)
            pdf_val = 0.5 * cpdf + 0.5 * acc * (1.0 / cfg.L)
            lam_ok = pdf_val > 0.0
            # weight = albedo * scattering_pdf / pdf_val; scattering_pdf is
            # the same clamped cosine/pi as cpdf (material.h:115-119)
            lam_w = jnp.where(lam_ok,
                              cpdf / jnp.where(lam_ok, pdf_val, 1.0), 0.0)
            lamx, lamy, lamz = mdx, mdy, mdz

        # ---- mirror reflection (shared by metal and dielectric) ----
        ddn = dx * nx_ + dy * ny_ + dz * nz_
        rfx = dx - 2.0 * ddn * nx_
        rfy = dy - 2.0 * ddn * ny_
        rfz = dz - 2.0 * ddn * nz_

        if cfg.has_metal or cfg.has_iso:
            # point-in-unit-ball, shared by metal fuzz (material.h:124-140)
            # and isotropic scatter (material.h:252-265) — a lane is at most
            # one of the two, so reusing the draws keeps them independent
            zb = 1.0 - 2.0 * u[2:3]
            rb = jnp.sqrt(jnp.maximum(1.0 - zb * zb, 0.0))
            cpb, spb = _cossin2pi(u[3:4])
            # ball radius ~ U^(1/3); cbrt has no Mosaic lowering, use
            # exp(log/3) (u == 0 maps to radius 0, the correct limit)
            radb = jnp.exp(jnp.log(jnp.maximum(u[4:5], 1e-30))
                           * (1.0 / 3.0))
            ballx = rb * cpb * radb
            bally = rb * spb * radb
            ballz = zb * radb
        if cfg.has_metal:
            fz = fuzz_v
            mex = rfx + fz * ballx
            mey = rfy + fz * bally
            mez = rfz + fz * ballz
        else:
            mex, mey, mez = rfx, rfy, rfz

        if cfg.has_dielectric:
            # dielectric with the corrected exit cosine (material.h:142-225)
            ridx = ridx_v
            inside = ddn > 0.0
            sgn = jnp.where(inside, -1.0, 1.0)
            onx = sgn * nx_
            ony = sgn * ny_
            onz = sgn * nz_
            nint = jnp.where(inside, ridx, 1.0 / jnp.maximum(ridx, 1e-6))
            cos_exit2 = 1.0 - ridx * ridx * (1.0 - ddn * ddn)
            cos_exit = jnp.sqrt(jnp.maximum(cos_exit2, 0.0))
            cosine = jnp.where(inside, cos_exit, -ddn)
            dt = dx * onx + dy * ony + dz * onz
            disc_r = 1.0 - nint * nint * (1.0 - dt * dt)
            canr = disc_r > 0.0
            sqr = jnp.sqrt(jnp.maximum(disc_r, 0.0))
            refx = nint * (dx - onx * dt) - onx * sqr
            refy = nint * (dy - ony * dt) - ony * sqr
            refz = nint * (dz - onz * dt) - onz * sqr
            r0 = (1.0 - ridx) / (1.0 + ridx)
            r0 = r0 * r0
            omc = 1.0 - cosine
            omc2 = omc * omc
            schl = r0 + (1.0 - r0) * omc2 * omc2 * omc
            rp = jnp.where(canr, schl, 1.0)
            coin = u[5:6] < rp
            dex = jnp.where(coin, rfx, refx)
            dey = jnp.where(coin, rfy, refy)
            dez = jnp.where(coin, rfz, refz)
        else:
            dex, dey, dez = rfx, rfy, rfz

        # ---- select by material type ----
        is_lam = mtype < 0.5
        is_metal = (mtype > 0.5) & (mtype < 1.5)
        is_diel = ((mtype > 1.5) & (mtype < 2.5)
                   if (cfg.has_light or cfg.has_iso) else mtype > 1.5)
        ndx = jnp.where(is_lam, lamx, jnp.where(is_metal, mex, dex))
        ndy = jnp.where(is_lam, lamy, jnp.where(is_metal, mey, dey))
        ndz = jnp.where(is_lam, lamz, jnp.where(is_metal, mez, dez))
        if cfg.has_iso:
            is_iso = mtype > 3.5
            ndx = jnp.where(is_iso, ballx, ndx)
            ndy = jnp.where(is_iso, bally, ndy)
            ndz = jnp.where(is_iso, ballz, ndz)
        ninv = jax.lax.rsqrt(ndx * ndx + ndy * ndy + ndz * ndz + 1e-30)
        ndx = ndx * ninv
        ndy = ndy * ninv
        ndz = ndz * ninv
        if lam_w is not None:
            albx = jnp.where(is_lam, albx * lam_w, albx)
            alby = jnp.where(is_lam, alby * lam_w, alby)
            albz = jnp.where(is_lam, albz * lam_w, albz)
        wx = jnp.where(is_diel, 1.0, albx)
        wy = jnp.where(is_diel, 1.0, alby)
        wz = jnp.where(is_diel, 1.0, albz)
        if "shade" in cfg.stub:
            # phase stub: fixed bounce-back direction + near-constant
            # weights. Everything between the extraction and here (RNG
            # draws, ONB, samplers, material math) becomes dead code; the
            # 1e-30*alb term keeps the extraction itself alive so the
            # deltas separate cleanly.
            ndx, ndy, ndz = -dx, -dy, -dz
            wx = albx * 1e-30 + 0.7
            wy = alby * 1e-30 + 0.7
            wz = albz * 1e-30 + 0.7
            scatter_ok = dy < 2.0  # unit dirs: always true, un-foldable
        else:
            # NOTE: no jnp.where on i1 vectors — Mosaic lowers bool
            # select_n through an i8->i1 trunci it does not support.
            # (Assigned under else: an unconditional overwrite would keep
            # lam_ok's sampler chain alive under the -shade stub and make
            # its delta undercount.)
            scatter_ok = jnp.logical_or(jnp.logical_not(is_lam), lam_ok)
        if cfg.has_light:
            # ---- one-sided emission (diffuse_light, material.h:238-244):
            # emits when the ray direction agrees with the normal; the
            # emitted color rides the albedo lanes. Light hits end the path
            # (scatter == false). ----
            is_li = ((mtype > 2.5) & (mtype < 3.5) if cfg.has_iso
                     else mtype > 2.5)
            emitm = active & hit & is_li & (ddn > 0.0)
            rx = rx + jnp.where(emitm, tpx * albx, 0.0)
            ry = ry + jnp.where(emitm, tpy * alby, 0.0)
            rz = rz + jnp.where(emitm, tpz * albz, 0.0)
            scatter_ok = scatter_ok & jnp.logical_not(is_li)

        # ---- background on miss (RayTracingWeekend.cpp:143-158) ----
        miss = active & jnp.logical_not(hit)
        if cfg.bg_gradient:
            tbg = 0.5 * (dy + 1.0)
            bgx = (1.0 - tbg) + tbg * 0.5
            bgy = (1.0 - tbg) + tbg * 0.7
            bgz = jnp.ones_like(tbg)  # (1-t) + t*1.0
            rx = rx + jnp.where(miss, tpx * bgx, 0.0)
            ry = ry + jnp.where(miss, tpy * bgy, 0.0)
            rz = rz + jnp.where(miss, tpz * bgz, 0.0)

        # ---- throughput update + termination ----
        live = active & hit
        tpx = jnp.where(live, tpx * wx, tpx)
        tpy = jnp.where(live, tpy * wy, tpy)
        tpz = jnp.where(live, tpz * wz, tpz)
        tpmax = jnp.maximum(tpx, jnp.maximum(tpy, tpz))
        alive = live & scatter_ok & (tpmax > 0.0)
        if cfg.rr_depth is not None:
            do_rr = alive & (depth >= float(cfg.rr_depth))
            p_cont = jnp.clip(tpmax, 0.05, 0.95)
            survive = u[6:7] < p_cont
            keep = do_rr & survive
            inv_p = 1.0 / p_cont
            tpx = jnp.where(keep, tpx * inv_p, tpx)
            tpy = jnp.where(keep, tpy * inv_p, tpy)
            tpz = jnp.where(keep, tpz * inv_p, tpz)
            alive = alive & (jnp.logical_not(do_rr) | survive)
        depth = depth + 1.0
        alive = alive & (depth < float(cfg.max_depth))

        finished = active & jnp.logical_not(alive)
        sf_ref[R_AX:R_AX + 1, :] = (sf_ref[R_AX:R_AX + 1, :]
                                    + jnp.where(finished, rx, 0.0))
        sf_ref[R_AY:R_AY + 1, :] = (sf_ref[R_AY:R_AY + 1, :]
                                    + jnp.where(finished, ry, 0.0))
        sf_ref[R_AZ:R_AZ + 1, :] = (sf_ref[R_AZ:R_AZ + 1, :]
                                    + jnp.where(finished, rz, 0.0))
        done = done + jnp.where(finished, 1.0, 0.0)

        # ---- regenerate finished slots' next sample ----
        if "regen" in cfg.stub:
            # phase stub: constant replacement rays — the per-iteration
            # camera generation (8 hash-RNG rows, lens disk, direction
            # normalize) becomes dead code; the state-row writes stay.
            gox = goy = goz = jnp.zeros((1, T), jnp.float32)
            gdx = gdy = jnp.zeros((1, T), jnp.float32)
            gdz = jnp.ones((1, T), jnp.float32)
            gtm = jnp.zeros((1, T), jnp.float32)
        else:
            gox, goy, goz, gdx, gdy, gdz, gtm = gen_rays(it)
        sf_ref[R_OX:R_OX + 1, :] = jnp.where(alive, px_, gox)
        sf_ref[R_OY:R_OY + 1, :] = jnp.where(alive, py_, goy)
        sf_ref[R_OZ:R_OZ + 1, :] = jnp.where(alive, pz_, goz)
        sf_ref[R_DX:R_DX + 1, :] = jnp.where(alive, ndx, gdx)
        sf_ref[R_DY:R_DY + 1, :] = jnp.where(alive, ndy, gdy)
        sf_ref[R_DZ:R_DZ + 1, :] = jnp.where(alive, ndz, gdz)
        sf_ref[R_TIME:R_TIME + 1, :] = jnp.where(alive, time, gtm)
        sf_ref[R_TPX:R_TPX + 1, :] = jnp.where(alive, tpx, 1.0)
        sf_ref[R_TPY:R_TPY + 1, :] = jnp.where(alive, tpy, 1.0)
        sf_ref[R_TPZ:R_TPZ + 1, :] = jnp.where(alive, tpz, 1.0)
        sf_ref[R_RX:R_RX + 1, :] = jnp.where(alive, rx, 0.0)
        sf_ref[R_RY:R_RY + 1, :] = jnp.where(alive, ry, 0.0)
        sf_ref[R_RZ:R_RZ + 1, :] = jnp.where(alive, rz, 0.0)
        sf_ref[R_DEPTH:R_DEPTH + 1, :] = jnp.where(alive, depth, 0.0)
        sf_ref[R_DONE:R_DONE + 1, :] = done
        sf_ref[R_ITERS:R_ITERS + 1, :] = sf_ref[R_ITERS:R_ITERS + 1, :] + 1.0

    def body(carry):
        it, _ = carry
        # cfg.unroll bounce iterations per while-loop trip: the loop
        # condition is a cross-lane any() reduce + scalar branch whose
        # per-iteration cost the phase breakdown (tools/mega_phase.py)
        # showed dominating the fixed tail. Under overdraw the overshoot
        # is FREE: lanes past their spp keep adding samples of their own
        # pixel and the epilogue renormalizes by the true counts.
        for kk in range(cfg.unroll):
            one_iter(it + kk)
        done_now = sf_ref[R_DONE:R_DONE + 1, :]
        # int32 live-flag carry: scalar i1 carries hit Mosaic truncation
        # limits.
        return it + cfg.unroll, jnp.any(done_now < spp).astype(jnp.int32)

    jax.lax.while_loop(lambda c: c[1] > 0, body,
                       (jnp.zeros((), jnp.int32),
                        jnp.any(valid).astype(jnp.int32)))

    out_ref[0, 0:1, :] = sf_ref[R_AX:R_AX + 1, :]
    out_ref[0, 1:2, :] = sf_ref[R_AY:R_AY + 1, :]
    out_ref[0, 2:3, :] = sf_ref[R_AZ:R_AZ + 1, :]
    out_ref[0, 3:4, :] = sf_ref[R_SEGS:R_SEGS + 1, :]
    out_ref[0, 4:5, :] = sf_ref[R_ITERS:R_ITERS + 1, :]
    out_ref[0, 5:6, :] = sf_ref[R_DONE:R_DONE + 1, :]
    out_ref[0, 6:7, :] = sf_ref[R_BLK:R_BLK + 1, :]
    out_ref[0, 7:8, :] = jnp.zeros((1, T), jnp.float32)


class _Cfg:
    """Static kernel configuration (hashable closure for jit)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)
        self._key = tuple(sorted(kw.items()))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _Cfg) and self._key == other._key


def _atlas_dims(images) -> tuple:
    """(n_img, Hp, Wp, bytes) of the kernel-resident image atlas, padded
    to the bf16 (16, 128) VMEM tile. Shape-only (NO device pull — this
    runs inside supports_scene on every launch, and an eager np.asarray
    of the image array costs a ~28 ms tunnel round-trip per call,
    CLAUDE.md). The byte budget is the CONSERVATIVE 6-plane hi/lo size:
    tape plans always pack 6 planes (byte_ok=False), so gating on the
    3-plane byte size would admit atlases the tape path cannot fit."""
    n_img, h_m, w_m, _ = images.shape
    hp = max(16, -(-h_m // 16) * 16)
    wp = max(128, -(-w_m // 128) * 128)
    return n_img, hp, wp, n_img * 6 * hp * wp * 2


def _atlas_is_byte(imgs: np.ndarray) -> bool:
    """True when every texel is byte-quantized (x*255 integral — true for
    any decoded image; the reference's image_texture is bytes by
    definition, texture.h:73-98). Byte atlases store ONE bf16 plane per
    channel holding round(x*255): integers 0..255 are EXACT in bf16, the
    one-hot dot result is an exact small-int f32, and the kernel's final
    (1/255) multiply reconstructs the texel to ~2^-24 — half the
    per-bounce MXU dots and MORE accurate than the 6-plane hi/lo split
    (~2^-16) kept as the fallback for non-byte floats. Called on the
    already-host-side array inside build_tables only (the result is
    memoized with the tables by build_tables_cached)."""
    scaled = imgs * 255.0
    return bool(np.all(np.abs(scaled - np.rint(scaled)) < 1e-3)
                and np.all(scaled >= -0.5) and np.all(scaled <= 255.5))


def supports_scene(scene: st.Scene) -> bool:
    """True when the megakernel covers this scene: sphere/rect geometry,
    constant + checker + Perlin-noise textures (all three display modes,
    on spheres, rects, and isotropic media), image textures on spheres,
    rects, AND media (VMEM-resident atlas up to 8 MB), constant media,
    any background, lights + one-sample MIS (rect and sphere lights).
    Out of scope: BVH-routed scenes, normal-debug rendering, non-MIS
    diffuse strategies."""
    if (scene.bvh is not None  # BVH scenes route through closest_hit
            or scene.needs_legacy_textures
            or scene.render_type != st.RENDER_SHADED
            or scene.lambertian_strategy != "mis"
            or int(np.sum(np.asarray(scene.spheres.active))
                   + np.sum(np.asarray(scene.rects.active))) == 0):
        return False
    if scene.has_image_tex:
        tex = scene.textures
        if tex.images is None:
            return False
        if _atlas_dims(tex.images)[3] > (8 << 20):
            return False
    return True


def _morton_order(centers: np.ndarray) -> np.ndarray:
    """Sort order by 3D Morton code of quantized centers (10 bits/axis)."""
    lo = centers.min(axis=0)
    span = np.maximum(centers.max(axis=0) - lo, 1e-9)
    q = np.clip(((centers - lo) / span * 1023.0).astype(np.uint64), 0, 1023)

    def spread(x):
        x = (x | (x << 16)) & np.uint64(0x30000FF)
        x = (x | (x << 8)) & np.uint64(0x300F00F)
        x = (x | (x << 4)) & np.uint64(0x30C30C3)
        x = (x | (x << 2)) & np.uint64(0x9249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(code, kind="stable").astype(np.int32)


def _kd_cluster_order(centers: np.ndarray, SB: int) -> np.ndarray:
    """Order by balanced kd-split: recursively partition on the widest
    axis so every SB-sized chunk of the result is a spatially compact
    box. Tighter cluster AABBs than Morton-code chunking (whose z-curve
    chunks straddle cell boundaries): measured on-chip survival
    0.186 -> 0.176 at 14.4k spheres / SB=128 (34.8 -> 37.4 M seg/s,
    +7.5%); at 3.6k the running-best ordered-traversal kills already
    dominate and the change is noise (64.5 -> 65.3, survival 0.431 ->
    0.429). Leaves keep whole multiples of SB on the left so every
    cluster except the last is exactly full."""
    n = centers.shape[0]
    order = np.empty(n, np.int32)
    pos = 0

    def rec(idx):
        nonlocal pos
        if idx.size <= SB:
            order[pos:pos + idx.size] = idx
            pos += idx.size
            return
        pts = centers[idx]
        ax = int(np.argmax(pts.max(axis=0) - pts.min(axis=0)))
        k = -(-idx.size // SB)          # clusters needed
        nl = (k // 2) * SB              # full-SB left half
        part = np.argpartition(pts[:, ax], nl)
        rec(idx[part[:nl]])
        rec(idx[part[nl:]])

    rec(np.arange(n, dtype=np.int32))
    return order


_TABLE_CACHE: dict = {}


def _scene_memo(cache: dict, scene, sub_key, build):
    """Weakref-keyed per-scene memo (shared by the table and pixel-order
    caches): keyed by object identity with weakref eviction (Scene
    pytrees hold unhashable arrays), so mutated/replaced scenes never
    hit a stale entry."""
    import weakref

    key = id(scene)
    entry = cache.get(key)
    if entry is not None and entry[0]() is scene:
        per = entry[1]
        if sub_key not in per:
            per[sub_key] = build()
        return per[sub_key]
    val = build()
    try:
        ref = weakref.ref(scene, lambda _: cache.pop(key, None))
    except TypeError:  # no weakref support: don't cache
        return val
    cache[key] = (ref, {sub_key: val})
    return val


def build_tables_cached(scene: st.Scene, SB: int, sg: int = 0,
                        byte_ok: bool = True):
    """Per-scene-object memo of build_tables: the eager packing pulls the
    sphere SoA to the host (device->host round-trips cost ~28 ms each
    through a remote tunnel), which would otherwise tax every launch.
    Keyed by object identity with weakref eviction (Scene pytrees hold
    unhashable arrays), so mutated/replaced scenes never hit a stale
    entry."""
    return _scene_memo(_TABLE_CACHE, scene, (SB, sg, byte_ok),
                       lambda: build_tables(scene, SB, sg,
                                            byte_ok=byte_ok))


def build_tables(scene: st.Scene, SB: int = 64, sg: int = 0,
                 order_override=None, byte_ok: bool = True):
    """Host-side (eager) packing: Morton-sorted sphere tables + cluster
    AABBs + camera vector. Returns (sph_tab (S,128), attr_tab (16,S),
    clus_tab (C,128), cam_vec (1,128), meta dict). sg > 0 appends
    super-cluster AABB rows (unions of sg consecutive clusters, grouped in
    MORTON order — spatial locality makes the unions tight) after the C
    cluster rows for the kernel's two-level vote.

    order_override: an (S,) int array (meta["slot_ext"]: original sphere
    row per slot, -1 = padding) that PINS the slot layout. Used by the
    inverse-rendering re-tape (ops/mega_grad._retabbed): the Morton sort
    and biggest-radius block reorder depend on sphere centers/radii, so
    optimizing geometry could silently reshuffle slots mid-fit while the
    replay closure still decodes the tape with the original maps. Pinning
    keeps slot codes stable; cluster AABBs are still recomputed from the
    CURRENT geometry, so culling stays correct."""
    sph = scene.spheres
    act = np.asarray(sph.active)
    c0 = np.asarray(sph.center0, np.float32)
    c1 = np.asarray(sph.center1, np.float32)
    t0 = np.asarray(sph.time0, np.float32)
    t1 = np.asarray(sph.time1, np.float32)
    rad = np.asarray(sph.radius, np.float32)
    mat = np.asarray(sph.mat)

    if order_override is not None:
        idx_ext = np.asarray(order_override, np.int64)
        S = idx_ext.size
        assert S % SB == 0, (S, SB)
        C = S // SB
        n = int(np.sum(idx_ext >= 0))
    else:
        live = np.nonzero(act)[0]
        # Drop exact geometric duplicates (same swept center/radius/time),
        # keeping the FIRST: the one-hot extraction mask SUMS attribute
        # rows of every sphere tied at the winning t, so coincident
        # duplicates would double albedo / corrupt mtype. First-wins
        # matches the reference's list iteration (strict t < closest: a
        # later equal hit never replaces). Distinct spheres tying at one
        # float32 t remains possible in principle but is measure-zero per
        # sample.
        if live.size:
            geom = np.stack([c0[live, 0], c0[live, 1], c0[live, 2],
                             c1[live, 0], c1[live, 1], c1[live, 2],
                             rad[live], t0[live], t1[live]], axis=1)
            _, first = np.unique(geom, axis=0, return_index=True)
            live = live[np.sort(first)]
        # Multi-cluster tables use the balanced kd-split order (compact
        # per-cluster boxes -> lower slab survival); single-cluster and
        # super-group tables keep the Morton curve (sg unions need
        # spatially CONSECUTIVE clusters, which the kd leaf order does
        # not guarantee between siblings at different depths).
        if live.size > SB and not sg:
            order = live[_kd_cluster_order(c0[live], SB)]
        else:
            order = (live[_morton_order(c0[live])] if live.size
                     else live.astype(np.int32))
        n = order.size
        S = max(SB, ((n + SB - 1) // SB) * SB)
        C = S // SB

        # Cluster importance order: the kernel's running-best slab gate
        # skips a cluster once the closest hit found so far is in front of
        # it, so visit the clusters most likely to OWN the closest hit
        # first — biggest spheres (the ground sphere dominates hit
        # probability) lead, the long Morton-sorted tail of small spheres
        # follows.
        idx_ext = np.full((S,), -1, np.int64)
        idx_ext[:n] = order
        if C > 1 and not sg:
            # (two-level mode keeps pure Morton cluster order instead: the
            # super unions must be spatially tight, which biggest-radius-
            # first reordering destroys)
            blocks = idx_ext.reshape(C, SB)
            key_r = np.array([np.abs(rad[b[b >= 0]]).max() if (b >= 0).any()
                              else -1.0 for b in blocks])
            blocks = blocks[np.argsort(-key_r, kind="stable")]
            idx_ext = blocks.reshape(S)
    actm = idx_ext >= 0

    def pad(x, fill=0.0):
        out = np.full((S,) + x.shape[1:], fill, x.dtype)
        out[actm] = x[idx_ext[actm]]
        return out

    c0p, c1p = pad(c0), pad(c1)
    t0p, t1p = pad(t0), pad(t1, 1.0)
    radp = pad(rad)
    actp = actm.astype(np.float32)
    dt = t1p - t0p
    idt = np.where(dt != 0, 1.0 / np.where(dt != 0, dt, 1.0), 0.0)
    dc = c1p - c0p

    # r2 = -1 on padding rows: the kernel's quadratic then has disc < 0
    # everywhere, so inactive spheres can never hit without a mask op.
    r2 = np.where(actp > 0, radp ** 2, -1.0).astype(np.float32)
    sph_tab = np.zeros((S, SPH_LANES), np.float32)
    for lane, v in ((C_CX, c0p[:, 0]), (C_CY, c0p[:, 1]), (C_CZ, c0p[:, 2]),
                    (C_DCX, dc[:, 0]), (C_DCY, dc[:, 1]), (C_DCZ, dc[:, 2]),
                    (C_T0, t0p), (C_IDT, idt), (C_R2, r2),
                    (C_ACT, actp), (C_NR2, -r2)):
        sph_tab[:, lane] = v

    # shading attributes via material/texture tables (gathers are fine here:
    # eager, once per scene)
    mats = scene.materials
    tex = scene.textures
    matp = pad(mat.astype(np.int64))
    mtype = np.asarray(mats.mtype)[matp]
    ti = np.asarray(mats.tex)[matp]
    alb = np.asarray(tex.color, np.float32)[ti]
    fuzz = np.asarray(mats.fuzz, np.float32)[matp]
    ridx = np.asarray(mats.ref_idx, np.float32)[matp]
    rinv = np.where(radp != 0, 1.0 / np.where(radp != 0, radp, 1.0), 0.0)
    # checker children (constant colors — the only form the packed rows
    # support; needs_legacy_textures gates anything deeper out of the mega)
    ttype_np = np.asarray(tex.ttype)
    col_all = np.asarray(tex.color, np.float32)
    chk = (ttype_np[ti] == st.TEX_CHECKER).astype(np.float32)
    evc = col_all[np.asarray(tex.even)[ti]]
    odc = col_all[np.asarray(tex.odd)[ti]]
    # noise textures: mode flag (1 + NOISE_*, 0 = not noise) + scale rows
    # for the in-kernel Perlin (all three display modes, texture.h:55-69)
    nmode_np = np.asarray(tex.noise_mode)
    is_noi = ttype_np[ti] == st.TEX_NOISE
    noi = np.where(is_noi, 1.0 + nmode_np[ti], 0.0).astype(np.float32)
    nscale = np.asarray(tex.scale, np.float32)[ti]
    noise_modes = ({int(m) for m in nmode_np[ti][is_noi & actm]}
                   if n else set())
    # image textures on spheres (texture.h:73-98): A_IMG = 1 + atlas id
    # (small ints are exact through the f32 extraction dot); the atlas
    # ships as hi/lo-bf16 row planes the kernel holds resident in VMEM
    is_img = ttype_np[ti] == st.TEX_IMAGE
    imgf = np.where(is_img, 1.0 + np.asarray(tex.image_id)[ti],
                    0.0).astype(np.float32)
    imgf = np.where(actm, imgf, 0.0).astype(np.float32)
    has_image = bool(np.any(imgf > 0))

    attr_tab = np.zeros((A_ROWS, S), np.float32)
    for row, v in ((A_CX, c0p[:, 0]), (A_CY, c0p[:, 1]), (A_CZ, c0p[:, 2]),
                   (A_DCX, dc[:, 0]), (A_DCY, dc[:, 1]), (A_DCZ, dc[:, 2]),
                   (A_T0, t0p), (A_IDT, idt), (A_RINV, rinv),
                   (A_MTYPE, mtype.astype(np.float32)),
                   (A_ALBX, alb[:, 0]), (A_ALBY, alb[:, 1]),
                   (A_ALBZ, alb[:, 2]),
                   (A_MPARAM, np.where(mtype == st.MAT_METAL, fuzz,
                                       np.where(mtype == st.MAT_DIELECTRIC,
                                                ridx, 0.0))
                    .astype(np.float32)),
                   (A_CHK, chk), (A_NSCALE, nscale), (A_NOISE, noi),
                   (A_EVENX, evc[:, 0]), (A_EVENY, evc[:, 1]),
                   (A_EVENZ, evc[:, 2]),
                   (A_ODDX, odc[:, 0]), (A_ODDY, odc[:, 1]),
                   (A_ODDZ, odc[:, 2]), (A_IMG, imgf)):
        attr_tab[row] = v

    # cluster AABBs over the motion-swept spheres; per-cluster per-AXIS
    # static flags (dc == 0 on padding rows) let the kernel drop each
    # motion FMA no member needs — book-1's motion blur is y-only
    # (Scene/scene.h:126-136), so its quadratic pays 2 FMAs, not 6
    clus_moving = tuple(
        tuple(bool(np.any(dc[c * SB:(c + 1) * SB, ax] != 0))
              for ax in range(3))
        for c in range(C))
    absr = np.abs(radp)
    los = np.minimum(c0p, c1p) - absr[:, None]
    his = np.maximum(c0p, c1p) + absr[:, None]
    los = np.where(actp[:, None] > 0, los, np.inf)
    his = np.where(actp[:, None] > 0, his, -np.inf)
    clus_tab = np.zeros((C, CLUS_LANES), np.float32)
    for c in range(C):
        sl = slice(c * SB, (c + 1) * SB)
        clus_tab[c, K_MINX:K_MINZ + 1] = los[sl].min(axis=0)
        clus_tab[c, K_MAXX:K_MAXZ + 1] = his[sl].max(axis=0)
    Cg = 0
    sg_eff = sg if (sg and C > 1) else 0
    if sg_eff:
        Cg = -(-C // sg_eff)
        sup = np.zeros((Cg, CLUS_LANES), np.float32)
        for g in range(Cg):
            rows = clus_tab[g * sg_eff:(g + 1) * sg_eff]
            sup[g, K_MINX:K_MINZ + 1] = rows[:, K_MINX:K_MINZ + 1].min(0)
            sup[g, K_MAXX:K_MAXZ + 1] = rows[:, K_MAXX:K_MAXZ + 1].max(0)
        clus_tab = np.concatenate([clus_tab, sup], axis=0)

    # ---- rect table + static per-rect axis/transform metadata ----
    mt_np = np.asarray(mats.mtype)
    tex_np = np.asarray(mats.tex)
    col_np = np.asarray(tex.color, np.float32)
    fuzz_np = np.asarray(mats.fuzz, np.float32)
    ridx_np = np.asarray(mats.ref_idx, np.float32)
    rects = scene.rects
    rlive = np.nonzero(np.asarray(rects.active))[0]
    R = int(rlive.size)
    rect_tab = np.zeros((max(R, 1), RECT_LANES), np.float32)
    rect_axes, rect_rot, rect_trans = [], [], []
    rect_tf, _tf_groups = [], {}
    r_axis = np.asarray(rects.axis)
    r_flip = np.asarray(rects.flip, np.float32)
    r_cos = np.asarray(rects.cos_t, np.float32)
    r_sin = np.asarray(rects.sin_t, np.float32)
    r_off = np.asarray(rects.offset, np.float32)
    r_mat = np.asarray(rects.mat)
    for i, rr in enumerate(rlive):
        ax = int(r_axis[rr])
        rect_axes.append(ax)
        ct_, st_ = float(r_cos[rr]), float(r_sin[rr])
        rot = (ct_ != 1.0) or (st_ != 0.0)
        rect_rot.append(rot)
        rect_trans.append(bool(np.any(r_off[rr] != 0.0)))
        # static transform-group id: rects with one baked (rotate_y,
        # translate) — e.g. a box's 6 faces — share the kernel's per-group
        # object-space ray + reciprocals
        tf_key = (rot, rect_trans[-1], ct_, st_,
                  tuple(float(v) for v in r_off[rr]))
        rect_tf.append(_tf_groups.setdefault(tf_key, len(_tf_groups)))
        fl = float(r_flip[rr])
        # object-space unit normal by axis code, rotated object->world
        # exactly as closest_hit does (geometry.py rect normals)
        n_o = [0.0, 0.0, 0.0]
        n_o[2 - ax if ax != 2 else 0] = fl  # XY->z, XZ->y, YZ->x
        nw = (ct_ * n_o[0] + st_ * n_o[2], n_o[1],
              -st_ * n_o[0] + ct_ * n_o[2])
        mi = int(r_mat[rr])
        ti_r = int(tex_np[mi])
        alb = col_np[ti_r]
        if int(np.asarray(tex.ttype)[ti_r]) == st.TEX_CHECKER:
            rect_tab[i, RT_CHK] = 1.0
            rect_tab[i, RT_EVENX:RT_EVENZ + 1] = \
                col_np[int(np.asarray(tex.even)[ti_r])]
            rect_tab[i, RT_ODDX:RT_ODDZ + 1] = \
                col_np[int(np.asarray(tex.odd)[ti_r])]
        elif int(np.asarray(tex.ttype)[ti_r]) == st.TEX_NOISE:
            rect_tab[i, RT_NOI] = 1.0 + float(nmode_np[ti_r])
            rect_tab[i, RT_NSC] = float(np.asarray(tex.scale)[ti_r])
            noise_modes.add(int(nmode_np[ti_r]))
        elif int(np.asarray(tex.ttype)[ti_r]) == st.TEX_IMAGE:
            rect_tab[i, RT_IMG] = 1.0 + float(
                np.asarray(tex.image_id)[ti_r])
            has_image = True
        for lane, v in ((RT_A0, rects.a0), (RT_A1, rects.a1),
                        (RT_B0, rects.b0), (RT_B1, rects.b1),
                        (RT_K, rects.k)):
            rect_tab[i, lane] = float(np.asarray(v)[rr])
        # reciprocal planar extents for the in-kernel rect uv
        # (hittable.h:160-172; zero-extent rects never hit)
        da_r = rect_tab[i, RT_A1] - rect_tab[i, RT_A0]
        db_r = rect_tab[i, RT_B1] - rect_tab[i, RT_B0]
        rect_tab[i, RT_IDA] = 1.0 / da_r if da_r != 0 else 0.0
        rect_tab[i, RT_IDB] = 1.0 / db_r if db_r != 0 else 0.0
        rect_tab[i, RT_COS] = ct_
        rect_tab[i, RT_SIN] = st_
        rect_tab[i, RT_OFFX:RT_OFFZ + 1] = r_off[rr]
        rect_tab[i, RT_NX:RT_NZ + 1] = nw
        rect_tab[i, RT_MTYPE] = float(mt_np[mi])
        rect_tab[i, RT_ALBX:RT_ALBZ + 1] = alb
        rect_tab[i, RT_FUZZ] = fuzz_np[mi]
        rect_tab[i, RT_RIDX] = ridx_np[mi]

    # ---- light table + static per-light kind/axis metadata ----
    lights = scene.lights
    L = int(lights.num)
    light_tab = np.zeros((max(L, 1), LIGHT_LANES), np.float32)
    light_kinds, light_axes, light_rot, light_trans = [], [], [], []
    l_kind = np.asarray(lights.kind)
    l_idx = np.asarray(lights.index)
    for i in range(L):
        kindl = int(l_kind[i])
        light_kinds.append(kindl)
        if kindl == st.LIGHT_RECT:
            rr = int(l_idx[i])
            light_axes.append(int(r_axis[rr]))
            ct_, st_ = float(r_cos[rr]), float(r_sin[rr])
            light_rot.append((ct_ != 1.0) or (st_ != 0.0))
            light_trans.append(bool(np.any(r_off[rr] != 0.0)))
            for lane, v in ((LT_A0, rects.a0), (LT_A1, rects.a1),
                            (LT_B0, rects.b0), (LT_B1, rects.b1),
                            (LT_K, rects.k)):
                light_tab[i, lane] = float(np.asarray(v)[rr])
            light_tab[i, LT_COS] = ct_
            light_tab[i, LT_SIN] = st_
            light_tab[i, LT_OFFX:LT_OFFZ + 1] = r_off[rr]
            light_tab[i, LT_AREA] = float(
                (np.asarray(rects.a1)[rr] - np.asarray(rects.a0)[rr])
                * (np.asarray(rects.b1)[rr] - np.asarray(rects.b0)[rr]))
        else:
            si = int(l_idx[i])
            light_axes.append(0)
            light_rot.append(False)
            light_trans.append(False)
            light_tab[i, LT_CX:LT_CZ + 1] = c0[si]
            light_tab[i, LT_RAD] = float(rad[si])

    has_light = bool((R and np.any(mt_np[r_mat[rlive]] == st.MAT_DIFFUSE_LIGHT))
                     or (n and np.any(mtype[actm] == st.MAT_DIFFUSE_LIGHT)))

    # ---- constant-medium table + static kind/transform metadata ----
    media = scene.media
    vlive = np.nonzero(np.asarray(media.active))[0]
    V = int(vlive.size)
    med_tab = np.zeros((max(V, 1), MED_LANES), np.float32)
    med_kinds, med_rot, med_trans = [], [], []
    if V:
        m_kind = np.asarray(media.kind)
        m_p0 = np.asarray(media.p0, np.float32)
        m_p1 = np.asarray(media.p1, np.float32)
        m_cos = np.asarray(media.cos_t, np.float32)
        m_sin = np.asarray(media.sin_t, np.float32)
        m_off = np.asarray(media.offset, np.float32)
        m_rho = np.asarray(media.density, np.float32)
        m_mat = np.asarray(media.mat)
        for i, vv in enumerate(vlive):
            med_kinds.append(int(m_kind[vv]))
            ct_, st_ = float(m_cos[vv]), float(m_sin[vv])
            med_rot.append((ct_ != 1.0) or (st_ != 0.0))
            med_trans.append(bool(np.any(m_off[vv] != 0.0)))
            med_tab[i, MD_P0X:MD_P0Z + 1] = m_p0[vv]
            med_tab[i, MD_P1X:MD_P1Z + 1] = m_p1[vv]
            med_tab[i, MD_COS] = ct_
            med_tab[i, MD_SIN] = st_
            med_tab[i, MD_OFFX:MD_OFFZ + 1] = m_off[vv]
            med_tab[i, MD_NIRHO] = -1.0 / float(m_rho[vv])
            ti_m = int(tex_np[int(m_mat[vv])])
            med_tab[i, MD_ALBX:MD_ALBZ + 1] = col_np[ti_m]
            if int(ttype_np[ti_m]) == st.TEX_NOISE:
                med_tab[i, MD_NOI] = 1.0 + float(nmode_np[ti_m])
                med_tab[i, MD_NSC] = float(np.asarray(tex.scale)[ti_m])
                noise_modes.add(int(nmode_np[ti_m]))
            elif int(ttype_np[ti_m]) == st.TEX_IMAGE:
                # isotropic media sample their texture at uv = (0, 0)
                # (the reference leaves hit_record.u/v unset there;
                # ops/geometry.py pins them to zero — mirrored in-kernel)
                med_tab[i, MD_IMG] = 1.0 + float(
                    np.asarray(tex.image_id)[ti_m])
                has_image = True

    # ---- image atlas planes: per image, rows [6*Hp*id + plane*Hp + j]
    # with plane = (hi_r, hi_g, hi_b, lo_r, lo_g, lo_b); hi = bf16(x),
    # lo = bf16(x - f32(hi)) reconstructs the f32 texel to ~2^-16 through
    # two exact one-hot dots. Hp/Wp pad to the bf16 (16, 128) VMEM tile.
    bf16 = jnp.bfloat16  # the ml_dtypes scalar type; valid as a numpy dtype
    if has_image:
        imgs = np.asarray(tex.images, np.float32)     # (I, Hm, Wm, 3)
        hw_np = np.asarray(tex.image_hw)
        n_img, img_hp, img_wp, _ = _atlas_dims(imgs)
        # tape/inverse-rendering plans need CONTINUOUS texel response in
        # the re-taped kernel forward (FD-validated texel gradients), so
        # they keep the hi/lo split; forward-only renders take the
        # half-the-dots byte atlas
        img_byte = byte_ok and _atlas_is_byte(imgs)
        h_m, w_m = imgs.shape[1], imgs.shape[2]
        n_planes = 3 if img_byte else 6
        img_tab = np.zeros((n_img * n_planes * img_hp, img_wp), bf16)
        for ii in range(n_img):
            for ch in range(3):
                p = imgs[ii, :, :, ch]
                b0 = ii * n_planes * img_hp
                if img_byte:
                    # round(x*255) in 0..255 is EXACT in bf16 (see
                    # _atlas_dims): one plane per channel, the kernel's
                    # 1/255 multiply reconstructs the texel
                    img_tab[b0 + ch * img_hp:
                            b0 + ch * img_hp + h_m, :w_m] = (
                        np.rint(p * 255.0).astype(bf16))
                else:
                    hi = p.astype(bf16)
                    lo = (p - hi.astype(np.float32)).astype(bf16)
                    img_tab[b0 + ch * img_hp:
                            b0 + ch * img_hp + h_m, :w_m] = hi
                    img_tab[b0 + (3 + ch) * img_hp:
                            b0 + (3 + ch) * img_hp + h_m, :w_m] = lo
        img_hw = tuple((int(hw_np[ii, 0]), int(hw_np[ii, 1]))
                       for ii in range(n_img))
    else:
        n_img, img_hp, img_wp, img_byte = 0, 16, 128, False
        img_hw = ()
        img_tab = np.zeros((16, 128), bf16)

    cam = scene.camera
    cam_vec = np.zeros((1, 128), np.float32)
    for lane, v in ((CAM_OX, cam.origin), (CAM_LLX, cam.lower_left_corner),
                    (CAM_HX, cam.horizontal), (CAM_VX, cam.vertical),
                    (CAM_UX, cam.u), (CAM_WX, cam.v)):
        cam_vec[0, lane:lane + 3] = np.asarray(v, np.float32)
    cam_vec[0, CAM_LENS] = float(cam.lens_radius)
    cam_vec[0, CAM_T0] = float(cam.time0)
    cam_vec[0, CAM_T1] = float(cam.time1)

    # Shared (time0, 1/dt) across live spheres -> the kernel hoists the
    # motion fraction to one per-ray row per bounce (cfg.uniform_time).
    t0a = t0p[actm]
    idta = idt[actm]
    uniform_time = bool(n and np.all(t0a == t0a[0])
                        and np.all(idta == idta[0]))
    meta = dict(S=S, C=C, SB=SB, sg=sg_eff, Cg=Cg,
                # host-side copies of the member-cluster AABBs for the
                # plan-time coherence binning (_coherent_pixel_layout):
                # recomputing them there would re-derive the kd/Morton
                # cluster assignment; a device pull-back would pay the
                # tunnel round-trip per launch
                clus_lo=clus_tab[:C, K_MINX:K_MINZ + 1].copy(),
                clus_hi=clus_tab[:C, K_MAXX:K_MAXZ + 1].copy(),
                uniform_time=uniform_time,
                ut_t0=float(t0a[0]) if n else 0.0,
                ut_idt=float(idta[0]) if n else 0.0,
                clus_moving=clus_moving,
                moving=bool(scene.has_moving_spheres),
                lens=float(cam.lens_radius) > 0.0,
                has_metal=bool(scene.has_metal),
                has_dielectric=bool(scene.has_dielectric),
                bg_gradient=scene.background == st.BG_GRADIENT,
                has_spheres=n > 0,
                has_light=has_light,
                has_checker=bool(scene.has_checker_tex),
                has_noise=bool(noise_modes),
                noise_modes=tuple(sorted(noise_modes)),
                has_image=has_image, n_img=n_img, img_hw=img_hw,
                img_hp=img_hp, img_wp=img_wp, img_byte=img_byte,
                has_iso=V > 0,
                R=R, rect_axes=tuple(rect_axes),
                rect_rot=tuple(rect_rot), rect_trans=tuple(rect_trans),
                rect_tf=tuple(rect_tf),
                L=L, light_kinds=tuple(light_kinds),
                light_axes=tuple(light_axes), light_rot=tuple(light_rot),
                light_trans=tuple(light_trans),
                V=V, med_kinds=tuple(med_kinds), med_rot=tuple(med_rot),
                med_trans=tuple(med_trans),
                # index maps for the differentiable replay
                # (ops/mega_grad.py): packed slot/row -> original scene row
                slot_to_orig=np.where(idx_ext >= 0, idx_ext, 0)
                .astype(np.int32),
                slot_ext=idx_ext.astype(np.int32),
                rect_rows=tuple(int(r) for r in rlive),
                med_rows=tuple(int(v) for v in vlive),
                light_rows=tuple(int(r) for r in l_idx[:L]))
    return (jnp.asarray(sph_tab), jnp.asarray(attr_tab),
            jnp.asarray(clus_tab), jnp.asarray(rect_tab),
            jnp.asarray(light_tab), jnp.asarray(med_tab),
            jnp.asarray(img_tab), jnp.asarray(cam_vec), meta)


@functools.partial(jax.jit, static_argnames=("cfg", "n_tiles", "interpret"))
def _mega_call(pixf, cam_vec, sph_tab, attr_tab, clus_tab, rect_tab,
               light_tab, med_tab, nperm_tab, nrvh_tab, nrvl_tab, img_tab,
               seed, *, cfg: _Cfg, n_tiles: int, interpret: bool):
    T = cfg.T
    S = cfg.S
    kern = functools.partial(_kernel, cfg=cfg)
    grid = (n_tiles,)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 4, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, SPH_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A_ROWS, S), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.C + cfg.Cg, CLUS_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(cfg.R, 1), RECT_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(cfg.L, 1), LIGHT_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(cfg.V, 1), MED_LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((48, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_img * (3 if cfg.img_byte else 6)
                          * cfg.img_hp if cfg.has_image
                          else 16, cfg.img_wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 8 + (cfg.n_iters if cfg.tape else 0), T),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_tiles, 8 + (cfg.n_iters if cfg.tape else 0), T), jnp.float32),
        scratch_shapes=(
            ([pltpu.VMEM((cfg.C, CLUS_LANES), jnp.float32)]
             if (cfg.batch_votes or cfg.dyn) else [])
            + ([pltpu.VMEM((A_ROWS, T), jnp.float32)] if cfg.fe
               else [] if cfg.idx_extract
               else [pltpu.VMEM((S, T), jnp.float32)])
            + [pltpu.VMEM((STATE_ROWS, T), jnp.float32)]
            + ([pltpu.SMEM((cfg.C,), jnp.int32)] if cfg.dyn else [])
            + ([pltpu.SMEM((cfg.dord + 1,), jnp.int32)]
               if cfg.dyn and cfg.dord else [])),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        # The TPU-semantics interpreter (not the generic one) implements
        # pltpu.prng_*, so CPU tests can run the full kernel.
        interpret=pltpu.InterpretParams() if interpret else False,
    )(pixf.reshape(n_tiles, 4, T), cam_vec, sph_tab, attr_tab, clus_tab,
      rect_tab, light_tab, med_tab, nperm_tab, nrvh_tab, nrvl_tab, img_tab,
      seed)
    return out


def _layout_from_order(order, inv, nx: int, ny: int, T: int, k: int):
    """Split a pixel permutation into tiles of T lanes covering T/k
    pixels with k sample-parallel slots each (k slots of one pixel finish
    their spp/k samples in near-lockstep, shrinking the per-tile tail).
    Returns (pixf (n_tiles, 4, T) f32 rows [i, j, valid, pad], inverse
    perm)."""
    assert T % k == 0
    Tp = T // k
    n_pix = nx * ny
    n_tiles = -(-n_pix // Tp)
    n_pad = n_tiles * Tp
    order_p = np.pad(order, (0, n_pad - n_pix), constant_values=n_pix)
    tiles = order_p.reshape(n_tiles, Tp)
    lanes = np.tile(tiles, (1, k))                       # (n_tiles, T)
    pixf = np.zeros((n_tiles, 4, T), np.float32)
    valid = lanes < n_pix
    safe = np.where(valid, lanes, 0)
    pixf[:, 0, :] = safe % nx
    pixf[:, 1, :] = safe // nx
    pixf[:, 2, :] = valid.astype(np.float32)
    return jnp.asarray(pixf), inv


@functools.lru_cache(maxsize=8)
def _pixel_layout(nx: int, ny: int, T: int, k: int = 1):
    """Block-linear pixel order split into tiles (see _layout_from_order)."""
    from .integrator import _block_linear_order

    order, inv = _block_linear_order(nx, ny)
    return _layout_from_order(order, inv, nx, ny, T, k)


_ORDER_CACHE: dict = {}


def _coherent_pixel_layout(scene: st.Scene, meta: dict, nx: int, ny: int,
                           T: int, k: int, t_min: float = 0.001):
    """Cluster-coherence pixel binning for large-S scenes (round-5).

    Survival in the culled sweep is set by TILE coherence: a tile whose
    lanes' rays touch few clusters votes the rest off. Block-linear order
    gives 2-D screen locality, but a 4096-lane tile's primary frustum
    still slices through many clusters in DEPTH, and secondary rays
    start wherever the primaries land. Binning pixels by the cluster
    their central primary ray enters FIRST groups lanes by 3-D scene
    locality instead: primaries in a tile then open against one cluster,
    and their secondaries start inside that cluster's neighborhood.
    The assignment is pure plan-time numpy arithmetic on the already-
    built cluster AABBs — no kernel change, no gathers; the inverse
    permutation restores the canvas exactly as for block-linear order
    (the TPU-native answer, at regen granularity, to the ray-reordering
    literature the measured gather costs rule out — docs/PERF.md).

    Within a bin, block-linear rank breaks ties so each bin stays
    screen-compact. Memoized per (scene identity, geometry) via
    _scene_memo — the binning costs ~1 s at 14.4k clusters x 1 M pixels
    and is reused across every launch of a render/bench loop."""
    sub = (nx, ny, T, k, meta["C"], meta["SB"], t_min)
    return _scene_memo(_ORDER_CACHE, scene, sub,
                       lambda: _coherent_pixel_order(scene, meta, nx, ny,
                                                     T, k, t_min))


def _coherent_pixel_order(scene, meta, nx, ny, T, k, t_min):
    from .integrator import _block_linear_order

    cam = scene.camera
    o = np.asarray(cam.origin, np.float32)
    ll = np.asarray(cam.lower_left_corner, np.float32)
    hz = np.asarray(cam.horizontal, np.float32)
    vt = np.asarray(cam.vertical, np.float32)
    C = meta["C"]
    lo = np.asarray(meta["clus_lo"], np.float32)         # (C, 3)
    hi = np.asarray(meta["clus_hi"], np.float32)
    n_pix = nx * ny
    ii = (np.arange(nx, dtype=np.float32) + 0.5) / nx
    jj = (np.arange(ny, dtype=np.float32) + 0.5) / ny
    # (n_pix, 3) central primary directions, row-major p = j*nx + i
    d = (ll[None, :] + ii[None, :, None] * hz[None, None, :]
         + jj[:, None, None] * vt[None, None, :]).reshape(n_pix, 3)
    d -= o[None, :]
    invd = 1.0 / np.where(d == 0.0, 1e-30, d)
    best_e = np.full(n_pix, np.inf, np.float32)
    best_c = np.full(n_pix, C, np.int32)
    for c in range(C):
        t0 = (lo[c][None, :] - o[None, :]) * invd
        t1 = (hi[c][None, :] - o[None, :]) * invd
        tn = np.minimum(t0, t1).max(axis=1)
        tf = np.maximum(t0, t1).min(axis=1)
        entry_t = np.maximum(tn, t_min)
        better = (tf >= entry_t) & (entry_t < best_e)
        best_e[better] = entry_t[better]
        best_c[better] = c
    _, bl_rank = _block_linear_order(nx, ny)
    order = np.lexsort((bl_rank, best_c)).astype(np.int32)
    inv = np.empty_like(order)
    inv[order] = np.arange(n_pix, dtype=np.int32)
    return _layout_from_order(order, inv, nx, ny, T, k)


def make_plan(scene: st.Scene, nx: int, ny: int, spp: int,
              max_depth: int = 50, rr_depth: int | None = 4,
              T: int | None = None, SB: int | None = None,
              slots_per_pixel: int = 1,
              chunks: int = 1, idx_extract: bool = False,
              cull: bool | None = None, extract_block: int | None = None,
              fuse_extract: int | None = None, tape: bool = False,
              phase_stub: tuple = (), unroll: int | None = None,
              batch_votes: bool | None = None,
              super_group: int = 0, dyn_cull: bool | None = None,
              dyn_order: int | None = None):
    """Host-side launch plan: packed tables + static kernel cfg for
    _mega_call at this geometry. Shared by trace_mega and the sharded
    multi-chip entry (parallel.mesh.render_sharded_mega, which passes the
    per-device spp shard). Returns (tables, cfg, T, k)."""
    assert supports_scene(scene), "scene not supported by the megakernel"
    k = slots_per_pixel
    assert spp % k == 0, (spp, k)
    if tape:
        # The replay mirrors one lane == one pixel with exactly spp
        # samples; the winner index rides R_BIDX, so force idx mode.
        assert k == 1, "tape mode requires slots_per_pixel == 1"
        assert unroll in (None, 1), "tape rows are bounded by n_iters"
        idx_extract = True
        fuse_extract = 0
    # Tiny sphere tables (e.g. the one glass ball in cornell_box) shrink to
    # one 8-sublane cluster rather than paying an SB-row quadratic.
    n_live = int(np.sum(np.asarray(scene.spheres.active)))
    fe_will_apply = (fuse_extract is None or bool(fuse_extract)) \
        and not idx_extract and not tape
    if SB is None:
        # Measured optima (docs/PERF.md): book-1-class tables want ONE
        # dense vote-free cluster; past one cluster, fused extraction
        # shifts the survival x vote-overhead knee to SB=128 Morton
        # clusters (52.2 M seg/s at 3.6k spheres vs 45.9 at SB=256, 24.0
        # at SB=64; the scratch path's old optimum was SB=256).
        if n_live <= 512:
            SB = 512
        else:
            SB = 128 if fe_will_apply else 256
    SB = min(SB, max(8, -(-n_live // 8) * 8))
    # Fused extraction needs 128-aligned attribute lane slices (full-tile
    # dot operands): round the cluster size up to a 128 multiple whenever
    # fe could apply — padding rows are inert (r2 = -1 never hits).
    if fe_will_apply and SB >= 128:
        SB = -(-SB // 128) * 128
    if super_group:
        # the group-skip path has no candidate scratch to BIG-fill
        assert fe_will_apply, "super_group requires fused extraction"
    tabs = build_tables_cached(scene, SB, super_group, byte_ok=not tape)
    meta = tabs[-1]
    # Keep the candidate-t scratch (S, T) within a conservative VMEM slice
    # for big sphere tables (T=4096-class shapes measurably spill).
    # idx_extract mode has NO (S, T) scratch: the tile width survives big
    # sphere tables untouched.
    S_padded = meta["S"]
    # Fused extraction (cfg.fe = sub-block rows): merge the one-hot
    # attribute dot into the sweep itself — no (S, T) scratch in ANY
    # shape. EE must be a 128-multiple (full-tile attr lane slices; see
    # tools/mosaic_repros for the partial-tile dot hazard) dividing SB.
    SB_eff = min(meta["SB"], S_padded)
    if fuse_extract is None:
        # auto-on (measured +25% on book-1, +35% at 3.6k spheres) unless
        # the caller explicitly asked for the idx winner-tracking mode
        fe = (128 if (meta["has_spheres"] and SB_eff % 128 == 0
                      and not idx_extract) else 0)
    else:
        fe = fuse_extract
        if fe and not (SB_eff % fe == 0 and fe % 128 == 0):
            fe = 0  # table too small / misaligned for full-tile slices
    if fe:
        idx_extract = False
    if T is None:
        # Measured auto (docs/PERF.md): fused extraction removed the
        # (S, T) scratch whose register pressure made wide tiles lose, so
        # dense single-cluster sweeps now peak at T=4096 (224.6 vs 221.0 M
        # seg/s on book-1); voted multi-cluster scenes and the scratch
        # path keep the T=2048 knee.
        T = 4096 if (fe and meta["C"] == 1) else 2048
    # idx_extract mode: pick the extraction block EB. The single-dot
    # one-hot costs an (S, T) VMEM intermediate; when that exceeds the
    # budget, block it at the largest 128-multiple divisor of S (so every
    # attr-table lane slice stays full-tile — partial-tile dot operands
    # are a measured miscompile, tools/mosaic_repros). If no aligned
    # divisor exists, clamp T like the scratch path below.
    eb = S_padded
    if idx_extract:
        if extract_block is not None:
            assert (S_padded % extract_block == 0
                    and extract_block % 128 == 0), (S_padded, extract_block)
            eb = extract_block
        elif S_padded * T * 4 > (8 << 20):
            eb = 0
            for cand in (512, 384, 256, 128):
                if S_padded % cand == 0:
                    eb = cand
                    break
            if not eb:
                eb = S_padded
                while T > 512 and S_padded * T * 4 > (8 << 20):
                    T //= 2
    while ((not idx_extract) and (not fe) and T > 512
           and S_padded * T * 4 > (8 << 20)):
        T //= 2
    T = max((T // 128) * 128, 512)  # lane slices must be 128-aligned
    if T % k:
        k = 1
    if cull is None:
        # Auto: votes lose when nearly every block survives anyway (the
        # book-1 scene measured 144 M seg/s dense vs 86-136 M culled);
        # multi-cluster scenes keep the running-best slab gate.
        cull = meta["C"] > 1
    if batch_votes is None:
        batch_votes = False  # interleaved votes measured faster (PERF.md)
    if dyn_cull is None:
        # Measured auto (docs/PERF.md round 4): the dynamic survivor-list
        # sweep beats interleaved per-cluster votes from mid cluster
        # counts up (+17% at C=15 and C=29, 2.1x at C=113) and loses ~5%
        # at C=4 where survival is 0.93 and votes barely kill anything.
        dyn_cull = meta["C"] >= 8 and not super_group
    if dyn_cull:
        # Dynamic survivor sweep needs fused extraction (no (S, T) scratch
        # to BIG-fill on a skip), the running-best merge (cull), and a
        # multi-cluster table; super-group unions would double-gate it.
        assert not super_group, "dyn_cull and super_group are exclusive"
        if not (fe and cull and meta["C"] > 1):
            dyn_cull = False
        else:
            batch_votes = False  # dyn computes its own batched votes
            # chunks stay: per-chunk survivor lists cut sweep work
            # (measured survival 0.186 -> 0.114 at NCH=4 on 14.4k spheres)
    if batch_votes:
        chunks = 1  # batched votes are whole-tile
    if not cull:
        chunks = 1  # chunks only subdivide votes
        batch_votes = False
        dyn_cull = False
    if dyn_order is None:
        # Measured auto (docs/PERF.md round 4): near-to-far survivor
        # ordering pays from mid cluster counts up where the re-vote
        # kill has far clusters to harvest.
        dyn_order = 16 if dyn_cull else 0
    if not dyn_cull:
        dyn_order = 0
    # every vote chunk must be a whole number of 128-lane registers
    chunks = max(1, min(chunks, T // 128))
    while chunks > 1 and (T % chunks or (T // chunks) % 128):
        chunks -= 1
    cfg = _Cfg(T=T, SB=meta["SB"], C=meta["C"], S=meta["S"], nx=nx, ny=ny,
               spp=spp // k, max_depth=max_depth, rr_depth=rr_depth,
               chunks=chunks, idx_extract=idx_extract, cull=cull, eb=eb,
               fe=fe, tape=tape, stub=tuple(phase_stub),
               batch_votes=batch_votes, dyn=dyn_cull, dord=dyn_order,
               sg=meta["sg"], Cg=meta["Cg"],
               # Measured auto (docs/PERF.md): amortizing the while-loop's
               # cross-lane any() + scalar branch over 16 bounce iterations
               # is worth +41% on cornell-class scenes at 8 (647 -> 912 M
               # seg/s r2) plus another +1-6% at 16 (cornell 933 -> 941,
               # smoke 1155 -> 1223, earth_rect 192 -> 195; 32 measured
               # 1232 smoke but -2% cornell) and nothing on
               # big-sphere-table scenes (the sweep dwarfs the check;
               # overshoot wastes more than the check costs). Tape mode
               # must stay exact (1 row/iter).
               unroll=((1 if tape or (meta["has_spheres"]
                                      and meta["S"] >= 256) else 16)
                       if unroll is None else unroll),
               n_iters=(spp // k) * max_depth if tape else 0,
               clus_moving=meta["clus_moving"],
               uniform_time=meta["uniform_time"], ut_t0=meta["ut_t0"],
               ut_idt=meta["ut_idt"],
               t_min=0.001, moving=meta["moving"], lens=meta["lens"],
               has_metal=meta["has_metal"],
               has_dielectric=meta["has_dielectric"],
               bg_gradient=meta["bg_gradient"],
               has_spheres=meta["has_spheres"],
               has_light=meta["has_light"],
               has_checker=meta["has_checker"],
               has_noise=meta["has_noise"],
               noise_modes=meta["noise_modes"],
               has_image=meta["has_image"], n_img=meta["n_img"],
               img_hw=meta["img_hw"], img_hp=meta["img_hp"],
               img_wp=meta["img_wp"], img_byte=meta["img_byte"],
               has_iso=meta["has_iso"],
               R=meta["R"], rect_axes=meta["rect_axes"],
               rect_rot=meta["rect_rot"], rect_trans=meta["rect_trans"],
               rect_tf=meta["rect_tf"],
               L=meta["L"], light_kinds=meta["light_kinds"],
               light_axes=meta["light_axes"], light_rot=meta["light_rot"],
               light_trans=meta["light_trans"],
               V=meta["V"], med_kinds=meta["med_kinds"],
               med_rot=meta["med_rot"], med_trans=meta["med_trans"])
    return tabs, cfg, T, k


def trace_mega(key, scene: st.Scene, nx: int, ny: int, spp: int,
               max_depth: int = 50, rr_depth: int | None = 4,
               T: int | None = None, SB: int | None = None,
               slots_per_pixel: int = 1,
               chunks: int = 1, idx_extract: bool = False,
               cull: bool | None = None, extract_block: int | None = None,
               fuse_extract: int | None = None,
               interpret: bool = False,
               return_stats: bool = False,
               phase_stub: tuple = (), unroll: int | None = None,
               batch_votes: bool | None = None, super_group: int = 0,
               dyn_cull: bool | None = None,
               dyn_order: int | None = None,
               coherent: bool | None = None):
    """Render via the megakernel. Returns ((ny, nx, 3) radiance sums,
    segment count). Host-side prep is eager (concrete scene required).

    T = lanes per tile; SB = sphere cluster size (None = measured auto:
    one dense vote-free cluster up to 512 live spheres, SB=256 Morton
    clusters with the running-best slab gate beyond — docs/PERF.md);
    slots_per_pixel = k sample-parallel lanes per pixel, each tracing
    spp/k samples.

    Lanes that reach their spp before their tile drains keep tracing extra
    samples of their own pixel (overdraw load balancing — was 30% idle
    lane-cycles); the returned sums are renormalized to spp-equivalent by
    the actual per-pixel counts, so callers divide by spp as usual."""
    if unroll is None and interpret:
        # auto-unroll exists to amortize the REAL chip's while-condition
        # cost; the interpreter executes every unrolled overshoot
        # iteration, making CPU tests up to 8x slower for nothing
        unroll = 1
    tabs, cfg, T, k = make_plan(scene, nx, ny, spp, max_depth=max_depth,
                                rr_depth=rr_depth, T=T, SB=SB,
                                slots_per_pixel=slots_per_pixel,
                                chunks=chunks, idx_extract=idx_extract,
                                cull=cull, extract_block=extract_block,
                                fuse_extract=fuse_extract,
                                phase_stub=phase_stub, unroll=unroll,
                                batch_votes=batch_votes,
                                super_group=super_group, dyn_cull=dyn_cull,
                                dyn_order=dyn_order)
    (sph_tab, attr_tab, clus_tab, rect_tab, light_tab, med_tab, img_tab,
     cam_vec, meta) = tabs
    if coherent is None:
        # Auto-OFF: the on-chip A/B (docs/coherence_sweep_r05.jsonl)
        # measured binning survival-neutral at whole-tile vote width
        # (0.375->0.376 at 3.6k, 0.1191->0.1195 at 14.4k — block-linear
        # tiles are already as coherent as a 2048-lane union can be), so
        # the default skips the ~1 s plan-time binning. Explicit
        # coherent=True remains for narrower-chunk experiments; when
        # A/B-ing culling variants, pass the SAME value to both so the
        # slot->pixel map (hence per-lane RNG streams) stays identical
        # and radiance stays bitwise-comparable.
        coherent = False
    if coherent and meta["C"] > 1:
        pixf, inv = _coherent_pixel_layout(scene, meta, nx, ny, T, k)
    else:
        pixf, inv = _pixel_layout(nx, ny, T, k)
    n_tiles = pixf.shape[0]
    seed = jax.random.randint(key, (1, 1), 0, np.int32(2 ** 31 - 1),
                              dtype=jnp.int32)
    out = _mega_call(pixf, cam_vec, sph_tab, attr_tab, clus_tab, rect_tab,
                     light_tab, med_tab, jnp.asarray(_PERM_B),
                     jnp.asarray(_RV_HI), jnp.asarray(_RV_LO), img_tab,
                     seed, cfg=cfg, n_tiles=n_tiles, interpret=interpret)
    Tp = T // k
    sums = (out[:, 0:3, :].transpose(0, 2, 1)
            .reshape(n_tiles, k, Tp, 3).sum(axis=1))        # (n_tiles,Tp,3)
    # Pooled overdraw estimator: lanes oversample their pixel while the
    # tile drains (see _kernel), so each pixel's actual sample count is the
    # slot-summed R_DONE; rescale to exactly-spp-equivalent sums so callers
    # keep dividing by spp.
    dones = out[:, 5, :].reshape(n_tiles, k, Tp).sum(axis=1)
    scale = spp / jnp.maximum(dones, 1.0)
    blocked = (sums * scale[..., None]).reshape(n_tiles * Tp, 3)
    image = blocked[jnp.asarray(inv)].reshape(ny, nx, 3)
    segments = jnp.sum(out[:, 3, :])
    if return_stats:
        # lane-cycles actually spent: every lane of a tile runs until the
        # tile's slowest lane finishes, so utilization = segments / sum of
        # per-lane loop iterations — the megakernel's load-balance metric.
        # blocks = lane-block increments (a lane gains 1 per executed
        # (cluster, chunk) block covering it, max C per iteration), so
        # blocks / (lane_iters * C) is the cull-survival rate.
        lane_iters = jnp.sum(out[:, 4, :])
        blocks = jnp.sum(out[:, 6, :])
        return image, segments, lane_iters, blocks
    return image, segments
