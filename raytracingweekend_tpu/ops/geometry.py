"""Wavefront closest-hit intersection over flat SoA primitive tables.

TPU-native replacement for the reference's virtual-dispatch linear scan
(reference: hittable_list.h:11-37 and the per-class hit() methods in
sphere.h:46-81, hittable.h:149-267,299-404,430-479). Instead of one ray
chasing pointers through an object graph, a whole wavefront of N rays is
intersected against each primitive table at once:

- spheres: a lax.scan over fixed-size sphere blocks with a running
  (best_t, best_idx) carry, so peak memory is O(N x block) regardless of
  scene size and the quadratic-setup arithmetic maps onto fused VPU/MXU ops;
- rects: a dense (N x R) test with the translate/rotate_y instancing baked
  into per-rect ray transforms (the reference's move-the-ray trick,
  hittable.h:294, vectorized);
- constant media: analytic convex entry/exit plus the stochastic scatter
  distance of hittable.h:463-474, expressed order-independently (see
  `hit_media`) so the result no longer depends on scan order like the
  reference's closest-so-far recursion did.

The reference's duplicated scan loop (hittable_list.h:16-34, 2x cost for the
same answer) and broken bvh_node (hittable.h:45-129, never instantiated) are
deliberately not reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..models import scene_types as st
from . import linalg, sampling

# Large finite sentinel: plays the role of std::numeric_limits<double>::max()
# at RayTracingWeekend.cpp:52 while staying float32-safe in arithmetic.
BIG = jnp.float32(3.0e37)

T_MIN = 0.001  # hit interval lower bound (RayTracingWeekend.cpp:52)

KIND_NONE = -1
KIND_SPHERE = 0
KIND_RECT = 1
KIND_MEDIUM = 2


@struct.dataclass
class Hit:
    """Wavefront hit_record (hittable.h:16-29), SoA over N rays."""
    hit: jnp.ndarray      # (N,) bool
    t: jnp.ndarray        # (N,)
    p: jnp.ndarray        # (N, 3)
    normal: jnp.ndarray   # (N, 3)
    u: jnp.ndarray        # (N,)
    v: jnp.ndarray        # (N,)
    mat: jnp.ndarray      # (N,) int32


def _moving_center(spheres: st.Spheres, time, idx=None):
    """Sphere center at ray time (sphere.h:48 via movement_linear at
    sphere.h:22-25). `time` broadcasts against the selected sphere rows."""
    if idx is None:
        c0, c1 = spheres.center0, spheres.center1
        t0, t1 = spheres.time0, spheres.time1
    else:
        c0, c1 = spheres.center0[idx], spheres.center1[idx]
        t0, t1 = spheres.time0[idx], spheres.time1[idx]
    fac = (time - t0) / (t1 - t0)
    return c0 + fac[..., None] * (c1 - c0)


def _sphere_candidate_t(o, d, time, t_min, spheres: st.Spheres, moving: bool):
    """Per-(ray, sphere) candidate hit t, or BIG.

    Implements the near-root-else-far-root rule of sphere.h:46-81. The
    closest-so-far upper bound is applied by the caller's global min, which
    is equivalent because far > near always.
    """
    if moving:
        c = _moving_center(spheres, time[:, None])          # (N, S, 3)
        oc = o[:, None, :] - c                              # (N, S, 3)
    else:
        oc = o[:, None, :] - spheres.center0[None, :, :]    # (N, S, 3)
    a = linalg.dot(d, d)[:, None]                           # (N, 1)
    b = jnp.sum(oc * d[:, None, :], axis=-1)                # (N, S)
    cc = jnp.sum(oc * oc, axis=-1) - (spheres.radius**2)[None, :]
    disc = b * b - a * cc
    sq = linalg.safe_sqrt(disc)
    t_near = (-b - sq) / a
    t_far = (-b + sq) / a
    t_cand = jnp.where(t_near > t_min, t_near, t_far)
    valid = (disc > 0) & (t_cand > t_min) & spheres.active[None, :]
    return jnp.where(valid, t_cand, BIG)


def hit_spheres(o, d, time, t_min, spheres: st.Spheres, moving: bool,
                block: int = 256):
    """Closest sphere hit: (best_t (N,), best_idx (N,) int32).

    Scans the sphere table in fixed-size blocks so peak memory is
    O(N x block) — the wavefront analogue of the reference's O(1)-memory
    linear scan, without its serialization.
    """
    S = spheres.count()
    N = o.shape[0]
    if S == 0:
        return jnp.full((N,), BIG), jnp.full((N,), -1, jnp.int32)
    if S <= block:
        t_cand = _sphere_candidate_t(o, d, time, t_min, spheres, moving)
        best_idx = jnp.argmin(t_cand, axis=-1).astype(jnp.int32)
        best_t = jnp.take_along_axis(t_cand, best_idx[:, None], axis=-1)[:, 0]
        return best_t, best_idx

    assert S % block == 0, "builder pads sphere table to a block multiple"
    nblk = S // block

    def reshape(x):
        return x.reshape((nblk, block) + x.shape[1:])

    xs = st.Spheres(
        center0=reshape(spheres.center0), center1=reshape(spheres.center1),
        time0=reshape(spheres.time0), time1=reshape(spheres.time1),
        radius=reshape(spheres.radius), mat=reshape(spheres.mat),
        active=reshape(spheres.active))

    def body(carry, blk):
        best_t, best_i = carry
        sph_blk, base = blk
        t_cand = _sphere_candidate_t(o, d, time, t_min, sph_blk, moving)
        bi = jnp.argmin(t_cand, axis=-1).astype(jnp.int32)
        bt = jnp.take_along_axis(t_cand, bi[:, None], axis=-1)[:, 0]
        better = bt < best_t
        return (jnp.where(better, bt, best_t),
                jnp.where(better, base + bi, best_i)), None

    init = (jnp.full((N,), BIG), jnp.full((N,), -1, jnp.int32))
    bases = jnp.arange(nblk, dtype=jnp.int32) * block
    (best_t, best_i), _ = jax.lax.scan(body, init, (xs, bases))
    return best_t, best_i


def _rect_object_space_ray(o, d, rects: st.Rects, transforms: bool):
    """Move each ray into every rect's object space: translate by -offset
    (hittable.h:299-301) then rotate by the rotate_y frame
    (hittable.h:373-382). Returns (o_rot, d_rot), each (N, R, 3)."""
    if not transforms:
        o_rot = jnp.broadcast_to(o[:, None, :], (o.shape[0], rects.count(), 3))
        d_rot = jnp.broadcast_to(d[:, None, :], o_rot.shape)
        return o_rot, d_rot
    osh = o[:, None, :] - rects.offset[None, :, :]          # (N, R, 3)
    c, s = rects.cos_t[None, :], rects.sin_t[None, :]
    ox = c * osh[..., 0] - s * osh[..., 2]
    oz = s * osh[..., 0] + c * osh[..., 2]
    dx = c * d[:, None, 0] - s * d[:, None, 2]
    dz = s * d[:, None, 0] + c * d[:, None, 2]
    o_rot = jnp.stack([ox, osh[..., 1], oz], axis=-1)
    d_rot = jnp.stack([dx, jnp.broadcast_to(d[:, None, 1], dx.shape), dz],
                      axis=-1)
    return o_rot, d_rot


def _rect_axes(rects: st.Rects):
    """Component indices (a, b, n) per rect from the axis code:
    xy -> (0,1,2), xz -> (0,2,1), yz -> (1,2,0) (hittable.h:142-267)."""
    axis = rects.axis
    ia = jnp.where(axis == st.RECT_YZ, 1, 0)
    ib = jnp.where(axis == st.RECT_XY, 1, 2)
    inrm = jnp.where(axis == st.RECT_XY, 2, jnp.where(axis == st.RECT_XZ, 1, 0))
    return ia, ib, inrm


def _pick(v, idx):
    """Select component `idx` (N- or R-shaped int) from trailing xyz axis."""
    return jnp.take_along_axis(v, idx[..., None], axis=-1)[..., 0]


def hit_rects(o, d, t_min, rects: st.Rects, transforms: bool):
    """Closest axis-rect hit: (best_t (N,), best_idx (N,) int32).

    R is small in every reference scene (<= 16), so a dense (N x R) test is
    both simplest and fastest on the VPU.
    """
    N = o.shape[0]
    R = rects.count()
    if R == 0:
        return jnp.full((N,), BIG), jnp.full((N,), -1, jnp.int32)
    o_rot, d_rot = _rect_object_space_ray(o, d, rects, transforms)
    ia, ib, inrm = _rect_axes(rects)
    ia = jnp.broadcast_to(ia[None, :], (N, R))
    ib = jnp.broadcast_to(ib[None, :], (N, R))
    inrm = jnp.broadcast_to(inrm[None, :], (N, R))
    o_n = _pick(o_rot, inrm)
    d_n = _pick(d_rot, inrm)
    t = (rects.k[None, :] - o_n) / d_n                      # (N, R)
    pa = _pick(o_rot, ia) + t * _pick(d_rot, ia)
    pb = _pick(o_rot, ib) + t * _pick(d_rot, ib)
    valid = (
        (t > t_min)
        & (pa >= rects.a0[None, :]) & (pa <= rects.a1[None, :])
        & (pb >= rects.b0[None, :]) & (pb <= rects.b1[None, :])
        & rects.active[None, :]
    )
    t_cand = jnp.where(valid, t, BIG)
    best_idx = jnp.argmin(t_cand, axis=-1).astype(jnp.int32)
    best_t = jnp.take_along_axis(t_cand, best_idx[:, None], axis=-1)[:, 0]
    return best_t, best_idx


def _medium_object_space_ray(o, d, media: st.Media):
    osh = o[:, None, :] - media.offset[None, :, :]
    c, s = media.cos_t[None, :], media.sin_t[None, :]
    ox = c * osh[..., 0] - s * osh[..., 2]
    oz = s * osh[..., 0] + c * osh[..., 2]
    dx = c * d[:, None, 0] - s * d[:, None, 2]
    dz = s * d[:, None, 0] + c * d[:, None, 2]
    o_rot = jnp.stack([ox, osh[..., 1], oz], axis=-1)
    d_rot = jnp.stack([dx, jnp.broadcast_to(d[:, None, 1], dx.shape), dz],
                      axis=-1)
    return o_rot, d_rot


def _boundary_entry_exit(o_rot, d_rot, media: st.Media):
    """Entry/exit params of each convex boundary over (-inf, inf), matching
    the two-pass boundary probing at hittable.h:438-449. Returns
    (entry (N,V), exit (N,V), hit (N,V))."""
    # Sphere boundary: quadratic roots.
    oc = o_rot - media.p0[None, :, :]
    a = jnp.sum(d_rot * d_rot, axis=-1)
    b = jnp.sum(oc * d_rot, axis=-1)
    r = media.p1[None, :, 0]
    cc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = b * b - a * cc
    sq = linalg.safe_sqrt(disc)
    s_entry = (-b - sq) / a
    s_exit = (-b + sq) / a
    s_hit = disc > 0
    # Box boundary: slab method (aabb.h:17-47 generalized to signed range).
    inv = 1.0 / d_rot
    tt0 = (media.p0[None, :, :] - o_rot) * inv
    tt1 = (media.p1[None, :, :] - o_rot) * inv
    tlo = jnp.max(jnp.minimum(tt0, tt1), axis=-1)
    thi = jnp.min(jnp.maximum(tt0, tt1), axis=-1)
    b_hit = thi > tlo
    is_sphere = (media.kind[None, :] == st.MEDIUM_SPHERE)
    entry = jnp.where(is_sphere, s_entry, tlo)
    exit_ = jnp.where(is_sphere, s_exit, thi)
    hit = jnp.where(is_sphere, s_hit, b_hit)
    return entry, exit_, hit


def hit_media(key, o, d, t_min, media: st.Media):
    """Stochastic constant-medium candidate hit (hittable.h:430-479).

    The scatter point lies at entry + (-1/rho)*ln(U)/|d| along the ray and is
    valid only if it falls before the boundary exit; competition with other
    geometry happens through the caller's global min, which is exactly
    equivalent to the reference's closest-so-far clamping of rec2.t (see
    SURVEY.md §2.1 #10) but independent of primitive order.
    """
    N = o.shape[0]
    V = media.count()
    if V == 0:
        return jnp.full((N,), BIG), jnp.full((N,), -1, jnp.int32)
    o_rot, d_rot = _medium_object_space_ray(o, d, media)
    entry, exit_, bhit = _boundary_entry_exit(o_rot, d_rot, media)
    entry = jnp.maximum(entry, t_min)   # rec1.t clamps (hittable.h:452-461)
    dlen = jnp.sqrt(jnp.sum(d * d, axis=-1))[:, None]       # (N, 1)
    u = sampling.uniform(key, (N, V))
    # Guard log(0); uniform() is in [0,1).
    hit_distance = -(1.0 / media.density[None, :]) * jnp.log(
        jnp.maximum(u, 1e-38))
    t_cand = entry + hit_distance / dlen
    valid = bhit & (entry < exit_) & (t_cand < exit_) & media.active[None, :]
    t_cand = jnp.where(valid, t_cand, BIG)
    best_idx = jnp.argmin(t_cand, axis=-1).astype(jnp.int32)
    best_t = jnp.take_along_axis(t_cand, best_idx[:, None], axis=-1)[:, 0]
    return best_t, best_idx


def closest_hit(key, o, d, time, scene: st.Scene, t_min=T_MIN) -> Hit:
    """Full-scene closest hit for a wavefront of N rays.

    Returns a Hit with surface attributes (p, normal, u, v, mat) resolved
    from the winning primitive, replicating hit_record fill-in of the
    per-class hit() methods.
    """
    N = o.shape[0]
    st_t, st_i = hit_spheres(o, d, time, t_min, scene.spheres,
                             scene.has_moving_spheres)
    rc_t, rc_i = hit_rects(o, d, t_min, scene.rects, scene.has_rect_transforms)
    if scene.has_media:
        md_t, md_i = hit_media(key, o, d, t_min, scene.media)
    else:
        md_t = jnp.full((N,), BIG)
        md_i = jnp.full((N,), -1, jnp.int32)

    ts = jnp.stack([st_t, rc_t, md_t], axis=-1)              # (N, 3)
    kind = jnp.argmin(ts, axis=-1).astype(jnp.int32)
    best_t = jnp.take_along_axis(ts, kind[:, None], axis=-1)[:, 0]
    hit = best_t < BIG
    kind = jnp.where(hit, kind, KIND_NONE)

    idx = jnp.where(kind == KIND_SPHERE, st_i,
                    jnp.where(kind == KIND_RECT, rc_i, md_i))
    idx = jnp.maximum(idx, 0)  # safe gather index for misses

    p_world = o + best_t[:, None] * d

    # --- sphere attribute resolution (sphere.h:56-77,115-122) ---
    sph = scene.spheres
    s_idx = jnp.where(kind == KIND_SPHERE, idx, 0)
    if scene.has_moving_spheres:
        c = _moving_center(sph, time, s_idx)
    else:
        c = sph.center0[s_idx]
    s_r = sph.radius[s_idx]
    s_normal = (p_world - c) / s_r[:, None]  # negative radius flips inward
    s_u, s_v = sampling.get_sphere_uv(s_normal)
    s_mat = sph.mat[s_idx]

    # --- rect attribute resolution (hittable.h:149-267 + transforms) ---
    rects = scene.rects
    r_idx = jnp.where(kind == KIND_RECT, idx, 0)
    r_off = rects.offset[r_idx]
    r_cos = rects.cos_t[r_idx]
    r_sin = rects.sin_t[r_idx]
    if scene.has_rect_transforms:
        osh = o - r_off
        o_obj = jnp.stack([
            r_cos * osh[:, 0] - r_sin * osh[:, 2],
            osh[:, 1],
            r_sin * osh[:, 0] + r_cos * osh[:, 2]], axis=-1)
        d_obj = jnp.stack([
            r_cos * d[:, 0] - r_sin * d[:, 2],
            d[:, 1],
            r_sin * d[:, 0] + r_cos * d[:, 2]], axis=-1)
    else:
        o_obj, d_obj = o, d
    p_obj = o_obj + best_t[:, None] * d_obj
    ia, ib, inrm = _rect_axes(rects)
    ia, ib, inrm = ia[r_idx], ib[r_idx], inrm[r_idx]
    pa = _pick(p_obj, ia)
    pb = _pick(p_obj, ib)
    r_u = (pa - rects.a0[r_idx]) / (rects.a1[r_idx] - rects.a0[r_idx])
    r_v = (pb - rects.b0[r_idx]) / (rects.b1[r_idx] - rects.b0[r_idx])
    n_obj = (jax.nn.one_hot(inrm, 3, dtype=o.dtype)
             * rects.flip[r_idx][:, None])
    if scene.has_rect_transforms:
        r_normal = jnp.stack([
            r_cos * n_obj[:, 0] + r_sin * n_obj[:, 2],
            n_obj[:, 1],
            -r_sin * n_obj[:, 0] + r_cos * n_obj[:, 2]], axis=-1)
        rp = jnp.stack([
            r_cos * p_obj[:, 0] + r_sin * p_obj[:, 2],
            p_obj[:, 1],
            -r_sin * p_obj[:, 0] + r_cos * p_obj[:, 2]], axis=-1)
        r_p = rp + r_off
    else:
        r_normal = n_obj
        r_p = p_obj
    r_mat = rects.mat[r_idx]

    # --- medium attribute resolution (hittable.h:469-473) ---
    m_idx = jnp.where(kind == KIND_MEDIUM, idx, 0)
    if scene.has_media:
        m_mat = scene.media.mat[m_idx]
    else:
        m_mat = jnp.zeros((N,), jnp.int32)
    m_normal = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], dtype=o.dtype), (N, 3))

    is_s = (kind == KIND_SPHERE)[:, None]
    is_r = (kind == KIND_RECT)[:, None]
    p = jnp.where(is_s, p_world, jnp.where(is_r, r_p, p_world))
    normal = jnp.where(is_s, s_normal, jnp.where(is_r, r_normal, m_normal))
    uu = jnp.where(is_s[:, 0], s_u, jnp.where(is_r[:, 0], r_u, 0.0))
    vv = jnp.where(is_s[:, 0], s_v, jnp.where(is_r[:, 0], r_v, 0.0))
    mat = jnp.where(is_s[:, 0], s_mat, jnp.where(is_r[:, 0], r_mat, m_mat))
    mat = jnp.where(hit, mat, 0)

    return Hit(hit=hit, t=best_t, p=p, normal=normal, u=uu, v=vv, mat=mat)


def hit_aabb(o, d, box_min, box_max, t_min, t_max):
    """Slab-method AABB test (aabb.h:17-47), batched. Returns (N,) bool.

    Kept for the BVH-culling path and to preserve the reference's unit-test
    surface (CppTest/unittest1.cpp:69-110).
    """
    inv = 1.0 / d
    t0 = (box_min - o) * inv
    t1 = (box_max - o) * inv
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    tmin = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    tmax = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return tmax > tmin


def surrounding_box(min0, max0, min1, max1):
    """AABB union (aabb.h:49-62)."""
    return jnp.minimum(min0, min1), jnp.maximum(max0, max1)
