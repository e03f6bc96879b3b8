"""Wavefront path-tracing integrator.

TPU-native reformulation of the recursive color() integrator
(reference: RayTracingWeekend.cpp:45-160). The depth-100 recursion becomes an
iterative bounce loop over a wavefront of N rays carrying
(origin, direction, throughput, radiance, active):

    radiance += throughput * emitted(vertex)
    throughput *= attenuation * scattering_pdf / pdf_val   (pdf materials)
    throughput *= attenuation                              (specular)

which telescopes to exactly the reference's
``emitted + atten * s_pdf * color(next) / pdf_val`` recursion.

Two loop modes:
- "while": lax.while_loop that stops as soon as every ray has terminated —
  the fast path for forward rendering (most rays die in a few bounces);
- "scan": fixed-depth lax.scan — reverse-mode differentiable, used by the
  inverse-rendering path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models import scene_types as st
from . import linalg, materials, sampling
from .geometry import closest_hit

_WHITE = (1.0, 1.0, 1.0)
_BLUE = (0.5, 0.7, 1.0)


def _background(d, scene: st.Scene):
    """Miss shading (RayTracingWeekend.cpp:143-158)."""
    if scene.background == st.BG_BLACK:
        return jnp.zeros(d.shape, d.dtype)
    unit = linalg.normalize(d)
    t = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.array(_WHITE, d.dtype)
    blue = jnp.array(_BLUE, d.dtype)
    # lerp(blue, white, t) with the reference's swapped-arg lerp
    # (vec3.h:84-87): (1-t)*white + t*blue.
    return (1.0 - t)[..., None] * white + t[..., None] * blue


def _bounce(scene: st.Scene, base_key, bounce, o, d, time, tp, radiance,
            active):
    """One wavefront bounce == one level of the color() recursion."""
    kb = jax.random.fold_in(base_key, bounce)
    k_med, k_shade = jax.random.split(kb)

    hit = closest_hit(k_med, o, d, time, scene)
    live = active & hit.hit
    miss = active & ~hit.hit

    bg = _background(d, scene)
    radiance = radiance + jnp.where(miss[:, None], tp * bg, 0.0)

    if scene.render_type == st.RENDER_NORMAL:
        # RenderType::Normal (cpp:135-136): shade 0.5*(normal+1), one bounce.
        radiance = radiance + jnp.where(live[:, None],
                                        0.5 * (hit.normal + 1.0), 0.0)
        active = jnp.zeros_like(active)
        return o, d, tp, radiance, active

    sr = materials.shade(k_shade, d, hit, scene)
    radiance = radiance + jnp.where(live[:, None], tp * sr.emitted, 0.0)
    tp = jnp.where(live[:, None], tp * sr.weight, tp)
    # Terminating on an all-zero throughput is an optimization the reference
    # lacks (it keeps recursing); the contribution is identically zero.
    alive = live & sr.scatter & jnp.any(tp > 0.0, axis=-1)
    o = jnp.where(alive[:, None], hit.p, o)
    d = jnp.where(alive[:, None], sr.direction, d)
    return o, d, tp, radiance, alive


@partial(jax.jit, static_argnames=("max_depth", "mode"))
def trace(key, o, d, time, scene: st.Scene, max_depth: int = 100,
          mode: str = "while"):
    """Integrate radiance for N rays. Returns (N, 3).

    Depth semantics match cpp:42,47-48: at most `max_depth` scatter events,
    then the tail contributes 0.
    """
    N = o.shape[0]
    tp = jnp.ones((N, 3), o.dtype)
    radiance = jnp.zeros((N, 3), o.dtype)
    active = jnp.ones((N,), bool)

    if mode == "while":
        def cond(state):
            bounce, *_, act = state
            return (bounce < max_depth) & jnp.any(act)

        def body(state):
            bounce, oo, dd, tt, rad, act = state
            oo, dd, tt, rad, act = _bounce(scene, key, bounce, oo, dd, time,
                                           tt, rad, act)
            return bounce + 1, oo, dd, tt, rad, act

        state = (jnp.asarray(0), o, d, tp, radiance, active)
        state = jax.lax.while_loop(cond, body, state)
        return state[4]

    # "scan": fixed trip count, reverse-differentiable.
    def body(carry, bounce):
        oo, dd, tt, rad, act = carry
        oo, dd, tt, rad, act = _bounce(scene, key, bounce, oo, dd, time, tt,
                                       rad, act)
        return (oo, dd, tt, rad, act), None

    (oo, dd, tt, radiance, act), _ = jax.lax.scan(
        body, (o, d, tp, radiance, active), jnp.arange(max_depth))
    return radiance


def trace_regenerative(key, scene: st.Scene, nx: int, ny: int, spp: int,
                       max_depth: int = 100, n_slots: int = 1 << 19):
    """Path-regenerative wavefront integrator: the production forward path.

    The lockstep `trace` loop runs until the LAST path dies, so with a mean
    path length of ~5 and a few depth-50 glass paths, slot utilization decays
    to ~10% — 10x wasted vector work. Here each of `n_slots` persistent slots
    immediately pulls the next (pixel, sample) from a global counter when its
    path terminates (the wavefront formulation of Laine et al. 2013, built
    from lax.while_loop + masked scatter-adds instead of GPU queues), so
    utilization stays ~100% until the tail of the whole frame.

    Sampling matches main()'s jittered box filter (cpp:227-228): ray k of
    nx*ny*spp covers pixel k % n_pix at sample k // n_pix. RNG is keyed per
    (slot, iteration), which is a different — equally valid — stream than
    `trace`'s per-(ray, bounce) keys; images agree statistically, not
    bitwise.

    Returns (radiance sum image (ny, nx, 3), segment count ()).
    """
    from . import camera as camera_mod

    n_pix = nx * ny
    total = n_pix * spp
    n_slots = min(n_slots, total)

    def fresh_rays(k, ray_id, live):
        """Generate camera rays for global ray ids (slot-shaped)."""
        pix = ray_id % n_pix
        i = (pix % nx).astype(jnp.float32)
        j = (pix // nx).astype(jnp.float32)
        k_u, k_v, k_cam = jax.random.split(k, 3)
        u = (i + sampling.uniform(k_u, ray_id.shape)) / nx
        v = (j + sampling.uniform(k_v, ray_id.shape)) / ny
        o, d, t = camera_mod.get_rays(k_cam, scene.camera, u, v)
        pix = jnp.where(live, pix, n_pix)  # dummy accumulator row
        return pix.astype(jnp.int32), o, d, t

    k_init, k_loop = jax.random.split(key)
    ray0 = jnp.arange(n_slots, dtype=jnp.int32)
    pix, o, d, time = fresh_rays(k_init, ray0, ray0 < total)

    image = jnp.zeros((n_pix + 1, 3), jnp.float32)  # +1 dummy row
    tp = jnp.ones((n_slots, 3), jnp.float32)
    depth = jnp.zeros((n_slots,), jnp.int32)
    rad = jnp.zeros((n_slots, 3), jnp.float32)
    next_ray = jnp.asarray(n_slots, jnp.int32)
    segments = jnp.zeros((), jnp.float32)
    it0 = jnp.asarray(0, jnp.int32)

    def cond(state):
        (it, pix, *_rest) = state
        return jnp.any(pix < n_pix)

    def body(state):
        (it, pix, o, d, time, tp, depth, rad, image, next_ray, segments) = \
            state
        active = pix < n_pix
        segments = segments + jnp.sum(active.astype(jnp.float32))
        kb = jax.random.fold_in(k_loop, it)
        o2, d2, tp2, rad2, alive = _bounce(scene, kb, 0, o, d, time, tp, rad,
                                           active)
        depth = depth + 1
        alive = alive & (depth < max_depth)

        finished = active & ~alive
        # deposit finished paths (masked scatter-add; misses hit dummy row)
        dep_pix = jnp.where(finished, pix, n_pix)
        image = image.at[dep_pix].add(jnp.where(finished[:, None], rad2, 0.0))

        # regenerate: finished slots pull the next global ray ids
        rank = jnp.cumsum(finished.astype(jnp.int32)) - 1
        new_id = next_ray + rank
        take = finished & (new_id < total)
        next_ray = next_ray + jnp.sum(finished.astype(jnp.int32))

        kg = jax.random.fold_in(kb, 1)
        pix_n, o_n, d_n, t_n = fresh_rays(kg, jnp.where(take, new_id, 0),
                                          take)
        pix = jnp.where(alive, pix, jnp.where(take, pix_n, n_pix))
        o = jnp.where(alive[:, None], o2, o_n)
        d = jnp.where(alive[:, None], d2, d_n)
        time = jnp.where(alive, time, t_n)
        tp = jnp.where(alive[:, None], tp2, 1.0)
        rad = jnp.where(alive[:, None], rad2, 0.0)
        depth = jnp.where(alive, depth, 0)
        return (it + 1, pix, o, d, time, tp, depth, rad, image, next_ray,
                segments)

    state = (it0, pix, o, d, time, tp, depth, rad, image, next_ray, segments)
    state = jax.lax.while_loop(cond, body, state)
    image, segments = state[8], state[10]
    return image[:n_pix].reshape(ny, nx, 3), segments


def trace_with_stats(key, o, d, time, scene: st.Scene, max_depth: int = 100):
    """Like trace(mode="while") but also returns the total number of ray
    segments cast (sum over bounces of active rays) — the benchmark metric."""
    N = o.shape[0]

    def cond(state):
        bounce, *_, act, _count = state
        return (bounce < max_depth) & jnp.any(act)

    def body(state):
        bounce, oo, dd, tt, rad, act, count = state
        count = count + jnp.sum(act.astype(jnp.float32))
        oo, dd, tt, rad, act = _bounce(scene, key, bounce, oo, dd, time, tt,
                                       rad, act)
        return bounce + 1, oo, dd, tt, rad, act, count

    tp = jnp.ones((N, 3), o.dtype)
    radiance = jnp.zeros((N, 3), o.dtype)
    active = jnp.ones((N,), bool)
    state = (jnp.asarray(0), o, d, tp, radiance, active,
             jnp.zeros((), jnp.float32))
    state = jax.lax.while_loop(cond, body, state)
    return state[4], state[6]
