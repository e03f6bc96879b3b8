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
from . import linalg, materials
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
