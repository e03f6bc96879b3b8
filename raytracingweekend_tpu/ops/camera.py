"""Vectorized thin-lens camera (reference: camera.h:7-74).

make_camera precomputes the look-at frame exactly as the reference
constructor; get_rays generates a whole wavefront of primary rays from one
key — defocus-disk offsets, shutter-time samples, and *normalized* directions
(camera.h:48-49, a reference quirk SURVEY.md §7 flags as required for
pixel parity).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.scene_types import Camera
from . import linalg, sampling


def make_camera(lookfrom, lookat, vup, vfov, aspect, aperture, focus_dist,
                t0=0.0, t1=1.0, dtype=jnp.float32) -> Camera:
    """Mirror of camera.h:13-34. vfov is the full vertical fov in degrees;
    aperture is the lens *diameter* (camera.h:18-19)."""
    lookfrom = jnp.asarray(lookfrom, dtype)
    lookat = jnp.asarray(lookat, dtype)
    vup = jnp.asarray(vup, dtype)
    theta = vfov * math.pi / 180.0
    half_height = math.tan(theta / 2.0)
    half_width = aspect * half_height
    w = linalg.normalize(lookfrom - lookat)
    u = linalg.normalize(linalg.cross(vup, w))
    v = linalg.cross(w, u)
    lower_left = (lookfrom - half_width * focus_dist * u
                  - half_height * focus_dist * v - focus_dist * w)
    return Camera(
        origin=lookfrom,
        lower_left_corner=lower_left,
        horizontal=2.0 * half_width * focus_dist * u,
        vertical=2.0 * half_height * focus_dist * v,
        u=u, v=v, w=w,
        lens_radius=jnp.asarray(aperture / 2.0, dtype),
        time0=jnp.asarray(t0, dtype),
        time1=jnp.asarray(t1, dtype),
    )


def get_rays(key, cam: Camera, s, t):
    """camera::get_ray (camera.h:36-50) for pixel params s, t of shape (N,).

    Returns (origin (N,3), direction (N,3) normalized, time (N,)).
    """
    kd, kt = jax.random.split(key)
    shape = s.shape
    rd = cam.lens_radius * sampling.random_in_unit_disk(kd, shape)
    offset = cam.u[None, :] * rd[..., 0:1] + cam.v[None, :] * rd[..., 1:2]
    time = cam.time0 + sampling.uniform(kt, shape) * (cam.time1 - cam.time0)
    direction = (cam.lower_left_corner[None, :]
                 + s[..., None] * cam.horizontal[None, :]
                 + t[..., None] * cam.vertical[None, :]
                 - cam.origin[None, :] - offset)
    origin = cam.origin[None, :] + offset
    return origin, linalg.normalize(direction), time
