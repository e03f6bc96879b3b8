"""Compositional instancing (VERDICT r1 weak #8): the reference's
translate / rotate_y / flip_normals wrappers apply to ANY hittable and nest
(hittable.h:269-416); here the wrapper algebra is the Transform dataclass,
whose closure under composition bakes any chain into one column set."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracingweekend_tpu.models import scene_types as st
from raytracingweekend_tpu.models.builder import SceneBuilder, Transform
from raytracingweekend_tpu.ops.geometry import closest_hit

KEY = jax.random.key(0)


def test_transform_composition_algebra():
    a = Transform.rotate_y(20) @ Transform.rotate_y(25)
    b = Transform.rotate_y(45)
    assert abs(a.cos_t - b.cos_t) < 1e-12 and abs(a.sin_t - b.sin_t) < 1e-12

    # outer translate after rotate: T(R(x))
    tr = Transform.translate((1, 2, 3)) @ Transform.rotate_y(90)
    x = tr.apply((1.0, 0.0, 0.0))
    np.testing.assert_allclose(x, (1.0, 2.0, 2.0), atol=1e-6)  # R90(1,0,0)=(0,0,-1)

    # rotation after translation rotates the offset too
    tr2 = Transform.rotate_y(90) @ Transform.translate((1, 0, 0))
    np.testing.assert_allclose(tr2.apply((0.0, 0.0, 0.0)), (0.0, 0.0, -1.0),
                               atol=1e-6)


def _hit_one(scene, o, d):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    return closest_hit(KEY, o, d, t, scene)


def test_rotated_translated_sphere_matches_analytic():
    b = SceneBuilder()
    # object-space center (1, 0, 0); rotate 90 deg about y -> (0, 0, -1);
    # translate (0, 0, 2) -> world center (0, 0, 1)
    b.sphere((1, 0, 0), 0.5, b.lambertian(b.constant((0.5, 0.5, 0.5))),
             transform=Transform.translate((0, 0, 2)) @ Transform.rotate_y(90))
    b.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    hit = _hit_one(scene, (0, 0, 0), (0, 0, 1))
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 0.5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.p[0]), (0, 0, 0.5), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hit.normal[0]), (0, 0, -1),
                               atol=1e-5)


def test_flipped_sphere_has_inward_normal():
    b = SceneBuilder()
    b.sphere((0, 0, 2), 0.5, b.lambertian(b.constant((0.5, 0.5, 0.5))),
             flip=True)
    b.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    assert float(scene.spheres.radius[0]) == -0.5
    hit = _hit_one(scene, (0, 0, 0), (0, 0, 1))
    np.testing.assert_allclose(np.asarray(hit.normal[0]), (0, 0, 1),
                               atol=1e-5)  # flipped: points along the ray


def test_moving_sphere_transform_applies_to_both_centers():
    b = SceneBuilder()
    tr = Transform.translate((5, 0, 0))
    b.sphere((0, 0, 0), 1.0, b.lambertian(b.constant((0.5, 0.5, 0.5))),
             center1=(0, 1, 0), transform=tr)
    b.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build()
    np.testing.assert_allclose(np.asarray(scene.spheres.center0[0]),
                               (5, 0, 0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(scene.spheres.center1[0]),
                               (5, 1, 0), atol=1e-6)
    assert scene.has_moving_spheres


def test_nested_rect_chain_equals_flat_composition():
    """transform=outer @ (kwargs chain) must equal the hand-composed flat
    transform — i.e. nested wrappers behave like the reference's nesting."""
    off_in = (1.0, 0.0, 2.0)
    outer = Transform.translate((0.0, 3.0, 0.0)) @ Transform.rotate_y(30)

    b1 = SceneBuilder()
    m = b1.lambertian(b1.constant((0.7, 0.7, 0.7)))
    b1.rect("xz", 0, 1, 0, 1, 0.0, m, rotate_y=45, translate=off_in,
            transform=outer)
    b1.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    s1 = b1.build()

    flat = outer @ (Transform.translate(off_in) @ Transform.rotate_y(45))
    b2 = SceneBuilder()
    m2 = b2.lambertian(b2.constant((0.7, 0.7, 0.7)))
    b2.rect("xz", 0, 1, 0, 1, 0.0, m2, transform=flat)
    b2.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    s2 = b2.build()

    np.testing.assert_allclose(np.asarray(s1.rects.cos_t),
                               np.asarray(s2.rects.cos_t), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1.rects.sin_t),
                               np.asarray(s2.rects.sin_t), atol=1e-7)
    np.testing.assert_allclose(np.asarray(s1.rects.offset),
                               np.asarray(s2.rects.offset), atol=1e-6)
    # sanity: the angle really is 75 degrees
    assert abs(float(s1.rects.cos_t[0]) - math.cos(math.radians(75))) < 1e-6


def test_transform_kwargs_backward_compatible():
    """The pre-existing kwargs path must produce identical tables."""
    b1 = SceneBuilder()
    m = b1.lambertian(b1.constant((0.7, 0.7, 0.7)))
    b1.rect("xz", 0, 1, 0, 1, 0.0, m, rotate_y=15, translate=(2, 0, 1))
    b1.camera((0, 0, 0), (0, 0, 1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    s1 = b1.build()
    assert abs(float(s1.rects.cos_t[0]) - math.cos(math.radians(15))) < 1e-7
    np.testing.assert_allclose(np.asarray(s1.rects.offset[0]), (2, 0, 1),
                               atol=1e-7)
