"""Directed intersection tests (reference oracle: sphere.h:46-81,
hittable.h:142-416,430-479, aabb.h:17-62, CppTest/unittest1.cpp:69-110)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.ops import geometry

KEY = jax.random.key(0)


def _mini_scene(build_fn, **build_kw):
    b = SceneBuilder()
    build_fn(b)
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, 0.0, 1.0)
    return b.build(**build_kw)


def _single(scene, o, d, t=0.5):
    o = jnp.asarray([o], jnp.float32)
    d = jnp.asarray([d], jnp.float32)
    time = jnp.asarray([t], jnp.float32)
    # want_uv=True: these tests check the full hit_record contract including
    # uv, which closest_hit skips by default for scenes without image
    # textures.
    return geometry.closest_hit(KEY, o, d, time, scene, want_uv=True)


def test_sphere_hit_near_root():
    scene = _mini_scene(lambda b: b.sphere((0, 0, -1), 0.5,
                                           b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (0, 0, 0), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 0.5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.p[0]), [0, 0, -0.5], atol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-5)


def test_sphere_miss():
    scene = _mini_scene(lambda b: b.sphere((0, 0, -1), 0.5,
                                           b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (0, 0, 0), (0, 1, 0))
    assert not bool(h.hit[0])


def test_sphere_inside_far_root():
    # Origin inside the sphere: near root < t_min, far root selected
    # (sphere.h:67-77).
    scene = _mini_scene(lambda b: b.sphere((0, 0, 0), 1.0,
                                           b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (0, 0, 0), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-5)


def test_negative_radius_inward_normal():
    # Hollow glass shell trick (Scene/scene.h:85-86): normal flips inward.
    scene = _mini_scene(lambda b: b.sphere((0, 0, -1), -0.5,
                                           b.dielectric(1.5)))
    h = _single(scene, (0, 0, 0), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, -1], atol=1e-5)


def test_moving_sphere_center_lerp():
    # movement_linear (sphere.h:20-38): center lerps with ray time.
    def build(b):
        b.sphere((0, 0, -2), 0.5, b.lambertian(b.constant((1, 1, 1))),
                 center1=(2, 0, -2), time0=0.0, time1=1.0)
    scene = _mini_scene(build)
    assert scene.has_moving_spheres
    h0 = _single(scene, (0, 0, 0), (0, 0, -1), t=0.0)
    assert bool(h0.hit[0])
    np.testing.assert_allclose(float(h0.t[0]), 1.5, rtol=1e-5)
    h1 = _single(scene, (2, 0, 0), (0, 0, -1), t=1.0)
    assert bool(h1.hit[0])
    h_miss = _single(scene, (0, 0, 0), (0, 0, -1), t=1.0)
    assert not bool(h_miss.hit[0])


def test_sphere_uv():
    # Hit +x side of a sphere at origin: phi=0 -> u=0.5, theta=0 -> v=0.5.
    scene = _mini_scene(lambda b: b.sphere((0, 0, 0), 1.0,
                                           b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (2, 0, 0), (-1, 0, 0))
    np.testing.assert_allclose([float(h.u[0]), float(h.v[0])], [0.5, 0.5],
                               atol=1e-5)


def test_xz_rect_hit():
    scene = _mini_scene(lambda b: b.rect("xz", -1, 1, -1, 1, 2.0,
                                         b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (0.5, 0, 0.5), (0, 1, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 1, 0], atol=1e-6)
    # uv from extents (hittable.h:193-194)
    np.testing.assert_allclose([float(h.u[0]), float(h.v[0])], [0.75, 0.75],
                               atol=1e-5)


def test_rect_bounds_miss():
    scene = _mini_scene(lambda b: b.rect("xz", -1, 1, -1, 1, 2.0,
                                         b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (1.5, 0, 0), (0, 1, 0))
    assert not bool(h.hit[0])


def test_flip_normals():
    scene = _mini_scene(lambda b: b.rect("xz", -1, 1, -1, 1, 2.0,
                                         b.lambertian(b.constant((1, 1, 1))),
                                         flip=True))
    h = _single(scene, (0, 0, 0), (0, 1, 0))
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, -1, 0], atol=1e-6)


def test_translate_moves_hit_point_back():
    # translate (hittable.h:295-328): ray moved into object space, hit point
    # moved back to world space.
    scene = _mini_scene(lambda b: b.rect("xz", -1, 1, -1, 1, 0.0,
                                         b.lambertian(b.constant((1, 1, 1))),
                                         translate=(5.0, 2.0, 0.0)))
    h = _single(scene, (5.0, 0.0, 0.0), (0, 1, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.p[0]), [5.0, 2.0, 0.0], atol=1e-5)


def test_rotate_y_90deg():
    # An xy rect rotated +90 deg about y presents its face along x
    # (hittable.h:331-416 semantics).
    scene = _mini_scene(lambda b: b.rect("xy", -1, 1, -1, 1, 0.0,
                                         b.lambertian(b.constant((1, 1, 1))),
                                         rotate_y=90.0))
    h = _single(scene, (3.0, 0.0, 0.0), (-1, 0, 0))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 3.0, rtol=1e-4)
    # object normal (0,0,1) rotated by +90 about y -> world (+1,0,0)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [1, 0, 0], atol=1e-4)


def test_box_closest_face():
    scene = _mini_scene(lambda b: b.box((-1, -1, -1), (1, 1, 1),
                                        b.lambertian(b.constant((1, 1, 1)))))
    h = _single(scene, (0, 0, 5), (0, 0, -1))
    assert bool(h.hit[0])
    np.testing.assert_allclose(float(h.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h.normal[0]), [0, 0, 1], atol=1e-6)
    # From inside toward -z, the z=-1 face is the flip_normals'd xy rect
    # (hittable_list.h:79-81): normal (0,0,-1).
    h2 = _single(scene, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(float(h2.t[0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2.normal[0]), [0, 0, -1],
                               atol=1e-6)


def test_closest_hit_ordering_across_tables():
    def build(b):
        m = b.lambertian(b.constant((1, 1, 1)))
        b.sphere((0, 0, -3), 0.5, m)
        b.rect("xy", -1, 1, -1, 1, -1.0, m)
    scene = _mini_scene(build)
    h = _single(scene, (0, 0, 0), (0, 0, -1))
    np.testing.assert_allclose(float(h.t[0]), 1.0, rtol=1e-5)  # rect wins


def test_constant_medium_scatter_probability():
    # P(scatter inside thickness L) = 1 - exp(-rho * L)
    # (hittable.h:463-474). Box from z=-2 to z=-4, rho=0.7, L=2.
    rho, L = 0.7, 2.0
    def build(b):
        b.constant_medium_box((-5, -5, -4), (5, 5, -2), rho,
                              b.isotropic((1.0, 1.0, 1.0)))
    scene = _mini_scene(build)
    N = 200_000
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (N, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (N, 1))
    time = jnp.zeros((N,), jnp.float32)
    h = geometry.closest_hit(jax.random.key(7), o, d, time, scene)
    p_hit = float(jnp.mean(h.hit.astype(jnp.float32)))
    expect = 1.0 - math.exp(-rho * L)
    assert abs(p_hit - expect) < 0.01
    # scatter points lie inside the slab
    t = np.asarray(h.t)[np.asarray(h.hit)]
    assert t.min() >= 2.0 - 1e-4 and t.max() <= 4.0 + 1e-4


def test_medium_vs_surface_ordering():
    # A wall behind a thin medium: rays that don't scatter in the medium must
    # hit the wall (the closest-so-far equivalence of hittable_list::hit).
    def build(b):
        b.constant_medium_box((-5, -5, -3), (5, 5, -2), 0.5,
                              b.isotropic((1.0, 1.0, 1.0)))
        b.rect("xy", -5, 5, -5, 5, -6.0, b.lambertian(b.constant((1, 1, 1))))
    scene = _mini_scene(build)
    N = 50_000
    o = jnp.zeros((N, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (N, 1))
    h = geometry.closest_hit(jax.random.key(8), o, d,
                             jnp.zeros((N,), jnp.float32), scene)
    assert bool(jnp.all(h.hit))
    t = np.asarray(h.t)
    in_medium = t < 5.0
    np.testing.assert_allclose(t[~in_medium], 6.0, rtol=1e-5)
    frac = in_medium.mean()
    assert abs(frac - (1.0 - math.exp(-0.5))) < 0.01


def test_aabb_hit_cases():
    # Mirrors CppTest/unittest1.cpp:69-102 directed aabb cases.
    bmin = jnp.asarray([[0.0, 0.0, 0.0]])
    bmax = jnp.asarray([[1.0, 1.0, 1.0]])
    o = jnp.asarray([[-1.0, 0.5, 0.5], [-1.0, 0.5, 0.5], [0.5, 0.5, 0.5],
                     [-1.0, 2.0, 0.5], [2.0, 0.5, 0.5]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0], [1.0, 0.0, 0.0],
                     [1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    res = geometry.hit_aabb(o, d, bmin, bmax, 0.0, 100.0)
    assert np.asarray(res).tolist() == [True, False, True, False, False]


def test_aabb_surrounding():
    mn, mx = geometry.surrounding_box(
        jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 1.0]),
        jnp.asarray([-1.0, 0.5, 0.0]), jnp.asarray([2.0, 0.7, 3.0]))
    np.testing.assert_allclose(np.asarray(mn), [-1.0, 0.0, 0.0])
    np.testing.assert_allclose(np.asarray(mx), [2.0, 1.0, 3.0])
