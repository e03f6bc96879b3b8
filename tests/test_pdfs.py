"""PDF correctness: each sampling PDF must integrate to 1 over the sphere of
directions, and samplers must be consistent with their PDFs (reference
oracle: pdf.h, hittable.h:208-228, sphere.h:88-108)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.ops import linalg, pdfs, sampling

_N_SIDE = 448
N = _N_SIDE * _N_SIDE  # matches the stratified-grid direction count


def _scene_with_lights(add):
    b = SceneBuilder()
    light = b.diffuse_light((15.0, 15.0, 15.0))
    add(b, light)
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, 0.0, 1.0)
    return b.build()


def _stratified_unit_vectors(key, n_side):
    """Jittered-grid directions over the sphere (area-preserving (z, phi)
    strata) — same estimator as uniform MC but with variance collapsed for
    small-solid-angle integrands like distant-light PDFs."""
    kz, kp = jax.random.split(key)
    iz, ip = jnp.meshgrid(jnp.arange(n_side), jnp.arange(n_side),
                          indexing="ij")
    n = n_side * n_side
    uz = (iz.reshape(-1) + jax.random.uniform(kz, (n,))) / n_side
    up = (ip.reshape(-1) + jax.random.uniform(kp, (n,))) / n_side
    z = 1.0 - 2.0 * uz
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * math.pi * up
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def _integrate_over_sphere(pdf_fn, key, n_side=_N_SIDE):
    """Stratified MC integral of pdf over all directions:
    E_uniform[pdf] * 4pi."""
    dirs = _stratified_unit_vectors(key, n_side)
    vals = pdf_fn(dirs)
    return float(jnp.mean(vals) * 4.0 * math.pi)


def test_cosine_pdf_integrates_to_one():
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))
    key = jax.random.key(0)
    est = _integrate_over_sphere(
        lambda d: pdfs.cosine_pdf_value(normal, d), key)
    assert abs(est - 1.0) < 0.02


def test_cosine_pdf_sample_matches_value():
    # E_sampled[1/pdf] over the hemisphere = 2pi (hemisphere solid angle).
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (N, 3))
    d = pdfs.cosine_pdf_sample(jax.random.key(1), normal)
    p = pdfs.cosine_pdf_value(normal, d)
    est = float(jnp.mean(1.0 / p))
    assert abs(est - 2.0 * math.pi) < 0.15


def test_rect_light_pdf_integrates_to_one():
    scene = _scene_with_lights(
        lambda b, light: b.add_light(
            b.rect("xz", 213.0, 343.0, 227.0, 332.0, 554.0, light)))
    o = jnp.broadcast_to(jnp.asarray([278.0, 100.0, 278.0]), (N, 3))
    est = _integrate_over_sphere(
        lambda d: pdfs.lights_pdf_value(o, d, scene), jax.random.key(2))
    assert abs(est - 1.0) < 0.05


def test_sphere_light_pdf_integrates_to_one():
    scene = _scene_with_lights(
        lambda b, light: b.add_light(b.sphere((0.0, 5.0, 0.0), 2.0, light)))
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (N, 3))
    est = _integrate_over_sphere(
        lambda d: pdfs.lights_pdf_value(o, d, scene), jax.random.key(3))
    assert abs(est - 1.0) < 0.05


def test_mixture_pdf_integrates_to_one():
    scene = _scene_with_lights(
        lambda b, light: b.add_light(
            b.rect("xz", -1.0, 1.0, -1.0, 1.0, 5.0, light)))
    o = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 0.0]), (N, 3))
    normal = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (N, 3))
    dirs = sampling.random_unit_vector(jax.random.key(4), (N,))
    mix = (0.5 * pdfs.cosine_pdf_value(normal, dirs)
           + 0.5 * pdfs.lights_pdf_value(o, dirs, scene))
    est = float(jnp.mean(mix) * 4.0 * math.pi)
    assert abs(est - 1.0) < 0.04


def test_lights_sample_hits_rect_light():
    scene = _scene_with_lights(
        lambda b, light: b.add_light(
            b.rect("xz", 213.0, 343.0, 227.0, 332.0, 554.0, light)))
    o = jnp.broadcast_to(jnp.asarray([278.0, 100.0, 278.0]), (8192, 3))
    d = pdfs.lights_sample(jax.random.key(5), o, scene)
    # Every sampled direction points at the rect: o + d lands on it exactly
    # (rect sample returns point - origin unnormalized, hittable.h:224-228).
    target = np.asarray(o + d)
    np.testing.assert_allclose(target[:, 1], 554.0, atol=1e-3)
    assert target[:, 0].min() >= 213.0 - 1e-3
    assert target[:, 0].max() <= 343.0 + 1e-3
    assert target[:, 2].min() >= 227.0 - 1e-3
    assert target[:, 2].max() <= 332.0 + 1e-3


def test_lights_sample_sphere_within_cone():
    scene = _scene_with_lights(
        lambda b, light: b.add_light(b.sphere((0.0, 5.0, 0.0), 2.0, light)))
    o = jnp.zeros((8192, 3))
    d = pdfs.lights_sample(jax.random.key(6), o, scene)
    d = linalg.normalize(d)
    to_c = jnp.asarray([0.0, 1.0, 0.0])
    cos_to_center = linalg.dot(d, to_c)
    ctm = math.sqrt(1.0 - 4.0 / 25.0)
    assert float(jnp.min(cos_to_center)) >= ctm - 1e-4


def test_two_light_mixture_averages():
    # hittable_list::pdf_value averages member pdfs (hittable_list.h:44-53).
    scene2 = _scene_with_lights(lambda b, light: (
        b.add_light(b.rect("xz", -1.0, 1.0, -1.0, 1.0, 5.0, light)),
        b.add_light(b.sphere((0.0, -5.0, 0.0), 1.0, light))))
    o = jnp.zeros((N, 3))
    est = _integrate_over_sphere(
        lambda d: pdfs.lights_pdf_value(o, d, scene2), jax.random.key(7))
    assert abs(est - 1.0) < 0.05


def test_transformed_rect_light_pdf():
    # A rotated+translated rect light: pdf must still integrate to 1.
    scene = _scene_with_lights(
        lambda b, light: b.add_light(
            b.rect("xz", -1.0, 1.0, -1.0, 1.0, 0.0, light, rotate_y=30.0,
                   translate=(0.0, 4.0, 0.0))))
    o = jnp.zeros((N, 3))
    est = _integrate_over_sphere(
        lambda d: pdfs.lights_pdf_value(o, d, scene), jax.random.key(8))
    assert abs(est - 1.0) < 0.05
    # And sampled points must land on the transformed rect plane (y = 4).
    d = pdfs.lights_sample(jax.random.key(9), o[:4096], scene)
    target = np.asarray(o[:4096] + d)
    np.testing.assert_allclose(target[:, 1], 4.0, atol=1e-3)
