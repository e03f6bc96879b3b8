"""Statistical tests of the keyed samplers against closed-form oracles.

Ports the MonteCarlo study app's eyeball checks into assertions
(reference: MonteCarlo/MonteCarlo.cpp — pi estimation, cos^2 sphere integral,
cosine-cubed integral) and validates each sampler's distribution moments.
"""
import math

import numpy as np
import jax
import jax.numpy as jnp

from raytracingweekend_tpu.ops import linalg, sampling

N = 200_000
KEY = jax.random.key(0)


def test_estimate_pi():
    # MonteCarlo.cpp:10-31: area of unit circle via uniform square samples.
    k1, k2 = jax.random.split(KEY)
    x = sampling.uniform(k1, (N,), -1.0, 1.0)
    y = sampling.uniform(k2, (N,), -1.0, 1.0)
    est = 4.0 * jnp.mean((x * x + y * y < 1.0).astype(jnp.float32))
    assert abs(float(est) - math.pi) < 0.02


def test_integrate_x_squared_uniform():
    # MonteCarlo.cpp:88-108: integral of x^2 over [0,2] = 8/3, uniform pdf.
    x = sampling.uniform(KEY, (N,), 0.0, 2.0)
    est = 2.0 * jnp.mean(x * x)
    assert abs(float(est) - 8.0 / 3.0) < 0.02


def test_random_unit_vector_is_unit_and_uniform():
    v = sampling.random_unit_vector(KEY, (N,))
    np.testing.assert_allclose(linalg.length(v), np.ones(N), atol=1e-5)
    # Uniform on sphere: each component has mean 0, E[z^2] = 1/3.
    np.testing.assert_allclose(jnp.mean(v, axis=0), np.zeros(3), atol=0.01)
    np.testing.assert_allclose(jnp.mean(v[:, 2] ** 2), 1.0 / 3.0, atol=0.01)


def test_sphere_integral_cos_squared():
    # MonteCarlo.cpp:151-183: integral of cos^2(theta) over the sphere = 4pi/3.
    v = sampling.random_unit_vector(KEY, (N,))
    est = 4.0 * math.pi * jnp.mean(v[:, 2] ** 2)
    assert abs(float(est) - 4.0 * math.pi / 3.0) < 0.05


def test_random_in_unit_sphere_radius_distribution():
    p = sampling.random_in_unit_sphere(KEY, (N,))
    r = np.asarray(linalg.length(p))
    assert r.max() <= 1.0
    # Uniform in ball: E[r] = 3/4, P(r < 0.5) = 1/8.
    assert abs(r.mean() - 0.75) < 0.01
    assert abs((r < 0.5).mean() - 0.125) < 0.01


def test_random_in_hemisphere():
    n = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), (N, 3))
    p = sampling.random_in_hemisphere(KEY, n)
    assert float(jnp.min(linalg.dot(p, n))) > 0.0


def test_cosine_direction_moments():
    # Cosine-weighted about +z: E[cos theta] = 2/3, pdf = cos/pi.
    v = sampling.random_cosine_direction(KEY, (N,))
    np.testing.assert_allclose(linalg.length(v), np.ones(N), atol=1e-4)
    assert float(jnp.min(v[:, 2])) >= 0.0
    assert abs(float(jnp.mean(v[:, 2])) - 2.0 / 3.0) < 0.01


def test_cosine_cubed_integral():
    # MonteCarlo.cpp:185-288: E_pdf[cos^3/(cos/pi)] = integral cos^3 over
    # hemisphere = pi/2.
    v = sampling.random_cosine_direction(KEY, (N,))
    c = v[:, 2]
    est = jnp.mean(c ** 3 / (c / math.pi))
    assert abs(float(est) - math.pi / 2.0) < 0.02


def test_random_to_sphere_cone():
    # All samples within the cone: z >= cos_theta_max.
    radius = jnp.full((N,), 0.5)
    dist2 = jnp.full((N,), 4.0)
    v = sampling.random_to_sphere(KEY, radius, dist2)
    ctm = math.sqrt(1.0 - 0.25 / 4.0)
    assert float(jnp.min(v[:, 2])) >= ctm - 1e-6
    np.testing.assert_allclose(linalg.length(v), np.ones(N), atol=1e-4)
    # Solid-angle pdf check: mean z = (1 + ctm)/2 for uniform-in-cone.
    assert abs(float(jnp.mean(v[:, 2])) - (1.0 + ctm) / 2.0) < 0.01


def test_random_in_unit_disk():
    p = sampling.random_in_unit_disk(KEY, (N,))
    r = np.asarray(linalg.length(p))
    assert r.max() <= 1.0
    np.testing.assert_allclose(np.asarray(p[:, 2]), np.zeros(N))
    # Uniform in disk: E[r] = 2/3, P(r < 0.5) = 1/4.
    assert abs(r.mean() - 2.0 / 3.0) < 0.01
    assert abs((r < 0.5).mean() - 0.25) < 0.01


def test_random_int_inclusive_uniform():
    # utility.h:22-25 semantics: inclusive bounds.
    r = sampling.random_int(KEY, (N,), 0, 3)
    vals, counts = np.unique(np.asarray(r), return_counts=True)
    assert list(vals) == [0, 1, 2, 3]
    np.testing.assert_allclose(counts / N, 0.25 * np.ones(4), atol=0.01)


def test_get_sphere_uv_poles_and_seam():
    # +x axis: phi=0 -> u = 1 - (0+pi)/(2pi) = 0.5; theta=0 -> v=0.5.
    u, v = sampling.get_sphere_uv(jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose([float(u), float(v)], [0.5, 0.5], atol=1e-6)
    # North pole: v = 1.
    _, v = sampling.get_sphere_uv(jnp.array([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(float(v), 1.0, atol=1e-6)


def test_determinism():
    a = sampling.random_unit_vector(KEY, (128,))
    b = sampling.random_unit_vector(KEY, (128,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
