"""The MonteCarlo study app as assertions (reference:
MonteCarlo/MonteCarlo.cpp; each estimate must converge to its closed form)."""
import numpy as np
import jax

from raytracingweekend_tpu import montecarlo as mc

KEY = jax.random.key(42)


def test_pi():
    est, exact = mc.estimate_pi(KEY, n=400_000)
    assert abs(est - exact) < 0.02


def test_pi_stratified_is_closer():
    plain, strat, exact = mc.estimate_pi_stratified(KEY, sqrt_n=200)
    assert abs(strat - exact) <= abs(plain - exact) + 1e-3
    assert abs(strat - exact) < 0.01


def test_integrals_x_squared():
    for fn in (mc.integrate_x_squared_uniform,
               mc.integrate_x_squared_linear_pdf,
               mc.integrate_x_squared_quadratic_pdf):
        est, exact = fn(KEY, n=400_000)
        assert abs(est - exact) < 0.02, fn.__name__


def test_zero_variance_pdf_is_exact():
    # pdf proportional to the integrand -> every sample equals the answer.
    est, exact = mc.integrate_x_squared_quadratic_pdf(KEY, n=1000)
    assert abs(est - exact) < 1e-4


def test_cos_squared_sphere():
    est, exact = mc.integrate_cos_squared_sphere(KEY, n=400_000)
    assert abs(est - exact) < 0.05


def test_cos_cubed_both_pdfs_agree():
    e1, exact = mc.integrate_cos_cubed_uniform_hemisphere(KEY, n=400_000)
    e2, _ = mc.integrate_cos_cubed_cosine_pdf(KEY, n=400_000)
    assert abs(e1 - exact) < 0.02
    assert abs(e2 - exact) < 0.02


def test_cosine_cloud_is_upper_hemisphere():
    pts = np.asarray(mc.cosine_direction_cloud(KEY, n=2048))
    assert pts.shape == (2048, 3)
    assert pts[:, 2].min() >= 0.0
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 1.0, atol=1e-4)
