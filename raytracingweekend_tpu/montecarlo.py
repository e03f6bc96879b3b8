"""Monte Carlo estimation studies — the library port of the reference's
standalone study app (reference: MonteCarlo/MonteCarlo.cpp).

Each function returns its estimate (and the closed-form answer where one
exists) instead of printing, so the studies double as statistical regression
tests of the sampling machinery the renderer relies on. All estimators are
vectorized single-launch jnp code rather than scalar loops.

Run as a script for the reference-style printed report:
    python -m raytracingweekend_tpu.montecarlo
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from .ops import linalg, sampling

__all__ = [
    "estimate_pi", "estimate_pi_stratified", "integrate_x_squared_uniform",
    "integrate_x_squared_linear_pdf", "integrate_x_squared_quadratic_pdf",
    "estimate_pi_forever",
    "integrate_cos_squared_sphere", "integrate_cos_cubed_uniform_hemisphere",
    "integrate_cos_cubed_cosine_pdf", "cosine_direction_cloud",
]


def estimate_pi(key, n: int = 1_000_000) -> Tuple[float, float]:
    """Area-ratio pi estimate (MonteCarlo.cpp:10-31). Returns (est, pi)."""
    kx, ky = jax.random.split(key)
    x = sampling.uniform(kx, (n,), -1.0, 1.0)
    y = sampling.uniform(ky, (n,), -1.0, 1.0)
    est = 4.0 * jnp.mean((x * x + y * y < 1.0).astype(jnp.float32))
    return float(est), math.pi


def estimate_pi_forever(key, chunk: int = 100_000, steps: int = 10):
    """Running-convergence pi study (MonteCarlo_EstimatePI_Forever,
    MonteCarlo.cpp:33-51): the reference loops endlessly printing the
    cumulative estimate every 100k draws; the wavefront form runs a
    fixed number of chunks through one lax.scan with a running
    inside-count carry and returns every intermediate estimate.
    Returns (estimates list of length `steps`, pi)."""
    def body(carry, k):
        inside, total = carry
        kx, ky = jax.random.split(k)
        x = sampling.uniform(kx, (chunk,), -1.0, 1.0)
        y = sampling.uniform(ky, (chunk,), -1.0, 1.0)
        inside = inside + jnp.sum((x * x + y * y < 1.0).astype(jnp.float32))
        total = total + chunk
        return (inside, total), 4.0 * inside / total

    keys = jax.random.split(key, steps)
    (_, _), ests = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros(())), keys)
    return [float(e) for e in ests], math.pi


def estimate_pi_stratified(key, sqrt_n: int = 1000) -> Tuple[float, float, float]:
    """Plain vs jittered-grid stratified pi (MonteCarlo.cpp:53-86).
    Returns (plain, stratified, pi)."""
    n = sqrt_n * sqrt_n
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = sampling.uniform(k1, (n,), -1.0, 1.0)
    y = sampling.uniform(k2, (n,), -1.0, 1.0)
    plain = 4.0 * jnp.mean((x * x + y * y < 1.0).astype(jnp.float32))

    ii = jnp.tile(jnp.arange(sqrt_n, dtype=jnp.float32), sqrt_n)
    jj = jnp.repeat(jnp.arange(sqrt_n, dtype=jnp.float32), sqrt_n)
    xs = 2.0 * ((ii + sampling.uniform(k3, (n,))) / sqrt_n) - 1.0
    ys = 2.0 * ((jj + sampling.uniform(k4, (n,))) / sqrt_n) - 1.0
    strat = 4.0 * jnp.mean((xs * xs + ys * ys < 1.0).astype(jnp.float32))
    return float(plain), float(strat), math.pi


def integrate_x_squared_uniform(key, n: int = 1_000_000):
    """integral x^2 over [0,2] with a uniform pdf (MonteCarlo.cpp:88-108).
    Returns (est, 8/3)."""
    x = sampling.uniform(key, (n,), 0.0, 2.0)
    return float(2.0 * jnp.mean(x * x)), 8.0 / 3.0


def integrate_x_squared_linear_pdf(key, n: int = 1_000_000):
    """Importance sampling with pdf 0.5x via inverse CDF x = 2*sqrt(U)
    (MonteCarlo.cpp:110-128). Returns (est, 8/3)."""
    u = sampling.uniform(key, (n,))
    x = 2.0 * jnp.sqrt(u)
    est = jnp.mean(x * x / (0.5 * x))
    return float(est), 8.0 / 3.0


def integrate_x_squared_quadratic_pdf(key, n: int = 1_000_000):
    """Zero-variance pdf 3x^2/8 via inverse CDF x = (8U)^(1/3)
    (MonteCarlo.cpp:130-149). Returns (est, 8/3)."""
    u = sampling.uniform(key, (n,))
    x = (8.0 * u) ** (1.0 / 3.0)
    est = jnp.mean(x * x / (3.0 * x * x / 8.0))
    return float(est), 8.0 / 3.0


def integrate_cos_squared_sphere(key, n: int = 1_000_000):
    """integral of cos^2(theta) over the sphere = 4pi/3
    (MonteCarlo.cpp:151-183). Returns (est, 4pi/3)."""
    d = sampling.random_unit_vector(key, (n,))
    est = jnp.mean(d[:, 2] ** 2 / (1.0 / (4.0 * math.pi)))
    return float(est), 4.0 * math.pi / 3.0


def integrate_cos_cubed_uniform_hemisphere(key, n: int = 1_000_000):
    """integral cos^3 over the hemisphere with uniform pdf 1/2pi
    (MonteCarlo.cpp:227-253, z = 1 - r2 form). Returns (est, pi/2)."""
    k1, k2 = jax.random.split(key)
    r2 = sampling.uniform(k2, (n,))
    z = 1.0 - r2
    est = jnp.mean(z ** 3 / (1.0 / (2.0 * math.pi)))
    return float(est), math.pi / 2.0


def integrate_cos_cubed_cosine_pdf(key, n: int = 1_000_000):
    """Same integral with the cosine pdf cos/pi (MonteCarlo.cpp:257-287).
    Returns (est, pi/2)."""
    d = sampling.random_cosine_direction(key, (n,))
    z = d[:, 2]
    est = jnp.mean(z ** 3 / (z / math.pi))
    return float(est), math.pi / 2.0


def cosine_direction_cloud(key, n: int = 1000):
    """The point cloud the reference's active main() dumps for plotting
    (MonteCarlo.cpp:312-331): cosine-sampled directions in the ONB of +z.
    Returns an (n, 3) array."""
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    u, v, w = linalg.onb_from_w(normal)
    a = sampling.random_cosine_direction(key, (n,))
    return linalg.onb_local(u, v, w, a)


def main():
    key = jax.random.key(0)
    ks = jax.random.split(key, 9)
    print("Estimate of PI = %.6f (pi = %.6f)" % estimate_pi(ks[0]))
    ests, _ = estimate_pi_forever(ks[8], chunk=100_000, steps=5)
    for e in ests:
        print(f"Estimate of PI = {e:.6f}")
    plain, strat, pi = estimate_pi_stratified(ks[1], sqrt_n=300)
    print(f"Regular     Estimate of Pi = {plain:.6f}")
    print(f"Stratified  Estimate of Pi = {strat:.6f}")
    print("I(x^2, uniform)   = %.6f (exact %.6f)"
          % integrate_x_squared_uniform(ks[2]))
    print("I(x^2, pdf 0.5x)  = %.6f (exact %.6f)"
          % integrate_x_squared_linear_pdf(ks[3]))
    print("I(x^2, pdf 3x^2/8)= %.6f (exact %.6f)"
          % integrate_x_squared_quadratic_pdf(ks[4]))
    print("I(cos^2, sphere)  = %.6f (exact %.6f)"
          % integrate_cos_squared_sphere(ks[5]))
    est, exact = integrate_cos_cubed_uniform_hemisphere(ks[6])
    print(f"Pi/2     = {exact:.12f}")
    print(f"Estimate = {est:.12f}")
    est, exact = integrate_cos_cubed_cosine_pdf(ks[7])
    print(f"Pi/2     = {exact:.12f}")
    print(f"Estimate = {est:.12f}")


if __name__ == "__main__":
    main()
