"""Unit tests for the vec3/onb math layer.

Ports the math-kernel coverage of the reference MSTest suite
(reference: CppTest/unittest1.cpp — dot/cross/ray/aabb cases) onto the
batched formulation, plus directed tests of reflect/refract/schlick/onb.
"""
import numpy as np
import jax.numpy as jnp

from raytracingweekend_tpu.ops import linalg


def test_dot():
    # CppTest/unittest1.cpp:20-26
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([4.0, 5.0, 6.0])
    assert float(linalg.dot(a, b)) == 32.0


def test_cross():
    # CppTest/unittest1.cpp:28-33
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(linalg.cross(a, b), [0.0, 0.0, 1.0])


def test_batched_dot_cross():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 3)).astype(np.float32)
    b = rng.normal(size=(64, 3)).astype(np.float32)
    np.testing.assert_allclose(
        linalg.dot(jnp.asarray(a), jnp.asarray(b)),
        np.sum(a * b, axis=-1), rtol=1e-5)
    np.testing.assert_allclose(
        linalg.cross(jnp.asarray(a), jnp.asarray(b)),
        np.cross(a, b), rtol=1e-5, atol=1e-6)


def test_normalize():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 2.0, 0.0]])
    n = linalg.normalize(v)
    np.testing.assert_allclose(linalg.length(n), [1.0, 1.0], rtol=1e-6)


def test_lerp_ref_swapped_args():
    # vec3.h:84-87: lerp(from, to, t) = (1-t)*to + t*from.
    frm = jnp.array([1.0, 0.0, 0.0])
    to = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(linalg.lerp_ref(frm, to, 0.0), to, atol=1e-7)
    np.testing.assert_allclose(linalg.lerp_ref(frm, to, 1.0), frm, atol=1e-7)


def test_reflect():
    v = jnp.array([1.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    np.testing.assert_allclose(linalg.reflect(v, n), [1.0, 1.0, 0.0], atol=1e-7)


def test_refract_straight_through():
    # Normal incidence, matched indices: direction unchanged (normalized).
    v = jnp.array([0.0, -2.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    refr, can = linalg.refract(v, n, jnp.asarray(1.0))
    assert bool(can)
    np.testing.assert_allclose(refr, [0.0, -1.0, 0.0], atol=1e-6)


def test_refract_snell_angle():
    # 45 degrees into glass (n=1.5): sin(t) = sin(45)/1.5.
    import math
    v = jnp.array([math.sin(math.pi / 4), -math.cos(math.pi / 4), 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    refr, can = linalg.refract(v, n, jnp.asarray(1.0 / 1.5))
    assert bool(can)
    sin_t = float(refr[0]) / float(linalg.length(refr))
    np.testing.assert_allclose(sin_t, math.sin(math.pi / 4) / 1.5, rtol=1e-5)


def test_refract_total_internal_reflection():
    # Grazing exit from glass: must report TIR.
    import math
    theta = math.radians(60.0)  # > critical angle asin(1/1.5) ~= 41.8 deg
    v = jnp.array([math.sin(theta), -math.cos(theta), 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    _, can = linalg.refract(v, n, jnp.asarray(1.5))
    assert not bool(can)


def test_schlick_limits():
    # Normal incidence -> r0; grazing -> 1.
    r0 = ((1 - 1.5) / (1 + 1.5)) ** 2
    np.testing.assert_allclose(float(linalg.schlick(jnp.asarray(1.0), 1.5)), r0, rtol=1e-6)
    np.testing.assert_allclose(float(linalg.schlick(jnp.asarray(0.0), 1.5)), 1.0, rtol=1e-6)


def test_onb_orthonormal():
    rng = np.random.default_rng(1)
    n = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    u, v, w = linalg.onb_from_w(n)
    for a in (u, v, w):
        np.testing.assert_allclose(linalg.length(a), np.ones(128), atol=1e-5)
    np.testing.assert_allclose(linalg.dot(u, v), np.zeros(128), atol=1e-5)
    np.testing.assert_allclose(linalg.dot(v, w), np.zeros(128), atol=1e-5)
    np.testing.assert_allclose(linalg.dot(u, w), np.zeros(128), atol=1e-5)
    # w aligned with n
    np.testing.assert_allclose(
        linalg.dot(w, linalg.normalize(n)), np.ones(128), atol=1e-5)
    # The reference basis is left-handed (onb.h:36-37: v = norm(w x a),
    # u = w x v), so u x v = -w. Preserved for behavioral parity.
    np.testing.assert_allclose(linalg.cross(u, v), -w, atol=1e-5)


def test_onb_local_roundtrip():
    n = jnp.array([0.0, 0.0, 1.0])
    u, v, w = linalg.onb_from_w(n)
    d = linalg.onb_local(u, v, w, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(d, [0.0, 0.0, 1.0], atol=1e-6)
