"""Texture evaluation tests (reference oracle: texture.h)."""
import numpy as np
import jax.numpy as jnp

from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.ops import textures


def _scene(build):
    b = SceneBuilder()
    build(b)
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 90.0, 1.0, 0.0, 1.0)
    return b.build()


def _eval(scene, ti, u, v, p):
    return np.asarray(textures.eval_texture(
        jnp.asarray(ti, jnp.int32), jnp.asarray(u, jnp.float32),
        jnp.asarray(v, jnp.float32), jnp.asarray(p, jnp.float32), scene))


def test_constant_texture():
    holder = {}
    def build(b):
        holder["t"] = b.constant((0.2, 0.4, 0.6))
        b.sphere((0, 0, -1), 0.5, b.lambertian(holder["t"]))
    scene = _scene(build)
    out = _eval(scene, [holder["t"]], [0.1], [0.9], [[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(out[0], [0.2, 0.4, 0.6], rtol=1e-6)


def test_checker_texture_sign_rule():
    holder = {}
    def build(b):
        even = b.constant((1.0, 0.0, 0.0))
        odd = b.constant((0.0, 1.0, 0.0))
        holder["t"] = b.checker(even, odd)
        b.sphere((0, 0, -1), 0.5, b.lambertian(holder["t"]))
    scene = _scene(build)
    # sin(10*0.05)^3 > 0 -> even; flip one coordinate sign -> odd
    # (texture.h:35-46).
    p_even = [0.05, 0.05, 0.05]
    p_odd = [-0.05, 0.05, 0.05]
    out = _eval(scene, [holder["t"], holder["t"]], [0, 0], [0, 0],
                [p_even, p_odd])
    np.testing.assert_allclose(out[0], [1.0, 0.0, 0.0], rtol=1e-6)
    np.testing.assert_allclose(out[1], [0.0, 1.0, 0.0], rtol=1e-6)


def test_noise_texture_marble_range():
    holder = {}
    def build(b):
        holder["t"] = b.noise(4.0)
        b.sphere((0, 0, -1), 0.5, b.lambertian(holder["t"]))
    scene = _scene(build)
    rng = np.random.default_rng(0)
    p = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    out = _eval(scene, [holder["t"]] * 512, np.zeros(512), np.zeros(512), p)
    # marble: 0.5*(1+sin(...)) in [0,1], grayscale (texture.h:67)
    assert out.min() >= 0.0 and out.max() <= 1.0
    np.testing.assert_allclose(out[:, 0], out[:, 1])
    np.testing.assert_allclose(out[:, 0], out[:, 2])
    assert out.std() > 0.05  # actually varies


def test_image_texture_nearest_lookup():
    holder = {}
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = (1, 0, 0)  # bottom-left (row 0 = bottom by our convention)
    img[0, 1] = (0, 1, 0)
    img[1, 0] = (0, 0, 1)
    img[1, 1] = (1, 1, 0)
    def build(b):
        holder["t"] = b.image(img)
        b.sphere((0, 0, -1), 0.5, b.lambertian(holder["t"]))
    scene = _scene(build)
    # texture.h:81-94: i = u*nx, j = (1-v)*ny - 0.001 indexes from image TOP;
    # our atlas stores row 0 = bottom, so v=0 -> j=ny-1... -> row index 0
    # after the flip bookkeeping. Corner checks:
    out = _eval(scene, [holder["t"]] * 4,
                [0.1, 0.9, 0.1, 0.9], [0.1, 0.1, 0.9, 0.9],
                [[0, 0, 0]] * 4)
    np.testing.assert_allclose(out[0], img[0, 0], atol=1e-6)  # u lo, v lo
    np.testing.assert_allclose(out[1], img[0, 1], atol=1e-6)
    np.testing.assert_allclose(out[2], img[1, 0], atol=1e-6)
    np.testing.assert_allclose(out[3], img[1, 1], atol=1e-6)


def test_checker_with_noise_child():
    holder = {}
    def build(b):
        even = b.noise(2.0)
        odd = b.constant((0.0, 0.0, 1.0))
        holder["t"] = b.checker(even, odd)
        b.sphere((0, 0, -1), 0.5, b.lambertian(holder["t"]))
    scene = _scene(build)
    out = _eval(scene, [holder["t"]], [0.0], [0.0], [[-0.05, 0.05, 0.05]])
    np.testing.assert_allclose(out[0], [0.0, 0.0, 1.0], rtol=1e-6)
