"""utils/denoise.py: the a-trous bilateral post-filter must cut
Monte-Carlo-style speckle variance while preserving hard edges — the
property that makes the gallery's denoised pair meaningful."""
import numpy as np
import jax

from raytracingweekend_tpu.utils.denoise import atrous_denoise, firefly_clamp


def _noisy_step(ny=64, nx=64, sigma=0.1, seed=0):
    rng = np.random.default_rng(seed)
    img = np.full((ny, nx, 3), 0.2, np.float32)
    img[:, nx // 2:, :] = 0.8
    return img, (img + rng.normal(0, sigma, img.shape)).astype(np.float32)


def test_denoise_reduces_noise_keeps_edge():
    clean, noisy = _noisy_step()
    out = np.asarray(atrous_denoise(noisy))
    # flat-region residual drops by >3x
    sl = (slice(8, 56), slice(4, 24))
    before = np.std(noisy[sl] - clean[sl])
    after = np.std(out[sl] - clean[sl])
    assert after < before / 3.0, (before, after)
    # the step edge survives: mean levels on both sides stay separated
    left = out[:, : 64 // 2 - 2].mean()
    right = out[:, 64 // 2 + 2:].mean()
    assert right - left > 0.5, (left, right)


def test_firefly_clamp_kills_outliers_keeps_regions():
    img = np.full((32, 32, 3), 0.1, np.float32)
    img[10, 10] = 50.0                    # isolated firefly
    img[20:28, 20:28] = 5.0               # a real bright region
    out = np.asarray(firefly_clamp(img))
    assert out[10, 10, 0] < 0.5
    assert out[23, 23, 0] > 4.0


def test_denoise_is_jittable():
    _, noisy = _noisy_step(32, 32)
    a = np.asarray(atrous_denoise(noisy, iterations=2))
    b = np.asarray(jax.jit(lambda x: atrous_denoise(x, iterations=2))(noisy))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
