"""Native C++ runtime tests: image codecs and the accumulation framebuffer
with checkpoint/resume (native/rtw_native.cpp via ctypes)."""
import os

import numpy as np
import pytest

from raytracingweekend_tpu import native
from raytracingweekend_tpu.utils import image as image_mod

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _test_img(h=13, w=17):
    rng = np.random.default_rng(0)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_native(tmp_path):
    img = _test_img()
    path = str(tmp_path / "t.png")
    native.write_png(path, img)
    back = native.read_png(path)
    np.testing.assert_array_equal(back, img)


def test_png_native_matches_python_reader(tmp_path):
    # Native-encoded files must decode identically through the pure-Python
    # fallback decoder (same bits on disk, two independent decoders).
    img = _test_img()
    path = str(tmp_path / "t.png")
    native.write_png(path, img)
    via_native = native.read_png(path)

    was = native._lib
    try:
        native._lib = None
        native._tried = True  # force the python fallback in utils.image
        py = image_mod.read_png(path)           # [0,1], bottom-up
    finally:
        native._lib = was
        native._tried = True
    py_u8 = np.round(py[::-1] * 255.0).astype(np.uint8)
    np.testing.assert_array_equal(py_u8, via_native)


def test_jpeg_roundtrip_decode(tmp_path):
    # Encode a PNG, transcode to JPEG bytes is not available natively (decode
    # only), so synthesize a JPEG with libjpeg through a tiny C call is out of
    # scope: instead verify decode against a reference JPEG if one exists.
    earth = "/root/reference/RayTracingWeekend/earth.jpg"
    if not os.path.exists(earth):
        pytest.skip("no sample jpeg available")
    img = native.read_jpeg(earth)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] > 100 and img.shape[1] > 100
    assert img.mean() > 10  # not all black


def test_load_image_jpeg_bottom_up():
    earth = "/root/reference/RayTracingWeekend/earth.jpg"
    if not os.path.exists(earth):
        pytest.skip("no sample jpeg available")
    img = image_mod.load_image(earth)
    assert img.dtype == np.float64
    assert 0.0 <= img.min() and img.max() <= 1.0
    raw = native.read_jpeg(earth).astype(np.float64) / 255.0
    np.testing.assert_allclose(img, raw[::-1], atol=1e-12)


def test_ppm_writers_match_python(tmp_path):
    img = _test_img(8, 9)
    p6 = str(tmp_path / "a.ppm")
    native.write_ppm(p6, img, binary=True)
    back = image_mod.read_ppm(p6)            # [0,1], bottom-up
    np.testing.assert_allclose(back[::-1], img / 255.0, atol=1/255/2)


def test_framebuffer_accumulate_resolve():
    h, w = 6, 8
    with native.Framebuffer(w, h) as fb:
        rng = np.random.default_rng(1)
        c1 = rng.random((h, w, 3)).astype(np.float32)
        c2 = rng.random((h, w, 3)).astype(np.float32)
        fb.add(c1, 2)
        fb.add(c2, 2)
        assert fb.spp == 4
        acc = fb.accumulator()
        np.testing.assert_allclose(acc, c1 + c2, rtol=1e-6)
        out = fb.resolve(flip_rows=True)
    mean = (c1 + c2) / 4.0
    expect = np.clip((255.99 * np.minimum(np.sqrt(mean), 1.0)).astype(int),
                     0, 255).astype(np.uint8)[::-1]
    np.testing.assert_array_equal(out, expect)


def test_framebuffer_checkpoint_roundtrip(tmp_path):
    h, w = 5, 7
    path = str(tmp_path / "fb.ckpt")
    rng = np.random.default_rng(2)
    c = rng.random((h, w, 3)).astype(np.float32)
    with native.Framebuffer(w, h) as fb:
        fb.add(c, 3)
        fb.save(path)
    fb2 = native.Framebuffer.load(path)
    assert (fb2.w, fb2.h, fb2.spp) == (w, h, 3)
    np.testing.assert_allclose(fb2.accumulator(), c, rtol=1e-6)
    fb2.close()


def test_render_resume_is_exact(tmp_path):
    """Interrupted render + resume == uninterrupted render, bit for bit."""
    import jax
    from raytracingweekend_tpu.models import scene_types as st
    from raytracingweekend_tpu.models.builder import SceneBuilder
    from raytracingweekend_tpu.render import render
    from raytracingweekend_tpu.utils.config import RenderConfig

    b = SceneBuilder()
    b.sphere((0, 0, -2), 0.7, b.lambertian(b.constant((0.6, 0.3, 0.2))))
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build(background=st.BG_GRADIENT)

    base = RenderConfig(nx=8, ny=8, spp=8, max_depth=3, samples_per_launch=2)
    full = render(scene, base)

    ckpt = str(tmp_path / "r.ckpt")
    half = RenderConfig(nx=8, ny=8, spp=4, max_depth=3, samples_per_launch=2,
                        checkpoint=ckpt)
    render(scene, half)
    rest = RenderConfig(nx=8, ny=8, spp=8, max_depth=3, samples_per_launch=2,
                        checkpoint=ckpt)
    resumed = render(scene, rest)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(resumed))
