"""Image I/O tests: PPM/PNG codecs and the gamma postprocess
(reference oracle: RayTracingWeekend.cpp:241-277)."""
import numpy as np

from raytracingweekend_tpu.utils import image as im


def _canvas():
    rng = np.random.default_rng(0)
    return rng.uniform(0.0, 1.0, size=(7, 5, 3))


def test_postprocess_gamma_and_clamp():
    c = np.array([[[0.25, 1.44, -0.1]]])
    out = im.postprocess(c)
    np.testing.assert_allclose(out[0, 0], [0.5, 1.0, 0.0], atol=1e-12)


def test_ppm_roundtrip(tmp_path):
    c = _canvas()
    path = str(tmp_path / "x.ppm")
    im.write_ppm(c, path)
    back = im.read_ppm(path)
    assert back.shape == c.shape
    # quantization error <= 1/255 plus int truncation
    assert np.abs(back - c).max() < 1.0 / 255.0 + 1e-9


def test_ppm_header_matches_reference_format(tmp_path):
    c = _canvas()
    path = str(tmp_path / "x.ppm")
    im.write_ppm(c, path)
    with open(path) as f:
        head = f.read().split("\n")[:3]
    assert head == ["P3", "5 7", "255"]  # cpp:257


def test_png_roundtrip(tmp_path):
    c = _canvas()
    path = str(tmp_path / "x.png")
    im.write_png(c, path)
    back = im.read_png(path)
    assert back.shape == c.shape
    assert np.abs(back - c).max() < 1.0 / 255.0 + 1e-9


def test_png_reads_foreign_file(tmp_path):
    # Encode with a different filter pattern: zlib level 9 + per-row Sub/Up
    # filters exercised via our own writer is not enough; synthesize a Paeth
    # row manually to exercise the unfilter path.
    import struct, zlib
    nx, ny = 4, 3
    rows = np.arange(nx * ny * 3, dtype=np.uint8).reshape(ny, nx * 3)
    raw = b""
    for j, ftype in enumerate((1, 3, 4)):  # Sub, Average, Paeth
        row = rows[j].astype(np.int32)
        prev = rows[j - 1].astype(np.int32) if j else np.zeros(nx * 3, np.int32)
        enc = np.zeros(nx * 3, np.int32)
        for i in range(nx * 3):
            a = row[i - 3] if i >= 3 else 0
            b = prev[i]
            cc = prev[i - 3] if i >= 3 else 0
            if ftype == 1:
                pred = a
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[i] = (row[i] - pred) & 0xFF
        raw += bytes([ftype]) + enc.astype(np.uint8).tobytes()

    def chunk(tag, payload):
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", nx, ny, 8, 2, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    path = str(tmp_path / "f.png")
    with open(path, "wb") as f:
        f.write(png)
    back = im.read_png(path)
    expect = (rows.reshape(ny, nx, 3).astype(np.float64) / 255.0)[::-1]
    np.testing.assert_allclose(back, expect, atol=1e-12)


def test_quantization_matches_reference_25599():
    # int(255.99 * c) (cpp:268-270): c = 1.0 -> 255, c = 0.5 -> 127.
    c = np.array([[[1.0, 0.5, 0.0]]])
    q = im._quantize(c)
    assert q[0, 0].tolist() == [255, 127, 0]
