"""Export the earth texture as a raw RTWI byte file for the reference oracle.

The reference's image_texture (texture.h:73-98) consumes a flat byte_array
of RGB8 texels with row 0 at the image TOP (its v-flip `j=(1-v)*ny-0.001`
lookup); no decoder exists anywhere in the reference tree, so the oracle
grows a trivial raw loader and this tool feeds it the EXACT texel bytes the
framework's scenes use (models/scenes._earth_pixels -> native libjpeg),
making the image-texture path externally falsifiable end to end.

Format: b"RTWI <nx> <ny>\n" + nx*ny*3 bytes, row-major, row 0 = top.

    python tools/export_texture_raw.py [out.rtwi]
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

from raytracingweekend_tpu.models.scenes import (  # noqa: E402
    _earth_pixels,
    earth_texture_path,
)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "reference_oracle",
        "earth.rtwi")
    # Refuse to export the procedural latitude-band fallback: an oracle
    # texture that silently disagrees with decoder-equipped runs would
    # invalidate every earth golden row downstream.
    if earth_texture_path() is None:
        sys.exit("export_texture_raw: native JPEG decoder or earth asset "
                 "unavailable — refusing to export the procedural fallback "
                 "as the oracle texture (build native/ first: make -C native)")
    pix = np.asarray(_earth_pixels(), np.float64)  # (ny, nx, 3), row 0 bottom
    ny, nx, _ = pix.shape
    data = np.rint(pix * 255.0).astype(np.uint8)[::-1]  # row 0 -> top
    with open(out, "wb") as f:
        f.write(f"RTWI {nx} {ny}\n".encode())
        f.write(data.tobytes())
    print(f"wrote {out}: {nx}x{ny}")


if __name__ == "__main__":
    main()
