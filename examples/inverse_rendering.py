"""Inverse rendering demo: recover scene parameters by gradient descent.

The reference renderer has no gradient story; this is the capability the
TPU rebuild adds (BASELINE.md). A target image is rendered with known
material colors, the colors are then scrambled, and Adam descends the
pixel L2 loss through the differentiable scan-mode integrator back to the
originals — all through `jax.grad` of the renderer itself.

Run:  python examples/inverse_rendering.py  (CPU-friendly: ~1 min)
Outputs target / initial / fitted PNGs next to this script.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from raytracingweekend_tpu.models import scene_types as st
from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.grad import render_diff, fit_texture_colors
from raytracingweekend_tpu.utils import image as image_mod

HERE = os.path.dirname(os.path.abspath(__file__))
KEY = jax.random.key(0)
NX = NY = 48
SPP = 24
DEPTH = 5


def build(colors):
    b = SceneBuilder()
    b.sphere((-1.1, 0.0, -3.0), 0.9, b.lambertian(b.constant(colors[0])))
    b.sphere((1.1, 0.0, -3.0), 0.9, b.lambertian(b.constant(colors[1])))
    b.sphere((0.0, -100.9, -3.0), 100.0, b.lambertian(b.constant(colors[2])))
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, NX / NY, 0.0, 1.0)
    return b.build(background=st.BG_GRADIENT)


def save(img, name):
    path = os.path.join(HERE, name)
    image_mod.write_png(image_mod.postprocess(np.asarray(img)), path)
    print("wrote", path)


def main():
    true_colors = [(0.8, 0.2, 0.2), (0.2, 0.3, 0.8), (0.6, 0.6, 0.1)]
    target_scene = build(true_colors)
    target = render_diff(target_scene, KEY, NX, NY, SPP, DEPTH)
    save(target, "inverse_target.png")

    start = build([(0.5, 0.5, 0.5)] * 3)
    save(render_diff(start, KEY, NX, NY, SPP, DEPTH), "inverse_start.png")

    fitted, loss = fit_texture_colors(
        start, target, key=KEY, nx=NX, ny=NY, spp=SPP, max_depth=DEPTH,
        steps=80, lr=0.08,
        log_fn=lambda i, l: print(f"  step {i:3d} loss {l:.3e}")
        if i % 20 == 0 else None)
    save(render_diff(fitted, KEY, NX, NY, SPP, DEPTH), "inverse_fitted.png")

    got = np.asarray(fitted.textures.color[:3])
    print("recovered colors:")
    for g, t in zip(got, true_colors):
        print(f"  {np.round(g, 3)}  (true {t})")
    print(f"final per-step loss {loss:.3e}")


if __name__ == "__main__":
    main()
