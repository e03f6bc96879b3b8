"""Observability metrics (SURVEY.md §5: rays/s, spp, variance, grad norms)."""
import json

import numpy as np
import jax

from raytracingweekend_tpu.models import scene_types as st
from raytracingweekend_tpu.models.builder import SceneBuilder
from raytracingweekend_tpu.models.scenes import make_scene
from raytracingweekend_tpu.render import render, RenderStats
from raytracingweekend_tpu.utils.config import RenderConfig
from raytracingweekend_tpu.grad import render_diff, fit_texture_colors


def test_render_metrics_jsonl_and_variance(tmp_path):
    scene = make_scene("dielectric", 1.0)
    cfg = RenderConfig(nx=12, ny=12, spp=16, max_depth=6,
                       samples_per_launch=4, seed=3, loop_mode="while")
    stats = RenderStats()
    mpath = tmp_path / "metrics.jsonl"
    render(scene, cfg, stats=stats, metrics_path=str(mpath))

    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert len(rows) == 4  # one per launch
    assert rows[-1]["spp_done"] == 16
    assert rows[-1]["rays_per_s"] > 0
    # MC estimates fluctuate across launches: variance must be positive and
    # the std error smaller than a per-launch std.
    assert rows[-1]["pixel_variance"] > 0
    assert 0 < rows[-1]["mean_std_error"] < rows[-1]["pixel_variance"] ** 0.5
    assert stats.pixel_variance == rows[-1]["pixel_variance"]


def test_fit_logs_grad_norms(tmp_path):
    b = SceneBuilder()
    b.sphere((0, 0, -2), 1.0, b.lambertian(b.constant((0.4, 0.5, 0.6))))
    b.camera((0, 0, 0), (0, 0, -1), (0, 1, 0), 60.0, 1.0, 0.0, 1.0)
    scene = b.build(background=st.BG_GRADIENT)
    key = jax.random.key(0)
    target = render_diff(scene, key, 8, 8, 4, 4)

    start = scene.replace(textures=scene.textures.replace(
        color=scene.textures.color * 0.5))
    seen = []
    mpath = tmp_path / "fit.jsonl"
    fit_texture_colors(start, target, key=key, nx=8, ny=8, spp=4,
                       max_depth=4, steps=3, lr=0.1,
                       log_fn=lambda s, l, g: seen.append((s, l, g)),
                       metrics_path=str(mpath))
    assert len(seen) == 3
    assert all(np.isfinite(g) and g > 0 for _, _, g in seen)
    rows = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert [r["step"] for r in rows] == [0, 1, 2]
    assert all(r["grad_norm"] > 0 for r in rows)
