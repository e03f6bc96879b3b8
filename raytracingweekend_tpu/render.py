"""Top-level rendering API + CLI.

Replaces the reference's main() render loop (reference:
RayTracingWeekend.cpp:195-289): the triple-nested PPL parallel_for over
rows x cols x samples becomes one jitted wavefront launch per sample chunk —
every (pixel, sample) is a ray in a flat batch, jittered exactly like
cpp:227-228, traced, and box-filter accumulated (cpp:235-241). Gamma-2 and
PPM/PNG writing live in utils.image.

Usage:
    python -m raytracingweekend_tpu.render --scene cornell_box --nx 400 \
        --ny 400 --spp 64 --out cornell.png
"""
from __future__ import annotations

import argparse
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .models import scene_types as st
from .models.scenes import make_scene, SCENES
from .ops import camera as camera_mod
from .ops import sampling
from .ops.integrator import trace
from .utils.config import RenderConfig
from .utils import image as image_mod


@partial(jax.jit, static_argnames=("nx", "ny", "chunk_spp", "max_depth",
                                   "mode"))
def render_chunk(scene: st.Scene, key, nx: int, ny: int, chunk_spp: int,
                 max_depth: int = 100, mode: str = "while"):
    """Trace chunk_spp jittered samples for every pixel; returns the radiance
    *sum* (ny, nx, 3) over the chunk (row 0 = image bottom, like the
    reference canvas at cpp:247)."""
    n_pix = nx * ny
    n_rays = n_pix * chunk_spp
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    i = jnp.tile(pix % nx, chunk_spp)
    j = jnp.tile(pix // nx, chunk_spp)

    k_u, k_v, k_cam, k_trace = jax.random.split(key, 4)
    # Jittered subpixel sampling (cpp:227-228).
    u = (i.astype(jnp.float32) + sampling.uniform(k_u, (n_rays,))) / nx
    v = (j.astype(jnp.float32) + sampling.uniform(k_v, (n_rays,))) / ny

    o, d, t = camera_mod.get_rays(k_cam, scene.camera, u, v)
    rad = trace(k_trace, o, d, t, scene, max_depth=max_depth, mode=mode)
    return rad.reshape(chunk_spp, ny, nx, 3).sum(axis=0)


def render(scene: st.Scene, cfg: RenderConfig, *, progress: bool = False):
    """Render to a linear-radiance canvas (ny, nx, 3) float32, averaged over
    cfg.spp samples. Accumulation is chunked over samples so HBM stays
    bounded; the RNG is folded per chunk so results are seed-deterministic
    and checkpoint/resume-safe."""
    key = jax.random.key(cfg.seed)
    chunk = min(cfg.samples_per_launch, cfg.spp)
    acc = np.zeros((cfg.ny, cfg.nx, 3), np.float32)
    done = 0
    launch = 0
    while done < cfg.spp:
        this = min(chunk, cfg.spp - done)
        part = render_chunk(scene, jax.random.fold_in(key, launch),
                            cfg.nx, cfg.ny, this, cfg.max_depth,
                            cfg.loop_mode)
        acc += np.asarray(part)
        done += this
        launch += 1
        if progress:
            print(f"  spp {done}/{cfg.spp}", flush=True)
    return acc / cfg.spp


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", default="cornell_box", choices=sorted(SCENES))
    p.add_argument("--nx", type=int, default=400)
    p.add_argument("--ny", type=int, default=400)
    p.add_argument("--spp", type=int, default=64)
    p.add_argument("--max-depth", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--samples-per-launch", type=int, default=8)
    p.add_argument("--out", default="out.png")
    p.add_argument("--normals", action="store_true",
                   help="RenderType::Normal debug shading (cpp:135-136)")
    args = p.parse_args(argv)

    cfg = RenderConfig(nx=args.nx, ny=args.ny, spp=args.spp,
                       max_depth=args.max_depth, seed=args.seed,
                       samples_per_launch=args.samples_per_launch)
    scene = make_scene(args.scene, cfg.aspect)
    if args.normals:
        scene = scene.replace(render_type=st.RENDER_NORMAL)

    t0 = time.perf_counter()
    canvas = render(scene, cfg, progress=True)
    trace_ms = (time.perf_counter() - t0) * 1000.0

    t0 = time.perf_counter()
    out01 = image_mod.postprocess(canvas)
    if args.out.endswith(".ppm"):
        image_mod.write_ppm(out01, args.out)
    else:
        image_mod.write_png(out01, args.out)
    write_ms = (time.perf_counter() - t0) * 1000.0

    # Same self-report as cpp:279-280.
    print(f"Trace: {trace_ms:.0f}ms")
    print(f"Write: {write_ms:.0f}ms")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
