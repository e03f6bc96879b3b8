"""Benchmark: rays/s on the book-1 final scene (BASELINE.md headline).

Workload: random_balls (~480 spheres, motion blur) at 1200x800 — the book-1
final-render geometry (Scene/scene.h:98-174). The metric counts *path
segments traced per second* (every bounce iteration counts its active rays),
the standard ray-throughput definition; vs_baseline is against the
BASELINE.json north-star target of 1e9 rays/s per chip.

Prints exactly one JSON line.
"""
from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

# Persistent compile cache: the wavefront integrator's first compile for a
# 512-sphere scene is minutes through a remote-tunnel backend; cache it
# across processes so repeat benchmark runs start hot.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from raytracingweekend_tpu.models.scenes import make_scene
from raytracingweekend_tpu.ops import camera as camera_mod
from raytracingweekend_tpu.ops import sampling
from raytracingweekend_tpu.ops.integrator import trace_with_stats

NX, NY = 1200, 800
MAX_DEPTH = 50
SPP_PER_LAUNCH = 1
TIMED_LAUNCHES = 4
BASELINE_RAYS_PER_S = 1.0e9


@partial(jax.jit, static_argnames=("nx", "ny", "spp", "max_depth"))
def bench_chunk(scene, key, nx: int, ny: int, spp: int, max_depth: int):
    n_pix = nx * ny
    n_rays = n_pix * spp
    pix = jnp.arange(n_pix, dtype=jnp.int32)
    i = jnp.tile(pix % nx, spp)
    j = jnp.tile(pix // nx, spp)
    k_u, k_v, k_cam, k_tr = jax.random.split(key, 4)
    u = (i.astype(jnp.float32) + sampling.uniform(k_u, (n_rays,))) / nx
    v = (j.astype(jnp.float32) + sampling.uniform(k_v, (n_rays,))) / ny
    o, d, t = camera_mod.get_rays(k_cam, scene.camera, u, v)
    rad, segments = trace_with_stats(k_tr, o, d, t, scene,
                                     max_depth=max_depth)
    return rad.reshape(spp, ny, nx, 3).sum(axis=0), segments


def main():
    scene = make_scene("random_balls", NX / NY)
    key = jax.random.key(0)

    # Warmup / compile.
    img, seg = bench_chunk(scene, key, NX, NY, SPP_PER_LAUNCH, MAX_DEPTH)
    img.block_until_ready()

    total_segments = 0.0
    t0 = time.perf_counter()
    for launch in range(TIMED_LAUNCHES):
        img, seg = bench_chunk(scene, jax.random.fold_in(key, launch + 1),
                               NX, NY, SPP_PER_LAUNCH, MAX_DEPTH)
        img.block_until_ready()
        total_segments += float(seg)
    dt = time.perf_counter() - t0

    rays_per_s = total_segments / dt
    print(json.dumps({
        "metric": "rays_per_s",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / BASELINE_RAYS_PER_S,
    }))


if __name__ == "__main__":
    main()
