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
from raytracingweekend_tpu.ops import megakernel as mk
from raytracingweekend_tpu.render import render_chunk_tiled

NX, NY = 1200, 800
MAX_DEPTH = 50
SPP_PER_LAUNCH = 64
TIMED_LAUNCHES = 4  # ~4.4 s each at current throughput; multi-scene
# coverage with spread lives in tools/bench_all.py -> docs/bench_r03.jsonl
BASELINE_RAYS_PER_S = 1.0e9


def main():
    scene = make_scene("random_balls", NX / NY)
    key = jax.random.key(0)

    # Fused Pallas megakernel (ops/megakernel.py): the whole
    # camera->intersect->shade->regen loop in one VMEM-resident kernel.
    use_mega = (mk.supports_scene(scene)
                and not os.environ.get("RTW_BENCH_TILED")
                and jax.default_backend() not in ("cpu", "gpu"))

    def launch_fn(k):
        if use_mega:
            return mk.trace_mega(k, scene, NX, NY, SPP_PER_LAUNCH,
                                 max_depth=MAX_DEPTH)
        return render_chunk_tiled(scene, k, NX, NY, SPP_PER_LAUNCH,
                                  MAX_DEPTH)

    # Warmup / compile (persistent-cached across runs). Two launches: the
    # first compiles, the second absorbs one-time dispatch/host-transfer
    # setup so the timed section measures steady state.
    img, seg = launch_fn(key)
    _ = float(seg)
    img, seg = launch_fn(jax.random.fold_in(key, 999))
    _ = float(seg)

    total_segments = 0.0
    t0 = time.perf_counter()
    for launch in range(TIMED_LAUNCHES):
        img, seg = launch_fn(jax.random.fold_in(key, launch + 1))
        total_segments += float(seg)  # forces device sync per launch
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
