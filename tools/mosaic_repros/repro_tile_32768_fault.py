"""Minimized repro for Mosaic/XLA landmine (b): the T = 1<<15 tile shape
faults the TPU worker inside the tiled integrator.

Context (VERDICT r1 weak #2): integrator.trace_tiled computes per-tile
pixel counts; with exactly T = 32768 pixels per tile the launch brings the
TPU worker down (device-level fault, not a Python exception) while 16384
and 65536 run fine and CPU is correct for all three. trace_tiled sidesteps
the shape (ops/integrator.py bumps it to 1<<16) and
tests/test_integrator_guards.py pins the guard.

WARNING: running this with --really on the shared TPU is expected to
CRASH THE WORKER (recovery can take ~30-60 min on this tunnel). It exists
to reproduce the fault deliberately when debugging with a dedicated chip,
not as part of any suite.

    python tools/mosaic_repros/repro_tile_32768_fault.py            # dry run
    python tools/mosaic_repros/repro_tile_32768_fault.py --really   # fault
"""
from __future__ import annotations

import sys


def main():
    if "--really" not in sys.argv:
        print(__doc__)
        print("dry run: pass --really on a dedicated chip to reproduce.")
        return

    import os
    os.environ["RTW_DISABLE_TILE_GUARD"] = "1"  # arm the faulting shape

    import jax
    from raytracingweekend_tpu.models.scenes import make_scene
    from raytracingweekend_tpu.ops.integrator import trace_tiled

    scene = make_scene("random_balls", 1.5)
    # 1<<19 slots at k=16 sample-parallel slots/pixel -> T = 1<<15 pixels
    # per tile, the faulting shape (the production guard normally bumps it).
    print("launching T=32768 tile (expect device fault)...", flush=True)
    img, segs = trace_tiled(jax.random.key(0), scene, 1200, 800, 128,
                            max_depth=8, n_slots=1 << 19, spp_per_slot=8)
    print("segs:", float(segs), "(no fault this time?)")


if __name__ == "__main__":
    main()
