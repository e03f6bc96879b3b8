"""Regression pins for the Mosaic/XLA landmine workarounds
(tools/mosaic_repros/ holds the minimized on-device repros)."""
import jax
import numpy as np

from raytracingweekend_tpu.ops.integrator import _tile_width


def test_tile_width_guard_pins_faulting_shape(monkeypatch):
    # The exact shape T=1<<15 faults the TPU worker (see
    # repro_tile_32768_fault.py); the guard must bump it and ONLY it.
    monkeypatch.delenv("RTW_DISABLE_TILE_GUARD", raising=False)
    assert _tile_width(1 << 19, 16) == 1 << 16   # would be 1<<15
    assert _tile_width(1 << 19, 8) == 1 << 16    # genuinely 1<<16
    assert _tile_width(1 << 19, 32) == 1 << 14   # below: untouched
    assert _tile_width(1 << 10, 8) == 256        # floor
    # escape hatch for the deliberate repro
    monkeypatch.setenv("RTW_DISABLE_TILE_GUARD", "1")
    assert _tile_width(1 << 19, 16) == 1 << 15


def test_dot_k3_subslice_interpret_baseline():
    """The K=3 sub-slice dot_general repro (landmine a) — in interpret
    mode both variants must agree with XLA; the on-device discrepancy is
    what tools/mosaic_repros/repro_dot_k3_subslice.py measures."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "repro_dot_k3",
        os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                     "mosaic_repros", "repro_dot_k3_subslice.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    err_sub, err_dense = mod.run(interpret=True)
    assert err_dense < 1e-4
    assert err_sub < 1e-4
