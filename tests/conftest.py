"""Test harness config: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests exercise the
same GSPMD partitioning logic on forced host-platform devices. The
environment may pre-import jax (site customization), so the platform is
forced through jax.config rather than env vars alone.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
