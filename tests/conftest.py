"""Test harness config: run the suite on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI, so sharding tests exercise the
same GSPMD partitioning logic on forced host-platform devices. The
environment may pre-import jax (site customization), so the platform is
forced through jax.config rather than env vars alone.
"""
import os

# RTW_TEST_TPU=1 runs the suite on the real device (used for the full
# golden-image validation); default is the virtual 8-device CPU mesh.
_USE_TPU = bool(os.environ.get("RTW_TEST_TPU"))

_flags = os.environ.get("XLA_FLAGS", "")
if not _USE_TPU:
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
