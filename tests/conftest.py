"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests)
and enable x64 so golden comparisons can run in double precision.

Must run before any `import jax` in test modules — pytest imports conftest
first, so setting env vars here is sufficient.
"""
import os
import sys

# Force CPU even when the shell pre-sets JAX_PLATFORMS (e.g. a TPU tunnel):
# tests validate multi-chip sharding on an 8-device virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The TPU-tunnel sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, which overrides the env var — force it
# back to plain CPU so tests run on the 8-device virtual mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
