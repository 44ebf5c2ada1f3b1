"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on
XLA's host-platform device emulation (SURVEY.md section 4 implication).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
