"""Test configuration: force an 8-device virtual CPU mesh before jax init.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on XLA's
host-platform device emulation.  The session's sitecustomize registers the
remote 'axon' TPU backend and pins jax_platforms to it, so we must override
the config *after* jax import but before any backend initialization --
otherwise every jit in the test suite compiles over the TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
