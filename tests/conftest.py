"""Test configuration: force an 8-virtual-device CPU platform.

This is the standard way to test TPU sharding logic without a real slice
(SURVEY.md section 4): XLA exposes N host CPU devices, so pjit/shard_map
tests exercise real collectives.

Must run before jax imports anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter start and
# pre-empts the JAX_PLATFORMS env var, so force the platform via jax.config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
