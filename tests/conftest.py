"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
8 virtual CPU devices (SURVEY.md section 4 test strategy).

Note: a site pytest plugin imports jax before this conftest runs, so env vars
alone are too late -- but the backend is not initialized until first use, so
jax.config.update still takes effect. The session env pre-sets
JAX_PLATFORMS=axon (the real TPU tunnel); unit tests always run on CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
