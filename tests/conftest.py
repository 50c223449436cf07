"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without a TPU pod (SURVEY.md section 4, "distributed tests without a pod").
The axon TPU plugin ignores JAX_PLATFORMS, so the platform is forced through
jax.config before any backend is initialized."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
