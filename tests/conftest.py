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

import pytest  # noqa: E402

_TESTS_SINCE_CLEAR = 0


@pytest.fixture(autouse=True)
def _bound_compile_cache_pressure():
    """Clear jax's executable caches every ~60 tests.

    The full suite compiles several hundred distinct XLA:CPU programs in
    one process; past ~140 tests the NEXT compilation segfaults inside
    LLVM (jax_src/compiler.py backend_compile_and_load — reproduced twice
    at the same spot, while every prefix/subset of the suite passes, and
    the crashing test passes standalone). Dropping the live executables
    periodically keeps the native compiler state small; the recompiles it
    forces cost far less than the suite's physics loops."""
    global _TESTS_SINCE_CLEAR
    yield
    _TESTS_SINCE_CLEAR += 1
    if _TESTS_SINCE_CLEAR >= 60:
        _TESTS_SINCE_CLEAR = 0
        jax.clear_caches()
