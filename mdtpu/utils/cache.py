"""Persistent XLA compilation cache helper.

TPU compiles in this environment go through a remote AOT helper that can take
~60 s per new program; the on-disk cache makes repeat runs (bench re-runs,
driver restarts) near-instant. Call once before building jitted programs.
"""
import jax

_DEFAULT_DIR = "/root/.cache/jax_comp"


def enable_compilation_cache(directory: str = _DEFAULT_DIR) -> None:
    if jax.config.jax_platforms == "cpu":
        # Forced-CPU sessions (the pytest conftest) compile locally in
        # milliseconds — the cache buys nothing there, and its executable
        # serialization path has segfaulted mid-suite twice (abort inside
        # compilation_cache.put_executable_and_time). TPU scripts never
        # force the platform, so they keep the cache.
        return
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
