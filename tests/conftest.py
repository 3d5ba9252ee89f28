import os

# Tests run on a virtual 8-device CPU mesh. The device-count flag must be
# set before the backend initializes; the platform choice must ALSO be
# forced via jax.config because the environment's TPU plugin (axon) wins
# over the JAX_PLATFORMS env var.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU unconditionally: the ambient environment may export
# JAX_PLATFORMS=axon (the TPU tunnel), and tests must never run there.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the solver jits are expensive to build
# (minutes across the suite); repeat runs hit the cache.
#
# Known environment flake (jaxlib 0.9 CPU): a COLD-cache full-suite run
# in one process can crash (SIGSEGV/SIGABRT) late in the suite while
# COMPILING 8-device mesh executables - observed inside
# backend_compile_and_load and the cache read/write paths, always after
# hundreds of prior in-process compiles, never in per-file runs. Every
# test passes per-file, and warm-cache full runs are stable (no
# compiles happen). If a full run crashes, re-running resumes from the
# persistent cache and completes; `for f in tests/test_*.py; do pytest
# $f; done` is the deterministic fallback. Also: never kill a test run
# mid-compile-write - a truncated cache entry aborts later reads; if
# that happens, delete tests/.jax_cache.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound the number of live compiled executables in the process.

    The full suite compiles/loads hundreds of executables; with all of
    them alive, loading the next large 8-device mesh executable
    segfaults inside jaxlib (see the cache note above). Dropping the
    in-memory jit caches between modules keeps the live set small; the
    persistent cache makes the reloads cheap."""
    yield
    import jax

    jax.clear_caches()
