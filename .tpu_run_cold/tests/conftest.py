"""Test environment: force the CPU backend with a virtual 8-device mesh (the
standard JAX trick for testing pjit/shard_map topologies without a pod —
SURVEY.md §4) and enable x64 so CPU conformance tests can match the Julia
reference's float64 oracles. TPU benchmarking runs via bench.py, not here.

Note on this image: a sitecustomize hook registers the axon TPU backend in
every Python process and the env pins JAX_PLATFORMS=axon, so ``jax`` is
already imported (config latched) by the time conftest runs. Backend
*initialization* is still lazy, so overriding jax_platforms here keeps tests
off the single TPU entirely — which also avoids deadlocking against a
concurrent TPU process (the axon claim is exclusive).
"""

import os

# Read by the CPU client at backend-init time (still in the future here).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (fixed-shape
# while-loop solvers recompile identically every run); caching executables
# across runs cuts repeat wall-clock several-fold. Keyed on HLO hash, so
# code changes invalidate cleanly. Local dir, gitignored.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"
