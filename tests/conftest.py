"""Test configuration: force an 8-device virtual CPU platform so
multi-chip sharding semantics are testable without TPU hardware
(SURVEY.md §4 'Distributed without a cluster').

Note: this image presets jax_platforms='axon,cpu' (the axon TPU
tunnel), which overrides the JAX_PLATFORMS env var — the config must
be updated after import, before any computation."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# CPU-only test speedup: LLVM codegen at -O0 cuts XLA:CPU compile times
# ~3-4x for this model's large inlined graphs (runtime is irrelevant at
# test sizes).  Never set for TPU runs.
if "xla_backend_optimization_level" not in _flags:
    _flags += (" --xla_backend_optimization_level=0"
               " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the model's graphs are large and XLA:CPU
# compiles are minutes — cache executables across test runs
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
