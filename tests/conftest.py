"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip sharding (shard_map/pjit) is tested against fake host devices, the
standard JAX trick (``--xla_force_host_platform_device_count``).  The real
TPU chip is only used by bench.py, never by the test suite.

Note: this environment's sitecustomize registers an ``axon`` TPU backend and
force-sets ``jax_platforms="axon,cpu"`` via jax.config — env vars alone are
not enough, the config must be updated back after importing jax.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite compiles several large conv
# nets (ResNet50/EffNet inits take minutes on CPU); caching makes repeat
# runs take seconds instead
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
