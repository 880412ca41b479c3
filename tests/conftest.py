"""Test env: 8 virtual CPU devices so mesh/shard_map paths run without a TPU.

SURVEY.md §4.2 ("Distributed tests without a cluster"): set
``xla_force_host_platform_device_count`` before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which outranks the env var — override it back so the
# suite never compiles over the TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compile cache: repeat suite runs skip XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpucdc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
