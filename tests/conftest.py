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
# XLA:CPU backend opt level 0: ~1.9x faster cold compiles (measured: tiny
# train step 195s -> 106s on the 1-core box). Numerics stay self-consistent —
# every test compares JAX-vs-JAX compiled under the same flags; host-side
# C++/Python rANS bit-exactness is unaffected. Set TPUCDC_TEST_FULL_OPT=1 to
# restore full optimization (e.g. when chasing an XLA-pass-dependent bug).
if os.environ.get("TPUCDC_TEST_FULL_OPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)
# Persistent compile cache: repeat suite runs skip XLA compilation. Lives
# under /root/.cache (not /tmp) so it survives reboots/tmp-cleanup — a cold
# suite on this 1-core box recompiles for tens of minutes otherwise. The
# TPU cache (/root/.cache/jax_tpucdc) is separate: cache keys are
# platform-specific, so CPU tests would never hit TPU entries.
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/tpucdc_jax_cpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
