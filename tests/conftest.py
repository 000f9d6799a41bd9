"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster" —
sharding/pjit paths compile and execute against 8 XLA host devices
(SURVEY.md §4).

Note: this environment registers the TPU ('axon') PJRT plugin from a
sitecustomize at interpreter startup, so jax is already imported before
conftest runs and env vars alone cannot switch platforms. Backends
initialise lazily, so ``jax.config.update`` below still takes effect —
it must run before the first device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: XLA:CPU executables are AOT-serialisable, so
# repeat suite runs skip compilation entirely (the dominant cost on this
# host — the suite is compile-bound, not compute-bound). The non-default
# min_entry_size=-1 is required: CPU executables are small and the default
# size floor silently drops them all.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CMR_TEST_COMPILE_CACHE",
                                 "/tmp/cmr_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
