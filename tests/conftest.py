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
from cmr_agent_tpu.cli.common import host_feature_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  host_feature_cache_dir(
                      os.environ.get("CMR_TEST_COMPILE_CACHE",
                                     "/tmp/cmr_jax_test_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# Slow-tail marking (VERDICT r2 weak #4): tests marked ``slow`` are the
# wall-clock tail (multi-process spawns, duplicate-coverage heavyweights —
# top-10 timings in docs/ROADMAP.md). They SKIP by default so the developer
# loop stays short, and run with ``--runslow`` (CI / certification runs).
# Every subsystem keeps at least one default-run test, so the default suite
# loses redundancy, not coverage.
# ---------------------------------------------------------------------------


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow (the wall-clock tail)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: wall-clock tail; skipped unless --runslow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tail: pass --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
