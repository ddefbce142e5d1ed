"""Test harness: force an 8-virtual-device CPU platform before JAX loads.

This is how JAX projects test mesh/DP logic without a real multi-chip slice
(SURVEY.md §4). All tests run on CPU; real-TPU benchmarking lives in
``bench.py``.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize in some environments force-selects an accelerator plugin
# via jax.config (which beats env vars); put CPU back for the test suite.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: the suite is jit-compile-dominated, and the
# programs are deterministic — repeat runs (the common case for a CI gate)
# skip most XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full-suite tier)")


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: the default run skips @pytest.mark.slow (task
    end-to-end / dryrun / big-model tests) and finishes in ~3 min; CI runs
    ``pytest --runslow`` (scripts/ci_full_suite.sh) for everything."""
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_preemption_flag():
    """The preemption stop flag is process-wide by design; don't let one
    test's SIGTERM stop later tests' training loops."""
    yield
    from siss_tpu.utils.preemption import PreemptionGuard

    PreemptionGuard().reset()
