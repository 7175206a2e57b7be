"""Test configuration: force CPU with 8 virtual devices so the data-parallel /
sharding tests exercise a real mesh without TPU hardware (SURVEY.md §4 — the
JAX-native 'fake backend').

Note: this environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (one remote TPU chip), so plain env-var setting in conftest
is too late.  Backends initialize lazily, so switching jax.config here still
works — as long as no test module touches a device before this file runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend())
assert jax.device_count() == 8, jax.device_count()


# ---------------------------------------------------------------------------
# Two-tier test suite: the quick tier (`pytest -m "not slow"`) runs in
# ~2 minutes; the full suite (~15 min) adds the heavy parallelism /
# finite-difference / train-loop compiles.  Slow tests are listed by measured
# duration (>5 s) in slow_tests.txt; regenerate with
#   python -m pytest tests/ -q --durations=0 | awk '$2=="call" && $1+0>5 {print $3}'
# ---------------------------------------------------------------------------

import pytest

_here = os.path.dirname(__file__)
with open(os.path.join(_here, "slow_tests.txt")) as _f:
    _SLOW = {line.strip() for line in _f if line.strip()}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >5s; excluded from the quick tier "
        "(-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if nodeid in _SLOW:
            item.add_marker(pytest.mark.slow)
