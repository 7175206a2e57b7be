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

# Persistent compilation cache: the full tier is dominated by big XLA:CPU
# compiles (parallelism meshes, fuzz geometries, train loops).  Caching them
# under .pytest_jax_cache makes every rerun of an unchanged test skip its
# compile entirely (measured 26:00 cold -> 16:14 warm on the round-2 host).
#
# OPT-IN (VITRS_JAX_COMPILE_CACHE=1) since round 4: on some hosts XLA:CPU's
# AOT loader rejects the machine-feature signature of entries written BY THE
# SAME HOST ("+prefer-no-scatter/+prefer-no-gather ... not supported on the
# host machine ... could lead to execution errors such as SIGILL"), and two
# full-suite runs SEGFAULTED inside compilation_cache.get_executable_and_time
# deserializing an entry mid-run.  A slower suite beats a crashing one;
# enable explicitly on hosts where the loader round-trips cleanly.
if os.environ.get("VITRS_JAX_COMPILE_CACHE", "0") == "1":
    _cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".pytest_jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


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

# Curated core-parity subset PROMOTED into the quick tier even when the
# duration scan lists them slow: the default developer loop must exercise
# the headline claims (bit-exact fp32 parity, expert-parallel gradient
# parity, 3-D-mesh gradient parity) every run, not only in the slow tier.
# Budget: ~1-2 min added warm (round-3 verdict item 10).
_PROMOTED = {
    "tests/test_bitexact.py::test_loss_bitwise_equal",
    "tests/test_moe.py::test_ep_grad_parity_vs_single_device[2-4]",
    "tests/test_threed.py::test_3d_gpt_loss_and_grads_match_single_device",
}
_SLOW -= _PROMOTED


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: measured >5s; excluded from the quick tier "
        "(-m 'not slow')")


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if nodeid in _SLOW:
            item.add_marker(pytest.mark.slow)
