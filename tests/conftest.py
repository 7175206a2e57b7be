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
