"""Test configuration: CPU backend with 8 virtual devices, float64.

Mirrors the reference's test philosophy (SURVEY.md §4): distributed tests run
the SAME code at any shard count; here nsize is a virtual-device mesh on one
host. The axon sitecustomize pre-imports jax with the TPU backend, so we
switch the platform to cpu post-import (allowed before backend init).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

if os.environ.get("PETSC_TPU_TEST_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _fresh_options():
    """Each test gets a clean options database (PetscInitialize semantics).

    Also drops jax's compiled-executable caches every 40 tests: a full
    suite accumulates thousands of live XLA CPU executables, and past
    ~400 tests the CPU backend segfaults inside backend_compile (code
    -buffer exhaustion). Periodic clear_caches keeps one long pytest
    process stable at a small recompile cost."""
    import petsc_tpu as pt
    pt.init(args=[])
    _test_counter["n"] += 1
    if _test_counter["n"] % 40 == 0:
        jax.clear_caches()
    yield
