"""Test harness configuration.

Runs the suite on CPU with 8 virtual XLA devices so multi-chip sharding
(`shard_map` + mesh collectives) is exercised without TPU hardware — the
same trick the reference uses to test its MPI-shaped decomposition without a
cluster (SURVEY.md §4).  x64 is enabled so accuracy gates can compare against
float64 NumPy twins; production TPU runs stay in f32/bf16.

Note: this image's sitecustomize imports jax and registers the TPU (axon)
backend in every interpreter, so env vars are too late here — we switch the
platform through jax.config before any backend is initialised.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    The full ~780-test suite segfaults inside XLA's CPU compiler at a
    position-dependent point (~91%) while every subset passes — the
    accumulated live-executable footprint across hundreds of distinct
    jitted programs eventually corrupts/exhausts the JIT code arena
    (reproduced twice at the same test, each half-suite green).  Bounding
    live executables to one module's worth removes the failure mode at a
    small recompile cost.
    """
    yield
    jax.clear_caches()
