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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
