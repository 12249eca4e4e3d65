"""Precision policy helpers.

The framework's dtype contract (SURVEY.md §7 "FP64 on TPU" hard part):
f64 is the verification precision on CPU lanes (x64 enabled by the test
harness and the validation campaigns), f32/bf16 the production TPU
precision.  Code must never *silently* truncate — an explicit
``jnp.float64`` with x64 disabled downcasts with a per-call UserWarning
(the BENCH_r01 warning spam, VERDICT.md r1 weak #3).  Use
``default_float()`` wherever "the widest float available here" is meant.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import dtypes as _jdtypes


def default_float():
    """The widest canonical float: f64 when x64 is enabled, else f32."""
    return _jdtypes.canonicalize_dtype(jnp.float64)


def canonical(dtype):
    """Canonicalize an explicit dtype request (f64 -> f32 when x64 is off)
    without the per-call truncation warning."""
    return _jdtypes.canonicalize_dtype(dtype)
