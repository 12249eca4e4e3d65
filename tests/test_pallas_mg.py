"""Fused single-kernel Pallas V-cycle: parity vs the XLA ladder.

The fused kernel (``ops/pallas_mg.py``) must reproduce
``ops.multigrid.vcycle`` level-for-level (same smoothing masks, transfer
stencils, sweep counts) — runs in interpreter mode here, compiled on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.ops.multigrid import vcycle
from scpn_fusion_tpu.ops.pallas_mg import _level_plan, fused_coarse_vcycle


def _problem(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    r = jnp.linspace(2.0, 10.0, n, dtype=dtype)
    dr = float(r[1] - r[0])
    psi = jnp.asarray(rng.standard_normal((n, n)), dtype)
    src = jnp.asarray(rng.standard_normal((n, n)), dtype)
    return psi, src, r, dr, dr


@pytest.mark.parametrize("n", [17, 65, 129])
def test_fused_matches_xla_vcycle(n):
    psi, src, r, dr, dz = _problem(n)
    ref = vcycle(psi, src, r, dr, dz, omega=1.0)
    fus = fused_coarse_vcycle(psi, src, r, dr, dz, 1.0, interpret=True)
    span = float(ref.max() - ref.min())
    dev = float(jnp.max(jnp.abs(ref - fus))) / span
    assert dev < 1e-6, f"span-rel dev {dev:.3e} at {n}^2"


def test_fused_matches_asymmetric_smoothing():
    psi, src, r, dr, dz = _problem(65, seed=3)
    ref = vcycle(psi, src, r, dr, dz, omega=1.0, pre_smooth=1, post_smooth=2)
    fus = fused_coarse_vcycle(psi, src, r, dr, dz, 1.0,
                              pre_smooth=1, post_smooth=2, interpret=True)
    span = float(ref.max() - ref.min())
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-6


def test_fused_preserves_dirichlet_boundary():
    psi, src, r, dr, dz = _problem(65, seed=5)
    fus = fused_coarse_vcycle(psi, src, r, dr, dz, 1.0, interpret=True)
    np.testing.assert_array_equal(np.asarray(fus[0, :]), np.asarray(psi[0, :]))
    np.testing.assert_array_equal(np.asarray(fus[-1, :]), np.asarray(psi[-1, :]))
    np.testing.assert_array_equal(np.asarray(fus[:, 0]), np.asarray(psi[:, 0]))
    np.testing.assert_array_equal(np.asarray(fus[:, -1]), np.asarray(psi[:, -1]))


def test_level_plan_matches_recursion_rule():
    assert _level_plan(129, 5) == [129, 65, 33, 17, 9, 5]
    assert _level_plan(65, 5) == [65, 33, 17, 9, 5]
    assert _level_plan(5, 5) == [5]


def test_non_pow2_grid_rejected():
    psi, src, r, dr, dz = _problem(64)
    with pytest.raises(ValueError, match="2\\^k\\+1"):
        fused_coarse_vcycle(psi, src, r, dr, dz, 1.0, interpret=True)
