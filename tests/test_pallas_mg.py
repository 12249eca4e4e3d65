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


# ── Fine-level wrap kernels (513²-class levels above the fused-tail cap) ──


@pytest.mark.parametrize("n,pre", [(65, 3), (129, 1)])
def test_fine_presmooth_restrict_matches_ladder(n, pre):
    from scpn_fusion_tpu.ops.multigrid import restrict_full_weight, smooth
    from scpn_fusion_tpu.ops.pallas_mg import fine_presmooth_restrict
    from scpn_fusion_tpu.ops.stencil import gs_residual

    psi, src, r, dr, dz = _problem(n, seed=7)
    p_ref = smooth(psi, src, r, dr, dz, 1.0, pre, use_pallas=False)
    d_ref = restrict_full_weight(gs_residual(p_ref, src, r, dr, dz))

    p_fus, d_fus = fine_presmooth_restrict(
        psi, src, r, dr, dz, 1.0, pre_smooth=pre, interpret=True)

    span_p = float(p_ref.max() - p_ref.min())
    assert float(jnp.max(jnp.abs(p_ref - p_fus))) / span_p < 1e-6
    span_d = float(d_ref.max() - d_ref.min()) or 1.0
    assert float(jnp.max(jnp.abs(d_ref - d_fus))) / span_d < 1e-6


@pytest.mark.parametrize("n,post", [(65, 3), (129, 2)])
def test_fine_prolong_smooth_matches_ladder(n, post):
    from scpn_fusion_tpu.ops.multigrid import prolongate_bilinear, smooth
    from scpn_fusion_tpu.ops.pallas_mg import fine_prolong_smooth

    psi, src, r, dr, dz = _problem(n, seed=11)
    nc = (n + 1) // 2
    rng = np.random.default_rng(13)
    e = jnp.asarray(rng.standard_normal((nc, nc)), jnp.float32)
    # Coarse error fields have a zero boundary ring (built from the zero
    # defect ring) — match that contract.
    e = e.at[0, :].set(0.0).at[-1, :].set(0.0).at[:, 0].set(0.0).at[:, -1].set(0.0)

    p_corr = psi + prolongate_bilinear(e, n, n)
    ref = smooth(p_corr, src, r, dr, dz, 1.0, post, use_pallas=False)

    fus = fine_prolong_smooth(psi, src, e, r, dr, dz, 1.0,
                              post_smooth=post, interpret=True)
    span = float(ref.max() - ref.min())
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-6


def test_fine_wrap_full_vcycle_parity_513():
    """End-to-end: wrapped 513² V-cycle == unfused XLA V-cycle."""
    from scpn_fusion_tpu.ops.multigrid import _vcycle_impl
    from scpn_fusion_tpu.ops.pallas_mg import (
        fine_presmooth_restrict, fine_prolong_smooth,
    )

    n = 513
    psi, src, r, dr, dz = _problem(n, seed=17)
    ref = _vcycle_impl(psi, src, r, dr, dz, 1.0, 1, 2, 5, 50, False)

    # Same composition the use_pallas branch takes, interpreted here.
    psi_s, d_c = fine_presmooth_restrict(psi, src, r, dr, dz, 1.0,
                                         pre_smooth=1, interpret=True)
    e_c = _vcycle_impl(jnp.zeros_like(d_c), d_c, r[::2], dr * 2, dz * 2,
                       1.0, 1, 2, 5, 50, False)
    fus = fine_prolong_smooth(psi_s, src, e_c, r, dr, dz, 1.0,
                              post_smooth=2, interpret=True)
    span = float(ref.max() - ref.min())
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-5


def test_fine_wrap_preserves_dirichlet_boundary():
    from scpn_fusion_tpu.ops.pallas_mg import (
        fine_presmooth_restrict, fine_prolong_smooth,
    )
    psi, src, r, dr, dz = _problem(65, seed=19)
    psi_s, d_c = fine_presmooth_restrict(psi, src, r, dr, dz, 1.0,
                                         pre_smooth=2, interpret=True)
    nc = (65 + 1) // 2
    e = jnp.zeros((nc, nc), jnp.float32)
    out = fine_prolong_smooth(psi_s, src, e, r, dr, dz, 1.0,
                              post_smooth=2, interpret=True)
    for sl in (np.s_[0, :], np.s_[-1, :], np.s_[:, 0], np.s_[:, -1]):
        np.testing.assert_array_equal(np.asarray(out[sl]), np.asarray(psi[sl]))
    # restricted defect carries a zero ring
    d = np.asarray(d_c)
    assert (d[0, :] == 0).all() and (d[-1, :] == 0).all()
    assert (d[:, 0] == 0).all() and (d[:, -1] == 0).all()
