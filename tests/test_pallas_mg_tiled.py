"""Tiled fused fine-level legs: parity vs the unfused XLA ladder.

The tiled kernels (``ops/pallas_mg_tiled.py``) chunk the fine level over Z
with redundant-compute halo strips; the emitted rows must equal the
monolithic values exactly (up to float re-association).  Interpreter mode
here, compiled on TPU.  Sizes are deliberately NOT chunk-aligned (65, 129
with ``t_rows=32``/``48``) so the pad/ragged-last-chunk path is exercised.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.ops.multigrid import (
    prolongate_bilinear,
    restrict_full_weight,
    smooth,
)
from scpn_fusion_tpu.ops.pallas_mg_tiled import (
    tiled_presmooth_restrict,
    tiled_prolong_smooth,
)
from scpn_fusion_tpu.ops.stencil import gs_residual


def _problem(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    r = jnp.linspace(2.0, 10.0, n, dtype=dtype)
    dr = float(r[1] - r[0])
    psi = jnp.asarray(rng.standard_normal((n, n)), dtype)
    src = jnp.asarray(rng.standard_normal((n, n)), dtype)
    return psi, src, r, dr, dr


@pytest.mark.parametrize("n,pre,t_rows", [(65, 3, 32), (129, 1, 48),
                                          (129, 3, 128)])
def test_tiled_presmooth_restrict_matches_ladder(n, pre, t_rows):
    psi, src, r, dr, dz = _problem(n, seed=7)
    p_ref = smooth(psi, src, r, dr, dz, 1.0, pre, use_pallas=False)
    d_ref = restrict_full_weight(gs_residual(p_ref, src, r, dr, dz))

    p_t, d_t = tiled_presmooth_restrict(
        psi, src, r, dr, dz, 1.0, pre_smooth=pre, t_rows=t_rows,
        interpret=True)

    span_p = float(p_ref.max() - p_ref.min())
    assert float(jnp.max(jnp.abs(p_ref - p_t))) / span_p < 1e-6
    span_d = float(d_ref.max() - d_ref.min()) or 1.0
    assert float(jnp.max(jnp.abs(d_ref - d_t))) / span_d < 1e-6


@pytest.mark.parametrize("n,post,t_rows", [(65, 3, 32), (129, 2, 48)])
def test_tiled_prolong_smooth_matches_ladder(n, post, t_rows):
    psi, src, r, dr, dz = _problem(n, seed=11)
    nc = (n + 1) // 2
    rng = np.random.default_rng(13)
    e = jnp.asarray(rng.standard_normal((nc, nc)), jnp.float32)
    e = e.at[0, :].set(0.0).at[-1, :].set(0.0) \
         .at[:, 0].set(0.0).at[:, -1].set(0.0)

    p_corr = psi + prolongate_bilinear(e, n, n)
    ref = smooth(p_corr, src, r, dr, dz, 1.0, post, use_pallas=False)

    fus = tiled_prolong_smooth(psi, src, e, r, dr, dz, 1.0,
                               post_smooth=post, t_rows=t_rows,
                               interpret=True)
    span = float(ref.max() - ref.min())
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-6


def test_tiled_full_vcycle_parity_1025_class():
    """End-to-end composition parity at a (reduced) above-cap-shaped size:
    the same two-leg + recursive-coarse composition the use_pallas branch
    takes for 1025², checked at 257 with small chunks so the test stays
    fast while the ragged-chunk + halo logic is identical."""
    from scpn_fusion_tpu.ops.multigrid import _vcycle_impl

    n = 257
    psi, src, r, dr, dz = _problem(n, seed=17)
    ref = _vcycle_impl(psi, src, r, dr, dz, 1.0, 1, 2, 5, 50, False)

    psi_s, d_c = tiled_presmooth_restrict(psi, src, r, dr, dz, 1.0,
                                          pre_smooth=1, t_rows=64,
                                          interpret=True)
    e_c = _vcycle_impl(jnp.zeros_like(d_c), d_c, r[::2], dr * 2, dz * 2,
                       1.0, 1, 2, 5, 50, False)
    fus = tiled_prolong_smooth(psi_s, src, e_c, r, dr, dz, 1.0,
                               post_smooth=2, t_rows=64, interpret=True)
    span = float(ref.max() - ref.min())
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-5


def test_tiled_preserves_dirichlet_boundary():
    psi, src, r, dr, dz = _problem(65, seed=19)
    psi_s, d_c = tiled_presmooth_restrict(psi, src, r, dr, dz, 1.0,
                                          pre_smooth=2, t_rows=32,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(psi_s[0, :]),
                                  np.asarray(psi[0, :]))
    np.testing.assert_array_equal(np.asarray(psi_s[-1, :]),
                                  np.asarray(psi[-1, :]))
    nc = (65 + 1) // 2
    e = jnp.zeros((nc, nc), jnp.float32)
    out = tiled_prolong_smooth(psi_s, src, e, r, dr, dz, 1.0,
                               post_smooth=2, t_rows=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out[:, 0]),
                                  np.asarray(psi[:, 0]))
    np.testing.assert_array_equal(np.asarray(out[:, -1]),
                                  np.asarray(psi[:, -1]))
