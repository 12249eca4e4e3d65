"""Solov'ev analytic parity: solver must converge to the exact equilibrium
at second order in grid spacing (the framework's true accuracy gate)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.solovev import SolovevParams
from scpn_fusion_tpu.ops import multigrid as mg
from scpn_fusion_tpu.ops.stencil import apply_dirichlet, gs_residual_rms


def _solve_analytic(n, params):
    grid = Grid.from_bounds(n, n, 3.0, 9.0, -3.0, 3.0, dtype=np.float64)
    rr, zz = grid.RR, grid.ZZ
    psi_exact = params.psi(rr, zz)
    src = params.source(rr)
    psi0 = apply_dirichlet(jnp.zeros_like(psi_exact), psi_exact)
    out = mg.mg_solve(psi0, src, grid.R, grid.dR, grid.dZ, n_cycles=30)
    span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
    err = float(jnp.max(jnp.abs(out - psi_exact))) / span
    return err, grid


class TestSolovevAnalytic:
    def test_exact_solution_recovered(self):
        params = SolovevParams()
        err, _ = _solve_analytic(65, params)
        assert err < 2e-4, f"Solov'ev span-rel error {err:.2e}"

    def test_second_order_grid_convergence(self):
        """Halving h must reduce the error by ~4x (O(h^2) discretisation)."""
        params = SolovevParams()
        e65, _ = _solve_analytic(65, params)
        e129, _ = _solve_analytic(129, params)
        ratio = e65 / e129
        assert 3.0 < ratio < 5.5, f"convergence order off: ratio {ratio:.2f}"

    def test_discrete_residual_is_second_order(self):
        """The stencil's truncation error on the analytic psi (R^4 terms)
        must scale as O(h^2)."""
        params = SolovevParams()

        def resid(n):
            grid = Grid.from_bounds(n, n, 3.0, 9.0, -3.0, 3.0, dtype=np.float64)
            psi_exact = params.psi(grid.RR, grid.ZZ)
            src = params.source(grid.RR)
            return float(gs_residual_rms(psi_exact, src, grid.R, grid.dR, grid.dZ))

        r65, r129 = resid(65), resid(129)
        ratio = r65 / r129
        assert 3.0 < ratio < 5.5, f"truncation order off: {ratio:.2f}"

    def test_profile_split_roundtrip(self):
        params = SolovevParams()
        mu0 = 1.0
        # Source split: A R^2 + B == -mu0 R^2 p' - FF'
        a_coeff = -mu0 * params.p_prime(mu0)
        b_coeff = -params.ff_prime()
        np.testing.assert_allclose(a_coeff, params.source_r2_coeff)
        np.testing.assert_allclose(b_coeff, params.source_const)
