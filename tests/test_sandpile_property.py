"""SOC sandpile tests + hypothesis property-based tests for core numerics.

The property-based section mirrors the reference's hypothesis usage
(SURVEY.md §4: property-based unit tests over the numerics core).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from scpn_fusion_tpu.models.equilibrium.profiles import (
    ProfileCoeffs,
    mtanh_profile,
)
from scpn_fusion_tpu.models.physics.sandpile import (
    SandpileConfig,
    avalanche_statistics,
    run_sandpile,
)
from scpn_fusion_tpu.ops.tridiag import thomas_solve
from scpn_fusion_tpu.utils import npref


class TestSandpile:
    def test_reaches_marginal_slope(self):
        # Small pile driven long enough to reach SOC steady state (sand
        # reaches the open edge and flux balances drive).
        cfg = SandpileConfig(n_cells=24, n_steps=6000)
        trace = run_sandpile(cfg, seed=0)
        stats = avalanche_statistics(trace)
        assert stats["total_flux_out"] > 0.0
        # the pile self-organises near (below) the critical slope
        assert 0.3 * cfg.critical_slope < stats["final_mean_slope"] \
            <= cfg.critical_slope
        assert stats["max_avalanche"] > 5.0 * max(stats["mean_avalanche"],
                                                  1.0)

    def test_mass_conservation(self):
        cfg = SandpileConfig(n_cells=32, n_steps=500)
        trace = run_sandpile(cfg, seed=1)
        added = cfg.drive_amount * cfg.n_steps
        held = float(jnp.sum(trace.heights_final))
        out = float(jnp.sum(trace.flux_out))
        assert held + out == pytest.approx(added, rel=1e-6)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            SandpileConfig(topple_amount=5.0, critical_slope=4.0)


# ---------------------------------------------------------------------------
# Property-based numerics
# ---------------------------------------------------------------------------

@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=3, max_value=40), st.integers(0, 2 ** 31 - 1))
def test_thomas_solver_matches_dense(n, seed):
    rng = np.random.default_rng(seed)
    lower = rng.uniform(-1.0, 1.0, n - 1)
    upper = rng.uniform(-1.0, 1.0, n - 1)
    diag = rng.uniform(3.0, 5.0, n)        # diagonally dominant
    rhs = rng.standard_normal(n)
    x = np.asarray(thomas_solve(jnp.asarray(lower), jnp.asarray(diag),
                                jnp.asarray(upper), jnp.asarray(rhs)))
    a = np.diag(diag) + np.diag(lower, -1) + np.diag(upper, 1)
    np.testing.assert_allclose(a @ x, rhs, atol=1e-9)


@settings(max_examples=25, deadline=None)
@given(st.floats(0.3, 1.0), st.floats(0.01, 0.2), st.floats(0.1, 2.0),
       st.floats(0.0, 1.0))
def test_mtanh_profile_monotone_and_bounded(ped_top, ped_width, ped_height,
                                            core_alpha):
    psi_n = jnp.linspace(0.0, 1.0, 101)
    coeffs = ProfileCoeffs(jnp.asarray(ped_top), jnp.asarray(ped_width),
                           jnp.asarray(ped_height), jnp.asarray(core_alpha))
    prof = np.asarray(mtanh_profile(psi_n, coeffs))
    assert np.all(np.isfinite(prof))
    assert np.all(prof >= -1e-9)
    # core value >= edge value (profiles decay outward)
    assert prof[0] >= prof[-1] - 1e-9


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1))
def test_gs_operator_linearity(seed):
    rng = np.random.default_rng(seed)
    n = 17
    r_1d = np.linspace(3.0, 9.0, n)
    d_r = r_1d[1] - r_1d[0]
    d_z = 6.0 / (n - 1)
    a = rng.standard_normal((n, n))
    b = rng.standard_normal((n, n))
    la = npref.gs_operator_np(a, r_1d, d_r, d_z)
    lb = npref.gs_operator_np(b, r_1d, d_r, d_z)
    lab = npref.gs_operator_np(a + 2.0 * b, r_1d, d_r, d_z)
    np.testing.assert_allclose(lab, la + 2.0 * lb, atol=1e-9)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2 ** 31 - 1), st.floats(1.0, 1.95))
def test_sor_fixed_point_is_gs_solution(seed, omega):
    # if psi solves L psi = source, one SOR sweep must not move it
    rng = np.random.default_rng(seed)
    n = 17
    r_1d = np.linspace(3.0, 9.0, n)
    d_r = r_1d[1] - r_1d[0]
    d_z = 6.0 / (n - 1)
    psi = rng.standard_normal((n, n))
    source = npref.gs_operator_np(psi, r_1d, d_r, d_z)
    out = npref.sor_step_np(psi, source, r_1d, d_r, d_z, omega=omega)
    np.testing.assert_allclose(out[1:-1, 1:-1], psi[1:-1, 1:-1],
                               atol=1e-9)
