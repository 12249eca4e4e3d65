"""Fokker-Planck RE + Hall-MHD pulsed kernel tests (physics behaviours the
reference validates: RE growth above E_crit, decay below, flux decay/drive
balance, integrator consistency)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.fokker_planck_re import (
    MC,
    E_CHARGE,
    EPS0,
    ME,
    C,
    COULOMB_LOG,
    FokkerPlanckGrid,
    fp_coefficients,
    run_fokker_planck,
)
from scpn_fusion_tpu.models.physics.hall_mhd_pulsed import (
    HallMHDPulsedParams,
    axial_field_from_flux,
    run_hall_mhd_pulsed,
    spitzer_resistivity_ohm_m,
)


def _e_crit(n_e):
    return float((n_e * E_CHARGE**3 * COULOMB_LOG)
                 / (4 * np.pi * EPS0**2 * ME * C**2))


class TestFokkerPlanck:
    def _seed(self, grid, dtype=jnp.float64):
        p = np.asarray(grid.p(dtype))
        f0 = 1e12 * np.exp(-((np.log10(p) + 1.0) ** 2) / 0.1)
        return jnp.asarray(f0, dtype)

    def test_grid_matches_reference_convention(self):
        grid = FokkerPlanckGrid(np_grid=64, p_max=100.0)
        p = np.asarray(grid.p(jnp.float64))
        ref = np.logspace(-2, np.log10(100.0), 64)
        np.testing.assert_allclose(p, ref, rtol=1e-12)
        dp = np.asarray(grid.dp(jnp.float64))
        np.testing.assert_allclose(dp, np.gradient(ref), rtol=1e-12)

    # Parameter regime follows the reference's own tests/bench
    # (tests/test_fokker_planck.py: dt=1e-5..1e-6, n_e=5e19, T_e=5000 eV;
    # the explicit scheme is CFL-limited at low p for cold plasmas).
    def test_population_grows_above_critical_field(self):
        grid = FokkerPlanckGrid(np_grid=64)
        n_e = 5e19
        e_field = 10.0  # >> E_crit(5e19) ~ 0.04 V/m
        f0 = self._seed(grid)
        _, trace = run_fokker_planck(grid, f0, 1e-6, e_field, n_e, 5000.0, 1.5,
                                     n_steps=300)
        n_re = np.asarray(trace.n_re)
        assert np.all(np.isfinite(n_re))
        assert n_re[-1] > n_re[0], "avalanche must grow the population"

    def test_population_decays_without_field(self):
        grid = FokkerPlanckGrid(np_grid=64)
        n_e = 5e19
        f0 = self._seed(grid)
        _, trace = run_fokker_planck(grid, f0, 1e-6, 0.0, n_e, 5000.0, 1.5,
                                     n_steps=300)
        n_re = np.asarray(trace.n_re)
        assert np.all(np.isfinite(n_re))
        assert n_re[-1] < n_re[0], "field-free population must decay"

    def test_distribution_nonnegative(self):
        grid = FokkerPlanckGrid(np_grid=64)
        f0 = self._seed(grid)
        f, _ = run_fokker_planck(grid, f0, 1e-6, 10.0, 5e19, 5000.0, 1.5,
                                 n_steps=100)
        assert np.all(np.asarray(f) >= 0.0)

    def test_advection_coefficient_signs(self):
        """High-p electrons accelerate for E >> E_crit; drag dominates at
        E ~ 0 (Hesslow force balance)."""
        grid = FokkerPlanckGrid(np_grid=64)
        p = grid.p(jnp.float64)
        a_hi, _, _ = fp_coefficients(p, 100.0 * _e_crit(5e19), 5e19, 1.5, 5000.0)
        a_lo, _, _ = fp_coefficients(p, 0.0, 5e19, 1.5, 5000.0)
        mid = slice(20, 40)  # intermediate momenta (synchrotron weak)
        assert np.all(np.asarray(a_hi)[mid] > 0)
        assert np.all(np.asarray(a_lo) < 0)

    def test_current_consistent_with_density(self):
        """j_re <= e * c * n_re (velocity bounded by c)."""
        grid = FokkerPlanckGrid(np_grid=64)
        f0 = self._seed(grid)
        _, trace = run_fokker_planck(grid, f0, 1e-6, 10.0, 5e19, 5000.0, 1.5,
                                     n_steps=50)
        j = float(trace.j_re[-1])
        n = float(trace.n_re[-1])
        assert 0 <= j <= E_CHARGE * C * n * (1 + 1e-6)


class TestHallMHD:
    def _setup(self, n=65):
        rho = jnp.linspace(0.01, 0.5, n)
        psi0 = 0.02 * jnp.asarray(np.sin(np.pi * np.asarray(rho) / 0.5))
        j_theta = jnp.zeros(n)
        return rho, psi0, j_theta

    def test_spitzer_value(self):
        """eta(100 eV, Z=1, lnL=17) ~ 8.9e-7 Ohm m — the NRL parallel
        Spitzer value (0.51 x eta_perp = 0.51 x 1.03e-4 x 17 / 100^1.5 in
        Ohm m); the reference's keV-coefficient-on-eV-input bug is fixed
        here — see the function docstring."""
        eta = float(spitzer_resistivity_ohm_m(jnp.asarray(100.0)))
        np.testing.assert_allclose(eta, 1.65e-9 * 17.0 / 0.1**1.5, rtol=1e-6)
        nrl_parallel = 0.51 * 1.03e-4 * 17.0 / 100.0**1.5
        np.testing.assert_allclose(eta, nrl_parallel, rtol=0.05)

    def test_spitzer_cross_module_consistency(self):
        """hall_mhd_pulsed and disruption_sequence resistivities must agree
        (same formula, different modules) once Z_eff is equalised."""
        from scpn_fusion_tpu.models.physics.disruption_sequence import (
            spitzer_resistivity,
        )
        from scpn_fusion_tpu.models.physics.disruption_sequence import (
            LN_LAMBDA as LNL_DISR,
        )
        t_ev = jnp.asarray([10.0, 100.0, 1000.0])
        a = np.asarray(spitzer_resistivity_ohm_m(t_ev, z_eff=1.5,
                                                 ln_lambda=float(LNL_DISR)))
        b = np.asarray(spitzer_resistivity(t_ev, z_eff=1.5))
        np.testing.assert_allclose(a, b, rtol=0.01)

    def test_flux_decays_without_drive(self):
        rho, psi0, j_theta = self._setup()
        params = HallMHDPulsedParams(tau_psi_s=1e-3,
                                     electron_temperature_ev=50.0,
                                     r_null_m=0.3)
        b_flat = lambda t: 0.1  # noqa: E731 — no ramp, no drive
        final, _, diags = run_hall_mhd_pulsed(
            params, psi0, rho, j_theta, b_flat, 1e-5, n_steps=200)
        # After 2 tau, amplitude should drop ~e^-2.
        ratio = float(jnp.max(jnp.abs(final.psi)) / jnp.max(jnp.abs(psi0)))
        np.testing.assert_allclose(ratio, np.exp(-2.0), rtol=0.05)

    def test_ramp_drives_flux(self):
        rho, psi0, j_theta = self._setup()
        params = HallMHDPulsedParams(tau_psi_s=1.0,
                                     electron_temperature_ev=50.0,
                                     r_null_m=0.3)
        b_ramp = lambda t: 0.1 + 50.0 * t  # noqa: E731 — strong ramp
        final, b_z, diags = run_hall_mhd_pulsed(
            params, jnp.zeros_like(psi0), rho, j_theta, b_ramp, 1e-5,
            n_steps=100)
        assert float(jnp.max(jnp.abs(final.psi))) > 0.0
        assert float(diags.hall_drive_l2[-1]) > 0.0
        assert np.all(np.isfinite(np.asarray(b_z)))

    def test_be_step_residual_small(self):
        """The implicit-BE update must satisfy its own discrete equation."""
        rho, psi0, j_theta = self._setup()
        params = HallMHDPulsedParams(tau_psi_s=1e-3,
                                     electron_temperature_ev=50.0,
                                     r_null_m=0.3)
        b_ramp = lambda t: 0.1 + 5.0 * t  # noqa: E731
        _, _, diags = run_hall_mhd_pulsed(
            params, psi0, rho, j_theta, b_ramp, 1e-6, n_steps=10)
        assert float(jnp.max(diags.source_residual_linf)) < 1e-6

    def test_integrators_agree_for_small_dt(self):
        rho, psi0, j_theta = self._setup()
        b_ramp = lambda t: 0.1 + 5.0 * t  # noqa: E731
        outs = {}
        for integ in ("implicit_be", "imex_rk2"):
            params = HallMHDPulsedParams(
                tau_psi_s=1e-3, electron_temperature_ev=50.0,
                r_null_m=0.3, time_integrator=integ)
            final, _, _ = run_hall_mhd_pulsed(
                params, psi0, rho, j_theta, b_ramp, 1e-8, n_steps=50)
            outs[integ] = np.asarray(final.psi)
        np.testing.assert_allclose(outs["implicit_be"], outs["imex_rk2"],
                                   rtol=1e-4, atol=1e-12)

    def test_axial_field_axis_handling(self):
        rho = jnp.linspace(0.0, 1.0, 51)
        psi = 0.5 * rho**2  # B_z = 1 everywhere
        b_z = np.asarray(axial_field_from_flux(rho, psi))
        np.testing.assert_allclose(b_z, 1.0, rtol=1e-6)
