"""MHD stability suite + scaling/burn/blanket + phase dynamics tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.phase import (
    lyapunov_v,
    order_parameter,
    run_kuramoto,
    run_upde,
    wrap_phase,
)
from scpn_fusion_tpu.models.physics.scaling_burn import (
    blanket_tbr,
    burn_equilibrium_0d,
    h_factor,
    ipb98y2_tau_e,
)
from scpn_fusion_tpu.models.physics.stability_mhd import (
    ballooning_stability,
    compute_q_profile,
    kruskal_shafranov_stability,
    mercier_stability,
    ntm_stability,
    peeling_ballooning_stability,
    run_full_stability_check,
    rwm_stability,
    troyon_beta_limit,
)


def _iter_profiles(n=50):
    rho = jnp.linspace(0.0, 1.0, n)
    ne = 10.0 * (1 - rho**2) ** 0.5 + 0.5
    t = 20.0 * (1 - rho**2) + 0.1
    return rho, ne, t


class TestQProfile:
    def test_iter_like_q_profile(self):
        rho, ne, t = _iter_profiles()
        qp = compute_q_profile(rho, ne, t, t, 6.2, 2.0, 5.3, 15.0,
                               kappa=1.7, delta=0.33)
        q = np.asarray(qp.q)
        assert np.all(np.isfinite(q)) and np.all(q > 0)
        # ITER-like: q0 ~ 1, q_edge ~ 3-4, monotone-ish rise.
        assert 0.5 < float(qp.q_min) < 2.0
        assert 2.0 < float(qp.q_edge) < 6.0
        assert float(qp.q_edge) > float(qp.q_min)

    def test_shear_zero_on_axis(self):
        rho, ne, t = _iter_profiles()
        qp = compute_q_profile(rho, ne, t, t, 6.2, 2.0, 5.3, 15.0)
        assert float(qp.shear[0]) == 0.0


class TestCriteria:
    def _qp(self):
        rho, ne, t = _iter_profiles()
        return compute_q_profile(rho, ne, t, t, 6.2, 2.0, 5.3, 15.0,
                                 kappa=1.7, delta=0.33)

    def test_mercier_low_pressure_stable(self):
        rho = jnp.linspace(0, 1, 50)
        ne = 1.0 * jnp.ones(50)
        t = 0.5 * jnp.ones(50)  # cold plasma: negligible alpha
        qp = compute_q_profile(rho, ne, t, t, 6.2, 2.0, 5.3, 15.0)
        res = mercier_stability(qp)
        assert bool(res.all_stable)

    def test_ballooning_boundary_shape(self):
        qp = self._qp()
        res = ballooning_stability(qp)
        ac = np.asarray(res.alpha_crit)
        assert np.all(ac >= 0.0)
        # CHT formula: at s=0.5 crit = 0.375; at s=2 crit = 1.2.
        from scpn_fusion_tpu.models.physics.stability_mhd import QProfile
        qp2 = QProfile(qp.rho, qp.q, jnp.full_like(qp.q, 0.5),
                       jnp.zeros_like(qp.q), qp.q_min, qp.q_min_rho, qp.q_edge)
        np.testing.assert_allclose(
            np.asarray(ballooning_stability(qp2).alpha_crit), 0.375, rtol=1e-6)

    def test_kruskal_shafranov(self):
        qp = self._qp()
        res = kruskal_shafranov_stability(qp)
        assert bool(res.stable) == (float(qp.q_edge) > 1.0)

    def test_troyon(self):
        # ITER-ish: beta_t = 2.5 %, Ip = 15 MA, a = 2, B0 = 5.3 -> I_N = 1.415
        res = troyon_beta_limit(0.025, 15.0, 2.0, 5.3)
        np.testing.assert_allclose(float(res.beta_n),
                                   100 * 0.025 * 2.0 * 5.3 / 15.0, rtol=1e-6)
        assert bool(res.stable_nowall)  # beta_N = 1.77 < 2.8

    def test_rwm_growth_between_limits(self):
        res = rwm_stability(3.0)
        assert not bool(res.stable)
        assert float(res.mode_growth_rate) > 0.0
        res2 = rwm_stability(2.0)
        assert bool(res2.stable) and float(res2.mode_growth_rate) == 0.0

    def test_ntm_bootstrap_drive(self):
        qp = self._qp()
        j_bs = 0.2 * jnp.ones_like(qp.rho) * 1e6
        j_tot = jnp.ones_like(qp.rho) * 1e6
        res = ntm_stability(qp, j_bs, j_tot, 2.0)
        w = np.asarray(res.w_marginal)
        assert np.all(w >= 0.0)
        # w_marg = -(0.2) * 2.0 / (-2.0) = 0.2 m everywhere
        np.testing.assert_allclose(w, 0.2, rtol=1e-6)

    def test_peeling_ballooning_scaling(self):
        qp = self._qp()
        low = peeling_ballooning_stability(qp, 1e4, 1e4, 6.2, 2.0, 5.3)
        high = peeling_ballooning_stability(qp, 1e7, 2e5, 6.2, 2.0, 5.3)
        assert float(low.stability_distance) > float(high.stability_distance)

    def test_full_check_runs(self):
        rho, ne, t = _iter_profiles()
        j_bs = 0.1 * jnp.ones(50) * 1e6
        j_tot = jnp.ones(50) * 1e6
        summary = run_full_stability_check(
            rho, ne, t, t, j_bs, j_tot,
            r0=6.2, a=2.0, b0=5.3, ip_ma=15.0,
            beta_t=0.02, j_edge=1e5, p_ped_pa=5e4)
        assert summary.overall_stable.dtype == jnp.bool_


class TestScalingBurn:
    def test_ipb98_iter_value(self):
        """ITER reference point: tau_E ~ 3.6 s (ITER Physics Basis)."""
        tau = float(ipb98y2_tau_e(15.0, 5.3, 10.0, 87.0, 6.2, 1.7, 2.0 / 6.2))
        assert 3.0 < tau < 4.5, tau

    def test_h_factor(self):
        assert float(h_factor(4.0, 2.0)) == 2.0

    def test_iter_like_burn_point_q10(self):
        """ITER-like 0D point must reach Q >= 5 (reference scan: Q = 15)."""
        pt = burn_equilibrium_0d(
            ne19=10.0, p_aux_mw=50.0, ip_ma=15.0, bt_t=5.3,
            r_m=6.2, a_m=2.0, kappa=1.7)
        assert bool(pt.converged)
        assert float(pt.q_fusion) > 5.0, f"Q = {float(pt.q_fusion)}"
        assert float(pt.t_kev) > 5.0
        assert float(pt.p_fusion_mw) > 200.0

    def test_burn_q_increases_with_density(self):
        lo = burn_equilibrium_0d(ne19=6.0, p_aux_mw=50.0, ip_ma=15.0,
                                 bt_t=5.3, r_m=6.2, a_m=2.0, kappa=1.7)
        hi = burn_equilibrium_0d(ne19=11.0, p_aux_mw=50.0, ip_ma=15.0,
                                 bt_t=5.3, r_m=6.2, a_m=2.0, kappa=1.7)
        assert float(hi.q_fusion) > float(lo.q_fusion)

    def test_blanket_tbr_matches_reference_single_group(self):
        """Exact parity with the reference's single-group BreedingBlanket
        (80 cm, 90% Li-6 gives 1.59344 in both; the widely-quoted 1.141 is
        its separate 3-group model)."""
        res = blanket_tbr(thickness_cm=80.0, li6_enrichment=0.9)
        np.testing.assert_allclose(float(res.tbr), 1.5934398506, rtol=1e-8)
        assert np.all(np.asarray(res.flux) >= 0.0)

    def test_blanket_enrichment_improves_tbr(self):
        hi = float(blanket_tbr(li6_enrichment=0.95).tbr)
        lo = float(blanket_tbr(li6_enrichment=0.6).tbr)
        assert hi > lo


class TestPhase:
    def test_order_parameter_limits(self):
        n = 256
        synced = jnp.full((n,), 0.7)
        r, psi = order_parameter(synced)
        np.testing.assert_allclose(float(r), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(psi), 0.7, atol=1e-6)
        rng = np.random.default_rng(0)
        spread = jnp.asarray(rng.uniform(-np.pi, np.pi, 100_000))
        r2, _ = order_parameter(spread)
        assert float(r2) < 0.02

    def test_kuramoto_synchronises_above_critical_coupling(self):
        rng = np.random.default_rng(1)
        n = 512
        theta0 = jnp.asarray(rng.uniform(-np.pi, np.pi, n))
        omega = jnp.asarray(0.1 * rng.standard_normal(n))
        out = run_kuramoto(theta0, omega, dt=0.01, k_coupling=2.0,
                           psi_mode="mean_field", n_steps=2000)
        r = np.asarray(out.r)
        assert r[-1] > 0.9, f"no sync: R={r[-1]}"
        assert r[-1] > r[0]

    def test_kuramoto_driver_pulls_to_psi(self):
        rng = np.random.default_rng(2)
        n = 128
        theta0 = jnp.asarray(rng.uniform(-np.pi, np.pi, n))
        omega = jnp.zeros(n)
        psi_target = 1.2
        out = run_kuramoto(theta0, omega, dt=0.01, k_coupling=0.0, zeta=3.0,
                           psi_external=psi_target, n_steps=2000)
        v = lyapunov_v(out.theta[-1], psi_target)
        assert float(v) < 1e-3
        assert float(out.lambda_exp) < 0.0  # converging toward the driver

    def test_wrap_phase_range(self):
        x = jnp.asarray([4.0, -4.0, 7.0, 0.0])
        w = np.asarray(wrap_phase(x))
        assert np.all((w > -np.pi - 1e-12) & (w <= np.pi + 1e-12))

    def test_upde_layers_synchronise(self):
        rng = np.random.default_rng(3)
        theta0 = jnp.asarray(rng.uniform(-np.pi, np.pi, (3, 64)))
        omega = jnp.asarray(0.05 * rng.standard_normal((3, 64)))
        mask = jnp.ones((3, 64))
        k = 1.5 * jnp.ones((3, 3))
        alpha = jnp.zeros((3, 3))
        zeta = 0.5 * jnp.ones(3)
        trace = run_upde(theta0, omega, mask, k, alpha, zeta,
                         dt=0.01, psi_external=0.0, psi_mode="external",
                         n_steps=3000)
        rg = np.asarray(trace.r_global)
        assert rg[-1] > 0.9
        assert np.all(np.isfinite(rg))

    def test_upde_pac_gating_runs(self):
        rng = np.random.default_rng(4)
        theta0 = jnp.asarray(rng.uniform(-np.pi, np.pi, (2, 32)))
        omega = jnp.zeros((2, 32))
        mask = jnp.ones((2, 32))
        k = jnp.ones((2, 2))
        trace = run_upde(theta0, omega, mask, k, jnp.zeros((2, 2)),
                         jnp.zeros(2), dt=0.01, pac_gamma=0.5, n_steps=100)
        assert np.all(np.isfinite(np.asarray(trace.r_layer)))
