"""Phase dynamics tests: Kuramoto, UPDE, Knm, adaptive engine, guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.phase.guard import (
    GuardConfig,
    guard_check,
    guard_check_trajectory,
    init_guard,
)
from scpn_fusion_tpu.models.phase.knm import (
    OMEGA_PLASMA_8,
    AdaptiveKnmConfig,
    KnmSpec,
    adaptive_knm_update,
    build_knm_plasma,
    build_knm_plasma_from_config,
    init_adaptive_state,
    plasma_omega,
)
from scpn_fusion_tpu.models.phase.kuramoto import (
    kuramoto_step,
    lyapunov_exponent,
    lyapunov_v,
    order_parameter,
    run_kuramoto,
    wrap_phase,
)
from scpn_fusion_tpu.models.phase.upde import (
    layer_order_parameters,
    run_upde,
    upde_tick,
)


class TestKuramoto:
    def test_order_parameter_limits(self):
        synced = jnp.full(64, 0.7)
        r, psi = order_parameter(synced)
        np.testing.assert_allclose(float(r), 1.0, atol=1e-6)
        np.testing.assert_allclose(float(psi), 0.7, atol=1e-6)
        spread = jnp.linspace(-np.pi, np.pi, 64, endpoint=False)
        r2, _ = order_parameter(spread)
        assert float(r2) < 0.05

    def test_weighted_order_parameter(self):
        theta = jnp.asarray([0.0, np.pi])
        w = jnp.asarray([1.0, 0.0])
        r, psi = order_parameter(theta, w)
        np.testing.assert_allclose(float(r), 1.0, atol=1e-9)

    def test_wrap_phase(self):
        x = jnp.asarray([3.5 * np.pi, -3.5 * np.pi, 0.0])
        w = np.asarray(wrap_phase(x))
        assert np.all(w > -np.pi - 1e-9) and np.all(w <= np.pi + 1e-9)

    def test_sync_above_critical_coupling(self):
        key = jax.random.PRNGKey(0)
        theta0 = jax.random.uniform(key, (256,), minval=-np.pi, maxval=np.pi)
        omega = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (256,))
        trace = run_kuramoto(theta0, omega, dt=0.01, k_coupling=2.0,
                             n_steps=2000, psi_mode="mean_field")
        # Strong coupling: order parameter climbs to near unity.
        assert float(trace.r[-1]) > 0.9
        assert float(trace.r[0]) < 0.7

    def test_no_sync_below_critical(self):
        key = jax.random.PRNGKey(0)
        theta0 = jax.random.uniform(key, (256,), minval=-np.pi, maxval=np.pi)
        omega = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (256,))
        trace = run_kuramoto(theta0, omega, dt=0.01, k_coupling=0.05,
                             n_steps=1000, psi_mode="mean_field")
        assert float(trace.r[-1]) < 0.4

    def test_external_driver_entrains(self):
        theta0 = jnp.linspace(-2.0, 2.0, 64)
        omega = jnp.zeros(64)
        trace = run_kuramoto(theta0, omega, dt=0.01, k_coupling=0.0,
                             zeta=2.0, psi_external=1.0, n_steps=2000)
        # All oscillators pulled to the carrier phase Psi=1.
        assert float(lyapunov_v(trace.theta[-1], 1.0)) < 1e-3
        assert float(trace.lambda_exp) < 0.0

    def test_lyapunov_v_range(self):
        assert float(lyapunov_v(jnp.zeros(8), 0.0)) == pytest.approx(0.0)
        assert float(lyapunov_v(jnp.full(8, np.pi), 0.0)) == pytest.approx(2.0)

    def test_lyapunov_exponent_sign(self):
        decay = [1.0, 0.5, 0.25, 0.125]
        grow = [0.1, 0.2, 0.4, 0.8]
        assert float(lyapunov_exponent(decay, 0.1)) < 0
        assert float(lyapunov_exponent(grow, 0.1)) > 0


class TestUPDE:
    def _setup(self, L=4, n=32):
        key = jax.random.PRNGKey(2)
        theta0 = jax.random.uniform(key, (L, n), minval=-np.pi, maxval=np.pi)
        omega = jnp.broadcast_to(
            jnp.asarray(plasma_omega(8)[:L])[:, None], (L, n)).astype(
                theta0.dtype) * 0.1
        mask = jnp.ones((L, n))
        return theta0, omega, mask

    def test_layer_order_parameters_masked(self):
        theta = jnp.zeros((2, 4)).at[1, 2:].set(np.pi)
        mask = jnp.ones((2, 4)).at[1, 2:].set(0.0)
        r, psi = layer_order_parameters(theta, mask)
        np.testing.assert_allclose(np.asarray(r), [1.0, 1.0], atol=1e-6)

    def test_tick_shapes_and_finiteness(self):
        theta0, omega, mask = self._setup()
        spec = build_knm_plasma(n_layers=4)
        k, alpha, zeta = spec.arrays()
        theta1, aux = upde_tick(theta0, omega, mask, k, alpha, zeta,
                                dt=1e-3, psi_global=0.0)
        assert theta1.shape == theta0.shape
        assert bool(jnp.all(jnp.isfinite(theta1)))
        assert aux["R_layer"].shape == (4,)

    def test_strong_coupling_synchronises_layers(self):
        theta0, omega, mask = self._setup()
        spec = KnmSpec(k=np.full((4, 4), 1.5))
        k, alpha, zeta = spec.arrays()
        trace = run_upde(theta0, 0.02 * omega, mask, k, alpha,
                         jnp.full(4, 0.5), dt=0.01, psi_external=0.5,
                         n_steps=3000)
        assert float(trace.r_global[-1]) > 0.9
        assert float(trace.v_global[-1]) < 0.1
        assert float(trace.lambda_exp) < 0.0

    def test_pac_gate_boosts_incoherent_sources(self):
        theta0, omega, mask = self._setup()
        spec = build_knm_plasma(n_layers=4)
        k, alpha, zeta = spec.arrays()
        _, aux0 = upde_tick(theta0, omega, mask, k, alpha, zeta,
                            dt=1e-3, psi_global=0.0, pac_gamma=0.0)
        _, aux1 = upde_tick(theta0, omega, mask, k, alpha, zeta,
                            dt=1e-3, psi_global=0.0, pac_gamma=2.0)
        # Gating changes the drift when sources are incoherent (R_n < 1).
        assert float(jnp.max(jnp.abs(aux1["dtheta"] - aux0["dtheta"]))) > 0


class TestKnm:
    def test_builder_modes_and_symmetry(self):
        for mode in ["baseline", "elm", "ntm", "sawtooth", "hybrid"]:
            spec = build_knm_plasma(mode=mode)
            k = np.asarray(spec.k)
            assert k.shape == (8, 8)
            np.testing.assert_allclose(k, k.T, atol=1e-12)
            assert np.all(k >= 0)
        with pytest.raises(ValueError):
            build_knm_plasma(mode="bogus")

    def test_physics_pairs_present(self):
        k = np.asarray(build_knm_plasma().k)
        np.testing.assert_allclose(k[0, 1], 0.42)   # drift-wave/zonal flow
        np.testing.assert_allclose(k[2, 5], 0.35)   # NTM/bootstrap

    def test_mode_bias_amplifies(self):
        base = np.asarray(build_knm_plasma("baseline").k)
        elm = np.asarray(build_knm_plasma("elm").k)
        assert elm[3, 4] > base[3, 4]

    def test_machine_scaling(self):
        low = np.asarray(build_knm_plasma_from_config(
            6.2, 2.0, 5.3, 15.0, 1.0).k)
        high = np.asarray(build_knm_plasma_from_config(
            6.2, 2.0, 5.3, 15.0, 12.0).k)
        assert high[0, 0] > low[0, 0]

    def test_omega_table(self):
        np.testing.assert_array_equal(plasma_omega(8), OMEGA_PLASMA_8)
        w16 = plasma_omega(16)
        assert w16.shape == (16,)
        assert w16[0] > w16[-1]

    def test_spec_validation(self):
        with pytest.raises(ValueError):
            KnmSpec(k=np.zeros((3, 2)))
        with pytest.raises(ValueError):
            KnmSpec(k=np.zeros((2, 2)), zeta=np.zeros(3))


class TestAdaptiveKnm:
    def test_beta_and_risk_channels(self):
        spec = build_knm_plasma()
        cfg = AdaptiveKnmConfig(max_delta_per_tick=10.0)  # no rate limit
        st = init_adaptive_state(spec)
        base = jnp.asarray(spec.k, jnp.float32)
        st2 = adaptive_knm_update(cfg, base, st,
                                  r_layer=jnp.full(8, 0.9),
                                  beta_n=2.0, disruption_risk=0.5,
                                  guard_approved=True)
        k2 = np.asarray(st2.k_current)
        # Beta channel scaled the matrix up.
        assert k2[0, 7] > float(base[0, 7])
        # Risk channel boosted the (2,5) pair beyond the beta scaling.
        assert k2[2, 5] - float(base[2, 5]) > k2[0, 7] - float(base[0, 7])
        np.testing.assert_allclose(k2, k2.T, atol=1e-6)

    def test_rate_limit(self):
        spec = build_knm_plasma()
        cfg = AdaptiveKnmConfig(max_delta_per_tick=0.02)
        st = init_adaptive_state(spec)
        base = jnp.asarray(spec.k, jnp.float32)
        st2 = adaptive_knm_update(cfg, base, st,
                                  r_layer=jnp.zeros(8), beta_n=5.0,
                                  disruption_risk=1.0, guard_approved=True)
        dk = np.abs(np.asarray(st2.k_current) - np.asarray(st.k_current))
        assert dk.max() <= 0.02 + 1e-6

    def test_guard_refusal_reverts(self):
        spec = build_knm_plasma()
        cfg = AdaptiveKnmConfig()
        st = init_adaptive_state(spec)
        base = jnp.asarray(spec.k, jnp.float32)
        st2 = adaptive_knm_update(cfg, base, st, r_layer=jnp.zeros(8),
                                  beta_n=2.0, disruption_risk=0.9,
                                  guard_approved=True)
        st3 = adaptive_knm_update(cfg, base, st2, r_layer=jnp.zeros(8),
                                  beta_n=5.0, disruption_risk=1.0,
                                  guard_approved=False)
        np.testing.assert_allclose(np.asarray(st3.k_current),
                                   np.asarray(st2.k_last_good), atol=1e-6)
        np.testing.assert_allclose(np.asarray(st3.integral), 0.0)


class TestGuard:
    def test_approves_contracting(self):
        cfg = GuardConfig(window=10, dt=0.1)
        st = init_guard(cfg)
        theta = jnp.full(16, 1.2)
        for k in range(12):
            # theta converging toward psi=0.
            verdict, st = guard_check(cfg, st, theta * (0.8 ** k), 0.0)
        assert bool(verdict.approved)
        assert float(verdict.lambda_exp) < 0
        assert float(verdict.score) > 0.5

    def test_refuses_after_sustained_growth(self):
        cfg = GuardConfig(window=10, dt=0.1, max_violations=3)
        st = init_guard(cfg)
        refused = False
        for k in range(12):
            theta = jnp.full(16, 0.01 * (1.6 ** k))
            verdict, st = guard_check(cfg, st, theta, 0.0)
            if not bool(verdict.approved):
                refused = True
        assert refused
        assert int(verdict.consecutive_violations) >= 3

    def test_trajectory_batch_check(self):
        cfg = GuardConfig(dt=0.1)
        ok = guard_check_trajectory(cfg, [1.0, 0.5, 0.2, 0.1])
        bad = guard_check_trajectory(cfg, [0.1, 0.2, 0.5, 1.0])
        assert bool(ok.approved) and not bool(bad.approved)
