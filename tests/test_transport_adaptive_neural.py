"""Transport depth: adaptive dt (Richardson + PI), neural closure with
OOD fallback, and the IPB98 He-pump chain.

Parity anchors: reference integrated_transport_solver_adaptive.py (PI law,
Richardson estimate, half-step acceptance),
integrated_transport_solver_model.py:83-160 (OOD-index selection),
scaling_laws.py IPB98(y,2) chain.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.surrogates.pretrained import (
    TransportSurrogate,
    load_transport_surrogate_pytree,
)
from scpn_fusion_tpu.models.transport.adaptive import (
    AdaptiveConfig,
    run_transport_adaptive,
)
from scpn_fusion_tpu.models.transport.solver import (
    TransportParams,
    _local_surrogate_inputs,
    _transport_coefficients,
    evolve_profiles,
    initial_state,
    run_transport,
)

PARAMS = TransportParams(nr=40)


@pytest.fixture(scope="module")
def surrogate() -> TransportSurrogate:
    sur, metrics = load_transport_surrogate_pytree()
    assert metrics["test_rel_l2"] < 0.25   # the reference's QLKNN gate
    return sur


class TestAdaptiveDt:
    def test_dt_adapts_within_bounds(self):
        s = initial_state(PARAMS)
        cfg = AdaptiveConfig(dt_init=0.01, tol=1e-3)
        final, trace = run_transport_adaptive(
            s, jnp.asarray(50.0), PARAMS, cfg=cfg, n_steps=12)
        dt = np.asarray(trace.dt)
        err = np.asarray(trace.error)
        assert np.all(dt >= cfg.dt_min) and np.all(dt <= cfg.dt_max)
        assert np.all(np.isfinite(err)) and np.all(err > 0)
        assert bool(jnp.all(jnp.isfinite(final.ti)))
        # The controller must actually move dt (not a fixed-step run).
        assert np.std(dt) > 0.0

    def test_tighter_tol_gives_smaller_dt(self):
        s = initial_state(PARAMS)
        _, loose = run_transport_adaptive(
            s, jnp.asarray(50.0), PARAMS,
            cfg=AdaptiveConfig(tol=1e-2), n_steps=10)
        _, tight = run_transport_adaptive(
            s, jnp.asarray(50.0), PARAMS,
            cfg=AdaptiveConfig(tol=1e-5), n_steps=10)
        assert float(np.mean(np.asarray(tight.dt))) < \
            float(np.mean(np.asarray(loose.dt)))

    def test_pi_factor_clipped(self):
        from scpn_fusion_tpu.models.transport.adaptive import _pi_factor
        cfg = AdaptiveConfig(tol=1e-3)
        assert float(_pi_factor(cfg, jnp.asarray(1e-12),
                                jnp.asarray(1e-12))) == 2.0
        assert float(_pi_factor(cfg, jnp.asarray(1e3),
                                jnp.asarray(1e3))) == pytest.approx(0.1)

    def test_halfstep_acceptance_more_accurate(self):
        """The accepted (two half-step) trajectory must beat the full-step
        trajectory against a fine-step truth run."""
        s = initial_state(PARAMS)
        p = jnp.asarray(50.0)
        dt = jnp.asarray(0.05)
        full = evolve_profiles(s, dt, p, PARAMS)
        half = evolve_profiles(
            evolve_profiles(s, 0.5 * dt, p, PARAMS), 0.5 * dt, p, PARAMS)
        truth = s
        for _ in range(10):
            truth = evolve_profiles(truth, dt / 10.0, p, PARAMS)
        err_full = float(jnp.linalg.norm(full.ti - truth.ti))
        err_half = float(jnp.linalg.norm(half.ti - truth.ti))
        assert err_half < err_full


class TestNeuralClosure:
    def test_in_distribution_uses_surrogate(self, surrogate):
        s = initial_state(PARAMS)
        chi_e_a, chi_i_a, d_a = _transport_coefficients(PARAMS, s)
        chi_e_n, chi_i_n, d_n = _transport_coefficients(PARAMS, s, surrogate)
        x = _local_surrogate_inputs(PARAMS, s, PARAMS.rho(s.ti.dtype))
        z = np.asarray(surrogate.max_abs_z(x))
        in_dist = z <= PARAMS.ood_sigma
        assert in_dist.sum() > 5   # the initial profiles are in-envelope
        # On in-distribution points the neural closure must differ from
        # the analytic one (it is a different model) yet stay physical.
        diff = np.abs(np.asarray(chi_i_n) - np.asarray(chi_i_a))[in_dist]
        assert diff.max() > 1e-4
        assert np.all(np.asarray(chi_i_n) >= 0.01)
        assert np.all(np.asarray(chi_i_n) <= 1e4)

    def test_ood_points_fall_back_to_analytic(self, surrogate):
        s = initial_state(PARAMS)
        # Push q far outside the training envelope (q trained on [1, 5]).
        s = s._replace(q=jnp.full_like(s.q, 40.0))
        chi_e_a, chi_i_a, d_a = _transport_coefficients(PARAMS, s)
        chi_e_n, chi_i_n, d_n = _transport_coefficients(PARAMS, s, surrogate)
        np.testing.assert_allclose(np.asarray(chi_i_n), np.asarray(chi_i_a))
        np.testing.assert_allclose(np.asarray(chi_e_n), np.asarray(chi_e_a))

    def test_full_run_with_surrogate_stable(self, surrogate):
        s = initial_state(PARAMS)
        final, trace = run_transport(
            s, jnp.asarray(0.01), jnp.asarray(50.0), PARAMS, 30,
            surrogate)
        assert bool(jnp.all(jnp.isfinite(final.ti)))
        assert bool(jnp.all(jnp.isfinite(final.te)))
        assert float(final.ti[1]) > 0.5   # heated plasma stays confined

    def test_adaptive_with_surrogate(self, surrogate):
        s = initial_state(PARAMS)
        final, trace = run_transport_adaptive(
            s, jnp.asarray(50.0), PARAMS, n_steps=6, surrogate=surrogate)
        assert bool(jnp.all(jnp.isfinite(final.ti)))


class TestIPB98Pump:
    def test_tau_e_follows_ipb98_chain(self):
        from scpn_fusion_tpu.models.transport.solver import (
            _confinement_time_estimate,
        )
        s = initial_state(PARAMS)
        rho = PARAMS.rho(s.ti.dtype)
        tau_hi = _confinement_time_estimate(PARAMS, s, jnp.asarray(50.0), rho)
        low_ip = TransportParams(nr=40, ip_ma=5.0)
        tau_lo = _confinement_time_estimate(low_ip, s, jnp.asarray(50.0), rho)
        # IPB98: tau ~ Ip^0.93 — a 3x current drop must cut tau_E.
        assert float(tau_lo) < float(tau_hi)
        ratio = float(tau_hi) / float(tau_lo)
        assert ratio == pytest.approx(3.0**0.93, rel=0.05)

    def test_optout_reverts_to_stored_energy_estimate(self):
        from scpn_fusion_tpu.models.transport.solver import (
            _confinement_time_estimate,
        )
        s = initial_state(PARAMS)
        rho = PARAMS.rho(s.ti.dtype)
        legacy = TransportParams(nr=40, use_ipb98_tau_he=False)
        tau = _confinement_time_estimate(legacy, s, jnp.asarray(50.0), rho)
        # W/P with these profiles is small but positive and clipped.
        assert 0.05 <= float(tau) <= 50.0

    def test_run_transport_multiion_stable_with_ipb98(self):
        s = initial_state(PARAMS)
        final, _ = run_transport(
            s, jnp.asarray(0.01), jnp.asarray(50.0), PARAMS, 30)
        assert bool(jnp.all(jnp.isfinite(final.n_he)))
        assert float(jnp.max(final.n_he)) >= 0.0
