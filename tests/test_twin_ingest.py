"""Digital-twin ingest + SNN scenario-planning tests.

Contract mirrors reference ``control/digital_twin_ingest.py``: emulated
streams are deterministic with a mid-shot burst, chaos injection is
accounted, and chaos-free SPARC/NSTX-U sessions produce passing plans."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.twin_ingest import (
    HISTORY_WINDOW,
    apply_chaos_monkey,
    build_snn_planner,
    disruption_risk_masked,
    generate_emulated_stream,
    risk_signal,
    run_realtime_twin_session,
    scenario_plan,
)


class TestStream:
    def test_shapes_and_determinism(self):
        s1 = generate_emulated_stream("SPARC", samples=64)
        s2 = generate_emulated_stream("sparc ", samples=64)
        assert s1.beta_n.shape == (64,)
        np.testing.assert_array_equal(np.asarray(s1.beta_n),
                                      np.asarray(s2.beta_n))

    def test_burst_window_raises_beta(self):
        s = generate_emulated_stream("NSTX-U", samples=320)
        beta = np.asarray(s.beta_n)
        phase = np.arange(320) / 319.0
        in_burst = (phase >= 0.60) & (phase <= 0.74)
        assert beta[in_burst].max() > beta[~in_burst].max()

    def test_invalid_machine_rejected(self):
        with pytest.raises(ValueError):
            generate_emulated_stream("ITER")
        with pytest.raises(ValueError):
            generate_emulated_stream("SPARC", samples=8)


class TestChaos:
    def test_zero_chaos_is_identity(self):
        s = generate_emulated_stream("SPARC", samples=64)
        out, drops, noise = apply_chaos_monkey(s, jax.random.PRNGKey(0))
        np.testing.assert_array_equal(np.asarray(out.beta_n),
                                      np.asarray(s.beta_n))
        assert int(drops) == 0 and int(noise) == 0

    def test_dropout_zeroes_and_counts(self):
        s = generate_emulated_stream("SPARC", samples=128)
        out, drops, _ = apply_chaos_monkey(
            s, jax.random.PRNGKey(1), dropout_prob=0.5)
        assert 50 < int(drops) < 4 * 128
        assert np.sum(np.asarray(out.ip_ma) == 0.0) > 0

    def test_density_stays_nonnegative(self):
        s = generate_emulated_stream("NSTX-U", samples=64)
        out, _, _ = apply_chaos_monkey(
            s, jax.random.PRNGKey(2), dropout_prob=0.3, noise_std=5.0)
        assert float(jnp.min(out.density_1e19)) >= 0.0


class TestRisk:
    def test_risk_bounded_and_monotone_in_burst(self):
        calm = jnp.full((HISTORY_WINDOW,), 0.45)
        hot = jnp.linspace(0.45, 1.6, HISTORY_WINDOW)
        mask = jnp.ones((HISTORY_WINDOW,), bool)
        tor = jnp.zeros((5,))
        r_calm = float(disruption_risk_masked(calm, mask, tor))
        r_hot = float(disruption_risk_masked(hot, mask, tor))
        assert 0.0 < r_calm < r_hot < 1.0

    def test_mask_excludes_padding(self):
        sig = jnp.concatenate(
            [jnp.full((32,), 99.0), jnp.full((32,), 0.5)])
        mask = jnp.concatenate(
            [jnp.zeros((32,), bool), jnp.ones((32,), bool)])
        tor = jnp.zeros((5,))
        r = float(disruption_risk_masked(sig, mask, tor))
        r_clean = float(disruption_risk_masked(
            jnp.full((64,), 0.5), jnp.ones((64,), bool), tor))
        assert abs(r - r_clean) < 1e-6

    def test_risk_signal_formula(self):
        s = generate_emulated_stream("SPARC", samples=64)
        sig = np.asarray(risk_signal(s))
        assert sig.shape == (64,) and np.all(sig >= 0.45 - 1e-6)


class TestScenarioPlan:
    def test_sparc_calm_plan_passes(self):
        ctrl, cfg = build_snn_planner()
        hist = jnp.full((HISTORY_WINDOW,), 0.45)
        mask = jnp.ones((HISTORY_WINDOW,), bool)
        plan = scenario_plan(ctrl, cfg, hist, mask, 1.65, 3.9, 8.2,
                             horizon=24)
        assert bool(plan.passes)
        assert float(plan.mean_risk) <= 0.75
        assert abs(float(plan.recommended_action)) <= 0.8

    def test_horizon_validation(self):
        ctrl, cfg = build_snn_planner()
        hist = jnp.full((HISTORY_WINDOW,), 0.45)
        mask = jnp.ones((HISTORY_WINDOW,), bool)
        with pytest.raises(ValueError):
            scenario_plan(ctrl, cfg, hist, mask, 1.65, 3.9, 8.2, horizon=2)


class TestSession:
    def test_chaos_free_session_all_plans_pass(self):
        plans, info = run_realtime_twin_session(
            "SPARC", samples=128, plan_every=16, horizon=16)
        assert int(info["n_plans"]) == 7
        assert float(info["all_pass_rate"]) == 1.0
        assert int(info["chaos_dropouts"]) == 0

    def test_nstxu_session_finite(self):
        plans, info = run_realtime_twin_session(
            "NSTX-U", samples=96, plan_every=24, horizon=12)
        assert np.all(np.isfinite(np.asarray(plans.mean_risk)))
        assert float(info["worst_mean_risk"]) <= 1.0

    def test_chaos_session_counts_faults(self):
        _, info = run_realtime_twin_session(
            "SPARC", samples=96, plan_every=24, horizon=8,
            chaos_dropout_prob=0.2, chaos_noise_std=0.01)
        assert int(info["chaos_dropouts"]) > 0
        assert int(info["chaos_noise_injections"]) == 4 * 96

    def test_deterministic(self):
        p1, i1 = run_realtime_twin_session("SPARC", samples=96,
                                           plan_every=32, horizon=8)
        p2, i2 = run_realtime_twin_session("SPARC", samples=96,
                                           plan_every=32, horizon=8)
        np.testing.assert_array_equal(np.asarray(p1.mean_risk),
                                      np.asarray(p2.mean_risk))
