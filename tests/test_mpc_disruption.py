"""NMPC planner + disruption predictor tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.disruption import (
    AlarmConfig,
    evaluate_predictor,
    extract_window_features,
    run_alarm,
    train_disruption_predictor,
)
from scpn_fusion_tpu.control.mpc import MPCConfig, mpc_closed_loop, plan, rollout


class TestMPC:
    @staticmethod
    def _linear_dynamics(x, u):
        # Unstable 2-state plant with direct actuation.
        a = jnp.asarray([[0.0, 1.0], [0.5, 0.0]])
        b = jnp.asarray([[0.0], [1.0]])
        return a @ x + (b @ u)

    def test_rollout_shapes(self):
        x0 = jnp.asarray([1.0, 0.0])
        u = jnp.zeros((5, 1))
        xs = rollout(self._linear_dynamics, x0, u, 0.1)
        assert xs.shape == (6, 2)

    def test_plan_reduces_cost_and_respects_bounds(self):
        cfg = MPCConfig(horizon=15, dt=0.1, iterations=100,
                        u_min=-2.0, u_max=2.0)
        x0 = jnp.asarray([1.0, 0.0])
        target = jnp.zeros(2)
        p = plan(self._linear_dynamics, cfg, x0, target,
                 u_init=jnp.zeros((15, 1)))
        # Uncontrolled cost for comparison.
        xs_free = rollout(self._linear_dynamics, x0, jnp.zeros((15, 1)), 0.1)
        cost_free = float(jnp.sum(xs_free[1:] ** 2))
        assert float(p.cost) < cost_free
        assert np.all(np.abs(np.asarray(p.u_traj)) <= 2.0 + 1e-6)

    def test_closed_loop_stabilises(self):
        cfg = MPCConfig(horizon=12, dt=0.1, iterations=80,
                        u_min=-3.0, u_max=3.0, l2_reg=1e-3)
        x0 = jnp.asarray([1.0, 0.0])
        target = jnp.zeros(2)
        xs, us = mpc_closed_loop(
            self._linear_dynamics, self._linear_dynamics, cfg, x0, target,
            n_steps=30, nu=1)
        final_norm = float(jnp.linalg.norm(xs[-1]))
        assert final_norm < 0.2, f"MPC failed to regulate: {final_norm}"


class TestDisruption:
    @staticmethod
    def _synthetic_shots(n_shots=32, t_len=128, seed=0):
        """Disruptive shots grow an oscillating precursor in channel 0 and a
        drift in channel 1 over the last ~40 ticks."""
        rng = np.random.default_rng(seed)
        shots = rng.standard_normal((n_shots, t_len, 3)).astype(np.float32) * 0.1
        labels = (np.arange(n_shots) % 2 == 0).astype(np.float32)
        t = np.arange(t_len)
        for i in range(n_shots):
            if labels[i] > 0:
                onset = t_len - 40
                grow = np.maximum(0, t - onset) / 40.0
                shots[i, :, 0] += 2.0 * grow * np.sin(0.8 * t)
                shots[i, :, 1] += 1.5 * grow
        return jnp.asarray(shots), jnp.asarray(labels)

    def test_window_features_shapes_and_trend(self):
        sig = jnp.asarray(np.linspace(0, 1, 50)[:, None], jnp.float32)
        feats = extract_window_features(sig, 10)
        assert feats.shape == (41, 3)
        # Linear ramp: trend constant and positive, std constant.
        trend = np.asarray(feats[:, 2])
        np.testing.assert_allclose(trend, trend[0], rtol=1e-4)
        assert trend[0] > 0

    def test_train_and_detect(self):
        shots, labels = self._synthetic_shots()
        pred = train_disruption_predictor(
            shots, labels, jax.random.PRNGKey(0), n_steps=1500)
        metrics = evaluate_predictor(pred, shots, labels)
        assert float(metrics["recall"]) >= 0.9, metrics
        assert float(metrics["fpr"]) <= 0.2, metrics

    def test_alarm_latching_and_confirmation(self):
        risk = jnp.asarray([0.0, 0.9, 0.0, 0.9, 0.9, 0.9, 0.0, 0.0])
        trace = run_alarm(risk, AlarmConfig(threshold=0.7, confirm_ticks=3))
        alarm = np.asarray(trace.alarm)
        assert not alarm[1]          # single spike doesn't fire
        assert alarm[5]              # 3 consecutive ticks fire
        assert alarm[6] and alarm[7]  # latched after firing
        assert int(trace.first_alarm_tick) == 5

    def test_no_alarm_on_quiet_shot(self):
        risk = 0.2 * jnp.ones(64)
        trace = run_alarm(risk, AlarmConfig())
        assert int(trace.first_alarm_tick) == -1


class TestAlarmThresholdSweep:
    def test_parity_with_run_alarm(self):
        from scpn_fusion_tpu.control.disruption import alarm_threshold_sweep

        rng = np.random.default_rng(3)
        risks = jnp.asarray(rng.uniform(0.0, 1.0, (6, 40)).astype(np.float32))
        thresholds = jnp.asarray([0.3, 0.6, 0.9], jnp.float32)
        fired, first = alarm_threshold_sweep(risks, thresholds)
        assert fired.shape == (3, 6) and first.shape == (3, 6)
        for k, th in enumerate([0.3, 0.6, 0.9]):
            for i in range(6):
                tr = run_alarm(risks[i],
                               AlarmConfig(threshold=th, confirm_ticks=3))
                assert bool(fired[k, i]) == bool(tr.first_alarm_tick >= 0)
                assert int(first[k, i]) == int(tr.first_alarm_tick)

    def test_monotone_in_threshold(self):
        from scpn_fusion_tpu.control.disruption import alarm_threshold_sweep

        risk = jnp.linspace(0.0, 1.0, 50)[None, :]
        thresholds = jnp.asarray([0.2, 0.5, 0.8], jnp.float32)
        fired, first = alarm_threshold_sweep(risk, thresholds)
        assert bool(jnp.all(fired))
        # Stricter thresholds fire later on a monotone ramp.
        assert int(first[0, 0]) < int(first[1, 0]) < int(first[2, 0])
