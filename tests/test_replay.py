"""Shot replay pipeline: preprocessing, actuator lag, end-to-end replay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.disruption import train_disruption_predictor
from scpn_fusion_tpu.control.replay import (
    ReplayConfig,
    actuator_lag,
    median_prefilter,
    preprocess_channel,
    replay_shot,
    resample_to_control_grid,
    robust_clip,
)


def _make_shots(n=24, t_len=128, c=2, seed=0):
    """Synthetic shot library: disruptive shots ramp channel 0 at the end."""
    rng = np.random.default_rng(seed)
    shots = rng.standard_normal((n, t_len, c)) * 0.1
    labels = (np.arange(n) % 2).astype(float)
    ramp = np.linspace(0, 3.0, 40)
    for i in range(n):
        if labels[i] > 0.5:
            shots[i, -40:, 0] += ramp
    return jnp.asarray(shots), jnp.asarray(labels)


@pytest.fixture(scope="module")
def predictor():
    shots, labels = _make_shots()
    return train_disruption_predictor(shots, labels, jax.random.PRNGKey(0),
                                      window=16, n_steps=800)


class TestPreprocessing:
    def test_resample_linear(self):
        t = jnp.asarray([0.0, 1.0])
        x = jnp.asarray([0.0, 10.0])
        out = resample_to_control_grid(t, x, 0.25, 5)
        np.testing.assert_allclose(np.asarray(out),
                                   [0.0, 2.5, 5.0, 7.5, 10.0])

    def test_median_despikes(self):
        x = jnp.ones(20).at[7].set(100.0)
        out = median_prefilter(x, 5)
        assert float(out[7]) == 1.0

    def test_robust_clip_handles_nan_and_outliers(self):
        x = jnp.asarray([1.0, 1.1, 0.9, jnp.nan, 500.0, 1.05])
        out = np.asarray(robust_clip(x, 6.0))
        assert np.all(np.isfinite(out))
        assert out.max() < 10.0

    def test_config_validation(self):
        with pytest.raises(ValueError):
            ReplayConfig(median_window=4)


class TestActuatorLag:
    def test_first_order_response(self):
        u = jnp.concatenate([jnp.zeros(10), jnp.ones(200)])
        y = np.asarray(actuator_lag(u, dt_s=1e-3, tau_s=20e-3))
        assert y[9] == pytest.approx(0.0, abs=1e-9)
        assert 0.0 < y[30] < 1.0         # rising
        assert y[-1] == pytest.approx(1.0, abs=0.02)
        assert np.all(np.diff(y[10:]) >= -1e-9)


class TestReplay:
    def test_disruptive_shot_trips_with_warning(self, predictor):
        shots, labels = _make_shots(seed=42)
        dis = np.where(np.asarray(labels) > 0.5)[0][0]
        raw = jnp.asarray(np.asarray(shots[dis]).T)   # (C, T)
        t = jnp.linspace(0.0, 0.128, raw.shape[1])
        cfg = ReplayConfig(control_dt_s=1e-3)
        res = replay_shot(predictor, cfg, t, raw)
        assert bool(res.tripped)
        assert float(res.warning_time_s) > 0.0
        # mitigation actuates only after the alarm
        act = np.asarray(res.actuated)[:, 0]
        first = int(np.argmax(np.asarray(res.alarm_latched)))
        assert np.allclose(act[:first], 0.0)
        assert act[-1] > 0.1

    def test_safe_shot_does_not_trip(self, predictor):
        shots, labels = _make_shots(seed=42)
        safe = np.where(np.asarray(labels) < 0.5)[0][0]
        raw = jnp.asarray(np.asarray(shots[safe]).T)
        t = jnp.linspace(0.0, 0.128, raw.shape[1])
        res = replay_shot(predictor, ReplayConfig(), t, raw)
        assert not bool(res.tripped)
        assert float(res.warning_time_s) == 0.0
