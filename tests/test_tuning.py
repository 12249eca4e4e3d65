"""Controller auto-tuning (batched CEM) tests.

Mirrors the reference's tuner contract (``control/controller_tuning.py``):
tuned PID gains must beat the untuned rollout score, and the H-inf tuning
must return parameters inside the search box with a feasible design.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.flight_sim import FlightSimParams
from scpn_fusion_tpu.control.tuning import (
    HINF_BOUNDS_HI,
    HINF_BOUNDS_LO,
    PID_BOUNDS_HI,
    PID_BOUNDS_LO,
    cem_minimize,
    pid_shot_cost,
    tune_hinf,
    tune_pid,
)

_PARAMS = FlightSimParams(control_hz=1000.0, shot_duration_s=0.25)


class TestCEM:
    def test_minimizes_quadratic(self):
        # Global minimum at x = [2, 0.5] inside the box.
        target = jnp.asarray([2.0, 0.5])
        res = cem_minimize(
            lambda x: jnp.sum((x - target) ** 2),
            jnp.asarray([0.1, 0.01]), jnp.asarray([10.0, 5.0]),
            jax.random.PRNGKey(0), population=64, n_generations=25,
            min_std=0.001)
        assert float(res.best_cost) < 1e-2
        np.testing.assert_allclose(np.asarray(res.best_params),
                                   np.asarray(target), rtol=0.1)

    def test_cost_history_is_monotone_at_best(self):
        res = cem_minimize(
            lambda x: jnp.sum(x * x),
            jnp.asarray([0.1]), jnp.asarray([10.0]),
            jax.random.PRNGKey(1), population=32, n_generations=10)
        running = np.minimum.accumulate(np.asarray(res.cost_history))
        assert float(res.best_cost) <= running[-1] + 1e-7


class TestTunePID:
    def test_beats_default_gains(self):
        default = jnp.asarray([
            _PARAMS.pid_r_kp, _PARAMS.pid_r_ki, _PARAMS.pid_r_kd,
            _PARAMS.pid_z_kp, _PARAMS.pid_z_ki, _PARAMS.pid_z_kd])
        baseline = float(pid_shot_cost(_PARAMS, default))
        res = tune_pid(_PARAMS, jax.random.PRNGKey(2),
                       population=48, n_generations=8)
        assert float(res.best_cost) <= baseline * 1.0001
        assert np.isfinite(float(res.best_cost))

    def test_gains_inside_search_box(self):
        res = tune_pid(_PARAMS, jax.random.PRNGKey(3),
                       population=32, n_generations=4)
        g = np.asarray(res.best_params)
        assert np.all(g >= np.asarray(PID_BOUNDS_LO) * (1 - 1e-5))
        assert np.all(g <= np.asarray(PID_BOUNDS_HI) * (1 + 1e-5))

    def test_deterministic_given_key(self):
        r1 = tune_pid(_PARAMS, jax.random.PRNGKey(4),
                      population=16, n_generations=3)
        r2 = tune_pid(_PARAMS, jax.random.PRNGKey(4),
                      population=16, n_generations=3)
        np.testing.assert_array_equal(np.asarray(r1.best_params),
                                      np.asarray(r2.best_params))


class TestTuneHInf:
    def _plant(self):
        # Lightly damped 2-state plant, collocated measurement.
        a = jnp.asarray([[0.0, 1.0], [-4.0, -0.2]])
        b1 = jnp.asarray([[0.0], [1.0]])
        b2 = jnp.asarray([[0.0], [1.0]])
        c1 = jnp.asarray([[1.0, 0.0]])
        c2 = jnp.asarray([[1.0, 0.0]])
        return a, b1, b2, c1, c2

    def test_returns_feasible_in_box(self):
        a, b1, b2, c1, c2 = self._plant()
        res = tune_hinf(a, b1, b2, c1, c2, jax.random.PRNGKey(5),
                        population=16, n_generations=4)
        th = np.asarray(res.best_params)
        assert np.all(th >= np.asarray(HINF_BOUNDS_LO) * (1 - 1e-5))
        assert np.all(th <= np.asarray(HINF_BOUNDS_HI) * (1 + 1e-5))
        # A feasible design exists in this box; the infeasibility penalty is
        # 1e3, so any best cost below that implies rho(XY) < gamma^2 held.
        assert float(res.best_cost) < 1e3
