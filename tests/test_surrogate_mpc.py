"""Learned-dynamics MPC: model fit, planning, surrogate-in-the-loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.mpc import MPCConfig
from scpn_fusion_tpu.control.surrogate_mpc import (
    learn_dynamics,
    one_step_error,
    surrogate_mpc_closed_loop,
    surrogate_mpc_plan,
)

DT = 0.05


def _true_plant(x, u):
    """Continuous dynamics of a damped 2-state plasma analogue:
    state [R_err, Z_err]; Z is unstable without control."""
    a = jnp.asarray([[-0.5, 0.1], [0.0, 0.4]])
    b = jnp.asarray([[1.0, 0.0], [0.0, 1.5]])
    return a @ x + b @ jnp.atleast_1d(u)


def _collect_rollouts(n=64, t=30, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.empty((n, t + 1, 2), np.float32)
    us = rng.uniform(-1.0, 1.0, (n, t, 2)).astype(np.float32)
    for i in range(n):
        x = rng.uniform(-1.0, 1.0, 2).astype(np.float32)
        xs[i, 0] = x
        for k in range(t):
            x = x + DT * np.asarray(_true_plant(jnp.asarray(x),
                                                jnp.asarray(us[i, k])))
            xs[i, k + 1] = x
    return jnp.asarray(xs), jnp.asarray(us)


@pytest.fixture(scope="module")
def model():
    xs, us = _collect_rollouts()
    return learn_dynamics(xs, us, jax.random.PRNGKey(0), n_steps=2000)


class TestModel:
    def test_one_step_error_small(self, model):
        xs, us = _collect_rollouts(n=16, seed=99)
        err = float(one_step_error(model, xs, us))
        assert err < 0.05

    def test_model_predicts_instability_direction(self, model):
        # uncontrolled Z grows: model must reproduce the sign
        x = jnp.asarray([0.0, 0.5])
        x1 = model(x, jnp.zeros(2))
        assert float(x1[1]) > 0.5


class TestPlanning:
    def test_plan_reduces_tracking_cost(self, model):
        cfg = MPCConfig(horizon=15, dt=DT, iterations=80,
                        learning_rate=0.1, u_min=-2.0, u_max=2.0)
        x0 = jnp.asarray([1.0, 0.8])
        target = jnp.zeros(2)
        p = surrogate_mpc_plan(model, cfg, x0, target)
        # planned trajectory ends much closer to target than it starts
        d0 = float(jnp.linalg.norm(x0))
        d1 = float(jnp.linalg.norm(p.x_traj[-1]))
        assert d1 < 0.3 * d0
        assert float(jnp.max(jnp.abs(p.u_traj))) <= 2.0 + 1e-6

    def test_surrogate_in_the_loop_stabilises_true_plant(self, model):
        cfg = MPCConfig(horizon=12, dt=DT, iterations=60,
                        learning_rate=0.1, u_min=-2.0, u_max=2.0)
        x0 = jnp.asarray([0.8, 0.6])
        xs, us = surrogate_mpc_closed_loop(
            model, _true_plant, cfg, x0, jnp.zeros(2), n_steps=25)
        final = float(jnp.linalg.norm(xs[-1]))
        assert final < 0.2 * float(jnp.linalg.norm(x0))
        assert bool(jnp.all(jnp.isfinite(xs)))
