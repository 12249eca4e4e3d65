"""Learned-dynamics (neural-surrogate) model-predictive control.

Role-parity with the reference's surrogate-MPC lane
(``control/neural_surrogate_mpc.py`` — MPC planning over an MLP dynamics
model fitted to plant trajectories — and the learned-dynamics NMPC in
``control/fusion_nmpc_jax.py:39-81``).  Composition over the framework's
generic pieces: the dynamics surrogate is an MLP residual model
``x_{k+1} = x_k + f_theta(x_k, u_k)`` trained with ``surrogates/mlp``; the
planner is the generic gradient MPC in ``control/mpc.py``; everything
stays one jitted program per plan/closed-loop run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.control.mpc import MPCConfig, mpc_closed_loop, plan
from scpn_fusion_tpu.models.surrogates.mlp import (
    MLPParams,
    init_mlp,
    mlp_apply,
    train_mlp,
)


class DynamicsSurrogate(NamedTuple):
    mlp: MLPParams
    x_mean: jnp.ndarray
    x_std: jnp.ndarray
    d_mean: jnp.ndarray     # residual (delta-x) normalisation
    d_std: jnp.ndarray
    n_state: int
    n_control: int

    def __call__(self, x, u):
        """Discrete map: x_{k+1} = x_k + f_theta(x_k, u_k)."""
        xu = jnp.concatenate([jnp.atleast_1d(x), jnp.atleast_1d(u)])
        xn = (xu - self.x_mean) / self.x_std
        d = mlp_apply(self.mlp, xn[None, :])[0] * self.d_std + self.d_mean
        return jnp.atleast_1d(x) + d

    def derivative(self, dt: float):
        """Continuous-form wrapper for the generic MPC rollout
        (``mpc.rollout`` integrates x + dt * f(x, u))."""
        def f(x, u):
            return (self(x, u) - jnp.atleast_1d(x)) / dt
        return f


def learn_dynamics(x_traj: jnp.ndarray, u_traj: jnp.ndarray, key, *,
                   hidden=(64, 64), n_steps: int = 3000,
                   lr: float = 1e-3) -> DynamicsSurrogate:
    """Fit the residual dynamics model from logged rollouts.

    x_traj: (N, T+1, n_state) states; u_traj: (N, T, n_control) controls.
    """
    n, t1, n_state = x_traj.shape
    n_control = u_traj.shape[-1]
    x_in = jnp.concatenate(
        [x_traj[:, :-1].reshape(-1, n_state),
         u_traj.reshape(-1, n_control)], axis=1)
    d_out = (x_traj[:, 1:] - x_traj[:, :-1]).reshape(-1, n_state)

    x_mean = jnp.mean(x_in, axis=0)
    x_std = jnp.maximum(jnp.std(x_in, axis=0), 1e-9)
    d_mean = jnp.mean(d_out, axis=0)
    d_std = jnp.maximum(jnp.std(d_out, axis=0), 1e-9)
    xn = ((x_in - x_mean) / x_std).astype(jnp.float32)
    dn = ((d_out - d_mean) / d_std).astype(jnp.float32)

    params = init_mlp(key, (n_state + n_control, *hidden, n_state))
    res = train_mlp(params, xn, dn, jax.random.fold_in(key, 1),
                    n_steps=n_steps, batch_size=min(512, xn.shape[0]),
                    lr=lr)
    return DynamicsSurrogate(
        mlp=res.params,
        x_mean=x_mean.astype(jnp.float32),
        x_std=x_std.astype(jnp.float32),
        d_mean=d_mean.astype(jnp.float32),
        d_std=d_std.astype(jnp.float32),
        n_state=n_state, n_control=n_control)


def one_step_error(model: DynamicsSurrogate, x_traj, u_traj) -> jnp.ndarray:
    """Held-out one-step relative L2 error (model-quality gate)."""
    pred = jax.vmap(jax.vmap(model))(x_traj[:, :-1], u_traj)
    err = jnp.linalg.norm(pred - x_traj[:, 1:])
    return err / jnp.maximum(jnp.linalg.norm(x_traj[:, 1:]), 1e-30)


def surrogate_mpc_plan(model: DynamicsSurrogate, cfg: MPCConfig, x0,
                       x_target, u_init=None):
    """Plan over the learned model (generic gradient MPC underneath)."""
    if u_init is None:
        u_init = jnp.zeros((cfg.horizon, model.n_control), jnp.float32)
    return plan(model.derivative(cfg.dt), cfg, x0, x_target, u_init)


def surrogate_mpc_closed_loop(model: DynamicsSurrogate, true_plant,
                              cfg: MPCConfig, x0, x_target, *,
                              n_steps: int):
    """Receding-horizon control of the TRUE plant using the learned model
    for planning (the reference's surrogate-in-the-loop contract);
    ``true_plant(x, u)`` is the continuous-form real dynamics."""
    return mpc_closed_loop(model.derivative(cfg.dt), true_plant, cfg, x0,
                           x_target, n_steps, nu=model.n_control)
