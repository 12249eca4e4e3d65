"""Plain-JAX MLP with a jitted Adam training loop.

The framework's shared surrogate backbone (reference analogues:
``core/neural_equilibrium.py:135-258`` SimpleMLP, ``core/neural_transport``
QLKNN-10D MLP, ``control/disruption_predictor.py`` NumPy fallback).  Pure
pytree parameters (no flax dependency), optax optimiser, the whole training
loop under ``lax.scan`` so a full fit is one device program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


class MLPParams(NamedTuple):
    weights: tuple
    biases: tuple


def init_mlp(key, sizes: Sequence[int], dtype=jnp.float32) -> MLPParams:
    """He-initialised MLP with the given layer sizes."""
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        scale = jnp.sqrt(2.0 / sizes[i])
        ws.append(scale * jax.random.normal(sub, (sizes[i], sizes[i + 1]), dtype))
        bs.append(jnp.zeros((sizes[i + 1],), dtype))
    return MLPParams(tuple(ws), tuple(bs))


def mlp_apply(params: MLPParams, x: jnp.ndarray) -> jnp.ndarray:
    """Forward pass (gelu hidden activations, linear head)."""
    h = x
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n - 1:
            h = jax.nn.gelu(h)
    return h


class TrainResult(NamedTuple):
    params: MLPParams
    loss_history: jnp.ndarray


@partial(jax.jit, static_argnames=("n_steps", "batch_size", "lr"))
def train_mlp(
    params: MLPParams,
    x: jnp.ndarray,
    y: jnp.ndarray,
    key,
    *,
    n_steps: int = 2000,
    batch_size: int = 256,
    lr: float = 1e-3,
) -> TrainResult:
    """Full MSE training run as one compiled ``lax.scan``."""
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    n = x.shape[0]

    def loss_fn(p, xb, yb):
        pred = mlp_apply(p, xb)
        return jnp.mean((pred - yb) ** 2)

    def step(carry, k):
        p, s = carry
        idx = jax.random.randint(jax.random.fold_in(key, k), (batch_size,), 0, n)
        loss, grads = jax.value_and_grad(loss_fn)(p, x[idx], y[idx])
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (params_f, _), losses = jax.lax.scan(
        step, (params, opt_state), jnp.arange(n_steps))
    return TrainResult(params_f, losses)
