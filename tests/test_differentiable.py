"""IFT fixed-point adjoint + differentiable predictive forward tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.differentiable import (
    PredictiveTheta,
    axis_sensitivity,
    build_predictive_model,
    fixed_point_ift,
    optimize_coil_currents_diff,
    solve_predictive_diff,
)
from scpn_fusion_tpu.models.equilibrium.topology import soft_axis_flux


class TestFixedPointIFT:
    def test_linear_fixed_point_gradient_exact(self):
        # psi* solves psi = a*psi + b  ->  psi* = b/(1-a);
        # d psi*/d b = 1/(1-a), d psi*/d a = b/(1-a)^2.
        a, b = 0.5, 2.0

        def step(theta, psi):
            return theta[0] * psi + theta[1]

        theta = jnp.asarray([a, b])
        psi = fixed_point_ift(step, theta, jnp.asarray(0.0), 200, 200)
        assert float(psi) == pytest.approx(b / (1 - a), rel=1e-6)

        g = jax.grad(lambda th: fixed_point_ift(
            step, th, jnp.asarray(0.0), 200, 200))(theta)
        assert float(g[1]) == pytest.approx(1.0 / (1 - a), rel=1e-5)
        assert float(g[0]) == pytest.approx(b / (1 - a) ** 2, rel=1e-5)

    def test_gradient_matches_finite_difference_vector_case(self):
        m = jnp.asarray([[0.3, 0.1], [0.0, 0.4]])

        def step(theta, psi):
            return m @ psi + theta

        def loss(theta):
            psi = fixed_point_ift(step, theta, jnp.zeros(2), 300, 300)
            return jnp.sum(psi ** 2)

        theta0 = jnp.asarray([1.0, -0.5])
        g = jax.grad(loss)(theta0)
        eps = 1e-5
        for i in range(2):
            e = jnp.zeros(2).at[i].set(eps)
            fd = (loss(theta0 + e) - loss(theta0 - e)) / (2 * eps)
            assert float(g[i]) == pytest.approx(float(fd), rel=1e-3)


@pytest.fixture(scope="module")
def model():
    grid = Grid(NR=33, NZ=33, R_min=4.0, R_max=9.0, Z_min=-4.0, Z_max=4.0,
                dtype=np.dtype("float64"))
    coil_r = (3.6, 9.4, 9.4, 3.6)
    coil_z = (3.8, 2.2, -2.2, -3.8)
    return build_predictive_model(grid, coil_r, coil_z)


def _theta():
    return PredictiveTheta(
        coil_currents=jnp.asarray([2e6, 4e6, 4e6, 2e6]),
        p_coeffs=jnp.asarray([1.0, 0.1, 0.1, 1.5]),
        ip_target=jnp.asarray(1.5e7))


class TestPredictive:
    def test_forward_produces_confined_state(self, model):
        psi = solve_predictive_diff(model, _theta(), n_fwd=200)
        assert bool(jnp.all(jnp.isfinite(psi)))
        # interior max exceeds the boundary (closed surfaces exist)
        assert float(jnp.max(psi[5:-5, 5:-5])) > float(jnp.max(psi[0, :]))

    def test_axis_sensitivity_finite_nonzero(self, model):
        g = axis_sensitivity(model, _theta(), n_fwd=120, n_bwd=120)
        gc = np.asarray(g.coil_currents)
        assert np.all(np.isfinite(gc))
        assert np.any(np.abs(gc) > 0)
        assert np.isfinite(float(g.ip_target))

    def test_coil_optimisation_reduces_loss(self, model):
        theta0 = _theta()
        psi0 = solve_predictive_diff(model, theta0, n_fwd=150)
        target = soft_axis_flux(psi0) * 1.1
        theta1 = optimize_coil_currents_diff(
            model, theta0, target, lr=5e4, n_steps=10, n_fwd=100,
            n_bwd=100)
        psi1 = solve_predictive_diff(model, theta1, n_fwd=150)
        l0 = float((soft_axis_flux(psi0) - target) ** 2)
        l1 = float((soft_axis_flux(psi1) - target) ** 2)
        assert l1 < l0
