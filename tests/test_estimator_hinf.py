"""EKF + H-infinity controller tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.estimator import (
    EKFState,
    ekf_init,
    ekf_predict,
    ekf_step,
    ekf_update,
)
from scpn_fusion_tpu.control.hinf import (
    HInfState,
    find_optimal_gamma,
    hinf_step,
    solve_care_ode,
    synthesize_hinf,
)


class TestEKF:
    def _setup(self):
        x0 = jnp.asarray([6.0, 0.1, 0.0, 0.0, 15.0, 10.0])
        p0 = jnp.eye(6) * 0.1
        q = jnp.eye(6) * 1e-4
        r = jnp.eye(4) * 1e-3
        return x0, p0, q, r

    def test_tracks_moving_plasma(self):
        x0, p0, q, r = self._setup()
        state = ekf_init(x0, p0)
        rng = np.random.default_rng(0)
        # True plasma drifts in R at 0.2 m/s.
        true_r = 6.0
        dt = 0.01
        for _ in range(200):
            true_r += 0.2 * dt
            z = jnp.asarray([true_r + 0.01 * rng.standard_normal(),
                             0.1, 15.0, 10.0])
            state = ekf_step(state, z, q, r, dt)
        assert abs(float(state.x[0]) - true_r) < 0.02
        # Velocity estimate should have learned the drift.
        assert 0.05 < float(state.x[2]) < 0.4

    def test_covariance_grows_in_predict_shrinks_in_update(self):
        x0, p0, q, r = self._setup()
        state = ekf_init(x0, p0)
        pred = ekf_predict(state, q, 0.1)
        assert float(jnp.trace(pred.p)) > float(jnp.trace(state.p))
        upd = ekf_update(pred, jnp.asarray([6.0, 0.1, 15.0, 10.0]), r)
        assert float(jnp.trace(upd.p)) < float(jnp.trace(pred.p))


class TestRiccati:
    def test_care_ode_matches_scipy(self):
        """RK4 Riccati integration must match scipy's Schur solution (LQR)."""
        import scipy.linalg
        a = jnp.asarray([[0.0, 1.0], [-2.0, -3.0]])
        b = jnp.asarray([[0.0], [1.0]])
        q = jnp.eye(2)
        s = b @ b.T  # R = I
        x = np.asarray(solve_care_ode(a, s, q, dt=0.005, n_steps=8000))
        x_ref = scipy.linalg.solve_continuous_are(
            np.asarray(a), np.asarray(b), np.eye(2), np.eye(1))
        np.testing.assert_allclose(x, x_ref, rtol=1e-4, atol=1e-6)


class TestHInf:
    def _plant(self):
        # Unstable 2-state plant (vertical-instability-like).
        a = jnp.asarray([[0.0, 1.0], [4.0, 0.0]])   # eigenvalues +-2
        b1 = jnp.asarray([[0.1], [0.0]])            # disturbance
        b2 = jnp.asarray([[0.0], [1.0]])            # control
        c1 = jnp.asarray([[1.0, 0.0], [0.0, 0.1]])  # performance
        c2 = jnp.asarray([[1.0, 0.0]])              # measurement
        return a, b1, b2, c1, c2

    def test_synthesis_feasible_at_large_gamma(self):
        a, b1, b2, c1, c2 = self._plant()
        g = synthesize_hinf(a, b1, b2, c1, c2, 50.0)
        assert bool(g.robust_feasible)
        x = np.asarray(g.x)
        np.testing.assert_allclose(x, x.T, atol=1e-8)
        assert np.all(np.linalg.eigvalsh(x) > -1e-8)  # PSD

    def test_gamma_bisection_returns_feasible(self):
        a, b1, b2, c1, c2 = self._plant()
        gamma = find_optimal_gamma(a, b1, b2, c1, c2, gamma_hi=50.0,
                                   n_bisect=10)
        g = synthesize_hinf(a, b1, b2, c1, c2, gamma)
        assert bool(g.robust_feasible)
        assert gamma < 50.0  # tightened below the cap

    def test_closed_loop_stabilises_unstable_plant(self):
        a, b1, b2, c1, c2 = self._plant()
        g = synthesize_hinf(a, b1, b2, c1, c2, 20.0)
        # A + B2 F must be Hurwitz.
        acl = np.asarray(a + b2 @ g.f)
        assert np.all(np.linalg.eigvals(acl).real < 0)

        # Simulate output feedback on the true plant.
        dt = 1e-3
        x_true = jnp.asarray([0.3, 0.0])
        s = HInfState(jnp.zeros(2))
        for _ in range(4000):
            y = c2 @ x_true
            s, u = hinf_step(g, a, b2, c2, s, y, dt)
            x_true = x_true + dt * (a @ x_true + b2 @ u)
        assert float(jnp.linalg.norm(x_true)) < 0.05, x_true
