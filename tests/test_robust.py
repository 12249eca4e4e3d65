"""mu-synthesis (D-K lite) + RWM feedback tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.robust import (
    build_rwm_plant,
    mu_synthesis,
    rwm_feedback_design,
)


class TestMuSynthesis:
    def test_stabilises_unstable_plant_with_bound(self):
        a = jnp.asarray([[0.5, 1.0], [0.0, -2.0]])   # one unstable pole
        b = jnp.asarray([[0.0], [1.0]])
        c = jnp.eye(2)
        res = mu_synthesis(a, b, c, n_dk_iters=3)
        a_cl = np.asarray(a - b @ res.k_gain)
        assert np.max(np.real(np.linalg.eigvals(a_cl))) < 0.0
        assert bool(res.converged)
        assert np.isfinite(float(res.mu_upper_bound))
        assert res.d_scales.shape == (2,)

    def test_mu_bound_grows_with_uncertainty(self):
        a = jnp.asarray([[0.2, 0.5], [0.0, -1.0]])
        b = jnp.asarray([[0.0], [1.0]])
        c = jnp.eye(2)
        lo = mu_synthesis(a, b, c, uncertainty_scale=0.1)
        hi = mu_synthesis(a, b, c, uncertainty_scale=0.5)
        assert float(hi.mu_upper_bound) >= float(lo.mu_upper_bound)


class TestRWM:
    def test_open_loop_unstable_closed_loop_stable(self):
        plant = build_rwm_plant(gamma_rwm=50.0)
        open_rate = float(np.max(np.real(
            np.linalg.eigvals(np.asarray(plant.a)))))
        assert open_rate > 0.0
        res = rwm_feedback_design(plant)
        assert bool(res.stabilised), float(res.closed_loop_rate)
        amp = np.asarray(res.trace)
        assert abs(amp[-1]) < abs(amp[0])

    def test_feedback_through_wall_only(self):
        # actuation enters only through the wall state (b[0] == 0): the
        # controller must work through the wall dynamics.
        plant = build_rwm_plant()
        assert float(plant.b[0, 0]) == 0.0
        res = rwm_feedback_design(plant, q_weight=500.0)
        assert bool(res.stabilised)
