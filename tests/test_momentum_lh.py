"""Momentum transport + L-H transition tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.transport.momentum_lh import (
    LHState,
    MomentumParams,
    confinement_multiplier,
    evolve_rotation,
    lh_transition_step,
    martin_lh_threshold_mw,
    momentum_cn_step,
    nbi_torque_density,
    plasma_surface_area,
)


class TestLH:
    def test_martin_scaling_iter_ballpark(self):
        # ITER: ne ~ 0.5e20, B = 5.3 T, S ~ 680 m^2 -> P_LH ~ 45-55 MW
        s = plasma_surface_area(6.2, 2.0, 1.8)
        p = float(martin_lh_threshold_mw(0.5, 5.3, s))
        assert 30.0 < p < 70.0

    def test_transition_hysteresis(self):
        args = dict(ne20=0.5, b_t=5.3, r_m=6.2, a_m=2.0, kappa=1.8)
        st = lh_transition_step(10.0, h_mode=jnp.asarray(False), **args)
        assert not bool(st.h_mode)
        p_lh = float(st.p_threshold_mw)
        # cross forward
        st = lh_transition_step(1.2 * p_lh, h_mode=st.h_mode, **args)
        assert bool(st.h_mode)
        # stay in H below threshold but above hysteresis band
        st = lh_transition_step(0.9 * p_lh, h_mode=st.h_mode, **args)
        assert bool(st.h_mode)
        # fall below the band -> back transition
        st = lh_transition_step(0.5 * p_lh, h_mode=st.h_mode, **args)
        assert not bool(st.h_mode)

    def test_confinement_multiplier(self):
        assert float(confinement_multiplier(jnp.asarray(True))) == 1.0
        assert float(confinement_multiplier(jnp.asarray(False))) == 0.6


class TestMomentum:
    def setup_method(self):
        self.rho = jnp.linspace(0.0, 1.0, 33)
        self.params = MomentumParams(
            r_m=jnp.asarray(6.2), a_m=jnp.asarray(2.0),
            prandtl=jnp.asarray(0.7), pinch_v_m_s=jnp.asarray(0.0))
        self.chi = jnp.ones(33)
        self.ni = 10.0 * (1.0 - 0.8 * self.rho ** 2)

    def test_torque_deposits_on_axis(self):
        tq = nbi_torque_density(self.rho, 33.0, 5.3, 6.2)
        tq = np.asarray(tq)
        assert tq[0] == tq.max()
        assert tq[-1] < 0.05 * tq[0]

    def test_rotation_spins_up_and_saturates_shape(self):
        tq = nbi_torque_density(self.rho, 33.0, 5.3, 6.2)
        tr = evolve_rotation(jnp.zeros(33), self.chi, tq, self.ni,
                             self.rho, 1e-3, 500, self.params)
        om = np.asarray(tr.omega)
        assert np.all(np.isfinite(om))
        assert om[-1, 0] > om[0, 0]           # core spins up
        assert abs(om[-1, -1]) < 1e-8         # edge pinned
        assert om[-1, 0] == om[-1].max()      # peaked on axis

    def test_no_torque_decays_to_edge_value(self):
        om0 = jnp.exp(-self.rho ** 2 / 0.1)
        tr = evolve_rotation(om0, self.chi, jnp.zeros(33), self.ni,
                             self.rho, 1e-2, 2000, self.params)
        assert float(jnp.max(jnp.abs(tr.omega[-1]))) < 0.05

    def test_single_step_stable_large_dt(self):
        om = momentum_cn_step(jnp.ones(33), self.chi, jnp.zeros(33),
                              self.ni, self.rho, 10.0, self.params)
        assert bool(jnp.all(jnp.isfinite(om)))
