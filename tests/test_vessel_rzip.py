"""Vessel circuits, RZIP vertical response, SMC, gain scheduling tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.gain_schedule import (
    DISRUPTION_MITIGATION,
    H_MODE_FLAT,
    L_MODE_FLAT,
    N_REGIMES,
    RAMP_UP,
    DetectorThresholds,
    GainBank,
    Waveform,
    init_schedule_state,
    iter_baseline_waveforms,
    schedule_step,
)
from scpn_fusion_tpu.control.sliding_mode import (
    SMCParams,
    estimate_convergence_time,
    lyapunov_certificate,
    run_smc_vertical,
    smc_step,
)
from scpn_fusion_tpu.control.vessel_rzip import (
    Vessel,
    build_rzip_state_space,
    closed_loop_eigenvalues,
    compute_n_index,
    mutual_inductance,
    mutual_matrix,
    psi_vessel,
    required_feedback_gain,
    rzip_lqr_gain,
    rzip_voltage_command,
    vertical_growth_rate,
    vertical_growth_time_ms,
    vessel_step,
)


def _make_vessel(n=8, r0=7.5, with_coils=False):
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = r0 + 2.8 * np.cos(theta)
    z = 3.2 * np.sin(theta)
    resistance = np.full(n, 5e-4)
    # Physical loop self-inductance mu0 R (ln(8R/a) - 2), a ~ 5 cm: ~6e-5 H
    # (must exceed neighbour mutuals or M is not SPD).
    inductance = 4e-7 * np.pi * r * (np.log(8.0 * r / 0.05) - 2.0)
    if with_coils:
        r = np.concatenate([r, [9.5, 9.5]])
        z = np.concatenate([z, [2.0, -2.0]])
        resistance = np.concatenate([resistance, [1e-3, 1e-3]])
        l_coil = 4e-7 * np.pi * 9.5 * (np.log(8.0 * 9.5 / 0.05) - 2.0) * 20.0
        inductance = np.concatenate([inductance, [l_coil, l_coil]])
    return Vessel(jnp.asarray(r), jnp.asarray(z),
                  jnp.asarray(resistance), jnp.asarray(inductance))


class TestVessel:
    def test_mutual_inductance_symmetric_and_decaying(self):
        m_near = float(mutual_inductance(6.0, 0.0, 6.0, 0.5))
        m_far = float(mutual_inductance(6.0, 0.0, 6.0, 3.0))
        m_sym = float(mutual_inductance(6.0, 0.5, 6.0, 0.0))
        assert m_near > m_far > 0
        np.testing.assert_allclose(m_near, m_sym, rtol=1e-6)

    def test_mutual_matrix_spd(self):
        v = _make_vessel()
        m = np.asarray(mutual_matrix(v))
        np.testing.assert_allclose(m, m.T, rtol=1e-6)
        assert np.all(np.diag(m) > 0)
        # SPD: Cholesky must succeed.
        np.linalg.cholesky(m)

    def test_eddy_currents_decay_without_drive(self):
        v = _make_vessel()
        i0 = jnp.ones(8) * 100.0
        i1 = i0
        for _ in range(50):
            i1 = vessel_step(v, i1, jnp.zeros(8), 1e-3)
        assert float(jnp.max(jnp.abs(i1))) < float(jnp.max(jnp.abs(i0)))

    def test_flux_drive_induces_opposing_current(self):
        v = _make_vessel()
        i1 = vessel_step(v, jnp.zeros(8), jnp.ones(8) * 1e-3, 1e-3)
        # Lenz: rising external flux drives negative loop current.
        assert float(jnp.max(i1)) < 0.0

    def test_psi_vessel_finite(self):
        v = _make_vessel()
        r_obs = jnp.linspace(5.0, 9.0, 10)
        z_obs = jnp.zeros(10)
        psi = psi_vessel(v, jnp.ones(8) * 1e3, r_obs, z_obs)
        assert bool(jnp.all(jnp.isfinite(psi)))
        assert float(jnp.max(jnp.abs(psi))) > 0


class TestRZIP:
    def _ss(self, n_index=-1.2):
        v = _make_vessel(with_coils=True)
        return build_rzip_state_space(
            v, n_wall=8, r0=6.2, ip_ma=15.0, n_index=n_index)

    def test_state_space_shapes(self):
        ss = self._ss()
        assert ss.a.shape == (12, 12)
        assert ss.b.shape == (12, 2)
        assert ss.c.shape == (1, 12)
        assert float(ss.a[0, 1]) == 1.0

    def test_negative_n_index_unstable(self):
        gamma = vertical_growth_rate(self._ss(n_index=-1.2))
        assert gamma > 0
        assert vertical_growth_time_ms(self._ss(n_index=-1.2)) < np.inf

    def test_positive_n_index_stable(self):
        # Positive n-index -> restoring force -> no growing mode.
        gamma_stable = vertical_growth_rate(self._ss(n_index=1.0))
        gamma_unstable = vertical_growth_rate(self._ss(n_index=-1.2))
        assert gamma_stable < gamma_unstable

    def test_lqr_stabilises(self):
        ss = self._ss(n_index=-0.4)
        k = rzip_lqr_gain(ss, kp=100.0, kd=100.0, n_steps=40000, dt=2e-5)
        eig_cl = closed_loop_eigenvalues(ss, k)
        eig_ol = vertical_growth_rate(ss)
        assert float(np.max(np.real(eig_cl))) < eig_ol
        u = np.asarray(rzip_voltage_command(k, 0.01, 0.0))
        assert u.shape == (2,)
        assert np.all(np.isfinite(u))

    def test_n_index_from_psi_map(self):
        # Analytic field Bz ~ B0 (R/R0)^(-n): n_index recovers n.
        r = jnp.linspace(5.0, 7.5, 101)
        z = jnp.linspace(-1.0, 1.0, 21)
        n_true = 1.5
        b0, r0 = 0.3, 6.2
        # psi(R) = integral of R Bz dR for Bz = b0 (R/r0)^(-n).
        rr = np.asarray(r)
        bz = b0 * (rr / r0) ** (-n_true)
        psi_mid = np.concatenate([[0.0], np.cumsum(
            0.5 * (rr[1:] * bz[1:] + rr[:-1] * bz[:-1]) * np.diff(rr))])
        psi = jnp.asarray(np.tile(psi_mid, (21, 1)))
        n_est = float(compute_n_index(psi, r, z, 6.2))
        np.testing.assert_allclose(n_est, n_true, atol=0.15)

    def test_required_gain_validation(self):
        assert required_feedback_gain(100.0, 0.01, 0.001) == pytest.approx(1.1)
        with pytest.raises(ValueError):
            required_feedback_gain(-1.0, 0.01, 0.001)
        with pytest.raises(ValueError):
            required_feedback_gain(1.0, 0.0, 0.001)


class TestSMC:
    def test_lyapunov_certificate(self):
        assert lyapunov_certificate(5.0, 3.0, 2.0)
        assert not lyapunov_certificate(1.0, 3.0, 2.0)
        assert not lyapunov_certificate(5.0, 1.0, 2.0)

    def test_convergence_time_bound(self):
        t = estimate_convergence_time(5.0, 3.0, 2.0, 0.04)
        assert 0 < t < np.inf
        assert estimate_convergence_time(1.0, 3.0, 2.0, 0.04) == np.inf

    def test_step_saturates(self):
        p = SMCParams(alpha=100.0, beta=50.0, u_max=5.0)
        u, v = smc_step(p, jnp.asarray(0.0), jnp.asarray(1.0),
                        jnp.asarray(0.0), 1e-3)
        assert abs(float(u)) <= 5.0

    def test_closed_loop_stabilises_unstable_plant(self):
        p = SMCParams(alpha=50.0, beta=30.0, c=0.05, u_max=200.0)
        trace = run_smc_vertical(p, z0=0.02, dz0=0.0, gamma=20.0,
                                 control_gain=500.0, dt=1e-4, n_steps=8000)
        z = np.asarray(trace.z)
        assert np.all(np.isfinite(z))
        # Displacement driven back toward zero and held.
        assert abs(z[-1]) < 0.005
        assert np.max(np.abs(z[-1000:])) < 0.01


class TestGainSchedule:
    def _bank(self, n_ch=2):
        shape = (N_REGIMES, n_ch)
        return GainBank(
            kp=jnp.full(shape, 1.0).at[H_MODE_FLAT].set(3.0),
            ki=jnp.full(shape, 0.1),
            kd=jnp.full(shape, 0.01),
            x_ref=jnp.zeros(shape).at[H_MODE_FLAT].set(2.0),
        )

    def test_detector_hysteresis(self):
        th = DetectorThresholds()
        bank = self._bank()
        st = init_schedule_state(2)
        x = jnp.zeros(2)
        # One H-mode sample is not enough to switch (buffer not unanimous).
        u, st2 = schedule_step(th, bank, st, x, 0.0, 0.01,
                               dip_dt=0.0, tau_e=2.0, p_disrupt=0.0)
        assert int(st2.regime) == RAMP_UP
        # Five consecutive H-mode detections commit the switch.
        for k in range(5):
            u, st2 = schedule_step(th, bank, st2, x, 0.01 * (k + 1), 0.01,
                                   dip_dt=0.0, tau_e=2.0, p_disrupt=0.0)
        assert int(st2.regime) == H_MODE_FLAT

    def test_disruption_overrides_and_resets_integral(self):
        th = DetectorThresholds()
        bank = self._bank()
        st = init_schedule_state(2)
        x = jnp.ones(2)
        # Build up integral in L-mode first.
        for k in range(6):
            u, st = schedule_step(th, bank, st, x, 0.01 * k, 0.01,
                                  dip_dt=0.0, tau_e=0.5, p_disrupt=0.0)
        assert float(jnp.max(jnp.abs(st.integral))) > 0
        for k in range(5):
            u, st = schedule_step(th, bank, st, x, 0.1 + 0.01 * k, 0.01,
                                  dip_dt=0.0, tau_e=0.5, p_disrupt=0.95)
        assert int(st.regime) == DISRUPTION_MITIGATION

    def test_bumpless_interpolation_is_continuous(self):
        th = DetectorThresholds(history_len=1)
        bank = self._bank()
        st = init_schedule_state(2, history_len=1)
        x = jnp.ones(2) * 0.5
        us = []
        t = 0.0
        # L-mode steady, then switch to H-mode; record command jump.
        for k in range(20):
            u, st = schedule_step(th, bank, st, x, t, 0.01,
                                  dip_dt=0.0, tau_e=0.5, p_disrupt=0.0)
            us.append(np.asarray(u))
            t += 0.01
        for k in range(20):
            u, st = schedule_step(th, bank, st, x, t, 0.01,
                                  dip_dt=0.0, tau_e=2.0, p_disrupt=0.0)
            us.append(np.asarray(u))
            t += 0.01
        us = np.stack(us)
        # No step discontinuity bigger than the full gain delta (blending):
        jumps = np.abs(np.diff(us[:, 0]))
        # Largest jump during blend much smaller than the instantaneous
        # switch would be (kp 1->3, x_ref 0->2 at x=0.5 -> jump ~ 7).
        assert jumps.max() < 2.0

    def test_waveforms(self):
        wf = iter_baseline_waveforms()
        ip = wf["ip_ma"]
        assert isinstance(ip, Waveform)
        np.testing.assert_allclose(float(ip(90.0)), 15.0, rtol=0.01)
        assert float(ip(0.0)) == pytest.approx(0.5)
        assert float(ip(600.0)) == pytest.approx(0.0)
