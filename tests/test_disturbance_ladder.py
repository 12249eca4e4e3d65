"""Disturbance-rejection ladder tests (PID / H-inf / MPC / SNN).

Parity anchor: reference validation/benchmark_disturbance_rejection.py +
RESULTS.md "Disturbance Rejection" (qualitative ordering MPC < PID <
H-infinity ISE on VDE; SNN stable but chattering).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.disturbance_ladder import (
    DT,
    GAMMA_GROWTH,
    _dare_gain,
    disturbance_trace,
    plant_matrices,
    run_hinf,
    run_mpc,
    run_pid,
    run_snn,
)


class TestScenarios:
    def test_vde_impulse_then_zero(self):
        d = np.asarray(disturbance_trace("VDE"))
        assert d[0] == 5000.0
        assert np.all(d[int(1e-3 / DT) + 1:] == 0.0)
        assert d.shape[0] == int(2.0 / DT)

    def test_density_ramp_shape(self):
        d = np.asarray(disturbance_trace("density_ramp"))
        assert d[0] == pytest.approx(200.0 * (0.5 - 1.0))
        assert d[-1] == pytest.approx(200.0 * (1.2 - 1.0))

    def test_elm_pacing_10hz(self):
        d = np.asarray(disturbance_trace("elm_pacing"))
        pulses = np.where(d > 0)[0]
        assert pulses.size > 0
        # Bursts recur every 0.1 s.
        starts = pulses[np.diff(np.concatenate([[-10], pulses])) > 1]
        assert np.allclose(np.diff(starts) * DT, 0.1, atol=1e-3)

    def test_unknown_scenario_rejected(self):
        with pytest.raises(ValueError, match="unknown scenario"):
            disturbance_trace("tornado")


class TestControllers:
    def test_open_loop_unstable(self):
        """Sanity: the plant alone diverges at gamma = 100/s."""
        a, _, _ = plant_matrices()
        eig = np.linalg.eigvals(np.asarray(a))
        assert eig.real.max() == pytest.approx(GAMMA_GROWTH, rel=0.1)

    def test_dare_gain_stabilises_discrete_plant(self):
        a, b, _ = plant_matrices(dtype=jnp.float64)
        a_d = jnp.eye(2, dtype=jnp.float64) + DT * a
        b_d = DT * b
        q = jnp.eye(2, dtype=jnp.float64)
        k = _dare_gain(a_d, b_d, q, jnp.asarray(1e-9, jnp.float64))
        a_cl = np.asarray(a_d) - np.outer(np.asarray(b_d), np.asarray(k))
        assert np.max(np.abs(np.linalg.eigvals(a_cl))) < 1.0

    def test_pid_rejects_vde(self):
        m = run_pid("VDE")
        assert bool(m.stable)
        assert float(m.ise) < 1e-4
        assert float(m.overshoot) < 0.05

    def test_mpc_beats_pid_beats_hinf_on_vde(self):
        ise_pid = float(run_pid("VDE").ise)
        ise_mpc = float(run_mpc("VDE").ise)
        ise_hinf = float(run_hinf("VDE").ise)
        assert ise_mpc < ise_pid < ise_hinf   # reference table ordering
        assert ise_hinf < 1e-3                # H-inf still rejects

    def test_snn_stable_but_chatters(self):
        m = run_snn("VDE")
        assert bool(m.stable)
        # Threshold quantisation: never settles into the 5% band
        # (reference SNN settle = 1.9999 on a 2 s scenario).
        assert float(m.settling_time_s) > 1.5
        assert float(m.ise) < 1e-3

    def test_snn_without_drains_would_saturate(self):
        """The drain transitions are load-bearing: the net's command
        places must not sit saturated (equal and pinned at 1)."""
        from scpn_fusion_tpu.control.disturbance_ladder import _build_z_net
        ctrl = _build_z_net(2e3, jnp.float32)
        # 4 transitions: 2 command + 2 drain.
        assert ctrl.thresholds.shape[0] == 4


class TestStressCampaign:
    """1000-shot stress campaign (reference Step 2.1; CPU-sized here)."""

    def test_randomized_shots_stay_controlled(self):
        from scpn_fusion_tpu.control.flight_sim import FlightSimParams
        from scpn_fusion_tpu.control.stress import (
            StressConfig,
            run_stress_campaign,
        )
        res = run_stress_campaign(FlightSimParams(), StressConfig(),
                                  n_shots=32, seed=7)
        assert float(res.disruption_rate) == 0.0
        assert float(res.r_err_p99) < 0.5
        assert res.per_shot_disrupted.shape == (32,)

    def test_disturbances_actually_injected(self):
        """ELM kicks and noise must perturb the trajectory: a quiet run
        and a noisy run differ."""
        import jax.numpy as jnp

        from scpn_fusion_tpu.control.flight_sim import FlightSimParams
        from scpn_fusion_tpu.control.stress import (
            StressConfig,
            run_stress_campaign,
        )
        noisy = run_stress_campaign(
            FlightSimParams(), StressConfig(), n_shots=8, seed=1)
        quiet = run_stress_campaign(
            FlightSimParams(),
            StressConfig(sensor_noise_m=0.0, elm_kick_m=0.0,
                         ramp_disturbance_m_s=0.0),
            n_shots=8, seed=1)
        assert float(noisy.r_err_p95) > float(quiet.r_err_p95)
