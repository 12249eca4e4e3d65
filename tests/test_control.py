"""Control stack tests: PID fail-safety, actuator dynamics, closed-loop shots."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control import (
    ActuatorParams,
    FlightSimParams,
    PIDGains,
    actuator_init,
    actuator_step,
    pid_init,
    pid_step,
    run_shot_reduced,
)
from scpn_fusion_tpu.control.flight_sim import run_shot_full, subgrid_axis
from tests.test_fixed_boundary import make_cfg


class TestPID:
    def test_proportional_response(self):
        g = PIDGains(jnp.float64(2.0), jnp.float64(0.0), jnp.float64(0.0))
        s = pid_init(jnp.float64)
        s, cmd = pid_step(g, s, jnp.float64(0.5))
        assert float(cmd) == 1.0

    def test_integrator_accumulates(self):
        g = PIDGains(jnp.float64(0.0), jnp.float64(1.0), jnp.float64(0.0))
        s = pid_init(jnp.float64)
        for _ in range(3):
            s, cmd = pid_step(g, s, jnp.float64(1.0))
        assert float(cmd) == 3.0

    def test_nan_failsafe(self):
        """Non-finite error: zero command, integrator not latched
        (reference tokamak_flight_sim.py:232-246)."""
        g = PIDGains(jnp.float64(1.0), jnp.float64(1.0), jnp.float64(1.0))
        s = pid_init(jnp.float64)
        s, _ = pid_step(g, s, jnp.float64(1.0))
        sum_before = float(s.err_sum)
        s, cmd = pid_step(g, s, jnp.float64(np.nan))
        assert float(cmd) == 0.0
        assert float(s.err_sum) == sum_before


class TestActuator:
    def test_first_order_lag_and_saturation(self):
        p = ActuatorParams(tau_s=0.06, dt_s=0.05, u_min=-100.0, u_max=100.0,
                           rate_limit=1e6)
        s = actuator_init(p, jnp.float64)
        s, out = actuator_step(p, s, jnp.float64(1000.0))  # above u_max
        alpha = 0.05 / (0.06 + 0.05)
        np.testing.assert_allclose(float(out), alpha * 100.0, rtol=1e-6)

    def test_rate_limit(self):
        p = ActuatorParams(tau_s=1e-6, dt_s=0.1, u_min=-1e9, u_max=1e9,
                           rate_limit=10.0)
        s = actuator_init(p, jnp.float64)
        s, out = actuator_step(p, s, jnp.float64(1e6))
        np.testing.assert_allclose(float(out), 1.0, rtol=1e-5)  # 10/s * 0.1s

    def test_nan_failsafe_hold(self):
        p = ActuatorParams(tau_s=0.06, dt_s=0.05)
        s = actuator_init(p, jnp.float64)
        s, _ = actuator_step(p, s, jnp.float64(100.0))
        held = float(s.u)
        s, out = actuator_step(p, s, jnp.float64(np.inf))
        assert float(out) == held
        assert int(s.faults) == 1

    def test_transport_delay(self):
        p = ActuatorParams(tau_s=1e-9, dt_s=0.01, rate_limit=1e12,
                           delay_steps=3)
        s = actuator_init(p, jnp.float64)
        outs = []
        for cmd in (1.0, 1.0, 1.0, 1.0, 1.0):
            s, out = actuator_step(p, s, jnp.float64(cmd))
            outs.append(float(out))
        # With 3 steps of delay the first ~3 outputs are from the zero buffer.
        assert outs[0] == 0.0 and outs[1] == 0.0 and outs[2] == 0.0
        assert outs[3] > 0.9


class TestReducedShot:
    def test_pid_holds_position(self):
        """The 10 kHz lane: controller keeps R/Z errors inside the
        disruption envelope for the whole shot (reference stress-campaign
        contract: 0% disruption)."""
        params = FlightSimParams(control_hz=10_000.0, shot_duration_s=0.5)
        trace, metrics = run_shot_reduced(params, dtype=jnp.float64)
        assert float(metrics["disruption_fraction"]) == 0.0
        assert float(metrics["r_err_p95"]) < 0.2
        assert float(metrics["z_err_p95"]) < 0.2
        assert np.all(np.isfinite(np.asarray(trace.r)))

    def test_uncontrolled_drift_disrupts(self):
        """Zero-gain controller: vertical drift must escape the envelope —
        the negative control (plant genuinely unstable without feedback)."""
        params = FlightSimParams(
            control_hz=1000.0, shot_duration_s=30.0,
            pid_r_kp=0.0, pid_r_ki=0.0, pid_r_kd=0.0,
            pid_z_kp=0.0, pid_z_ki=0.0, pid_z_kd=0.0)
        _, metrics = run_shot_reduced(params, dtype=jnp.float64)
        assert float(metrics["disruption_fraction"]) > 0.0

    def test_ip_ramp(self):
        params = FlightSimParams(control_hz=1000.0, shot_duration_s=0.2)
        trace, _ = run_shot_reduced(params, dtype=jnp.float64)
        ip = np.asarray(trace.ip_ma)
        assert ip[0] < ip[-1]
        assert abs(ip[0] - 5.0) < 0.1


class TestSubgridAxis:
    def test_parabolic_interpolation_exact_for_quadratic(self):
        r = jnp.linspace(0.0, 10.0, 21)
        z = jnp.linspace(-5.0, 5.0, 21)
        rr, zz = jnp.meshgrid(r, z)
        # Peak at R=5.17, Z=0.23 (off-grid)
        psi = -((rr - 5.17) ** 2) - (zz - 0.23) ** 2
        r_ax, z_ax = subgrid_axis(psi, r, z, 0.5, 0.5)
        np.testing.assert_allclose(float(r_ax), 5.17, atol=1e-6)
        np.testing.assert_allclose(float(z_ax), 0.23, atol=1e-6)


class TestFullShot:
    def test_full_physics_shot_runs(self):
        # Normalised-unit config: the actuator delta limit must be on the
        # coil-current scale (~unit), not the SI 50 kA default.
        cfg = make_cfg("multigrid", n=49, max_iter=250)
        psi, currents, trace = run_shot_full(
            cfg, shot_steps=5, dtype=jnp.float64,
            actuator_delta_limit=0.2,
            target_r=6.0, target_z=0.0)
        assert np.all(np.isfinite(np.asarray(psi)))
        cur = np.asarray(currents)
        assert np.all(np.isfinite(cur))
        # Coil currents stay near their baseline (bounded actuation).
        assert np.max(np.abs(cur)) < 20.0
        r_ax = np.asarray(trace.r_axis)
        assert np.all((r_ax >= 2.0) & (r_ax <= 10.0))
        assert np.all(np.asarray(trace.converged))
