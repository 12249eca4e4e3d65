"""Fault-tolerant control (FDI + reconfigurable allocation) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.fault_tolerant import (
    ACTUATOR_LOSS,
    ACTUATOR_STUCK,
    SENSOR_DRIFT,
    SENSOR_DROPOUT,
    FaultState,
    apply_actuator_fault,
    apply_sensor_fault,
    controllability_ok,
    ft_step,
    graceful_shutdown,
    init_fault_state,
    inject_sensor_fault,
    reconfig_gain,
    run_fault_tolerant_shot,
)


def _jacobian(n_s=4, n_c=6, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((n_s, n_c)).astype(np.float64))


class TestReconfigGain:
    def test_nominal_matches_tikhonov_pinv(self):
        j = _jacobian()
        state = init_fault_state(6, 4, jnp.float64)
        k = np.asarray(reconfig_gain(j, state, 1e-8))
        jn = np.asarray(j)
        k_ref = np.linalg.solve(jn.T @ jn + 1e-8 * np.eye(6), jn.T)
        # J^T J is rank-4 regularised at 1e-8 -> condition ~1e8; the two
        # solve paths agree to that conditioning, not machine epsilon.
        np.testing.assert_allclose(k, k_ref, rtol=1e-5, atol=1e-6)

    def test_lost_coil_rows_zeroed(self):
        j = _jacobian()
        state = apply_actuator_fault(init_fault_state(6, 4, jnp.float64),
                                     2, ACTUATOR_LOSS)
        k = np.asarray(reconfig_gain(j, state))
        np.testing.assert_allclose(k[2], 0.0, atol=1e-12)
        assert np.max(np.abs(k[0])) > 0

    def test_sensor_dropout_removes_row_influence(self):
        j = _jacobian()
        state = apply_sensor_fault(init_fault_state(6, 4, jnp.float64),
                                   1, SENSOR_DROPOUT)
        k = np.asarray(reconfig_gain(j, state, 1e-8))
        np.testing.assert_allclose(k[:, 1], 0.0, atol=1e-10)


class TestFaultState:
    def test_stuck_actuator_records_offset(self):
        state = apply_actuator_fault(init_fault_state(6, 4, jnp.float64),
                                     3, ACTUATOR_STUCK, stuck_val=2.5)
        assert float(state.coil_ok[3]) == 0.0
        assert float(state.stuck_value[3]) == 2.5

    def test_negative_index_is_noop(self):
        s0 = init_fault_state(6, 4, jnp.float64)
        s1 = apply_actuator_fault(s0, -1, ACTUATOR_LOSS)
        s2 = apply_sensor_fault(s0, -1, SENSOR_DROPOUT)
        np.testing.assert_array_equal(np.asarray(s1.coil_ok),
                                      np.asarray(s0.coil_ok))
        np.testing.assert_array_equal(np.asarray(s2.sensor_weight),
                                      np.asarray(s0.sensor_weight))


class TestStepAndControllability:
    def test_stuck_compensation(self):
        """The stuck-coil offset is subtracted from the error before
        allocation (reference step:186-197)."""
        j = _jacobian()
        state = apply_actuator_fault(init_fault_state(6, 4, jnp.float64),
                                     0, ACTUATOR_STUCK, stuck_val=1.0)
        err = jnp.zeros(4, jnp.float64)
        du = np.asarray(ft_step(j, state, err))
        # With zero tracking error the healthy coils must counteract the
        # stuck coil's contribution: J @ du ~ -J[:,0] * 1.0.
        jn = np.asarray(j)
        resid = jn @ du + jn[:, 0]
        assert np.linalg.norm(resid) < 0.3 * np.linalg.norm(jn[:, 0])
        assert du[0] == 0.0

    def test_controllability_flips_when_majority_lost(self):
        j = _jacobian()
        state = init_fault_state(6, 4, jnp.float64)
        assert bool(controllability_ok(j, state))
        for c in (0, 1, 2, 3):
            state = apply_actuator_fault(state, c, ACTUATOR_LOSS)
        assert not bool(controllability_ok(j, state))

    def test_graceful_shutdown_zeros(self):
        np.testing.assert_array_equal(np.asarray(graceful_shutdown(6)),
                                      np.zeros(6))


class TestInjector:
    def test_dropout_and_drift(self):
        sig = jnp.asarray([1.0, 2.0, 3.0])
        out = inject_sensor_fault(5.0, sig, 3.0, 1, SENSOR_DROPOUT)
        np.testing.assert_allclose(np.asarray(out), [1.0, 0.0, 3.0])
        out = inject_sensor_fault(5.0, sig, 3.0, 2, SENSOR_DRIFT,
                                  severity=0.5)
        np.testing.assert_allclose(np.asarray(out), [1.0, 2.0, 4.0])
        out = inject_sensor_fault(1.0, sig, 3.0, 1, SENSOR_DROPOUT)
        np.testing.assert_allclose(np.asarray(out), np.asarray(sig))


class TestWholeShot:
    def test_reconfigured_shot_recovers_tracking(self):
        j = _jacobian()
        target = jnp.asarray([1.0, -0.5, 0.3, 0.8], jnp.float64)
        # Lose two coils mid-shot; allocation must still converge.
        trace = run_fault_tolerant_shot(
            j, target,
            fault_times=jnp.asarray([50, 80, -1]),
            fault_kinds=jnp.asarray([ACTUATOR_LOSS, ACTUATOR_LOSS, 0]),
            fault_indices=jnp.asarray([0, 3, -1]),
            n_steps=200)
        errs = np.asarray(trace.error_norm)
        assert errs[-1] < 1e-6, errs[-1]
        assert bool(trace.controllable[-1])
        # Faulted coils hold zero command after their fault time.
        cmds = np.asarray(trace.coil_commands)
        np.testing.assert_allclose(cmds[60:, 0], 0.0, atol=1e-12)
        np.testing.assert_allclose(cmds[90:, 3], 0.0, atol=1e-12)

    def test_shot_is_jittable_and_vmappable(self):
        j = _jacobian()
        target = jnp.asarray([1.0, -0.5, 0.3, 0.8], jnp.float64)

        def shot(idx):
            return run_fault_tolerant_shot(
                j, target,
                fault_times=jnp.asarray([40, -1, -1]),
                fault_kinds=jnp.asarray([ACTUATOR_LOSS, 0, 0]),
                fault_indices=jnp.stack([idx, -1, -1]),
                n_steps=120).error_norm[-1]

        finals = jax.jit(jax.vmap(shot))(jnp.arange(6))
        assert finals.shape == (6,)
        assert float(jnp.max(finals)) < 1e-5

    def test_stuck_coil_held_and_compensated_in_loop(self):
        """A coil stuck at a nonzero command keeps injecting flux; the
        healthy coils absorb it and tracking still converges."""
        from scpn_fusion_tpu.control.fault_tolerant import ACTUATOR_STUCK

        j = _jacobian()
        target = jnp.asarray([1.0, -0.5, 0.3, 0.8], jnp.float64)
        trace = run_fault_tolerant_shot(
            j, target,
            fault_times=jnp.asarray([60, -1, -1]),
            fault_kinds=jnp.asarray([ACTUATOR_STUCK, 0, 0]),
            fault_indices=jnp.asarray([2, -1, -1]),
            fault_values=jnp.asarray([3.0, 0.0, 0.0]),
            n_steps=250)
        errs = np.asarray(trace.error_norm)
        # The stuck jump perturbs tracking, then the reallocation
        # recovers it; the frozen coil command stays out of du.
        assert errs[60] > 1e-3          # the 3.0-stuck jump is visible
        assert errs[-1] < 1e-6, errs[-1]
        np.testing.assert_allclose(np.asarray(trace.coil_commands)[70:, 2],
                                   0.0, atol=1e-12)
