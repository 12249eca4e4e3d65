"""RMF spin-up + phase-lock loop tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.rmf import (
    PLLParams,
    RMFParams,
    run_phase_lock,
    run_rmf_spinup,
)


class TestSpinUp:
    def test_strong_rmf_synchronises(self):
        tr = run_rmf_spinup(RMFParams(b_rmf_mt=8.0))
        assert bool(tr.synchronised), float(tr.sync_fraction)
        om = np.asarray(tr.omega_e_hz)
        assert om[-1] > om[0]
        assert np.all(np.diff(om) >= -1e-6)   # monotone spin-up

    def test_weak_rmf_slips(self):
        tr = run_rmf_spinup(RMFParams(b_rmf_mt=0.05, friction_rate=2e5))
        assert not bool(tr.synchronised)
        assert float(tr.sync_fraction) < 0.5

    def test_sync_fraction_monotone_in_amplitude(self):
        fracs = [float(run_rmf_spinup(
            RMFParams(b_rmf_mt=b, n_steps=10000)).sync_fraction)
            for b in (0.2, 1.0, 4.0)]
        assert fracs[0] <= fracs[1] <= fracs[2]


class TestPLL:
    def test_locks_onto_offset_rotation(self):
        tr = run_phase_lock(PLLParams(), rotation_hz=95e3,
                            antenna_hz0=100e3)
        assert bool(tr.locked)
        assert float(tr.lock_time_s) < 0.05
        assert abs(float(tr.antenna_freq_hz[-1]) - 95e3) < 2e3

    def test_tracks_drifting_rotation(self):
        tr = run_phase_lock(PLLParams(n_steps=8000), rotation_hz=95e3,
                            freq_drift_hz_s=2e5)
        assert bool(tr.locked)
        # final antenna frequency follows the drifted target
        target = 95e3 + 2e5 * 8000 * 1e-5
        assert abs(float(tr.antenna_freq_hz[-1]) - target) < 5e3

    def test_unlocked_without_gain(self):
        tr = run_phase_lock(PLLParams(kp_hz_per_rad=0.0,
                                      ki_hz_per_rad_s=0.0),
                            rotation_hz=95e3, antenna_hz0=100e3)
        assert not bool(tr.locked)
