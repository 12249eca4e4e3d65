"""Shot archive + IMAS-lite connector tests."""

import numpy as np
import pytest

from scpn_fusion_tpu.io import (
    IdsError,
    MachineProfiles,
    equilibrium_to_ids,
    ids_from_json,
    ids_get,
    ids_new,
    ids_put,
    ids_to_equilibrium,
    ids_to_json,
    ids_to_profiles,
    load_machine_profiles,
    poll_feed,
    profiles_to_ids,
    save_reference_profiles,
    synthetic_machine_profiles,
)
from scpn_fusion_tpu.utils.telemetry import TELEMETRY


class TestArchive:
    def test_synthetic_profiles_deterministic(self):
        a = synthetic_machine_profiles("diiid", 145419)
        b = synthetic_machine_profiles("diiid", 145419)
        np.testing.assert_array_equal(a.t_e_kev, b.t_e_kev)
        assert a.machine == "diiid" and a.source == "synthetic"
        c = synthetic_machine_profiles("diiid", 145420)
        assert not np.allclose(a.t_e_kev, c.t_e_kev)

    def test_profiles_monotone_pedestal(self):
        p = synthetic_machine_profiles("sparc", 1, h_mode=True)
        # core > pedestal top > separatrix
        assert p.t_e_kev[0] > p.t_e_kev[-5] > p.t_e_kev[-1] >= 0.0

    def test_validation_rejects_bad_shapes(self):
        rho = np.linspace(0, 1, 8)
        with pytest.raises(ValueError):
            MachineProfiles("diiid", 1, 0.0, rho, np.ones(7), np.ones(8),
                            np.ones(8), 1.0, 2.0, 1.7, 0.6)
        with pytest.raises(ValueError):
            MachineProfiles("diiid", 1, 0.0, rho[::-1], np.ones(8),
                            np.ones(8), np.ones(8), 1.0, 2.0, 1.7, 0.6)

    def test_save_load_roundtrip(self, tmp_path):
        p = synthetic_machine_profiles("cmod", 7)
        save_reference_profiles(p, root=tmp_path)
        q = load_machine_profiles("cmod", 7, root=tmp_path)
        np.testing.assert_allclose(q.n_e_19, p.n_e_19)
        assert q.shot == 7

    def test_missing_falls_back_with_telemetry(self, tmp_path):
        TELEMETRY.reset()
        q = load_machine_profiles("jet", 999, root=tmp_path)
        assert q.source == "synthetic"
        assert TELEMETRY.counts().get("archive.synthetic_profiles", 0) >= 1
        with pytest.raises(FileNotFoundError):
            load_machine_profiles("jet", 999, root=tmp_path,
                                  allow_synthetic=False)

    def test_poll_feed_monotone_time_and_ramp(self, tmp_path):
        frames = list(poll_feed("mast", 3, n_frames=5, dt_s=0.2))
        times = [f.time_s for f in frames]
        assert times == sorted(times)
        assert frames[-1].t_e_kev[0] >= frames[0].t_e_kev[0]

    def test_unknown_machine_rejected(self):
        with pytest.raises(ValueError, match="unknown machine"):
            synthetic_machine_profiles("nstx", 1)


class TestImas:
    def test_schema_enforced(self):
        ids = ids_new("equilibrium")
        with pytest.raises(IdsError, match="not in"):
            ids_put(ids, "time_slice/nonsense", 1.0)
        with pytest.raises(IdsError, match="unknown IDS"):
            ids_new("waveforms")

    def test_equilibrium_roundtrip(self, tmp_path):
        r = np.linspace(1.0, 3.0, 9)
        z = np.linspace(-1.5, 1.5, 11)
        psi = np.outer(np.sin(z), np.cos(r))
        ids = equilibrium_to_ids(
            r_1d=r, z_1d=z, psi=psi, ip_a=1.5e6, b0_t=2.5, r0_m=1.8,
            axis_rz=(1.9, 0.02), x_point_rz=(1.4, -1.1),
            psi_axis=-0.3, psi_boundary=0.0, time_s=1.25)
        path = ids_to_json(ids, tmp_path / "eq.json")
        back = ids_from_json(path)
        eq = ids_to_equilibrium(back)
        np.testing.assert_allclose(eq["psi"], psi)
        np.testing.assert_allclose(eq["r_1d"], r)
        assert eq["ip_a"] == pytest.approx(1.5e6)
        assert eq["axis_rz"][0] == pytest.approx(1.9)

    def test_equilibrium_shape_consistency_checked(self):
        ids = equilibrium_to_ids(
            r_1d=np.linspace(1, 2, 5), z_1d=np.linspace(-1, 1, 7),
            psi=np.zeros((7, 5)), ip_a=1e6, b0_t=2.0, r0_m=1.5)
        ids_put(ids, "time_slice/profiles_2d/psi", np.zeros((5, 7)))
        with pytest.raises(IdsError, match="inconsistent"):
            ids_to_equilibrium(ids)

    def test_core_profiles_roundtrip_units(self):
        p = synthetic_machine_profiles("iter", 42)
        ids = profiles_to_ids(p)
        # SI in the IDS
        te_ev = ids_get(ids, "profiles_1d/electrons/temperature")
        assert float(np.max(te_ev)) > 1e3
        q = ids_to_profiles(ids, machine="iter", shot=42)
        np.testing.assert_allclose(q.t_e_kev, p.t_e_kev, rtol=1e-12)
        np.testing.assert_allclose(q.n_e_19, p.n_e_19, rtol=1e-12)
        assert q.ip_ma == pytest.approx(p.ip_ma)

    def test_wrong_ids_type_rejected(self):
        p = synthetic_machine_profiles("diiid", 1)
        ids = profiles_to_ids(p)
        with pytest.raises(IdsError, match="expected an equilibrium"):
            ids_to_equilibrium(ids)
