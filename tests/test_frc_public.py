"""Public C-2U FRC reference table lane (core/public_frc_reference.py parity)."""

import json
from pathlib import Path

import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.frc_public import (
    C2U_CSV, C2UTable, c2u_reference_status, c2u_regime_screen,
    load_c2u_table,
)

HAVE_ARTIFACT = C2U_CSV.exists()


@pytest.mark.skipif(not HAVE_ARTIFACT, reason="public artifact absent")
class TestPublicTable:
    def test_loads_and_units(self):
        t = load_c2u_table()
        n = t.shot.shape[0]
        assert n >= 5
        # SI conversions: keV->eV, mWb->Wb, kJ->J
        assert 50.0 < float(np.min(t.total_temperature_ev)) < 2000.0
        assert float(np.max(t.poloidal_flux_wb)) < 0.1
        assert float(np.max(t.thermal_energy_j)) > 1e3
        assert len(t.comments) == n

    def test_sha256_gate(self, tmp_path, monkeypatch):
        import scpn_fusion_tpu.models.physics.frc_public as mod
        bad = tmp_path / "c2u.csv"
        bad.write_text(C2U_CSV.read_text() + "\n")
        meta = tmp_path / "c2u.metadata.json"
        meta.write_text(json.dumps({"source_sha256": "0" * 64}))
        monkeypatch.setattr(mod, "C2U_METADATA", meta)
        with pytest.raises(ValueError, match="sha256 mismatch"):
            mod.load_c2u_table(bad)

    def test_monotone_shot_gate(self, tmp_path):
        rows = ("shot,Eth(kJ),Fp(mWb),T(keV),t_max(ms),P_max(MW),"
                "E_max(kJ),comment\n"
                "10,1,1,0.5,1.1,0.1,1,a\n5,1,1,0.5,1.1,0.1,1,b\n")
        p = tmp_path / "bad.csv"
        p.write_text(rows)
        with pytest.raises(ValueError, match="strictly increasing"):
            load_c2u_table(p, verify_sha256=False)

    def test_positive_column_gate(self, tmp_path):
        rows = ("shot,Eth(kJ),Fp(mWb),T(keV),t_max(ms),P_max(MW),"
                "E_max(kJ),comment\n10,-1,1,0.5,1.1,0.1,1,a\n")
        p = tmp_path / "bad.csv"
        p.write_text(rows)
        with pytest.raises(ValueError, match="must be positive"):
            load_c2u_table(p, verify_sha256=False)

    def test_status_and_screen(self):
        st = c2u_reference_status()
        assert st["status"] == "public_reference_table_available"
        assert st["shot_count"] >= 5
        assert "claim_boundary" in st
        screen = c2u_regime_screen(load_c2u_table())
        assert screen["all_ok"], screen

    def test_energy_per_flux_finite(self):
        t = load_c2u_table()
        epf = np.asarray(t.energy_per_flux_j_per_wb)
        assert np.all(np.isfinite(epf)) and np.all(epf > 0.0)


def test_blocked_status_when_absent(tmp_path):
    st = c2u_reference_status(tmp_path / "nope.csv")
    assert st["status"] == "blocked_missing_public_reference_artifact"
