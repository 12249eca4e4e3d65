"""MAST ingestor + OMAS free-boundary input contract.

Parity anchors: reference io/mast_ingestor.py (cache/synthetic lanes,
channel conventions) and io/omas_free_boundary_inputs.py (strict
fail-closed extraction, provenance binding, COCOS validation).
"""

import numpy as np
import pytest

from scpn_fusion_tpu.io.mast import MastIngestor, default_mast_cache_dir
from scpn_fusion_tpu.io.omas_inputs import (
    OmasFreeBoundaryInputs,
    OmasInputError,
    OmasProvenance,
    extract_free_boundary_inputs,
)


def _valid_ods(n_probes=2, n_loops=2):
    ods = {
        "dataset_description": {"cocos": 11},
        "pf_active": {
            "n_coil": 2,
            "coil": {
                "0": {"name": "P1", "n_element": 1,
                      "element": {"0": {"geometry": {"rectangle": {
                          "r": 0.8, "z": 1.2, "width": 0.1,
                          "height": 0.2}},
                          "turns_with_sign": 20.0}},
                      "current": {"time": [0.0, 0.1, 0.2],
                                  "data": [1e3, 2e3, 3e3]}},
                "1": {"name": "P2", "n_element": 1,
                      "element": {"0": {"geometry": {"rectangle": {
                          "r": 1.4, "z": -1.2, "width": 0.1,
                          "height": 0.2}}}},
                      "current": {"time": [0.0, 0.1],
                                  "data": [-1e3, -2e3]}},
            },
        },
        "magnetics": {
            "n_bpol_probe": n_probes,
            "bpol_probe": {
                str(i): {"position": {"r": 1.0 + 0.1 * i, "z": 0.2},
                         "poloidal_angle": 0.3,
                         "field": {"time": [0.0, 0.1],
                                   "data": [0.01, 0.02]}}
                for i in range(n_probes)},
            "n_flux_loop": n_loops,
            "flux_loop": {
                str(i): {"position": {"r": 1.6, "z": -0.3 + 0.1 * i},
                         "flux": {"time": [0.0, 0.1],
                                  "data": [0.1, 0.12]}}
                for i in range(n_loops)},
        },
    }
    return ods


def _prov():
    return OmasProvenance(
        machine="mast-u", shot_id=45425, run_id=1,
        source_uri="s3://mast/45425", source_sha256="a" * 64,
        license_id="CC-BY-4.0")


class TestOmasExtraction:
    def test_strict_extraction_succeeds(self):
        out = extract_free_boundary_inputs(_valid_ods(), _prov())
        assert isinstance(out, OmasFreeBoundaryInputs)
        assert len(out.pf_coils) == 2
        assert out.pf_coils[0].elements[0].turns == 20.0
        assert out.pf_coils[1].elements[0].turns == 1.0   # default
        r, z, turns = out.coils_for_solver()
        assert r.shape == (2,)
        assert out.probe_points().shape == (2, 2)
        assert len(out.content_sha256()) == 64

    def test_strict_mode_requires_magnetics(self):
        ods = _valid_ods()
        ods["magnetics"]["n_bpol_probe"] = 0
        with pytest.raises(OmasInputError, match="blocked"):
            extract_free_boundary_inputs(ods, _prov())
        # Development lane tolerates the gap but still needs coils.
        out = extract_free_boundary_inputs(
            ods, _prov(), require_ingestion_ready=False)
        assert out.bpol_probes == ()

    def test_missing_coils_always_fails(self):
        ods = _valid_ods()
        ods["pf_active"]["n_coil"] = 0
        with pytest.raises(OmasInputError, match="PF coils"):
            extract_free_boundary_inputs(
                ods, _prov(), require_ingestion_ready=False)

    def test_bad_cocos_rejected(self):
        ods = _valid_ods()
        ods["dataset_description"]["cocos"] = 42
        with pytest.raises(OmasInputError, match="COCOS"):
            extract_free_boundary_inputs(ods, _prov())

    def test_nonmonotone_time_base_rejected(self):
        ods = _valid_ods()
        ods["pf_active"]["coil"]["0"]["current"]["time"] = [0.1, 0.0, 0.2]
        with pytest.raises(OmasInputError, match="increasing"):
            extract_free_boundary_inputs(ods, _prov())

    def test_provenance_validation(self):
        with pytest.raises(OmasInputError, match="sha256"):
            OmasProvenance("m", 1, 1, "uri", "nothex", "MIT")
        with pytest.raises(OmasInputError, match="non-empty"):
            OmasProvenance("", 1, 1, "uri", "a" * 64, "MIT")

    def test_content_hash_changes_with_payload(self):
        a = extract_free_boundary_inputs(_valid_ods(), _prov())
        ods = _valid_ods()
        ods["pf_active"]["coil"]["0"]["current"]["data"] = [9e3, 9e3, 9e3]
        b = extract_free_boundary_inputs(ods, _prov())
        assert a.content_sha256() != b.content_sha256()


class TestMastIngestor:
    def test_synthetic_lane_is_labelled(self, tmp_path):
        ing = MastIngestor(cache_dir=tmp_path)
        data, source = ing.load_shot_summary(30420)
        assert source in ("synthetic", "cache")
        if source == "synthetic":
            assert data["ip"].max() > 1e5   # MAST-class current
        assert set(data) >= {"time", "ip", "ne_bar", "b_t"}

    def test_cache_round_trip_beats_synthetic(self, tmp_path):
        ing = MastIngestor(cache_dir=tmp_path)
        payload = {"time": np.linspace(0, 1, 10),
                   "ip": np.full(10, 7.7e5),
                   "ne_bar": np.full(10, 3e19),
                   "b_t": np.full(10, 0.55)}
        ing.save_to_cache(12345, payload)
        data, source = ing.load_shot_summary(12345)
        assert source == "cache"
        np.testing.assert_allclose(data["ip"], 7.7e5)

    def test_corrupt_cache_fails_closed(self, tmp_path):
        ing = MastIngestor(cache_dir=tmp_path)
        np.savez(tmp_path / "shot_99.npz", time=np.arange(3))
        with pytest.raises(ValueError, match="missing channel"):
            ing.load_shot_summary(99)

    def test_save_requires_all_channels(self, tmp_path):
        ing = MastIngestor(cache_dir=tmp_path)
        with pytest.raises(ValueError, match="missing channel"):
            ing.save_to_cache(1, {"time": np.arange(3)})

    def test_magnetic_probes_shapes(self, tmp_path):
        ing = MastIngestor(cache_dir=tmp_path)
        mags, source = ing.load_magnetic_probes(30420, n_probes=4)
        assert mags["b_pol"].shape[0] == 4
        assert mags["b_pol"].shape[1] == mags["time"].shape[0]

    def test_default_cache_dir_env_override(self, monkeypatch, tmp_path):
        monkeypatch.setenv("SCPN_MAST_CACHE_DIR", str(tmp_path / "x"))
        assert default_mast_cache_dir() == tmp_path / "x"
