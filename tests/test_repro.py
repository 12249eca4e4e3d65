"""Reproduction-evidence ledger tests."""

import json

from scpn_fusion_tpu.utils.repro import (
    build_reproduction_report,
    render_reproduction_markdown,
    run_full_reproduction,
)


def test_ledger_inventories_committed_artifacts():
    report = build_reproduction_report()
    assert report["artifact_count"] > 10
    paths = [a["path"] for a in report["artifacts"]]
    assert any(p.startswith("validation/reports/") for p in paths)
    assert any(p.startswith("weights/") for p in paths)
    for a in report["artifacts"]:
        assert a["exists"] and len(a["sha256"]) == 64
    # Committed campaign reports must not be failing.
    assert report["failed_reports"] == []
    assert report["acceptance_passed"] is True
    assert len(report["evidence_payload_sha256"]) == 64


def test_markdown_render_and_persist(tmp_path):
    report = run_full_reproduction(json_output=tmp_path / "repro.json",
                                   markdown_output=tmp_path / "repro.md")
    md = (tmp_path / "repro.md").read_text()
    assert "# Full Reproduction Evidence" in md
    assert report["evidence_payload_sha256"] in md
    payload = json.loads((tmp_path / "repro.json").read_text())
    assert payload["schema"] == "scpn-fusion-tpu.full-reproduction-evidence.v1"


def test_rerun_gate_detects_missing_script():
    report = build_reproduction_report(rerun_scripts=["no_such_script.py"])
    assert report["reruns"][0]["status"] == "missing"
    assert report["acceptance_passed"] is False
