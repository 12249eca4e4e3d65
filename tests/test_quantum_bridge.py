"""Quantum-bridge fail-closed external runner tests."""

import subprocess
import sys

import pytest

from scpn_fusion_tpu.utils.quantum_bridge import (
    QUANTUM_SCRIPT_NAMES,
    quantum_suite_status,
    run_quantum_suite,
)


def test_missing_lab_fails_closed(tmp_path):
    with pytest.raises(FileNotFoundError, match="Quantum Lab not found"):
        run_quantum_suite(base_path=tmp_path / "nope")
    status = quantum_suite_status(tmp_path / "nope")
    assert status["status"] == "blocked_missing_quantum_lab"


def test_missing_scripts_fail_closed(tmp_path):
    lab = tmp_path / "QUANTUM_LAB"
    lab.mkdir()
    (lab / QUANTUM_SCRIPT_NAMES[0]).write_text("print('ok')\n")
    with pytest.raises(FileNotFoundError, match="missing required scripts"):
        run_quantum_suite(base_path=lab)
    assert quantum_suite_status(lab)["status"] == "blocked_missing_scripts"


def test_suite_runs_when_present(tmp_path):
    lab = tmp_path / "QUANTUM_LAB"
    lab.mkdir()
    for name in QUANTUM_SCRIPT_NAMES:
        (lab / name).write_text("import sys; sys.exit(0)\n")
    report = run_quantum_suite(base_path=lab, script_timeout_seconds=60.0)
    assert report["ok"] is True
    assert report["scripts"] == list(QUANTUM_SCRIPT_NAMES)
    assert quantum_suite_status(lab)["status"] == "available"


def test_failing_script_raises(tmp_path):
    lab = tmp_path / "QUANTUM_LAB"
    lab.mkdir()
    for name in QUANTUM_SCRIPT_NAMES:
        (lab / name).write_text("import sys; sys.exit(3)\n")
    with pytest.raises(RuntimeError, match="exit=3"):
        run_quantum_suite(base_path=lab, script_timeout_seconds=60.0)


def test_bad_timeout_rejected(tmp_path):
    with pytest.raises(ValueError, match="finite"):
        run_quantum_suite(base_path=tmp_path, script_timeout_seconds=0.0)
