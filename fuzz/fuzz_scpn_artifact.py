"""Fuzz target: compiled SCPN controller artifact (reference parity:
``fuzz/fuzz_snn_artifact.py`` — the reference's SNN artifact is this
framework's checksummed controller artifact).

Contract: arbitrary bytes either import into a checksum-verified,
finite-weight ``CompiledController`` or raise ``ArtifactError`` /
JSON decode errors.  The sha256 payload checksum means virtually every
mutation must be REJECTED — a mutated artifact that imports cleanly is
itself a finding.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scpn_fusion_tpu.scpn.artifact import (  # noqa: E402
    ArtifactError,
    import_controller,
)

EXPECTED = (ArtifactError, json.JSONDecodeError, UnicodeDecodeError, OSError,
            KeyError, TypeError)
_MAX = 512 * 1024


def TestOneInput(data: bytes) -> None:
    if len(data) > _MAX:
        data = data[:_MAX]
    with tempfile.TemporaryDirectory(prefix="scpn-artifact-fuzz-") as tmp:
        path = Path(tmp) / "controller.json"
        path.write_bytes(data)
        try:
            import_controller(path)
        except EXPECTED:
            return


if __name__ == "__main__":
    from common import main_atheris

    main_atheris(TestOneInput, import_controller)
