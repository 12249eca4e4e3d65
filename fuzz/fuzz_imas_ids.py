"""Fuzz target: IMAS IDS JSON payloads (reference parity:
``fuzz/fuzz_imas_ids.py``).

Drives both layers: ``ids_from_json`` (envelope/schema/size-cap gate) and,
when a payload survives it, the per-IDS validators + the equilibrium
extraction path.  Contract: fail-closed ``IdsError``/``ImasIdsError``
(both ``ValueError``) or a validated structure.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scpn_fusion_tpu.io.imas import (  # noqa: E402
    IdsError,
    ids_from_json,
    ids_to_equilibrium,
)
from scpn_fusion_tpu.io.imas_ids import (  # noqa: E402
    ImasIdsError,
    validate_equilibrium_ids,
)

EXPECTED = (IdsError, ImasIdsError, json.JSONDecodeError, UnicodeDecodeError,
            OSError)
_MAX = 256 * 1024


def TestOneInput(data: bytes) -> None:
    if len(data) > _MAX:
        data = data[:_MAX]
    with tempfile.TemporaryDirectory(prefix="scpn-ids-fuzz-") as tmp:
        path = Path(tmp) / "ids.json"
        path.write_bytes(data)
        try:
            ids = ids_from_json(path)
        except EXPECTED:
            return
        if ids.get("_ids") == "equilibrium":
            try:
                ids_to_equilibrium(ids)
            except EXPECTED:
                pass
        # The strict validator path must also stay fail-closed.
        try:
            validate_equilibrium_ids(ids)
        except EXPECTED:
            pass


if __name__ == "__main__":
    from common import main_atheris

    main_atheris(TestOneInput, ids_from_json)
