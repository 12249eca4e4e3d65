"""Fuzz target: reactor-config JSON loader (reference parity:
``fuzz/fuzz_fusion_config.py``).

Contract: arbitrary bytes either load into a validated ``ReactorConfig``
or raise ``ConfigError`` / JSON decode errors — never an uncontrolled
exception, never a config with non-finite or out-of-domain fields.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scpn_fusion_tpu.core.config import ConfigError, load_config  # noqa: E402

EXPECTED = (ConfigError, json.JSONDecodeError, UnicodeDecodeError, OSError)
_MAX = 128 * 1024


def TestOneInput(data: bytes) -> None:
    if len(data) > _MAX:
        data = data[:_MAX]
    with tempfile.TemporaryDirectory(prefix="scpn-config-fuzz-") as tmp:
        path = Path(tmp) / "reactor.json"
        path.write_bytes(data)
        try:
            cfg = load_config(path)
        except EXPECTED:
            return
        assert cfg.grid_resolution[0] > 0 and cfg.grid_resolution[1] > 0


if __name__ == "__main__":
    from common import main_atheris

    main_atheris(TestOneInput, load_config)
