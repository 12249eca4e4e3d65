"""Fuzz target: disruption-shot npz reader (reference parity:
``fuzz/fuzz_disruption_npz.py``).

Contract: arbitrary bytes either parse into a finite-validated
``DisruptionShot`` or raise ``DisruptionNpzError`` / ``OSError`` — numpy's
zip/format internals must never leak another exception type through.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scpn_fusion_tpu.io.disruption_npz import (  # noqa: E402
    DisruptionNpzError,
    read_disruption_npz,
)

EXPECTED = (DisruptionNpzError, OSError)
_MAX = 512 * 1024


def TestOneInput(data: bytes) -> None:
    if len(data) > _MAX:
        data = data[:_MAX]
    with tempfile.TemporaryDirectory(prefix="scpn-npz-fuzz-") as tmp:
        path = Path(tmp) / "shot.npz"
        path.write_bytes(data)
        try:
            shot = read_disruption_npz(path)
        except EXPECTED:
            return
        import numpy as np

        assert np.all(np.isfinite(shot.signals))


if __name__ == "__main__":
    from common import main_atheris

    main_atheris(TestOneInput, read_disruption_npz)
