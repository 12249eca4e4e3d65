"""Fuzz target: GEQDSK parser (reference parity: ``fuzz/fuzz_geqdsk.py``).

Contract: arbitrary bytes either parse into a validated :class:`GEqdsk`
or raise the parser's fail-closed ``GeqdskError`` (a ``ValueError``) /
byte-level decode errors — never any other exception type.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scpn_fusion_tpu.io.geqdsk import GeqdskError, read_geqdsk  # noqa: E402

EXPECTED = (GeqdskError, UnicodeDecodeError, OSError)
_MAX = 256 * 1024


def TestOneInput(data: bytes) -> None:
    if len(data) > _MAX:
        data = data[:_MAX]
    with tempfile.TemporaryDirectory(prefix="scpn-geqdsk-fuzz-") as tmp:
        path = Path(tmp) / "case.geqdsk"
        path.write_bytes(data)
        try:
            eq = read_geqdsk(path)
        except EXPECTED:
            return
        # Parsed objects must be fully finite-validated.
        import numpy as np

        assert np.all(np.isfinite(eq.psirz)), "parser returned non-finite psi"


if __name__ == "__main__":
    from common import main_atheris

    main_atheris(TestOneInput, read_geqdsk)
