"""Corpus-driven fuzz driver, atheris-compatible and pytest-runnable.

Role-parity with the reference's atheris harnesses
(``fuzz/fuzz_{geqdsk,imas_ids,fusion_config,snn_artifact,disruption_npz}.py``
+ CI ``python-fuzz.yml``): each target module exposes ``TestOneInput(data:
bytes)`` with the atheris contract (arbitrary bytes either parse into a
validated object or raise the parser's own fail-closed error type), plus a
committed seed corpus under ``fuzz/seeds/<target>/``.

Atheris is not installed in this image (and is not a baked-in dependency),
so the in-image executable path is :func:`run_corpus`: replay every corpus
entry verbatim, then drive ``n_mutations`` deterministic byte-level
mutations (flip / splice / truncate / duplicate / random-insert) seeded
from each corpus file — the classic dumb-fuzzer loop, reproducible by
construction (fixed PRNG seed).  ``main_atheris`` keeps the
coverage-guided entry point for environments that have atheris.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable

import numpy as np

SEEDS_ROOT = Path(__file__).resolve().parent / "seeds"


def corpus_dir(target: str) -> Path:
    return SEEDS_ROOT / target


def _mutate(rng: np.random.Generator, data: bytes) -> bytes:
    """One deterministic mutation of ``data`` (never returns it unchanged)."""
    buf = bytearray(data if data else b"\x00")
    op = int(rng.integers(0, 5))
    if op == 0:      # bit flips
        for _ in range(int(rng.integers(1, 8))):
            i = int(rng.integers(0, len(buf)))
            buf[i] ^= 1 << int(rng.integers(0, 8))
    elif op == 1:    # truncate
        buf = buf[: int(rng.integers(0, len(buf)))]
    elif op == 2:    # splice a random chunk over a random offset
        chunk = bytes(rng.integers(0, 256, size=int(rng.integers(1, 64)),
                                   dtype=np.uint8))
        i = int(rng.integers(0, len(buf) + 1))
        buf[i:i + len(chunk)] = chunk
    elif op == 3:    # duplicate a slice (length/record confusion)
        i = int(rng.integers(0, len(buf)))
        j = int(rng.integers(i, min(len(buf), i + 256)))
        buf[i:i] = buf[i:j]
    else:            # numeric-token attack: inject inf/nan/huge exponents
        tok = rng.choice([b" nan ", b" inf ", b"-inf ", b"1e309 ",
                          b"-1E-309 ", b"0x41 ", b"1d99 "])
        i = int(rng.integers(0, len(buf) + 1))
        buf[i:i] = bytes(tok)
    return bytes(buf)


def run_corpus(
    test_one_input: Callable[[bytes], None],
    target: str,
    *,
    n_mutations: int = 200,
    seed: int = 0,
    max_len: int = 256 * 1024,
) -> dict:
    """Replay the committed corpus, then fuzz mutations of it.

    Raises whatever non-allowed exception the target lets through (that IS
    the finding); returns run statistics on a clean pass.
    """
    cdir = corpus_dir(target)
    files = sorted(cdir.glob("*")) if cdir.exists() else []
    if not files:
        raise FileNotFoundError(f"no seed corpus for target {target!r} "
                                f"under {cdir}")
    n_cases = 0
    for f in files:
        data = f.read_bytes()[:max_len]
        test_one_input(data)
        n_cases += 1
        rng = np.random.default_rng(
            np.frombuffer(f.name.encode()[:16].ljust(16, b"\0"),
                          dtype=np.uint32) + seed)
        for _ in range(n_mutations):
            data_m = _mutate(rng, data)[:max_len]
            test_one_input(data_m)
            n_cases += 1
    # Pure-random tail: parsers must also survive structureless garbage.
    rng = np.random.default_rng(seed + 1)
    for _ in range(n_mutations // 2):
        test_one_input(bytes(rng.integers(0, 256,
                                          size=int(rng.integers(0, 4096)),
                                          dtype=np.uint8)))
        n_cases += 1
    return {"target": target, "corpus_files": len(files), "cases": n_cases}


def main_atheris(test_one_input: Callable[[bytes], None],
                 *instrument) -> None:
    """Coverage-guided entry point (environments with atheris installed)."""
    import sys

    try:
        import atheris
    except ImportError as exc:  # pragma: no cover - not in this image
        raise SystemExit(
            "atheris not installed; run via pytest tests/test_fuzz_harness.py "
            "for the corpus-driven loop") from exc
    for fn in instrument:  # pragma: no cover
        atheris.instrument_func(fn)
    atheris.instrument_func(test_one_input)  # pragma: no cover
    atheris.Setup(sys.argv, test_one_input)  # pragma: no cover
    atheris.Fuzz()  # pragma: no cover
