"""Checkpoint/resume for solver and scenario state (JSON + NPZ hybrid).

Reference analogue: ``core/checkpoint.py:25-99`` (JSON checkpoint with
numpy<->list conversion) and the sha256-allowlisted loading policy
(``control/disruption_checkpoint_policy.py:82-110``).  Pytrees of jnp/np
arrays are stored as an NPZ alongside a JSON manifest with the tree
structure, scalar metadata, and a payload checksum; loading is fail-closed
(checksum + shape validation).  Warm-start psi reuse — the
performance-critical "resume" (reference: warm 13 ms vs cold 165 ms) — is
just passing the loaded psi back into the solver.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np


def save_checkpoint(
    path: str | Path,
    state: Any,
    *,
    metadata: dict | None = None,
) -> Path:
    """Save a pytree checkpoint: <path>.npz (arrays) + <path>.json (manifest)."""
    path = Path(path)
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    # Append suffixes rather than with_suffix(): dotted names like
    # "ckpt.step100" must not have ".step100" replaced (ADVICE.md r1).
    npz_path = Path(str(path) + ".npz")
    np.savez_compressed(npz_path, **arrays)

    sha = hashlib.sha256(npz_path.read_bytes()).hexdigest()
    manifest = {
        "schema": "scpn-fusion-tpu.checkpoint.v1",
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "shapes": {k: list(v.shape) for k, v in arrays.items()},
        "dtypes": {k: str(v.dtype) for k, v in arrays.items()},
        "payload_sha256": sha,
        "metadata": metadata or {},
    }
    json_path = Path(str(path) + ".json")
    json_path.write_text(json.dumps(manifest, indent=2) + "\n")
    return json_path


def load_checkpoint(path: str | Path, example_state: Any) -> tuple[Any, dict]:
    """Load a checkpoint into the structure of ``example_state`` (fail-closed:
    checksum, leaf count, shapes, and dtypes must match the manifest).

    Any malformed manifest — missing keys, wrong value types — raises
    ``ValueError``, never an uncontrolled ``KeyError``/``TypeError``
    (hypothesis fuzz lane, ``tests/test_fuzz_parsers.py``)."""
    try:
        return _load_checkpoint_unchecked(path, example_state)
    except ValueError:
        raise
    except (KeyError, TypeError, AttributeError, IndexError) as exc:
        raise ValueError(f"malformed checkpoint manifest/payload: "
                         f"{exc!r}") from exc


def _load_checkpoint_unchecked(path: str | Path,
                               example_state: Any) -> tuple[Any, dict]:
    path = Path(path)
    manifest = json.loads(Path(str(path) + ".json").read_text())
    if manifest.get("schema") != "scpn-fusion-tpu.checkpoint.v1":
        raise ValueError(f"unknown checkpoint schema: {manifest.get('schema')!r}")
    npz_path = Path(str(path) + ".npz")
    sha = hashlib.sha256(npz_path.read_bytes()).hexdigest()
    if sha != manifest["payload_sha256"]:
        raise ValueError("checkpoint payload checksum mismatch")

    with np.load(npz_path) as data:
        leaves_loaded = [data[f"leaf_{i}"] for i in range(manifest["n_leaves"])]
    example_leaves, treedef = jax.tree.flatten(example_state)
    if len(example_leaves) != len(leaves_loaded):
        raise ValueError(
            f"checkpoint has {len(leaves_loaded)} leaves, "
            f"expected {len(example_leaves)}")
    for i, (got, want) in enumerate(zip(leaves_loaded, example_leaves)):
        if tuple(got.shape) != tuple(np.shape(want)):
            raise ValueError(
                f"leaf {i} shape {got.shape} != expected {np.shape(want)}")
        # .get: checkpoints saved before the dtype manifest was added carry
        # the same schema id but no "dtypes" key — still valid (ADVICE r2).
        want_dtype = manifest.get("dtypes", {}).get(f"leaf_{i}")
        if want_dtype is not None and str(got.dtype) != want_dtype:
            raise ValueError(
                f"leaf {i} dtype {got.dtype} != manifest dtype {want_dtype}")
        # Guard the f64-payload-into-f32-pipeline hazard: when the example
        # leaf is an array, its dtype is the pipeline contract.
        if hasattr(want, "dtype") and got.dtype != np.dtype(want.dtype):
            raise ValueError(
                f"leaf {i} dtype {got.dtype} != expected pipeline dtype "
                f"{np.dtype(want.dtype)}")
    return jax.tree.unflatten(treedef, leaves_loaded), manifest["metadata"]
