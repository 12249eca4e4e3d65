"""Disruption-shot NPZ reader: round-trip + fail-closed contract.

Reference parity: ``io/tokamak_disruption_archive.py:30-73`` required-key
validation; the single-exception-type contract here is fuzzed by
``fuzz/fuzz_disruption_npz.py``.
"""

import io
import zipfile

import numpy as np
import pytest

from scpn_fusion_tpu.io.disruption_npz import (
    CHANNEL_KEYS,
    DisruptionNpzError,
    DisruptionShot,
    read_disruption_npz,
    write_disruption_npz,
)


def _shot(t_len=64, disruptive=True, seed=0) -> DisruptionShot:
    rng = np.random.default_rng(seed)
    sig = rng.standard_normal((t_len, len(CHANNEL_KEYS)))
    sig[:, 0] = np.linspace(0.0, 1.0, t_len)  # time axis
    return DisruptionShot(sig, disruptive, t_len - 5 if disruptive else -1,
                          "ntm" if disruptive else "none")


def test_roundtrip(tmp_path):
    shot = _shot()
    p = tmp_path / "shot.npz"
    write_disruption_npz(p, shot)
    back = read_disruption_npz(p)
    np.testing.assert_allclose(back.signals, shot.signals, rtol=0, atol=0)
    assert back.is_disruption is True
    assert back.disruption_time_idx == shot.disruption_time_idx
    assert back.disruption_type == "ntm"
    assert back.time_s[0] == 0.0


def test_roundtrip_safe_shot(tmp_path):
    p = tmp_path / "safe.npz"
    write_disruption_npz(p, _shot(disruptive=False))
    back = read_disruption_npz(p)
    assert back.is_disruption is False
    assert back.disruption_time_idx == -1


@pytest.mark.parametrize("payload", [
    b"", b"not a zip", b"PK\x03\x04garbage",
])
def test_garbage_bytes_fail_closed(tmp_path, payload):
    p = tmp_path / "bad.npz"
    p.write_bytes(payload)
    with pytest.raises(DisruptionNpzError):
        read_disruption_npz(p)


def test_missing_key_fail_closed(tmp_path):
    shot = _shot()
    p = tmp_path / "m.npz"
    sig = shot.signals
    payload = {k: sig[:, i] for i, k in enumerate(CHANNEL_KEYS[:-1])}
    payload["is_disruption"] = np.asarray(True)
    payload["disruption_time_idx"] = np.asarray(3)
    payload["disruption_type"] = np.asarray("ntm")
    np.savez(p, **payload)
    with pytest.raises(DisruptionNpzError, match="missing keys"):
        read_disruption_npz(p)


def test_nonfinite_fail_closed(tmp_path):
    shot = _shot()
    shot.signals[3, 2] = np.nan
    p = tmp_path / "nan.npz"
    write_disruption_npz(p, shot)
    with pytest.raises(DisruptionNpzError, match="non-finite"):
        read_disruption_npz(p)


def test_ragged_channels_fail_closed(tmp_path):
    shot = _shot()
    p = tmp_path / "r.npz"
    payload = {k: shot.signals[:, i] for i, k in enumerate(CHANNEL_KEYS)}
    payload["q95"] = payload["q95"][:-3]
    payload["is_disruption"] = np.asarray(False)
    payload["disruption_time_idx"] = np.asarray(-1)
    payload["disruption_type"] = np.asarray("none")
    np.savez(p, **payload)
    with pytest.raises(DisruptionNpzError):
        read_disruption_npz(p)


def test_bad_disruption_idx_fail_closed(tmp_path):
    shot = _shot()
    p = tmp_path / "i.npz"
    write_disruption_npz(p, shot._replace(disruption_time_idx=10_000))
    with pytest.raises(DisruptionNpzError):
        read_disruption_npz(p)


def test_disruptive_without_onset_fail_closed(tmp_path):
    p = tmp_path / "o.npz"
    write_disruption_npz(p, _shot()._replace(disruption_time_idx=-1))
    with pytest.raises(DisruptionNpzError):
        read_disruption_npz(p)


def test_wrong_suffix_fail_closed(tmp_path):
    p = tmp_path / "shot.txt"
    p.write_bytes(b"x")
    with pytest.raises(DisruptionNpzError, match="must be .npz"):
        read_disruption_npz(p)


def test_nested_zip_surprise_fail_closed(tmp_path):
    """A valid zip that is not a valid npz must not leak zipfile internals."""
    p = tmp_path / "z.npz"
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("random.txt", "hello")
    p.write_bytes(buf.getvalue())
    with pytest.raises(DisruptionNpzError):
        read_disruption_npz(p)


def test_case_insensitive_keys(tmp_path):
    """The reference's committed fixtures capitalise physics symbols
    (``Ip_MA``, ``BT_T``, ``beta_N``); lookup is case-insensitive."""
    shot = _shot()
    p = tmp_path / "shot.npz"
    write_disruption_npz(p, shot)
    with np.load(p, allow_pickle=False) as raw:
        payload = {k: raw[k] for k in raw.files}
    payload["Ip_MA"] = payload.pop("ip_ma")
    payload["BT_T"] = payload.pop("bt_t")
    payload["beta_N"] = payload.pop("beta_n")
    q = tmp_path / "caps.npz"
    np.savez(q, **payload)
    back = read_disruption_npz(q)
    np.testing.assert_allclose(back.signals, shot.signals, rtol=0, atol=0)


def test_case_collision_fail_closed(tmp_path):
    """Two keys differing only by case must be rejected, not guessed."""
    shot = _shot()
    p = tmp_path / "shot.npz"
    write_disruption_npz(p, shot)
    with np.load(p, allow_pickle=False) as raw:
        payload = {k: raw[k] for k in raw.files}
    payload["IP_MA"] = payload["ip_ma"]
    q = tmp_path / "dup.npz"
    np.savez(q, **payload)
    with pytest.raises(DisruptionNpzError, match="ambiguous"):
        read_disruption_npz(q)
