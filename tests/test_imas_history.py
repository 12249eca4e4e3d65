"""IMAS history/pulse payload converter tests."""

import numpy as np
import pytest

from scpn_fusion_tpu.control.digital_twin import (
    TwinConfig,
    twin_init,
    twin_to_ids,
)
from scpn_fusion_tpu.io.imas_history import (
    ids_pulse_to_twin_history,
    ids_to_twin_history,
    twin_history_to_ids,
    twin_history_to_ids_pulse,
    validate_ids_payload_sequence,
)


def _history(n=4, dt=0.1):
    cfg = TwinConfig()
    state = twin_init(cfg)
    return [(i * dt, twin_to_ids(state, cfg, time_s=i * dt))
            for i in range(n)]


def test_roundtrip_history():
    hist = _history(5)
    payloads = twin_history_to_ids(hist, machine="SPARC", shot=7, run=2)
    assert len(payloads) == 5
    assert all(p["machine"] == "SPARC" and p["shot"] == 7 for p in payloads)
    back = ids_to_twin_history(payloads)
    assert len(back) == 5
    np.testing.assert_allclose([t for t, _ in back],
                               [0.0, 0.1, 0.2, 0.3, 0.4], atol=1e-9)
    assert back[0][1]["summary"] == hist[0][1]["summary"]


def test_duplicate_times_bumped_by_millisecond():
    hist = _history(3, dt=0.0)  # all timestamps identical
    payloads = twin_history_to_ids(hist)
    times = [p["time_slice"]["time_s"] for p in payloads]
    assert times == pytest.approx([0.0, 1e-3, 2e-3])
    idx = [p["time_slice"]["index"] for p in payloads]
    assert idx == [0, 1, 2]


def test_sequence_validation_rejects_mixed_identity():
    payloads = twin_history_to_ids(_history(2), machine="ITER", shot=1)
    bad = [payloads[0], dict(payloads[1], machine="SPARC")]
    with pytest.raises(ValueError, match="same"):
        validate_ids_payload_sequence(bad)
    regress = [payloads[1], payloads[0]]
    with pytest.raises(ValueError, match="strictly increasing"):
        validate_ids_payload_sequence(regress)
    with pytest.raises(ValueError, match="at least one"):
        validate_ids_payload_sequence([])


def test_pulse_roundtrip_and_schema_gate():
    hist = _history(4)
    pulse = twin_history_to_ids_pulse(hist, machine="ITER", shot=3, run=1)
    assert pulse["schema"] == "ids_equilibrium_pulse_v1"
    back = ids_pulse_to_twin_history(pulse)
    assert len(back) == 4
    with pytest.raises(ValueError, match="schema"):
        ids_pulse_to_twin_history(dict(pulse, schema="bogus"))
    mixed = dict(pulse)
    mixed["time_slices"] = [dict(pulse["time_slices"][0], shot=99)] \
        + list(pulse["time_slices"][1:])
    with pytest.raises(ValueError):
        ids_pulse_to_twin_history(mixed)


def test_payload_schema_requirements():
    with pytest.raises(ValueError, match="missing keys"):
        validate_ids_payload_sequence([{"machine": "ITER"}])
    with pytest.raises(ValueError, match="sequence"):
        validate_ids_payload_sequence("nope")
