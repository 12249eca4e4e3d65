"""Phase observability: realtime monitor, stream codec, GK->UPDE bridge.

Parity anchors: reference phase/realtime_monitor.py (tick snapshots +
recorder + guard), phase/ws_phase_stream.py (bearer-token auth in
constant time, loopback guard, bounded commands), phase/gk_upde_bridge.py
(K_nm modulation from GK outputs).
"""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.phase.knm import build_knm_plasma, plasma_omega
from scpn_fusion_tpu.models.phase.monitor import (
    MonitorConfig,
    PhaseStreamCodec,
    StreamAuthError,
    adaptive_knm_from_gk,
    gk_natural_frequencies,
    init_monitor,
    is_loopback_host,
    monitor_tick,
    run_monitor,
    stream_trace,
)


@pytest.fixture(scope="module")
def monitor():
    spec = build_knm_plasma(mode="baseline", n_layers=8)
    state, arrays = init_monitor(spec, n_per=20, seed=3)
    return spec, state, arrays


class TestMonitor:
    def test_single_tick_snapshot_shape(self, monitor):
        _, state, arrays = monitor
        new_state, snap = monitor_tick(state, arrays)
        assert int(new_state.tick) == 1
        assert snap["r_layer"].shape == (8,)
        assert 0.0 <= float(snap["r_global"]) <= 1.0

    def test_run_is_one_scan_and_records(self, monitor):
        _, state, arrays = monitor
        final, trace = run_monitor(state, arrays, n_ticks=200)
        assert trace.n_ticks == 200
        assert int(final.tick) == 200
        assert np.all(np.isfinite(np.asarray(trace.v_global)))
        snap = trace.snapshot(199)
        assert snap["tick"] == 200
        assert isinstance(snap["guard_approved"], bool)

    def test_trace_save_npz(self, monitor, tmp_path):
        _, state, arrays = monitor
        _, trace = run_monitor(state, arrays, n_ticks=50)
        p = trace.save_npz(tmp_path / "trace.npz")
        data = np.load(p)
        assert data["r_global"].shape == (50,)

    def test_guard_flags_divergence(self, monitor):
        """With anti-phase driving the Lyapunov V grows and the guard
        eventually withholds approval."""
        spec, state, arrays = monitor
        cfg = MonitorConfig(
            psi_driver=float(np.pi),
            guard=__import__(
                "scpn_fusion_tpu.models.phase.guard",
                fromlist=["GuardConfig"]).GuardConfig(
                    window=20, max_violations=1,
                    lambda_threshold=-10.0))
        # lambda_threshold very low => any growth violates immediately.
        _, trace = run_monitor(state, arrays, cfg=cfg, n_ticks=100)
        assert not bool(np.asarray(trace.guard_approved)[-1])


class TestStreamCodec:
    def test_snapshot_round_trip(self, monitor):
        _, state, arrays = monitor
        _, trace = run_monitor(state, arrays, n_ticks=5)
        codec = PhaseStreamCodec(token="s3cret")
        buf = io.BytesIO()
        n = stream_trace(trace, codec, buf)
        assert n == 5
        lines = buf.getvalue().splitlines()
        assert len(lines) == 5
        payload = codec.decode(lines[0])
        assert payload["type"] == "snapshot"
        assert payload["tick"] == 1

    def test_bad_token_rejected(self):
        codec = PhaseStreamCodec(token="right")
        frame = PhaseStreamCodec(token="wrong").encode_snapshot({"tick": 1})
        with pytest.raises(StreamAuthError, match="token"):
            codec.decode(frame)

    def test_command_bounds_enforced(self):
        import json
        codec = PhaseStreamCodec(token="t", command_bounds=(-1.0, 1.0))
        ok = json.dumps({"type": "command", "token": "t",
                         "name": "zeta", "value": 0.5}).encode()
        assert codec.decode_command(ok) == ("zeta", 0.5)
        bad = json.dumps({"type": "command", "token": "t",
                          "name": "zeta", "value": 5.0}).encode()
        with pytest.raises(StreamAuthError, match="bounds"):
            codec.decode_command(bad)

    def test_oversized_and_malformed_frames_rejected(self):
        codec = PhaseStreamCodec(token="t", max_frame_bytes=64)
        with pytest.raises(StreamAuthError, match="size"):
            codec.decode(b"x" * 100)
        with pytest.raises(StreamAuthError, match="malformed"):
            codec.decode(b"not json")

    def test_loopback_guard(self):
        assert is_loopback_host("127.0.0.1")
        assert is_loopback_host("localhost")
        assert not is_loopback_host("0.0.0.0")


class TestGKBridge:
    def test_growth_rate_strengthens_zonal_coupling(self):
        spec = build_knm_plasma(mode="baseline", n_layers=8)
        k_base, _, _ = spec.arrays(jnp.float32)
        k_mod = adaptive_knm_from_gk(k_base, gamma_max=0.5, chi_e=0.0)
        assert float(k_mod[0, 1]) > float(k_base[0, 1])
        assert float(k_mod[1, 0]) == pytest.approx(float(k_mod[0, 1]))
        # Quiescent plasma: no modulation.
        k_quiet = adaptive_knm_from_gk(k_base, gamma_max=0.0, chi_e=0.0)
        np.testing.assert_allclose(np.asarray(k_quiet[0, 1]),
                                   np.asarray(k_base[0, 1]), rtol=1e-6)

    def test_pedestal_ratio_modulates_barrier_coupling(self):
        spec = build_knm_plasma(mode="baseline", n_layers=8)
        k_base, _, _ = spec.arrays(jnp.float32)
        chi_flat = jnp.ones(30)
        chi_ped_hot = jnp.ones(30).at[-6:].set(3.0)
        k_flat = adaptive_knm_from_gk(k_base, 0.0, 0.0,
                                      chi_i_profile=chi_flat)
        k_hot = adaptive_knm_from_gk(k_base, 0.0, 0.0,
                                     chi_i_profile=chi_ped_hot)
        assert float(k_hot[3, 4]) > float(k_flat[3, 4])

    def test_small_nets_passthrough(self):
        k = jnp.ones((4, 4))
        np.testing.assert_allclose(
            np.asarray(adaptive_knm_from_gk(k, 1.0, 1.0)), np.asarray(k))

    def test_natural_frequency_shift(self):
        omega = jnp.asarray(plasma_omega(8), jnp.float32)
        out = gk_natural_frequencies(omega, gamma_max=0.4)
        assert float(out[0]) > float(omega[0])
        np.testing.assert_allclose(np.asarray(out[1:]),
                                   np.asarray(omega[1:]))

    def test_composes_with_native_tglf(self):
        """End-to-end: native TGLF fluxes drive the K_nm modulation."""
        from scpn_fusion_tpu.models.gyrokinetics.tglf_native import (
            TGLFNativeConfig,
            tglf_native_fluxes,
        )
        r = tglf_native_fluxes(9.0, 6.9, 2.2, 1.4, 0.8, 0.16, 1.0, 0.1,
                               2.0, 5.3, 6.2, 8.0,
                               cfg=TGLFNativeConfig(n_ky_ion=6,
                                                    n_energy=16,
                                                    n_lambda=12))
        spec = build_knm_plasma(mode="baseline", n_layers=8)
        k_base, _, _ = spec.arrays(jnp.float32)
        k_mod = adaptive_knm_from_gk(
            k_base, jnp.max(r.gamma_net), r.chi_e)
        assert bool(jnp.all(jnp.isfinite(k_mod)))
        assert float(k_mod[0, 1]) > float(k_base[0, 1])
