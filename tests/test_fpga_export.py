"""FPGA register-level export of the compiled SCPN controller.

Parity anchor: reference control/hil_fpga_export.py:27-180 (register map
+ Verilog header, Q2.14); upgraded here with real-weight ROM images and
a measured quantisation-error report.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.fpga_export import (
    FixedPointFormat,
    export_verilog_header,
    export_weight_hex,
    generate_register_map,
    quantization_report,
)
from scpn_fusion_tpu.scpn.controller import ControllerConfig
from tests.test_neuro_closed_loop import build_rz_controller


@pytest.fixture(scope="module")
def ctrl():
    return build_rz_controller(dtype=jnp.float32)


class TestFixedPoint:
    def test_q214_round_trip(self):
        fmt = FixedPointFormat()
        x = np.asarray([0.35, -1.0, 1.5, 0.0])
        back = fmt.dequantize(fmt.quantize(x))
        np.testing.assert_allclose(back, x, atol=1.0 / fmt.scale)

    def test_saturation(self):
        fmt = FixedPointFormat()
        q = fmt.quantize(np.asarray([100.0, -100.0]))
        assert q[0] == fmt.max_int and q[1] == fmt.min_int

    def test_hex_two_complement(self):
        fmt = FixedPointFormat()
        hexes = fmt.to_hex(np.asarray([-1, 1]))
        assert hexes == ["ffff", "0001"]

    def test_validation(self):
        with pytest.raises(ValueError, match="frac_bits"):
            FixedPointFormat(total_bits=16, frac_bits=16)


class TestRegisterMap:
    def test_map_carries_compiled_weights(self, ctrl):
        reg = generate_register_map(ctrl)
        assert reg.w_in_q.shape == ctrl.w_in.shape
        assert reg.dt_ticks == int(100.0 * 100e6 / 1e6)
        assert len(reg.input_ports) == int(ctrl.inj_place_ids.shape[0])
        assert len(reg.output_ports) == int(ctrl.act_gain.shape[0])
        # Quantised weights reconstruct the float weights to LSB.
        back = reg.fmt.dequantize(reg.w_in_q)
        np.testing.assert_allclose(back, np.asarray(ctrl.w_in),
                                   atol=1.0 / reg.fmt.scale)

    def test_hex_images(self, ctrl):
        reg = generate_register_map(ctrl)
        images = export_weight_hex(reg)
        assert set(images) == {"w_in.hex", "w_out.hex",
                               "thresholds.hex", "gains.hex"}
        n_words = len(images["w_in.hex"].strip().splitlines())
        assert n_words == reg.w_in_q.size

    def test_verilog_header(self, ctrl):
        reg = generate_register_map(ctrl)
        v = export_verilog_header(reg)
        assert "module scpn_controller #(" in v
        assert f"parameter N_PLACES      = {reg.n_places}," in v
        assert '$readmemh("w_in.hex", w_in);' in v
        assert v.count("input  wire signed") == len(reg.input_ports)
        assert v.strip().endswith("endmodule")


class TestQuantization:
    def test_q214_error_acceptable(self, ctrl):
        cfg = ControllerConfig(firing_mode="fractional",
                               firing_margin=0.5, dt=1e-3)
        rep = quantization_report(ctrl, cfg)
        assert rep.acceptable, rep
        assert rep.max_action_dev <= 0.02 * rep.action_scale

    def test_coarse_format_degrades(self, ctrl):
        """4 fractional bits must measurably hurt — the report is a real
        measurement, not a constant."""
        cfg = ControllerConfig(firing_mode="fractional",
                               firing_margin=0.5, dt=1e-3)
        fine = quantization_report(ctrl, cfg)
        coarse = quantization_report(
            ctrl, cfg, fmt=FixedPointFormat(total_bits=8, frac_bits=4))
        assert coarse.rms_action_dev > fine.rms_action_dev
