"""ADC/DAC converter boundary (control/hil_sensors.py:25-127 parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.hil_sensors import (
    AdcConfig, DacConfig, converter_loop, dac_init, read_adc,
    read_magnetic_probe, write_coil_current, write_dac,
)


class TestAdc:
    def test_quantisation_grid(self):
        cfg = AdcConfig(noise_rms_lsb=0.0)
        v = read_adc(jnp.linspace(-1.4, 1.4, 64), jax.random.PRNGKey(0), cfg)
        codes = (np.asarray(v) - cfg.v_min) / cfg.lsb_voltage
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-3)

    def test_clip_to_range(self):
        cfg = AdcConfig(noise_rms_lsb=0.0)
        v = read_adc(jnp.array([99.0, -99.0]), jax.random.PRNGKey(0), cfg)
        np.testing.assert_allclose(np.asarray(v), [cfg.v_max, cfg.v_min],
                                   atol=2 * cfg.lsb_voltage)

    def test_noise_statistics(self):
        cfg = AdcConfig(noise_rms_lsb=2.0)
        v = read_adc(jnp.zeros(20000), jax.random.PRNGKey(1), cfg)
        rms = float(jnp.std(v))
        # quantisation adds lsb^2/12; tolerate 25%
        assert 0.75 * 2.0 * cfg.lsb_voltage < rms < 1.25 * 2.2 * cfg.lsb_voltage

    def test_probe_scale_roundtrip(self):
        cfg = AdcConfig(noise_rms_lsb=0.0)
        b = read_magnetic_probe(jnp.array(3.7), jax.random.PRNGKey(0), cfg)
        assert abs(float(b) - 3.7) < 0.01  # 12-bit over 20 T span


class TestDac:
    def test_slew_limit(self):
        st = dac_init()
        st, out = write_dac(st, jnp.array(10.0), dt_us=0.1,
                            cfg=DacConfig(slew_rate_v_per_us=50.0))
        assert abs(float(out) - 5.0) < 1e-6  # 50 V/us * 0.1 us
        st, out = write_dac(st, jnp.array(10.0), dt_us=0.1)
        assert abs(float(out) - 10.0) < 1e-6

    def test_nonfinite_fail_safe_hold(self):
        st = dac_init()
        st, out1 = write_dac(st, jnp.array(2.0), dt_us=1.0)
        st, out2 = write_dac(st, jnp.array(jnp.nan), dt_us=1.0)
        assert float(out2) == float(out1)
        assert int(st.faults) == 1
        st, out3 = write_dac(st, jnp.array(jnp.inf), dt_us=1.0)
        assert float(out3) == float(out1) and int(st.faults) == 2

    def test_range_clamp(self):
        st = dac_init()
        st, out = write_dac(st, jnp.array(500.0), dt_us=100.0)
        assert float(out) == 10.0

    def test_coil_current_scale(self):
        st = dac_init()
        st, ka = write_coil_current(st, jnp.array(20.0), dt_us=100.0)
        assert abs(float(ka) - 20.0) < 1e-5

    def test_vectorised_channels_one_scan(self):
        cmds = jnp.stack([jnp.linspace(0, 8, 50),
                          jnp.full(50, jnp.nan),
                          -jnp.linspace(0, 8, 50)], axis=1)
        state, out = jax.jit(converter_loop)(cmds)
        assert out.shape == (50, 3)
        assert int(state.faults[1]) == 50          # dead channel held at 0
        np.testing.assert_allclose(np.asarray(out[:, 1]), 0.0)
        assert np.all(np.isfinite(np.asarray(out)))
        # opposite channels are mirror images
        np.testing.assert_allclose(np.asarray(out[:, 0]),
                                   -np.asarray(out[:, 2]), atol=1e-6)
