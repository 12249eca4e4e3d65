"""FRC pulsed-compression trajectory: circuit, piston, energy budget.

Reference parity anchors: ``core/pulsed_compression.py`` (exact R-L
interval :164-209, piston step :352-448, diagnostics :507-545).
"""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.physics.pulsed_compression import (
    CoilGeometry,
    CompressionConfig,
    _circuit_step,
    coil_field_t,
    initial_state,
    run_voltage_driven_compression,
    trajectory_diagnostics,
)


def _flat_drive(v):
    def drive(t):
        return jnp.asarray(v)
    return drive


def test_circuit_exact_rl_response():
    """Constant-V interval must match the analytic R-L solution and the
    energy ledger must close: source = ohmic + d(magnetic energy)."""
    coil = CoilGeometry()
    dt = 1e-6
    i0 = 0.0
    i1, _, ohm, src = _circuit_step(coil, jnp.asarray(i0), jnp.asarray(1000.0), dt)
    tau = coil.inductance_h / coil.resistance_ohm
    i_exact = (1000.0 / coil.resistance_ohm) * (1.0 - np.exp(-dt / tau))
    np.testing.assert_allclose(float(i1), i_exact, rtol=1e-12)
    # Trapezoid ledger closes to discretisation order.
    de_mag = 0.5 * coil.inductance_h * (float(i1) ** 2 - i0**2)
    np.testing.assert_allclose(float(src), float(ohm) + de_mag,
                               rtol=2e-2)


def test_voltage_clamped_to_bank_limit():
    coil = CoilGeometry(bank_voltage_max_v=100.0)
    i_hi, _, _, _ = _circuit_step(coil, jnp.asarray(0.0),
                                  jnp.asarray(1e6), 1e-6)
    i_ref, _, _, _ = _circuit_step(coil, jnp.asarray(0.0),
                                   jnp.asarray(100.0), 1e-6)
    np.testing.assert_allclose(float(i_hi), float(i_ref), rtol=1e-12)


def test_compression_heats_and_densifies():
    """Rising coil current compresses the FRC: radius falls, density and
    temperature rise adiabatically, and the energy balance closes."""
    cfg = CompressionConfig()
    s0 = initial_state(cfg, radius_m=0.25, t_i_ev=100.0, t_e_ev=100.0)
    trace = run_voltage_driven_compression(
        cfg, s0, _flat_drive(4000.0), dt_s=2e-8, n_steps=3000)
    s = trace.state
    assert float(jnp.min(s.radius_m)) < 0.25 * 0.8
    i_min = int(jnp.argmin(s.radius_m))
    assert float(s.t_i_ev[i_min]) > 150.0
    assert float(s.density_m3[i_min]) > 5.0e20 * 1.5
    assert float(jnp.max(jnp.abs(trace.balance_residual))) < 1e-8
    assert np.all(np.isfinite(np.asarray(s.radius_m)))


def test_adiabatic_invariant_without_losses():
    """With no radial loss channel, T V^(gamma-1) is conserved along the
    trajectory (pure adiabatic compression)."""
    cfg = CompressionConfig(radial_loss_time_s=jnp.inf)
    s0 = initial_state(cfg, radius_m=0.25)
    trace = run_voltage_driven_compression(
        cfg, s0, _flat_drive(3000.0), dt_s=2e-8, n_steps=1500)
    s = trace.state
    inv = np.asarray(s.t_i_ev) * (np.pi * np.asarray(s.radius_m) ** 2) \
        ** (cfg.gamma - 1.0)
    np.testing.assert_allclose(inv, inv[0], rtol=1e-6)


def test_loss_channel_radiates():
    cfg = CompressionConfig(radial_loss_time_s=5e-6)
    s0 = initial_state(cfg, radius_m=0.25)
    trace = run_voltage_driven_compression(
        cfg, s0, _flat_drive(3000.0), dt_s=2e-8, n_steps=1500)
    assert float(trace.state.radiated_loss_j[-1]) > 0.0
    assert float(jnp.max(jnp.abs(trace.balance_residual))) < 1e-8


def test_diagnostics_and_bounce():
    """The magnetic piston overshoots and bounces: the diagnostics must
    count at least one radial turning point and report the compression
    ratio consistently."""
    cfg = CompressionConfig()
    s0 = initial_state(cfg, radius_m=0.25)
    trace = run_voltage_driven_compression(
        cfg, s0, _flat_drive(4000.0), dt_s=2e-8, n_steps=4000)
    d = trajectory_diagnostics(trace, cfg, 0.25)
    assert int(d.radial_turning_points) >= 1
    np.testing.assert_allclose(
        float(d.compression_ratio),
        0.25 / float(jnp.min(trace.state.radius_m)), rtol=1e-6)
    assert float(d.max_balance_residual) < 1e-8


def test_drive_waveform_is_differentiable():
    """End-to-end gradient through the whole trajectory w.r.t. the bank
    voltage (the capability the reference's host loop cannot provide)."""
    cfg = CompressionConfig()
    s0 = initial_state(cfg, radius_m=0.25)

    def min_radius(v):
        def drive(t):
            return v

        tr = run_voltage_driven_compression(cfg, s0, drive,
                                            dt_s=2e-8, n_steps=500)
        return jnp.min(tr.state.radius_m)

    g = float(jax.grad(min_radius)(jnp.asarray(3000.0)))
    assert np.isfinite(g)
    assert g < 0.0   # more drive voltage -> deeper compression


def test_coil_field_scaling():
    coil = CoilGeometry(n_turns=40, l_coil_m=1.0)
    b = float(coil_field_t(coil, 1000.0))
    np.testing.assert_allclose(b, 4e-7 * np.pi * 40 * 1000.0, rtol=1e-12)
