"""Faraday back-EMF + recovery-energy contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.faraday_recovery import (
    central_derivative,
    faraday_back_emf,
    faraday_recovery,
    integrated_recovery_energy,
    magnetic_flux_wb,
    recovery_from_compression,
)
from scpn_fusion_tpu.models.physics.pulsed_compression import (
    CoilGeometry,
    CompressionConfig,
    initial_state,
    run_voltage_driven_compression,
)


def test_central_derivative_exact_on_quadratic():
    """3-point stencil is exact for quadratics, even on non-uniform grids."""
    t = jnp.asarray(np.sort(np.concatenate([np.linspace(0, 1, 9),
                                            [0.013, 0.37, 0.81]])))
    y = 3.0 * t**2 - 2.0 * t + 0.5
    np.testing.assert_allclose(np.asarray(central_derivative(t, y)),
                               np.asarray(6.0 * t - 2.0), rtol=1e-10)


def test_back_emf_closed_form():
    emf = float(faraday_back_emf(0.2, 1.5, -10.0, 50.0, 8))
    expect = -8 * np.pi * (0.2**2 * 50.0 + 2.0 * 1.5 * 0.2 * (-10.0))
    assert emf == pytest.approx(expect, rel=1e-12)
    assert float(magnetic_flux_wb(0.2, 1.5)) == pytest.approx(
        1.5 * np.pi * 0.04, rel=1e-12)


def test_flux_derivative_closure_analytic():
    """EMF from exact derivatives closes against d(flux)/dt to FD accuracy."""
    t = jnp.linspace(0.0, 1e-3, 201)
    r = 0.3 - 100.0 * t**2          # quadratic collapse
    b = 1.0 + 4000.0 * t            # linear field ramp
    res = faraday_recovery(t, r, b, n_turns=4, coil_resistance_ohm=0.5,
                           d_radius_dt_m_s=-200.0 * t,
                           d_b_ext_dt_t_s=jnp.full_like(t, 4000.0))
    assert float(res.flux_derivative_residual_linf) < 1e-6
    # Recovered energy equals trapezoid of EMF^2/R.
    p = np.asarray(res.load_power_w)
    expect = np.trapezoid(p, np.asarray(t))
    assert float(res.recovered_energy_j) == pytest.approx(expect, rel=1e-12)
    assert float(res.recovered_energy_j) > 0


def test_recovery_jits_and_matches_eager():
    t = jnp.linspace(0.0, 1e-3, 64)
    r = 0.3 * jnp.exp(-t / 1e-3)
    b = 1.0 + 2000.0 * t
    eager = faraday_recovery(t, r, b, n_turns=2, coil_resistance_ohm=1.0)
    jitted = jax.jit(lambda t, r, b: faraday_recovery(
        t, r, b, n_turns=2, coil_resistance_ohm=1.0))(t, r, b)
    np.testing.assert_allclose(float(jitted.recovered_energy_j),
                               float(eager.recovered_energy_j), rtol=1e-12)


def test_budget_fail_closed_when_work_missing():
    t = jnp.linspace(0.0, 1e-3, 32)
    r = 0.3 - 50.0 * t**2
    b = 1.0 + 1000.0 * t
    rep = integrated_recovery_energy(t, r, b, n_turns=2,
                                     coil_resistance_ohm=1.0)
    assert rep.budget_claim_status == "blocked_missing_compression_work"
    assert rep.energy_budget_passed is None
    assert rep.source_budget_claim_status == "blocked_missing_coil_source_work"


def test_budget_gate_pass_and_fail():
    t = jnp.linspace(0.0, 1e-3, 32)
    r = 0.3 - 50.0 * t**2
    b = 1.0 + 1000.0 * t
    base = integrated_recovery_energy(t, r, b, n_turns=2,
                                      coil_resistance_ohm=1.0)
    recovered = float(base.result.recovered_energy_j)
    ok = integrated_recovery_energy(t, r, b, n_turns=2, coil_resistance_ohm=1.0,
                                    compression_work_j=recovered * 1.001)
    assert ok.energy_budget_passed is True
    assert ok.budget_claim_status == "passed"
    bad = integrated_recovery_energy(t, r, b, n_turns=2, coil_resistance_ohm=1.0,
                                     compression_work_j=recovered * 10.0)
    assert bad.energy_budget_passed is False
    assert bad.budget_claim_status == "failed"


def test_input_validation():
    t = jnp.array([0.0, 1.0, 0.5])
    with pytest.raises(ValueError, match="strictly increasing"):
        integrated_recovery_energy(t, jnp.ones(3), jnp.ones(3),
                                   n_turns=1, coil_resistance_ohm=1.0)
    with pytest.raises(ValueError, match="positive"):
        integrated_recovery_energy(jnp.array([0.0, 1.0]),
                                   jnp.array([0.1, -0.1]), jnp.ones(2),
                                   n_turns=1, coil_resistance_ohm=1.0)
    with pytest.raises(ValueError, match="n_turns"):
        integrated_recovery_energy(jnp.array([0.0, 1.0]), jnp.ones(2),
                                   jnp.ones(2), n_turns=0,
                                   coil_resistance_ohm=1.0)


def test_adapter_from_pulsed_compression():
    """End-to-end: voltage-driven compression trace -> recovery report."""
    coil = CoilGeometry(n_turns=20, l_coil_m=1.0, resistance_ohm=5e-3,
                        inductance_h=2e-6)
    cfg = CompressionConfig(coil=coil, min_radius_m=0.02, gamma=5.0 / 3.0,
                            plasma_mass_kg=2e-5)
    state0 = initial_state(cfg, radius_m=0.3, t_i_ev=100.0, t_e_ev=100.0,
                           density_m3=5e19)
    drive = lambda t: 400.0  # noqa: E731
    trace = run_voltage_driven_compression(cfg, state0, drive,
                                           n_steps=800, dt_s=1e-7)
    rep = recovery_from_compression(trace, n_turns=8,
                                    coil_resistance_ohm=0.1)
    assert float(rep.result.recovered_energy_j) >= 0.0
    assert np.isfinite(float(rep.result.flux_derivative_residual_linf))
    # Work sidecars came from the trace, so the gates are evaluated
    # (pass or fail), never blocked.
    assert rep.budget_claim_status in ("passed", "failed")
    assert rep.source_budget_claim_status in ("passed", "failed")
    assert rep.flux_derivative_closure_passed
