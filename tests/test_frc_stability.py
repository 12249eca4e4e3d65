"""FRC tilt-mode diagnostics + rigid-rotor validation contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.frc import MU0, solve_rigid_rotor
from scpn_fusion_tpu.models.physics.frc_stability import (
    ATOMIC_MASS_KG,
    BELOVA_MHD_GROWTH_COEFFICIENT,
    DEUTERIUM_MASS_AMU,
    ELEMENTARY_CHARGE_C,
    alfven_speed_m_s,
    belova_table1_acceptance_status,
    claim_boundary,
    regime_name,
    rigid_body_flr_regime_code,
    s_parameter,
    tilt_mode_report,
    tilt_mode_stable,
    tilt_trajectory_from_compression,
    validate_rigid_rotor,
)


@pytest.fixture(scope="module")
def eq():
    return solve_rigid_rotor(b_external_t=1.5, separatrix_radius_m=0.3,
                             peak_density_m3=2e20, n_points=512)


def test_s_parameter_matches_numpy_twin(eq):
    """Mask-based static-shape integral == dense clipped numpy trapezoid."""
    t_i = 500.0
    rho = np.asarray(eq.rho, np.float64)
    b_z = np.asarray(eq.b_z, np.float64)
    r_s = float(eq.r_s)
    mass = DEUTERIUM_MASS_AMU * ATOMIC_MASS_KG
    p_th = np.sqrt(2.0 * mass * t_i * ELEMENTARY_CHARGE_C)
    integrand = rho * ELEMENTARY_CHARGE_C * np.abs(b_z) / p_th
    stop = int(np.searchsorted(rho, r_s, side="right"))
    r_clip = np.append(rho[:stop], r_s)
    f_clip = np.append(integrand[:stop], np.interp(r_s, rho, integrand))
    twin = np.trapezoid(f_clip * 1.0, r_clip) / r_s
    ours = float(s_parameter(eq, t_i))
    assert ours == pytest.approx(twin, rel=1e-6)
    assert ours > 0


def test_s_parameter_temperature_scaling(eq):
    """s ~ 1/sqrt(T_i): doubling T_i divides s by sqrt(2)."""
    s1 = float(s_parameter(eq, 400.0))
    s2 = float(s_parameter(eq, 800.0))
    assert s1 / s2 == pytest.approx(np.sqrt(2.0), rel=1e-6)


def test_alfven_speed_value():
    v = float(alfven_speed_m_s(2.0, 1e20))
    rho_m = 1e20 * DEUTERIUM_MASS_AMU * ATOMIC_MASS_KG
    assert v == pytest.approx(2.0 / np.sqrt(float(MU0) * rho_m), rel=1e-6)


def test_regime_ladder():
    codes = rigid_body_flr_regime_code(jnp.array([1.0, 2.0, 2.5, 3.5]))
    assert codes.tolist() == [0, 1, 2, 3]
    assert regime_name(0) == "diamagnetic_flr_threshold_passed"
    assert regime_name(3) == "mhd_tilt_susceptible"


def test_tilt_report_growth_rate_and_jit(eq):
    report = jax.jit(lambda e: tilt_mode_report(e, 500.0, 4.0))(eq)
    v_a = float(alfven_speed_m_s(jnp.max(jnp.abs(eq.b_z)), jnp.max(eq.density)))
    expect = BELOVA_MHD_GROWTH_COEFFICIENT * v_a / (float(eq.r_s) * 4.0)
    assert float(report.growth_rate_s_inv) == pytest.approx(expect, rel=1e-6)
    assert float(report.alfven_transit_time_s) == pytest.approx(
        float(eq.r_s) * 4.0 / v_a, rel=1e-6)
    assert int(report.regime_code) in range(4)


def test_tilt_stable_fail_closed(eq):
    stable, gamma = tilt_mode_stable(eq, 500.0, 4.0)
    assert stable is False
    assert float(gamma) > 0
    assert belova_table1_acceptance_status()["status"].startswith("blocked")
    assert "not_accepted" in claim_boundary()


def test_trajectory_constant_states(eq):
    """Constant compression states: cumulative integral == gamma * t."""
    n = 16
    t = jnp.linspace(0.0, 1e-5, n)
    traj = tilt_trajectory_from_compression(
        eq, 500.0, 4.0,
        t_s=t,
        radius_m=jnp.full((n,), 0.3),
        t_i_ev=jnp.full((n,), 500.0),
        density_m3=jnp.full((n,), 2e20),
        b_ext_t=jnp.full((n,), 1.5),
    )
    gamma = float(traj.growth_rate_s_inv[0])
    np.testing.assert_allclose(np.asarray(traj.cumulative_growth_integral),
                               gamma * np.asarray(t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(traj.perturbation_amplification),
        np.exp(np.minimum(gamma * np.asarray(t), 700.0)), rtol=1e-5)
    assert not bool(traj.amplification_overflow_limited[0])


def test_trajectory_self_similar_s_projection(eq):
    """s(t) = s0 * (R/R0) * (B/B0) * sqrt(T0/T)."""
    t = jnp.array([0.0, 1e-6])
    traj = tilt_trajectory_from_compression(
        eq, 500.0, 4.0,
        t_s=t,
        radius_m=jnp.array([0.3, 0.15]),
        t_i_ev=jnp.array([500.0, 2000.0]),
        density_m3=jnp.array([2e20, 8e20]),
        b_ext_t=jnp.array([1.5, 6.0]),
    )
    s0 = float(traj.s_parameter[0])
    expect = s0 * (0.15 / 0.3) * (6.0 / 1.5) * np.sqrt(500.0 / 2000.0)
    assert float(traj.s_parameter[1]) == pytest.approx(expect, rel=1e-6)


def test_trajectory_overflow_clamp(eq):
    """Huge growth*dt saturates at the dtype log-max instead of inf."""
    t = jnp.array([0.0, 1e6])
    traj = tilt_trajectory_from_compression(
        eq, 500.0, 4.0,
        t_s=t,
        radius_m=jnp.full((2,), 0.3),
        t_i_ev=jnp.full((2,), 500.0),
        density_m3=jnp.full((2,), 2e20),
        b_ext_t=jnp.full((2,), 1.5),
    )
    assert bool(traj.amplification_overflow_limited[1])
    assert np.isfinite(float(traj.perturbation_amplification[1]))


def test_validate_rigid_rotor_passes(eq):
    report = jax.jit(validate_rigid_rotor)(eq)
    assert bool(report.all_passed), {
        k: float(v) for k, v in report._asdict().items()}
    assert float(report.pressure_balance_residual) < 1e-3


def test_validate_catches_corruption(eq):
    bad = eq._replace(pressure=jnp.zeros_like(eq.pressure))
    report = validate_rigid_rotor(bad)
    assert not bool(report.pressure_balance_ok)
    assert not bool(report.all_passed)
    nan = eq._replace(b_z=eq.b_z.at[3].set(jnp.nan))
    assert not bool(validate_rigid_rotor(nan).all_passed)
