"""Coolant-loop thermal hydraulics (Churchill + Darcy-Weisbach).

Reference parity anchors: ``engineering/thermal_hydraulics.py:38-118``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.engineering.thermal_hydraulics import (
    COOLANTS,
    churchill_friction_factor,
    pumping_power,
)


def test_churchill_laminar_limit():
    """At low Re the Churchill correlation must approach 64/Re."""
    for re in (100.0, 500.0, 1000.0):
        f = float(churchill_friction_factor(re))
        np.testing.assert_allclose(f, 64.0 / re, rtol=0.05)


def test_churchill_turbulent_range():
    """Turbulent smooth-pipe f ~ 0.03 at Re=1e5 (Moody chart)."""
    f = float(churchill_friction_factor(1e5))
    assert 0.015 < f < 0.03


def test_churchill_matches_reference_formula():
    """Bit-level parity with the reference's expression at a spot value."""
    re, eps = 5.0e4, 1e-4
    a = (2.457 * np.log(1.0 / ((7.0 / re) ** 0.9 + 0.27 * eps))) ** 16
    b = (37530.0 / re) ** 16
    expect = 8.0 * ((8.0 / re) ** 12 + 1.0 / (a + b) ** 1.5) ** (1.0 / 12.0)
    np.testing.assert_allclose(float(churchill_friction_factor(re, eps)),
                               expect, rtol=1e-12)


def test_water_loop_500mw_reference_case():
    """The reference's __main__ demo case: 500 MW water loop."""
    res = pumping_power(500.0, coolant="water")
    # mdot = 500e6 / (5000 * 50) = 2000 kg/s exactly.
    np.testing.assert_allclose(float(res.mdot_kg_s), 2000.0, rtol=1e-12)
    assert float(res.reynolds) > 1e6                  # fully turbulent
    assert float(res.p_pump_mw) > 0.0
    assert np.isfinite(float(res.dp_pa))


def test_helium_needs_more_pumping_than_water():
    """Low-density helium must pay far more pumping power for the same
    heat duty and geometry (the standard He-coolant penalty)."""
    w = pumping_power(500.0, coolant="water", pipe_diameter_m=0.2)
    he = pumping_power(500.0, coolant="helium", pipe_diameter_m=0.2)
    assert float(he.p_pump_mw) > 10.0 * float(w.p_pump_mw)


def test_vectorised_design_scan_and_gradient():
    q = jnp.asarray([100.0, 300.0, 500.0])
    res = jax.vmap(lambda qq: pumping_power(qq, coolant="water"))(q)
    p = np.asarray(res.p_pump_mw)
    assert (np.diff(p) > 0.0).all()

    g = float(jax.grad(
        lambda d: pumping_power(500.0, pipe_diameter_m=d).p_pump_mw)(0.05))
    assert np.isfinite(g) and g < 0.0   # wider pipe -> less pump power


def test_coolant_table_matches_reference():
    assert COOLANTS["lipb"]["rho"] == 9000.0
    assert COOLANTS["helium"]["cp"] == 5190.0
