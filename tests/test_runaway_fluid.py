"""DREAM-style fluid runaway rates + balance (`models/physics/runaway_fluid`).

Parity anchor: really-executed DREAM trajectory at
`/root/reference/validation/reference_data/dream/` (gated in depth by
`validation/run_runaway_dream.py`); these tests pin the physics contracts
and the published limiting forms.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics import runaway_fluid as rf

DREAM_REF = Path("/root/reference/validation/reference_data/dream/"
                 "dream_fluid_runaway_reference.json")


def test_coulomb_logs_standard_values():
    # ne=1e20, Te=1 keV: thermal = 14.9, relativistic = 14.6 + 0.5 ln(1e3)
    assert np.isclose(float(rf.coulomb_log_thermal(1.0, 1.0)), 14.9)
    assert np.isclose(float(rf.coulomb_log_relativistic(1.0, 1.0)),
                      14.6 + 0.5 * np.log(1e3))


def test_ed_over_ec_is_mec2_over_te():
    # E_D/E_c = m_e c^2 / T_e for equal Coulomb logs (Rosenbluth 1997)
    lnl = 15.0
    ratio = float(rf.dreicer_field(0.7, 10.0, lnl)
                  / rf.critical_field(0.7, lnl))
    assert np.isclose(ratio, 510.99895 / 10.0, rtol=1e-6)


def test_dreicer_zero_below_critical_field():
    assert float(rf.dreicer_rate(0.5, 0.1, 1e-4, 1.0)) == 0.0
    assert float(rf.avalanche_rate(0.5, 0.1, 1e-4, 1.0)) == 0.0


def test_dreicer_monotone_in_field():
    e = jnp.asarray([1.0, 2.0, 4.0, 6.0])
    rates = np.asarray(rf.dreicer_rate(0.5, 0.1, e, 1.0))
    assert np.all(np.diff(rates) > 0.0)
    assert np.all(rates >= 0.0) and np.all(np.isfinite(rates))


def test_avalanche_linear_in_overfield():
    # Gamma proportional to (E - E_c) above threshold
    g2 = float(rf.avalanche_rate(0.5, 0.1, 2.0, 1.0))
    e_c = float(rf.critical_field(
        0.5, rf.coulomb_log_relativistic(0.5, 0.1)))
    g4 = float(rf.avalanche_rate(0.5, 0.1, 4.0, 1.0))
    assert np.isclose(g4 / g2, (4.0 - e_c) / (2.0 - e_c), rtol=1e-6)


def test_balance_mitigation_loss_accounting():
    n_re, tau = 1e14, 5e-3
    b_inf = rf.fluid_density_balance(0.5, 0.1, 6.0, 1.0, n_re)
    b_tau = rf.fluid_density_balance(0.5, 0.1, 6.0, 1.0, n_re,
                                     loss_time_s=tau)
    assert np.isclose(float(b_inf.total_source - b_tau.total_source),
                      n_re / tau, rtol=1e-10)
    assert float(b_inf.loss_source) == 0.0


def test_run_exponential_integrator_exact_pure_avalanche():
    # With a pre-seeded pure-avalanche state (cold plasma, E well above
    # E_c but far below E_D so the Dreicer exponential underflows),
    # n(t) = n0 exp(Gamma t) exactly.
    ne20, te, e, z = 0.5, 0.01, 0.5, 1.0
    assert float(rf.dreicer_rate(ne20, te, e, z)) < 1e-12
    gamma = float(rf.avalanche_rate(ne20, te, e, z))
    tr = rf.run_fluid_runaway(ne20, te, e, z, n_re_seed=1e10,
                              t_max_s=0.01, n_steps=50)
    expected = 1e10 * np.exp(gamma * np.asarray(tr.time_s))
    np.testing.assert_allclose(np.asarray(tr.n_re), expected, rtol=1e-9)


def test_density_cap_clamps():
    tr = rf.run_fluid_runaway(0.5, 0.1, 50.0, 1.0, n_re_seed=1e16,
                              t_max_s=1.0, n_steps=100,
                              max_runaway_fraction=0.05)
    assert float(np.max(np.asarray(tr.n_re))) <= 0.05 * 0.5e20 * (1 + 1e-12)


def test_hot_tail_seed_contracts():
    # no seed without cooling; faster quench -> more seed
    assert float(rf.hot_tail_seed(1.0, 2.0, 0.5, 1.0)) == 0.0
    fast = float(rf.hot_tail_seed(3.0, 0.02, 0.5, 0.5))
    slow = float(rf.hot_tail_seed(3.0, 0.02, 0.5, 4.0))
    assert fast > slow > 0.0


@pytest.mark.skipif(not DREAM_REF.exists(), reason="DREAM artifact absent")
def test_dream_cross_code_ratio_bands():
    payload = json.loads(DREAM_REF.read_text())
    sc, series = payload["scenario"], payload["series"]
    ne20, te = sc["n_e_m3"] / 1e20, sc["T_e_eV"] / 1e3
    r_d = (float(rf.dreicer_rate(ne20, te, sc["E_field_V_m"], sc["Z_eff"]))
           / float(np.median(series["other_fluid"]["gammaDreicer"])))
    r_a = (float(rf.avalanche_rate(ne20, te, sc["E_field_V_m"], sc["Z_eff"]))
           / float(np.median(series["other_fluid"]["GammaAva"])))
    assert 0.85 <= r_d <= 1.15          # reference's Dreicer band
    assert 0.60 <= r_a <= 1.00          # reference's avalanche band
