"""Whole-device-model discharge loop tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.transport.solver import TransportParams
from scpn_fusion_tpu.models.wdm import (
    WDMConfig,
    collapse_time_s,
    default_initial_state,
    redeposition_fraction,
    run_discharge,
    thomas_fermi_pressure,
)


def test_thomas_fermi_pressure_regimes():
    """Ideal term dominates hot/dilute; degeneracy dominates cold/dense."""
    p_hot = float(thomas_fermi_pressure(1e20, 1e4))
    assert p_hot == pytest.approx(1e20 * 1e4 * 1.602176634e-19, rel=1e-3)
    p_cold_dense = float(thomas_fermi_pressure(1e30, 0.0))
    expect_deg = (1.054571817e-34**2 / 9.1093837015e-31) * (1e30) ** (5.0 / 3.0)
    assert p_cold_dense == pytest.approx(expect_deg, rel=1e-6)
    assert float(thomas_fermi_pressure(1e30, 1.0)) > p_cold_dense


def test_redeposition_fraction_bounds_and_monotonicity():
    f = np.asarray(redeposition_fraction(jnp.array([1.0, 5.0, 20.0]), 1e19))
    assert np.all((f >= 0.0) & (f <= 0.99))
    assert f[0] < f[1] <= f[2]
    assert float(redeposition_fraction(5.0, 1e22)) == pytest.approx(0.95, abs=0.05)


def test_discharge_runs_and_accumulates_impurities():
    tp = TransportParams(nr=32, picard_max_iter=5)
    cfg = WDMConfig(transport=tp, dt_s=0.01, p_aux_mw=50.0,
                    core_penetration=1e-2)
    trace = run_discharge(cfg, default_initial_state(cfg), n_steps=40)
    assert np.all(np.isfinite(np.asarray(trace.te_core_kev)))
    w = np.asarray(trace.w_impurity_total)
    assert np.all(np.diff(w) >= -1e-6)  # inventory never decreases
    np.testing.assert_allclose(np.asarray(trace.time_s),
                               0.01 * np.arange(1, 41), rtol=1e-5)
    f = np.asarray(trace.redeposition_fraction)
    assert np.all((f >= 0.0) & (f <= 0.99))


def test_collapse_latch_freezes_state():
    """An absurdly high impurity drive quenches the core; after the latch
    trips, the recorded core temperature stays frozen."""
    tp = TransportParams(nr=32, picard_max_iter=5)
    cfg = WDMConfig(transport=tp, dt_s=0.05, p_aux_mw=0.0,
                    core_penetration=50.0, collapse_te_kev=0.5)
    trace = run_discharge(cfg, default_initial_state(cfg), n_steps=60)
    collapsed = np.asarray(trace.collapsed)
    te = np.asarray(trace.te_core_kev)
    if collapsed.any():
        k = int(np.argmax(collapsed))
        assert collapse_time_s(trace) == pytest.approx(
            float(trace.time_s[k]), rel=1e-6)
        # Latched: core temperature no longer changes after collapse.
        if k + 2 < te.size:
            np.testing.assert_allclose(te[k + 1:], te[k + 1], rtol=1e-6)
    else:
        # No collapse at all would defeat the scenario's purpose.
        assert te[-1] < te[0]


def test_no_collapse_without_impurity_penetration():
    tp = TransportParams(nr=32, picard_max_iter=5)
    cfg = WDMConfig(transport=tp, dt_s=0.01, p_aux_mw=50.0,
                    core_penetration=0.0)
    trace = run_discharge(cfg, default_initial_state(cfg), n_steps=40)
    assert collapse_time_s(trace) is None
    assert float(trace.w_impurity_total[-1]) == pytest.approx(0.0, abs=1e-8)
