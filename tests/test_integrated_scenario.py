"""Integrated shot scenario: whole-shot dynamics + report gates."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.scenario import (
    FluxBudget,
    standard_shot_schedule,
)
from scpn_fusion_tpu.models.physics.integrated_scenario import (
    ScenarioMachine,
    run_shot,
)

ITER_BUDGET = FluxBudget(phi_cs_vs=280.0, l_plasma_uh=7.0, r0_m=6.2)


class TestShot:
    def test_iter_like_shot_reaches_burning_hmode(self):
        sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                       flattop_s=300.0, ne_flat_19=10.0,
                                       p_aux_flat_mw=50.0)
        trace, report = run_shot(sched, ITER_BUDGET)
        assert bool(report.reached_burn), float(report.q_flattop)
        assert float(report.q_flattop) > 5.0
        assert float(report.h_mode_duration_s) > 100.0
        assert not bool(report.flux_exhausted)
        assert not bool(report.greenwald_violated)
        # temperature rises into burning range at flattop
        t = np.asarray(trace.t_kev)
        assert t.max() > 6.0
        assert np.all(np.isfinite(t))

    def test_low_heating_stays_lmode_low_q(self):
        sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                       flattop_s=300.0, ne_flat_19=10.0,
                                       p_aux_flat_mw=5.0)
        trace, report = run_shot(sched, ITER_BUDGET)
        assert float(report.h_mode_duration_s) < 50.0
        assert float(report.q_flattop) < 5.0

    def test_small_flux_budget_exhausts(self):
        sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                       flattop_s=600.0)
        tight = FluxBudget(phi_cs_vs=120.0, l_plasma_uh=7.0, r0_m=6.2)
        _, report = run_shot(sched, tight)
        assert bool(report.flux_exhausted)

    def test_overdense_shot_flags_greenwald(self):
        sched = standard_shot_schedule(ip_flat_ma=5.0, ne_flat_19=20.0)
        _, report = run_shot(sched, ITER_BUDGET)
        assert bool(report.greenwald_violated)

    def test_ramp_phases_visible_in_trace(self):
        sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                       flattop_s=300.0)
        trace, _ = run_shot(sched, ITER_BUDGET)
        ip = np.asarray(trace.ip_ma)
        # ramp-up, flattop, ramp-down structure
        assert ip[5] < ip[len(ip) // 2]
        assert ip[-2] < 0.5 * ip.max()
