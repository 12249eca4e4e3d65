"""Startup, scenario schedule, volt-second budget, design scan tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.scenario import (
    FluxBudget,
    ScenarioSchedule,
    Waveform,
    burn_through,
    is_breakdown,
    monitor_flux_consumption,
    optimal_prefill_pressure,
    paschen_breakdown_voltage,
    run_startup_sequence,
    standard_shot_schedule,
    townsend_avalanche,
)
from scpn_fusion_tpu.models.physics.design_scan import (
    DesignLimits,
    compact_reactor_search,
    evaluate_design,
    scan_designs,
)


class TestStartup:
    def test_paschen_minimum(self):
        p = jnp.logspace(-4, 0, 200)
        v = np.asarray(paschen_breakdown_voltage(p, 100.0))
        finite = np.isfinite(v)
        p_min = float(p[finite][np.argmin(v[finite])])
        assert p_min == pytest.approx(optimal_prefill_pressure(100.0),
                                      rel=0.1)
        # breakdown easy at the minimum, hard far below it
        assert bool(is_breakdown(20.0, p_min))
        assert not bool(is_breakdown(20.0, 1e-6))

    def test_avalanche_full_ionization(self):
        tr = townsend_avalanche(v_loop=20.0, p_pa=1e-3, r0_m=6.2)
        assert float(tr.ionization_fraction) > 0.99
        assert float(tr.time_to_full_ionization_s) < 0.02
        ne = np.asarray(tr.ne_m3)
        assert np.all(np.diff(ne) >= -1e-6)

    def test_burn_through_needs_voltage(self):
        ok = burn_through(v_loop=15.0, r0_m=6.2, a_m=2.0,
                          impurity_fraction=0.01)
        weak = burn_through(v_loop=0.2, r0_m=6.2, a_m=2.0,
                            impurity_fraction=0.08)
        assert bool(ok.succeeded)
        assert not bool(weak.succeeded)

    def test_startup_sequence_composite(self):
        good = run_startup_sequence(v_loop=20.0,
                                    p_pa=optimal_prefill_pressure(),
                                    r0_m=6.2, a_m=2.0)
        assert bool(good.succeeded)
        bad = run_startup_sequence(v_loop=2.0, p_pa=1e-6, r0_m=6.2, a_m=2.0)
        assert not bool(bad.succeeded)


class TestSchedule:
    def test_waveform_interp_and_validation(self):
        wf = Waveform((0.0, 10.0, 20.0), (0.0, 5.0, 5.0))
        assert float(wf(5.0)) == pytest.approx(2.5)
        assert float(wf(15.0)) == pytest.approx(5.0)
        with pytest.raises(ValueError):
            Waveform((0.0, 0.0), (1.0, 2.0))
        with pytest.raises(ValueError):
            Waveform((0.0,), (1.0,))

    def test_standard_schedule_shape(self):
        sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                       flattop_s=300.0)
        assert sched.validate() == []
        t = jnp.linspace(0.0, sched.duration, 100)
        vals = sched.evaluate(t)
        ip = np.asarray(vals["ip_ma"])
        assert ip.max() == pytest.approx(15.0)
        assert ip[0] == pytest.approx(0.1)
        # flattop plateau
        mid = sched.evaluate(200.0)
        assert float(mid["ip_ma"]) == pytest.approx(15.0)

    def test_validation_catches_bad_waveforms(self):
        bad = ScenarioSchedule(waveforms=(
            ("ip_ma", Waveform((0.0, 1.0), (-1.0, 5.0))),
            ("ne19", Waveform((0.0, 1.0), (0.0, 5.0))),
        ))
        problems = bad.validate()
        assert any("negative plasma current" in p for p in problems)
        assert any("non-positive density" in p for p in problems)


class TestFluxBudget:
    def test_iter_like_budget(self):
        # ITER-ish: 280 V s CS swing, L ~ 7 uH, 15 MA
        b = FluxBudget(phi_cs_vs=280.0, l_plasma_uh=7.0, r0_m=6.2)
        ind = float(b.inductive_flux(15.0))
        res = float(b.resistive_flux(15.0))
        assert ind == pytest.approx(105.0, rel=0.01)
        assert res == pytest.approx(0.45 * 4e-7 * np.pi * 6.2 * 15e6,
                                    rel=0.01)
        remaining = float(b.remaining_flux(15.0))
        assert 100.0 < remaining < 140.0
        # ~0.1 V loop, 30% bootstrap -> >= 1000 s flattop
        t_flat = float(b.max_flattop_duration(15.0, 0.1,
                                              bootstrap_fraction=0.3))
        assert t_flat > 1000.0

    def test_monitor_reports_exhaustion(self):
        b = FluxBudget(phi_cs_vs=120.0, l_plasma_uh=7.0)
        t = jnp.linspace(0.0, 1000.0, 101)
        ip = jnp.full_like(t, 15.0)
        v = jnp.full_like(t, 0.5)
        tr = monitor_flux_consumption(b, t, ip, v)
        assert float(tr.exhausted_at_s) < 1000.0
        assert float(tr.remaining_vs[-1]) < 0.0


class TestDesignScan:
    def test_iter_like_point_feasible_q10(self):
        pt = evaluate_design(6.2, 2.0, 5.3, 15.0, 10.0, 50.0, kappa=1.8)
        assert float(pt.q_fusion) > 5.0
        assert bool(pt.feasible), (
            float(pt.greenwald_fraction), float(pt.beta_n),
            float(pt.q_star), float(pt.b_coil_t),
            float(pt.wall_load_mw_m2))

    def test_scan_picks_feasible_best(self):
        r = jnp.asarray([3.0, 6.2, 9.0])
        pts = scan_designs(r_m=r, a_m=r / 3.1, b0_t=5.3,
                           ip_ma=15.0 * r / 6.2, ne19=10.0, p_aux_mw=50.0)
        assert int(pts.n_feasible) >= 1
        best = int(pts.best_index)
        assert bool(pts.points.feasible[best])

    def test_compact_search_finds_devices(self):
        res = compact_reactor_search(n_samples=512, seed=1)
        assert int(res.n_feasible) > 0
        best = int(res.best_index)
        assert bool(res.points.feasible[best])
        assert float(res.points.q_fusion[best]) >= 10.0
        assert float(res.points.r_m[best]) < 7.0

    def test_limits_mask(self):
        tight = DesignLimits(beta_n_max=0.1)
        pt = evaluate_design(6.2, 2.0, 5.3, 15.0, 10.0, 50.0,
                             limits=tight)
        assert not bool(pt.feasible)
