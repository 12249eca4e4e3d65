"""Engineering subpackage: BoP, thermal hydraulics, HTS quench, DEC."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.engineering import (
    CoolantLoop,
    DECChannel,
    DECFault,
    PlantParams,
    QuenchScenario,
    REBCOConductor,
    churchill_friction_factor,
    current_sharing_temperature_k,
    evaluate_direct_energy_conversion,
    evaluate_rebco_quench,
    plant_performance,
    simulate_quench_transient,
)


class TestBalanceOfPlant:
    def test_iter_like_plant_is_net_negative(self):
        # ITER-like: 500 MW fusion, 50 MW heating -> research device, no net
        perf = plant_performance(500.0, 50.0)
        assert float(perf.q_plasma) == pytest.approx(10.0)
        assert float(perf.p_net_mw) < 100.0

    def test_reactor_scale_plant_is_net_positive(self):
        perf = plant_performance(2500.0, 80.0)
        assert float(perf.p_net_mw) > 300.0
        assert float(perf.q_engineering) > 1.0

    def test_energy_conservation_gross_le_thermal(self):
        perf = plant_performance(1000.0, 50.0)
        assert float(perf.p_gross_mw) < float(perf.p_thermal_mw)
        expected_thermal = 0.8 * 1000 * 1.15 + 0.2 * 1000 + 50
        assert float(perf.p_thermal_mw) == pytest.approx(expected_thermal)

    def test_vmap_operating_scan(self):
        p_fus = jnp.linspace(100.0, 3000.0, 16)
        perf = jax.vmap(lambda p: plant_performance(p, 50.0))(p_fus)
        net = np.asarray(perf.p_net_mw)
        assert net.shape == (16,)
        assert np.all(np.diff(net) > 0)  # monotone in fusion power

    def test_coolant_loop_facade_and_coolants(self):
        for coolant in ("water", "helium", "flibe"):
            loop = CoolantLoop(coolant)
            res = loop.calculate_pumping_power(2000.0)
            assert res["P_pump_MW"] > 0.0
        with pytest.raises(ValueError, match="unknown coolant"):
            PlantParams(coolant="mercury")

    def test_churchill_limits(self):
        # laminar: f ~ 64/Re
        f_lam = float(churchill_friction_factor(jnp.asarray(500.0)))
        assert f_lam == pytest.approx(64.0 / 500.0, rel=0.05)
        # turbulent smooth: f ~ 0.02 at Re ~ 1e5
        f_turb = float(churchill_friction_factor(jnp.asarray(1e5)))
        assert 0.01 < f_turb < 0.03


class TestHtsQuench:
    def test_tcs_between_operating_and_critical(self):
        c = REBCOConductor()
        tcs = current_sharing_temperature_k(c)
        assert c.operating_temperature_k < tcs < c.critical_temperature_k

    def test_transient_current_decays_after_detection(self):
        c = REBCOConductor()
        s = QuenchScenario()
        tr = simulate_quench_transient(c, s)
        i = np.asarray(tr.current_a)
        t = np.asarray(tr.t)
        # exponential dump with tau ~ L/R after the detection window
        tau = c.inductance_h / c.dump_resistance_ohm
        t_det = s.detection_delay_s + s.protection_switch_delay_s
        expected = c.operating_current_a * np.exp(-(t[-1] - t_det) / tau)
        assert i[-1] == pytest.approx(expected, rel=0.05)
        assert np.all(np.diff(i[t > t_det]) <= 1e-9)
        assert np.all(np.isfinite(np.asarray(tr.hotspot_k)))

    def test_default_screen_passes(self):
        rep = evaluate_rebco_quench()
        assert rep.passed, rep.failures
        assert rep.peak_hotspot_k < 200.0
        assert rep.current_after_1s_a < REBCOConductor().operating_current_a

    def test_weak_dump_fails_hotspot(self):
        c = REBCOConductor(dump_resistance_ohm=0.002,
                           coolant_heat_transfer_w_m2_k=0.0,
                           stabilizer_area_m2=4e-5)
        s = QuenchScenario(detection_delay_s=1.0, simulation_duration_s=8.0)
        rep = evaluate_rebco_quench(c, s)
        assert not rep.passed
        assert "hotspot_temperature_limit" in rep.failures

    def test_low_margin_flagged(self):
        c = REBCOConductor(operating_current_a=55_000.0)
        rep = evaluate_rebco_quench(c)
        assert "critical_current_margin" in rep.failures

    def test_validation_rejects_bad_conductor(self):
        with pytest.raises(ValueError):
            REBCOConductor(critical_temperature_k=10.0)
        with pytest.raises(ValueError):
            REBCOConductor(operating_current_a=70_000.0)


class TestDirectEnergy:
    def test_default_channel_passes(self):
        rep = evaluate_direct_energy_conversion()
        assert rep.passed, rep.failures
        assert rep.nominal_electric_power_mw == pytest.approx(
            500.0 * 0.2 * 0.6)
        assert rep.degraded_electric_power_mw < rep.nominal_electric_power_mw

    def test_slow_isolation_fails_energy_bound(self):
        c = DECChannel(isolation_time_ms=300.0, max_unisolated_energy_mj=1.0)
        rep = evaluate_direct_energy_conversion(c)
        assert "unisolated_energy" in rep.failures

    def test_small_bus_capacitance_overvoltage(self):
        c = DECChannel(bus_capacitance_f=1e-6)
        rep = evaluate_direct_energy_conversion(c)
        assert "bus_overvoltage" in rep.failures

    def test_validation(self):
        with pytest.raises(ValueError):
            DECChannel(charged_particle_fraction=1.5)
        with pytest.raises(ValueError):
            DECFault(load_rejection_fraction=-0.1)
