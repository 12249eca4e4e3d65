"""HTS quench protection + balance-of-plant tests."""

import numpy as np
import pytest

from scpn_fusion_tpu.models.engineering.balance_of_plant import (
    CoolantLoop,
    PlantParams,
    churchill_friction_factor,
    plant_performance,
    pumping_power,
)
from scpn_fusion_tpu.models.engineering.hts_quench import (
    QuenchScenario,
    REBCOConductor,
    current_sharing_temperature_k,
    evaluate_rebco_quench,
    simulate_quench_transient,
)


class TestHTSQuench:
    def test_current_sharing_temperature(self):
        c = REBCOConductor()
        tcs = current_sharing_temperature_k(c)
        # Linear Ic(T): T_cs = 20 + 70 * (1 - 40/60) = 43.33 K.
        assert tcs == pytest.approx(20.0 + 70.0 * (1.0 / 3.0), rel=1e-12)
        assert c.operating_temperature_k < tcs < c.critical_temperature_k

    def test_dump_decays_current(self):
        tr = simulate_quench_transient(REBCOConductor(), QuenchScenario())
        i = np.asarray(tr.current_a)
        t = np.asarray(tr.t)
        after = i[t > 0.2]
        assert after[-1] < after[0]
        # Decay scale follows tau = L / R_dump = 8 s; at +1 s from
        # detection (0.15 s) the current should be well below I_op but
        # nowhere near zero.
        assert 0.3 * i[0] < i[-1] < i[0]
        assert float(np.max(np.asarray(tr.hotspot_k))) < 200.0

    def test_screen_passes_default_and_flags_undetectable(self):
        ok = evaluate_rebco_quench()
        assert ok.passed and not ok.failures
        bad = evaluate_rebco_quench(
            s=QuenchScenario(initial_normal_zone_m=1e-3,
                             normal_zone_velocity_m_s=1e-3))
        assert not bad.passed
        assert "detection_voltage_below_threshold" in bad.failures

    def test_validation_rejects_nonpositive(self):
        with pytest.raises(ValueError):
            REBCOConductor(inductance_h=0.0)


class TestBalanceOfPlant:
    def test_friction_factor_laminar_limit(self):
        # Churchill ~ 64/Re in the laminar regime.
        f = float(churchill_friction_factor(500.0))
        assert f == pytest.approx(64.0 / 500.0, rel=0.05)

    def test_pumping_power_monotone_in_load(self):
        params = PlantParams()
        p1 = float(pumping_power(500.0, params))
        p2 = float(pumping_power(1000.0, params))
        assert 0.0 < p1 < p2

    def test_plant_performance_energy_bookkeeping(self):
        perf = plant_performance(2000.0, 50.0)
        # Thermal power: 0.8*2000*1.15 + 0.2*2000 + 50 = 2290 MW.
        assert float(perf.p_thermal_mw) == pytest.approx(2290.0, rel=1e-5)
        assert float(perf.p_gross_mw) == pytest.approx(2290.0 * 0.35,
                                                       rel=1e-5)
        # Net = gross - recirculating, strictly less than gross.
        assert float(perf.p_net_mw) < float(perf.p_gross_mw)
        assert float(perf.q_plasma) == pytest.approx(40.0, rel=1e-5)
        assert float(perf.q_engineering) > 1.0   # a 2 GW plant nets power

    def test_subcritical_plant_nets_negative(self):
        perf = plant_performance(50.0, 50.0)
        assert float(perf.p_net_mw) < 0.0

    def test_coolant_loop_facade(self):
        loop = CoolantLoop("water")
        out = loop.calculate_pumping_power(1000.0)
        assert out["P_pump_MW"] > 0.0 and out["mdot_kg_s"] > 0.0
        with pytest.raises(Exception):
            CoolantLoop("mercury")
