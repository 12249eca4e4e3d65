"""Disruption sequence, SPI mitigation, pellet/blob/MARFE tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.disruption_sequence import (
    DisruptionParams,
    avalanche_growth_rate,
    critical_field_connor_hastie,
    run_disruption_sequence,
    spi_mitigation_scan,
    spitzer_resistivity,
    structural_response_screen,
)
from scpn_fusion_tpu.models.physics.edge_events import (
    blob_transport,
    marfe_onset,
    pellet_ablation,
)


class TestDisruption:
    def test_sequence_quenches_ohmic_current(self):
        p = DisruptionParams()
        trace, s = run_disruption_sequence(p)
        ip = np.asarray(trace.ip_ma)
        i_re = np.asarray(trace.i_re_ma)
        assert ip[0] == pytest.approx(15.0, rel=0.01)
        # The OHMIC channel quenches; the total plateaus on the RE beam
        # (unmitigated conversion — the hazard the sequence screens for).
        assert (ip[-1] - i_re[-1]) < 1.0
        assert ip[-1] < ip[0]
        assert float(s.tau_cq_ms) > 0.0
        te = np.asarray(trace.te_ev)
        assert te[-1] == pytest.approx(10.0, rel=0.2)   # post-TQ floor

    def test_unmitigated_generates_runaways(self):
        p = DisruptionParams()
        _, s = run_disruption_sequence(p)
        assert float(s.i_re_final_ma) > 0.5       # multi-MA RE beam risk
        assert not bool(s.mitigated)

    def test_spi_suppresses_avalanche(self):
        p = DisruptionParams()
        _, unmit = run_disruption_sequence(p)
        _, mit = run_disruption_sequence(p, spi_ne20_injected=200.0,
                                         spi_time_ms=0.2)
        assert float(mit.i_re_final_ma) < 0.2 * float(unmit.i_re_final_ma)

    def test_spi_scan_monotone_mitigation(self):
        p = DisruptionParams(n_steps=2000)
        q = jnp.asarray([0.0, 5.0, 50.0])
        s = spi_mitigation_scan(p, q)
        i_re = np.asarray(s.i_re_final_ma)
        assert i_re[2] < i_re[0]

    def test_halo_force_and_screen(self):
        p = DisruptionParams()
        _, s = run_disruption_sequence(p)
        assert float(s.halo_peak_ma) > 0.5
        screen = structural_response_screen(s, force_limit_mn=1e4,
                                            tau_cq_min_ms=0.0)
        assert screen["passed"]
        tight = structural_response_screen(s, force_limit_mn=0.1)
        assert "halo_force_limit" in tight["failures"]

    def test_physics_helpers(self):
        # colder plasma -> higher resistivity
        assert float(spitzer_resistivity(10.0)) > float(
            spitzer_resistivity(1000.0))
        # denser plasma -> higher critical field -> weaker avalanche
        g_lo = float(avalanche_growth_rate(jnp.asarray(10.0), 1.0))
        g_hi = float(avalanche_growth_rate(jnp.asarray(10.0), 50.0))
        assert g_hi < g_lo
        assert float(critical_field_connor_hastie(5.0)) == pytest.approx(
            5.0 * float(critical_field_connor_hastie(1.0)), rel=1e-6)


class TestPellet:
    def _profiles(self, n=33, t_core=10.0):
        rho = np.linspace(0, 1, n)
        te = t_core * (1 - 0.9 * rho ** 2)
        ne = 8.0 * (1 - 0.7 * rho ** 2)
        return jnp.asarray(te), jnp.asarray(ne)

    def test_pellet_ablates_and_deposits(self):
        te, ne = self._profiles()
        tr = pellet_ablation(te_profile_kev=te, ne_profile_19=ne)
        assert float(tr.radius_mm[-1]) < 2.0      # mass ablated
        dep = np.asarray(tr.deposition)
        assert dep.sum() > 0.0
        # deposition is edge-weighted (pellet burns up before the core)
        assert float(tr.penetration_rho) > 0.0

    def test_hotter_plasma_shallower_penetration(self):
        te_hot, ne = self._profiles(t_core=25.0)
        te_cold, _ = self._profiles(t_core=2.0)
        pen_hot = float(pellet_ablation(te_profile_kev=te_hot,
                                        ne_profile_19=ne).penetration_rho)
        pen_cold = float(pellet_ablation(te_profile_kev=te_cold,
                                         ne_profile_19=ne).penetration_rho)
        assert pen_hot > pen_cold   # burned up further out


class TestBlobMarfe:
    def test_blob_velocity_scales_with_size_then_caps(self):
        small = blob_transport(blob_size_mm=2.0)
        large = blob_transport(blob_size_mm=30.0)
        assert float(small.v_blob_m_s) > 0.0
        assert float(large.v_blob_m_s) != float(small.v_blob_m_s)
        assert float(small.gamma_flux_m2_s) > 0.0

    def test_marfe_density_limit_behaviour(self):
        low = marfe_onset(n_edge_19=1.0, te_edge_ev=50.0, ip_ma=2.0,
                          a_m=0.6)
        high = marfe_onset(n_edge_19=20.0, te_edge_ev=15.0, ip_ma=2.0,
                           a_m=0.6, impurity_fraction=0.06)
        assert not bool(low.at_risk)
        assert bool(high.at_risk)
        # more impurities -> lower onset density
        dirty = marfe_onset(n_edge_19=1.0, te_edge_ev=50.0, ip_ma=2.0,
                            a_m=0.6, impurity_fraction=0.1)
        assert float(dirty.n_marfe_19) < float(low.n_marfe_19)
