"""Quasi-3D physics contracts tests (reference ``core/quasi_3d_contracts.py``
+ ``nuclear/blanket_neutronics.py:194-310`` volumetric TBR contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.nuclear.blanket import BlanketConfig, volumetric_tbr
from scpn_fusion_tpu.models.physics.quasi3d import (
    build_divertor_profiles,
    calibrate_tbr_with_erosion,
    hall_mhd_zonal_ratio,
    jet_solps_reference_profile,
    quasi_3d_force_balance,
    solve_quasi_3d_force_residual,
    two_fluid_temhd_coupled_profile,
)
from scpn_fusion_tpu.models.physics.stellarator import StellaratorConfig

BASE = StellaratorConfig(n_fp=1, r0=2.95, a=0.95,
                         helical_excursion=0.0, mirror_ratio=0.0)
STELLAR = StellaratorConfig(n_fp=4, r0=2.95, a=0.95,
                            helical_excursion=0.057, mirror_ratio=0.04)


class TestVolumetricTBR:
    def test_positive_report(self):
        r = volumetric_tbr(BlanketConfig(thickness_cm=80.0,
                                         li6_enrichment=0.9))
        assert float(r.tbr) > 0.0
        assert float(r.total_production_per_s) > 0.0
        assert float(r.blanket_volume_m3) > 0.0

    def test_thicker_blanket_increases_tbr(self):
        thin = volumetric_tbr(BlanketConfig(thickness_cm=40.0,
                                            li6_enrichment=0.9))
        thick = volumetric_tbr(BlanketConfig(thickness_cm=100.0,
                                             li6_enrichment=0.9))
        assert float(thick.tbr) > float(thin.tbr)

    def test_higher_enrichment_increases_tbr(self):
        lo = volumetric_tbr(BlanketConfig(thickness_cm=80.0,
                                          li6_enrichment=0.5))
        hi = volumetric_tbr(BlanketConfig(thickness_cm=80.0,
                                          li6_enrichment=0.95))
        assert float(hi.tbr) > float(lo.tbr)

    def test_3d_corrections_reduce_ideal(self):
        r = volumetric_tbr(BlanketConfig(thickness_cm=80.0,
                                         li6_enrichment=0.9))
        assert float(r.tbr) == pytest.approx(
            float(r.tbr_ideal) * 0.80 * 0.85, rel=1e-6)


class TestForceBalance:
    def test_observables(self):
        obs = quasi_3d_force_balance(jax.random.PRNGKey(0), base=BASE,
                                     stellar=STELLAR, samples=512)
        assert 0.0 < float(obs.force_balance_rmse_pct) < 20.0
        # The helical excursion dominates the per-field-period harmonic.
        assert float(obs.n1_amp) == pytest.approx(0.057, rel=0.05)
        assert float(obs.asymmetry_index) > 0.01
        assert float(obs.radial_spread_m) > 0.0

    def test_axisymmetric_pair_has_zero_rmse(self):
        obs = quasi_3d_force_balance(jax.random.PRNGKey(1), base=BASE,
                                     stellar=BASE, samples=256)
        assert float(obs.force_balance_rmse_pct) < 1e-4
        assert float(obs.n1_amp) < 1e-6


class TestForceResidual:
    def test_relaxation_converges(self):
        m2, p2 = solve_quasi_3d_force_residual(0.06, 0.057, 0.002,
                                               iterations=2)
        m14, p14 = solve_quasi_3d_force_residual(0.06, 0.057, 0.002,
                                                 iterations=14)
        assert float(p14) < float(p2)
        assert 0.0 < float(m14) < float(p14)


class TestCoupling:
    def test_jet_profile_and_cooling(self):
        ref, meta = jet_solps_reference_profile(
            [{"q95": 4.0, "edge_gradient": 0.02, "bcentr": 2.8},
             {"q95": 3.4, "edge_gradient": 0.03, "bcentr": 3.4}], 48)
        assert ref.shape == (48,) and np.all(ref >= 5.0e4)
        assert meta["jet_file_count"] == 2
        div = build_divertor_profiles(
            n1_amp=0.057, n2_amp=0.002, z_n1_amp=0.057, zonal_ratio=0.06,
            reference_profile_w_m2=ref)
        assert 0.1 < div["cooling_gain_pct"] < 30.0
        assert div["two_fluid_diag"]["electron_temp_mean_kev"] > 2.0

    def test_two_fluid_bounded(self):
        raw = jnp.full((16,), 8.5e5)
        cool, diag = two_fluid_temhd_coupled_profile(raw, 0.2)
        assert np.all(np.asarray(cool) <= np.asarray(raw))
        assert np.all(np.asarray(cool) >= 0.70 * np.asarray(raw))
        assert float(diag["ion_temp_mean_kev"]) <= 65.0

    def test_zonal_ratio_backend(self):
        out = hall_mhd_zonal_ratio(jax.random.PRNGKey(2), grid=16, steps=16)
        assert out["backend"] == "hall_mhd"
        assert 0.0 < out["zonal_ratio"] < 1.0


class TestTBRCalibration:
    def test_calibrated_not_above_raw(self):
        t = calibrate_tbr_with_erosion(
            mean_heat_flux_w_m2=8.5e5, thickness_cm=260.0,
            asdex_erosion_ref_mm_year=0.25)
        assert t["calibrated_tbr"] <= t["raw_tbr"] + 1e-9
        assert 0.0 < t["calibration_factor"] <= 1.0
        assert t["estimated_erosion_mm_year"] > 0.0

    def test_high_erosion_cuts_harder(self):
        lo = calibrate_tbr_with_erosion(
            mean_heat_flux_w_m2=8.5e5, thickness_cm=260.0,
            asdex_erosion_ref_mm_year=0.25)
        hi = calibrate_tbr_with_erosion(
            mean_heat_flux_w_m2=8.5e7, thickness_cm=260.0,
            asdex_erosion_ref_mm_year=0.25)
        # 100x the heat flux -> far more erosion -> smaller headroom factor.
        assert hi["estimated_erosion_mm_year"] > lo["estimated_erosion_mm_year"]
        assert hi["calibration_factor"] <= lo["calibration_factor"]
