"""Blanket neutronics + PWI sputtering tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.nuclear.blanket import (
    BlanketConfig,
    MultiGroupConfig,
    enrichment_scan,
    multigroup_tbr,
    single_group_tbr,
)
from scpn_fusion_tpu.models.nuclear.pwi import (
    SputteringMaterial,
    erosion_rate,
    erosion_scan,
    sputtering_yield,
)


class TestBlanket:
    def test_multigroup_headline_tbr(self):
        """Reference parity: 80 cm, 90% Li-6, port 0.80, streaming 0.85
        gives TBR = 1.14 (SURVEY §2.10)."""
        res = multigroup_tbr(MultiGroupConfig())
        np.testing.assert_allclose(float(res.tbr), 1.14, atol=0.02)
        # Thermal group dominates breeding (940 b Li-6 cross-section).
        pg = np.asarray(res.tbr_per_group)
        assert pg[2] > pg[1] > pg[0]
        np.testing.assert_allclose(pg.sum(), float(res.tbr), rtol=1e-6)

    def test_flux_attenuates_and_groups_populate(self):
        res = multigroup_tbr(MultiGroupConfig())
        phi = np.asarray(res.flux)
        assert phi.shape[0] == 3
        assert np.all(phi >= 0)
        # Fast flux decays monotonically into the blanket.
        assert phi[0, -1] < 0.05 * phi[0, 0]
        # Downscattered groups are populated through the blanket depth
        # (built entirely from the moderation chain, no imposed BC flux).
        assert phi[1].max() > 0 and phi[2].max() > 0
        assert phi[2, 1:20].min() > 0

    def test_tbr_increases_with_enrichment(self):
        scan = np.asarray(enrichment_scan(jnp.asarray([0.3, 0.6, 0.9])))
        assert scan[2] > scan[1] > scan[0] > 0

    def test_single_group_breeding(self):
        res = single_group_tbr(BlanketConfig())
        assert 1.0 < float(res.tbr) < 2.5
        assert bool(jnp.all(res.flux >= 0))

    def test_single_group_supercritical_rejected(self):
        with pytest.raises(ValueError, match="Supercritical"):
            single_group_tbr(BlanketConfig(li6_enrichment=0.2))

    def test_config_validation(self):
        with pytest.raises(ValueError):
            BlanketConfig(li6_enrichment=1.5)
        with pytest.raises(ValueError):
            BlanketConfig(thickness_cm=0.01)


class TestPWI:
    def test_threshold_behaviour(self):
        w = SputteringMaterial.from_name("Tungsten")
        assert float(sputtering_yield(w, 100.0)) == 0.0   # below 200 eV
        assert float(sputtering_yield(w, 1000.0)) > 0.0

    def test_carbon_sputters_more_easily(self):
        w = SputteringMaterial.from_name("Tungsten")
        c = SputteringMaterial.from_name("Carbon")
        e = 500.0
        assert float(sputtering_yield(c, e)) > float(sputtering_yield(w, e))

    def test_grazing_incidence_enhances(self):
        w = SputteringMaterial.from_name("Tungsten")
        y_norm = float(sputtering_yield(w, 2000.0, angle_deg=0.0))
        y_graze = float(sputtering_yield(w, 2000.0, angle_deg=80.0))
        assert y_graze > 2.0 * y_norm

    def test_erosion_rate_keys_and_redeposition(self):
        w = SputteringMaterial.from_name("Tungsten",
                                         redeposition_factor=0.95)
        res = erosion_rate(w, 1e24, 100.0)
        for key in ["Yield", "E_impact", "Net_Flux", "Erosion_mm_year",
                    "Impurity_Source"]:
            assert key in res
        assert float(res["E_impact"]) == pytest.approx(500.0)
        w0 = SputteringMaterial.from_name("Tungsten",
                                          redeposition_factor=0.0)
        res0 = erosion_rate(w0, 1e24, 100.0)
        np.testing.assert_allclose(float(res["Net_Flux"]),
                                   0.05 * float(res0["Net_Flux"]), rtol=1e-5)

    def test_scan_monotone_in_temperature(self):
        w = SputteringMaterial.from_name("Tungsten")
        temps, erosion, yields = erosion_scan(w, 1e24, 10.0, 100.0, 50)
        erosion = np.asarray(erosion)
        assert erosion.shape == (50,)
        # Below-threshold cold end is zero, hot end erodes.
        assert erosion[0] == 0.0
        assert erosion[-1] > 0.0
        assert np.all(np.diff(erosion) >= -1e-12)

    def test_yield_differentiable(self):
        w = SputteringMaterial.from_name("Tungsten")
        g = float(jax.grad(lambda e: sputtering_yield(w, e))(2000.0))
        assert np.isfinite(g) and g > 0
