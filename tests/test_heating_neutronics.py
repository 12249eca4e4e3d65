"""Heating + neutronics candidate contract tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.nuclear.heating_neutronics import (
    aries_at_q_proxy,
    genray_heating_proxy,
    mcnp_lite_tbr,
    mcnp_lite_transport_tbr,
    quick_candidate,
    refine_candidate_tbr,
    require_fraction,
)


def test_heating_proxy_bounds_and_determinism():
    key = jax.random.PRNGKey(0)
    h1 = genray_heating_proxy(key, major_radius_m=6.2, elongation=1.8,
                              b_t=5.5, rf_power_mw=30.0, nbi_power_mw=25.0)
    h2 = genray_heating_proxy(key, major_radius_m=6.2, elongation=1.8,
                              b_t=5.5, rf_power_mw=30.0, nbi_power_mw=25.0)
    assert 0.35 <= float(h1["rf_absorption_eff"]) <= 0.95
    assert 0.28 <= float(h1["nbi_absorption_eff"]) <= 0.93
    assert float(h1["absorbed_heating_mw"]) == pytest.approx(
        30.0 * float(h1["rf_absorption_eff"])
        + 25.0 * float(h1["nbi_absorption_eff"]), rel=1e-6)
    assert float(h1["rf_absorption_eff"]) == float(h2["rf_absorption_eff"])
    assert 0.0 <= float(h1["rf_reflection_rate"]) <= 1.0
    assert float(h1["mean_path_length_norm"]) > 0.9


def test_aries_q_proxy_scalings():
    base = float(aries_at_q_proxy(major_radius_m=6.2, b_t=5.5, ip_ma=12.0,
                                  absorbed_heating_mw=55.0))
    assert base == pytest.approx(5.8, rel=1e-6)
    bigger_b = float(aries_at_q_proxy(major_radius_m=6.2, b_t=6.5, ip_ma=12.0,
                                      absorbed_heating_mw=55.0))
    assert bigger_b > base


def test_mcnp_lite_tbr_projection():
    tbr, factor = mcnp_lite_tbr(raw_tbr=1.0, li6_enrichment=0.9,
                                be_multiplier_fraction=0.5,
                                reflector_albedo=0.5)
    expect_factor = 1.11 + 0.22 * 0.5 + 0.08 * 0.9 + 0.05 * 0.5
    assert float(factor) == pytest.approx(expect_factor, rel=1e-6)
    assert float(tbr) == pytest.approx(expect_factor * 1.45, rel=1e-6)
    with pytest.raises(ValueError, match="li6_enrichment"):
        mcnp_lite_tbr(raw_tbr=1.0, li6_enrichment=1.5,
                      be_multiplier_fraction=0.5, reflector_albedo=0.5)


def test_transport_mc_physical_trends():
    key = jax.random.PRNGKey(1)
    thin = mcnp_lite_transport_tbr(key, histories=2000, thickness_cm=5.0,
                                   li6_enrichment=0.9,
                                   be_multiplier_fraction=0.5,
                                   reflector_albedo=0.3)
    thick = mcnp_lite_transport_tbr(key, histories=2000, thickness_cm=100.0,
                                    li6_enrichment=0.9,
                                    be_multiplier_fraction=0.5,
                                    reflector_albedo=0.3)
    # Thicker blanket: more capture, less leakage.
    assert float(thick["tbr_mc"]) > float(thin["tbr_mc"])
    assert float(thick["leakage_rate"]) < float(thin["leakage_rate"])
    assert float(thick["multiplication_gain"]) >= 1.0
    # Enrichment trend probed with Be multiplication suppressed (at high
    # multiplier fractions, low-enrichment histories live longer and the
    # weight amplification can outweigh the per-collision capture drop).
    hi_li = mcnp_lite_transport_tbr(key, histories=2000, thickness_cm=100.0,
                                    li6_enrichment=0.9,
                                    be_multiplier_fraction=0.0,
                                    reflector_albedo=0.3)
    lo_li = mcnp_lite_transport_tbr(key, histories=2000, thickness_cm=100.0,
                                    li6_enrichment=0.1,
                                    be_multiplier_fraction=0.0,
                                    reflector_albedo=0.3)
    assert float(hi_li["tbr_mc"]) > float(lo_li["tbr_mc"])


def test_transport_mc_weight_conservation_bound():
    """Capture + leak tallies stay bounded by total injected weight times
    the multiplication gain (sanity on the non-analog estimator)."""
    key = jax.random.PRNGKey(2)
    mc = mcnp_lite_transport_tbr(key, histories=1500, thickness_cm=60.0,
                                 li6_enrichment=0.9,
                                 be_multiplier_fraction=0.9,
                                 reflector_albedo=0.8)
    total_out = float(mc["tbr_mc"]) + float(mc["leakage_rate"])
    assert total_out <= float(mc["multiplication_gain"]) * 1.6 + 0.2


def test_quick_candidate_schema_and_objective():
    cand = quick_candidate(jax.random.PRNGKey(5), 7)
    assert cand["candidate_id"] == 7.0
    assert 4.0 <= cand["major_radius_m"] <= 7.4
    assert 0.78 <= cand["li6_enrichment"] <= 1.0
    expect_obj = (cand["q_proxy"] + 18.0 * (cand["tbr_est"] - 1.05)
                  - 0.45 * abs(cand["q_proxy"] - cand["q_aries_at_proxy"]))
    assert cand["objective"] == pytest.approx(expect_obj, rel=1e-6)


def test_refine_candidate_adds_transport_fields():
    cand = quick_candidate(jax.random.PRNGKey(6), 3)
    refined = refine_candidate_tbr(cand, jax.random.PRNGKey(100))
    for field in ("raw_tbr", "tbr_final", "tbr_mc", "neutron_leakage_rate",
                  "neutron_multiplication_gain"):
        assert field in refined and np.isfinite(refined[field])
    assert refined["tbr_final"] == pytest.approx(
        0.60 * float(mcnp_lite_tbr(
            raw_tbr=refined["raw_tbr"],
            li6_enrichment=refined["li6_enrichment"],
            be_multiplier_fraction=refined["be_multiplier_fraction"],
            reflector_albedo=refined["reflector_albedo"])[0])
        + 0.40 * refined["tbr_mc"], rel=1e-6)
    assert require_fraction("x", 0.5) == 0.5
