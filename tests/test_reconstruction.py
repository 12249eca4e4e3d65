"""Tests for the measured-external-source reconstruction lane.

Reference methodology: ``validation/validate_real_diiid_145419.py`` (full-
domain reproduction w/ measured external source, shell pinning) and the
``benchmark_sparc_geqdsk_rmse.py`` 0.05 NRMSE gate.
"""

import os
from pathlib import Path

import numpy as np
import pytest

from scpn_fusion_tpu.io.geqdsk import read_geqdsk
from scpn_fusion_tpu.models.equilibrium import reconstruction as rc

SPARC = Path("/root/reference/validation/reference_data/sparc")

pytestmark = pytest.mark.skipif(
    not SPARC.exists(), reason="reference fixture data not mounted")


@pytest.fixture(scope="module")
def case_1305():
    eq = read_geqdsk(SPARC / "sparc_1305.eqdsk")
    return rc.prepare_case(eq)


def test_prepare_case_flips_to_peaked(case_1305):
    c = case_1305
    assert c.flipped  # SPARC EFIT files store psi ascending
    assert c.psi_axis > c.psi_bnd
    # Axis value is the interior max of the peaked field.
    assert np.isclose(np.max(c.psi[2:-2, 2:-2]), c.psi_axis,
                      atol=0.02 * c.span)


def test_source_convention_snaps_to_2pi(case_1305):
    # sparc_1305 is a documented scaled_by_2pi public file
    # (reference eqdsk.py:45-50 GEQDSK_PUBLIC_SPARC_SOURCE_ADAPTERS).
    assert case_1305.source_convention == "scaled_by_2pi"
    assert abs(case_1305.source_best_fit_scale - 2 * np.pi) < 0.05
    # After the adapter the profiles reproduce the measured Delta*psi.
    assert case_1305.source_best_fit_rel_l2 < 0.01


def test_plasma_mask_is_axis_connected(case_1305):
    c = case_1305
    from scipy import ndimage
    lab, n = ndimage.label(c.plasma)
    assert n == 1  # one connected component
    assert c.plasma.any()
    # Mask excludes the domain boundary ring (coil/vacuum region).
    assert not c.plasma[0, :].any() and not c.plasma[-1, :].any()


def test_reconstruction_hits_reference_gate(case_1305):
    out = rc.reconstruct(case_1305, subcell=1, max_iter=100)
    assert out["final_step"] < 1e-6 * case_1305.span or out["iterations"] < 100
    # The reference's own gate is 0.05 NRMSE; we clear it by >10x.
    assert out["nrmse_range"] < 0.005
    assert out["deep_rms_rel_span"] < 0.01


def test_operator_residual_self_consistency(case_1305):
    op = rc.operator_residual(case_1305)
    # A real EFIT file satisfies our discrete operator at the few-% level
    # deep inside (discretisation error of the file's own solve).
    assert op["deep_rms_rel"] < 0.05


def test_shell_pinning_collapses_error():
    eq = read_geqdsk(SPARC / "sparc_1310.eqdsk")
    full = rc.reconstruct(rc.prepare_case(eq), subcell=1, max_iter=100)
    pinned = rc.reconstruct(rc.prepare_case(eq, model_psin_max=0.95),
                            subcell=1, max_iter=100)
    # Reference finding: the full-domain error is attributable to the
    # pedestal-shell source representation.
    assert pinned["deep_rms_rel_span"] < 0.35 * full["deep_rms_rel_span"]
    assert pinned["deep_rms_rel_span"] < 0.005


def test_cold_start_reaches_same_fixed_point(case_1305):
    warm = rc.reconstruct(case_1305, subcell=1, max_iter=150)
    cold = rc.reconstruct(case_1305, subcell=1, max_iter=150, init="external")
    assert abs(cold["deep_rms_rel_span"] - warm["deep_rms_rel_span"]) < 2e-3
    assert cold["deep_rms_rel_span"] < 0.02


def test_delta_star_matches_stencil_op(case_1305):
    import jax.numpy as jnp

    from scpn_fusion_tpu.ops.stencil import gs_operator

    c = case_1305
    d_r = float(c.r[1] - c.r[0])
    d_z = float(c.z[1] - c.z[0])
    via_jax = np.asarray(gs_operator(
        jnp.asarray(c.psi), jnp.asarray(c.r), d_r, d_z), np.float64)
    # interior agreement (gs_operator may zero the ring too)
    assert np.allclose(via_jax[1:-1, 1:-1], c.lap[1:-1, 1:-1],
                       rtol=1e-10, atol=1e-10 * np.abs(c.lap).max())


# ── Joint p'/FF' re-fit (kinetic-EFIT-style, VERDICT r4 next #3) ──

DIIID = Path("/root/reference/validation/reference_data/diiid")


@pytest.fixture(scope="module")
def case_diiid_raw():
    eq = read_geqdsk(DIIID / "diiid_hmode_2MA.geqdsk")
    return rc.prepare_case(eq)


@pytest.mark.skipif(not DIIID.exists(), reason="fixtures not mounted")
def test_refit_improves_raw_fixture(case_diiid_raw):
    """On a raw (non-self-consistent) DIII-D fixture the joint re-fit must
    cut the strict NRMSE at least 2x vs the fixture's own tables."""
    raw = rc.reconstruct(case_diiid_raw, subcell=1, anderson_m=8,
                         max_iter=150)
    fit = rc.refit_profiles(case_diiid_raw, n_p=4, n_f=4, relax=0.5,
                            n_outer=25)
    assert fit["nrmse_range"] < 0.12
    assert raw["nrmse_range"] / fit["nrmse_range"] >= 2.0


@pytest.mark.skipif(not DIIID.exists(), reason="fixtures not mounted")
def test_refit_ip_constraint_respected(case_diiid_raw):
    """The fitted source must carry the measured plasma current within the
    soft-constraint tolerance (kinetic-EFIT Ip row)."""
    import jax.numpy as jnp

    fit = rc.refit_profiles(case_diiid_raw, n_p=4, n_f=4, relax=0.5,
                            n_outer=25)
    c = case_diiid_raw
    rr = np.broadcast_to(c.r[None, :], c.psi.shape)
    psin = np.clip((fit["psi_fit"] - c.psi_axis)
                   / (c.psi_bnd - c.psi_axis), 0.0, 1.0)
    support = 1.0 / (1.0 + np.exp(-(1.0 - psin) / 0.03))
    xg = np.linspace(0.0, 1.0, c.pprime.size)
    pp = np.interp(psin, xg, fit["pprime_fit"])
    ff = np.interp(psin, xg, fit["ffprime_fit"])
    s = -(rc.MU0 * rr**2 * pp + ff) * support
    d_r = float(c.r[1] - c.r[0])
    d_z = float(c.z[1] - c.z[0])
    ip_fit = float(np.sum(np.where(c.model_region,
                                   -s / (rc.MU0 * rr), 0.0)) * d_r * d_z)
    assert abs(ip_fit - c.ip_model) / abs(c.ip_model) < 0.02


@pytest.mark.skipif(not DIIID.exists(), reason="fixtures not mounted")
def test_nonflux_decomposition_flags_bad_fixture(case_diiid_raw):
    """The model-free per-bin fit must expose the fixture's structural
    non-GS content (>0.3), and the source-optimal flux-error reference
    point must be computable and worse than the refit's flux-space fit."""
    fit = rc.refit_profiles(case_diiid_raw, n_p=4, n_f=4, relax=0.5,
                            n_outer=25)
    assert fit["flux_function_floor_rel_l2_deep"] > 0.3
    ref_pt = rc.flux_function_floor_field(case_diiid_raw)
    assert np.isfinite(ref_pt["floor_deep_rms_rel_span"])
    assert fit["deep_rms_rel_span"] < ref_pt["floor_deep_rms_rel_span"]


def test_refit_recovers_consistent_fixture(case_1305):
    """On a GS-SELF-CONSISTENT file (SPARC) the dual criterion's first
    branch must be reachable: the re-fit lands at/below the reference's
    own 0.05 NRMSE gate — proof the 0.12 raw-fixture gate reflects the
    data, not the method."""
    fit = rc.refit_profiles(case_1305, n_p=4, n_f=4, relax=0.5, n_outer=15)
    assert fit["nrmse_range"] < 0.05
    assert fit["flux_function_floor_rel_l2_deep"] < 0.3
