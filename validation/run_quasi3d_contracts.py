#!/usr/bin/env python
"""Quasi-3D modeling contracts campaign (reference Task 4).

Mirrors ``/root/reference/validation/task4_quasi_3d_modeling.py:60-180``:
build quasi-3D force-balance observables from paired axisymmetric /
stellarator surfaces, relax the toroidal-poloidal force residual, estimate
the Hall-MHD zonal ratio, derive the SOLPS-surrogate JET heat-flux
reference from the 5 read-only JET G-EQDSK files, couple the divertor
profile through two-fluid + TEMHD cooling, and calibrate the volumetric
TBR against the ASDEX erosion shape curve — then apply the reference's own
production gate thresholds verbatim (:138-146).

Fail-closed: a missing JET fixture blocks (never passes) the lane.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

JET_DIR = Path("/root/reference/validation/reference_data/jet")

# Reference production thresholds (task4_quasi_3d_modeling.py:138-146).
THRESHOLDS = {
    "max_force_balance_rmse_pct": 8.0,
    "max_force_residual_p95_pct": 12.0,
    "min_two_fluid_index": 0.10,
    "min_temhd_cooling_gain_pct": 1.0,
    "max_jet_heat_flux_rmse_pct": 15.0,
    "max_erosion_curve_rmse_pct": 35.0,
    "max_calibrated_tbr": 1.10,
}


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from scpn_fusion_tpu.io.geqdsk import read_geqdsk
    from scpn_fusion_tpu.models.physics.quasi3d import (
        build_divertor_profiles,
        calibrate_tbr_with_erosion,
        geqdsk_profile_stats,
        hall_mhd_zonal_ratio,
        jet_solps_reference_profile,
        quasi_3d_force_balance,
        solve_quasi_3d_force_residual,
    )
    from scpn_fusion_tpu.models.physics.stellarator import StellaratorConfig
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # ── Quasi-3D force balance + residual relaxation ──
    base = StellaratorConfig(n_fp=1, r0=2.95, a=0.95,
                             helical_excursion=0.0, mirror_ratio=0.0)
    stellar = StellaratorConfig(n_fp=4, r0=2.95, a=0.95,
                                helical_excursion=0.057, mirror_ratio=0.04)
    obs = quasi_3d_force_balance(jax.random.PRNGKey(42), base=base,
                                 stellar=stellar, samples=720)
    fb_rmse = float(obs.force_balance_rmse_pct)
    res_mean, res_p95 = solve_quasi_3d_force_residual(
        obs.asymmetry_index, obs.n1_amp, obs.n2_amp,
        poloidal_points=56, toroidal_points=48, iterations=14)
    ok = (fb_rmse <= THRESHOLDS["max_force_balance_rmse_pct"]
          and float(res_p95) <= THRESHOLDS["max_force_residual_p95_pct"])
    lanes.append(LaneResult(
        name="quasi3d_force_balance",
        status="pass" if ok else "fail",
        metrics={
            "force_balance_rmse_pct": fb_rmse,
            "asymmetry_index": float(obs.asymmetry_index),
            "n1_amp": float(obs.n1_amp),
            "n2_amp": float(obs.n2_amp),
            "force_residual_mean_pct": float(res_mean),
            "force_residual_p95_pct": float(res_p95),
        },
        thresholds={k: THRESHOLDS[k] for k in
                    ("max_force_balance_rmse_pct",
                     "max_force_residual_p95_pct")},
        notes="paired axisymmetric/nfp=4 surfaces at rho=0.92; residual "
              "relaxation 14 iters as one scan"))

    # ── JET SOLPS surrogate + divertor coupling ──
    jet_files = sorted(JET_DIR.glob("*.geqdsk"))
    if not jet_files:
        lanes.append(LaneResult(
            name="jet_divertor_coupling", status="blocked",
            notes=f"no JET geqdsk fixtures under {JET_DIR}"))
        lanes.append(LaneResult(
            name="tbr_erosion_calibration", status="blocked",
            notes="blocked on JET lane"))
    else:
        stats = [geqdsk_profile_stats(read_geqdsk(p)) for p in jet_files]
        ref_profile, jet_meta = jet_solps_reference_profile(stats, 48)
        hall = hall_mhd_zonal_ratio(jax.random.PRNGKey(42 + 911),
                                    grid=18, steps=36)
        div = build_divertor_profiles(
            n1_amp=float(obs.n1_amp), n2_amp=float(obs.n2_amp),
            z_n1_amp=float(obs.z_n1_amp),
            zonal_ratio=float(hall["zonal_ratio"]),
            reference_profile_w_m2=ref_profile)
        pred = np.asarray(div["predicted_profile_w_m2"])
        jet_rmse = float(100.0 * np.sqrt(np.mean((pred - ref_profile) ** 2))
                         / max(float(np.mean(np.abs(ref_profile))), 1e-12))
        two_fluid_index = float(
            hall["zonal_ratio"]
            * (1.0 + div["divertor_state"]["hartmann_number"] / 300.0))
        ok = (div["cooling_gain_pct"]
              >= THRESHOLDS["min_temhd_cooling_gain_pct"]
              and jet_rmse <= THRESHOLDS["max_jet_heat_flux_rmse_pct"]
              and two_fluid_index >= THRESHOLDS["min_two_fluid_index"])
        lanes.append(LaneResult(
            name="jet_divertor_coupling",
            status="pass" if ok else "fail",
            metrics={
                "jet_file_count": jet_meta["jet_file_count"],
                "mean_q95": jet_meta["mean_q95"],
                "zonal_ratio": hall["zonal_ratio"],
                "zonal_backend": hall["backend"],
                "cooling_gain_pct": div["cooling_gain_pct"],
                "jet_heat_flux_rmse_pct": jet_rmse,
                "two_fluid_index": two_fluid_index,
                "two_fluid_temp_split_index":
                    div["two_fluid_diag"]["two_fluid_temp_split_index"],
                "hartmann_number":
                    div["divertor_state"]["hartmann_number"],
            },
            thresholds={k: THRESHOLDS[k] for k in
                        ("min_temhd_cooling_gain_pct",
                         "max_jet_heat_flux_rmse_pct",
                         "min_two_fluid_index")},
            notes="SOLPS surrogate from 5 read-only JET g-files; per-point "
                  "vmapped TEMHD columns (reference shares one stabilizer "
                  "across points)"))

        # ── TBR calibration against erosion curve ──
        tbr = calibrate_tbr_with_erosion(
            mean_heat_flux_w_m2=float(np.mean(pred)),
            thickness_cm=260.0, asdex_erosion_ref_mm_year=0.25)
        ok = (tbr["erosion_curve_rmse_pct"]
              <= THRESHOLDS["max_erosion_curve_rmse_pct"]
              and tbr["calibrated_tbr"] <= THRESHOLDS["max_calibrated_tbr"])
        lanes.append(LaneResult(
            name="tbr_erosion_calibration",
            status="pass" if ok else "fail",
            metrics={k: tbr[k] for k in
                     ("estimated_erosion_mm_year", "raw_tbr",
                      "calibration_factor", "calibrated_tbr",
                      "erosion_curve_rmse_pct")},
            thresholds={k: THRESHOLDS[k] for k in
                        ("max_erosion_curve_rmse_pct",
                         "max_calibrated_tbr")},
            notes="volumetric-shell TBR (port 0.80 x streaming 0.85) at "
                  "the reference geometry 6.2/2.0/1.7, 260 cm"))

    path = write_report("quasi3d_contracts", lanes)
    print(f"report: {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    sys.exit(main())
