#!/usr/bin/env python
"""MIF/FRC + electromagnetic-evidence campaign (round-3 breadth).

Lanes (fail-closed):

1. frc_rigid_rotor_audit — the rigid-rotor state passes its own closure
   identities (force balance, Ampere, flux derivative, constant total
   pressure, field reversal, analytic null at R_s/sqrt(2)) at the 2e-2
   relative gates the reference's validator uses
   (``frc_rigid_rotor_validation.py:27``).
2. frc_tilt_diagnostic — the Steinhauer s parameter matches a dense
   clipped numpy twin to <=1e-6 rel; the Belova-normalised growth rate
   equals C*V_A/(E*R_s) exactly; the stability claim remains fail-closed
   (``tilt_mode_frc.py:287``: stable=False while Table I parity is
   blocked); the compression-trajectory projection follows the
   self-similar s scaling.
3. faraday_recovery_closure — on a really-executed voltage-driven
   compression trace, the FD flux rate closes against -EMF/N at the
   reference's 2e-2 gate, recovered energy is non-negative, and the
   energy-budget gates are EVALUATED (the work sidecars exist), never
   blocked.
4. maxwell_evolution — the source-free spectral Maxwell system holds
   Faraday / Ampere-Maxwell / inductive-E / div-B residuals <= 1e-12
   and total field energy drift <= 1e-11 over 64 steps
   (``gk_maxwell_evolution.py`` gates), with the honest
   ``self_consistent_kinetic_current_supported=False`` claim.
5. heating_neutronics_candidate — the candidate pipeline produces a
   finite scored+refined candidate whose blended TBR is consistent with
   its parts (0.60 projected + 0.40 MC), and the transport MC shows the
   physical thickness trend (thicker blanket -> less leakage).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from scpn_fusion_tpu.models.gyrokinetics.maxwell_evolution import (
        MaxwellEvolutionConfig,
        run_local_maxwell_evolution,
        to_evidence,
    )
    from scpn_fusion_tpu.models.nuclear.heating_neutronics import (
        mcnp_lite_tbr,
        mcnp_lite_transport_tbr,
        quick_candidate,
        refine_candidate_tbr,
    )
    from scpn_fusion_tpu.models.physics.faraday_recovery import (
        recovery_from_compression,
    )
    from scpn_fusion_tpu.models.physics.frc import solve_rigid_rotor
    from scpn_fusion_tpu.models.physics.frc_stability import (
        ATOMIC_MASS_KG,
        BELOVA_MHD_GROWTH_COEFFICIENT,
        DEUTERIUM_MASS_AMU,
        ELEMENTARY_CHARGE_C,
        alfven_speed_m_s,
        s_parameter,
        tilt_mode_report,
        tilt_mode_stable,
        tilt_trajectory_from_compression,
        validate_rigid_rotor,
    )
    from scpn_fusion_tpu.models.physics.pulsed_compression import (
        CoilGeometry,
        CompressionConfig,
        initial_state,
        run_voltage_driven_compression,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes: list[LaneResult] = []

    # ── Lane 1: rigid-rotor closure audit ──
    eq = solve_rigid_rotor(b_external_t=1.5, separatrix_radius_m=0.3,
                           peak_density_m3=2e20, n_points=512)
    audit = validate_rigid_rotor(eq)
    ok1 = bool(audit.all_passed)
    lanes.append(LaneResult(
        name="frc_rigid_rotor_audit",
        status="pass" if ok1 else "fail",
        metrics={k: (float(v) if v.ndim == 0 and v.dtype != bool
                     else bool(v))
                 for k, v in audit._asdict().items()},
        thresholds={"relative_residual_max": 2e-2},
        notes="closure identities of the Steinhauer rigid rotor at the "
              "reference validator's gates"))

    # ── Lane 2: tilt diagnostic + numpy twin ──
    t_i = 500.0
    rho = np.asarray(eq.rho, np.float64)
    b_z = np.asarray(eq.b_z, np.float64)
    r_s = float(eq.r_s)
    p_th = np.sqrt(2.0 * DEUTERIUM_MASS_AMU * ATOMIC_MASS_KG * t_i
                   * ELEMENTARY_CHARGE_C)
    integrand = rho * ELEMENTARY_CHARGE_C * np.abs(b_z) / p_th
    stop = int(np.searchsorted(rho, r_s, side="right"))
    twin = np.trapezoid(np.append(integrand[:stop],
                                  np.interp(r_s, rho, integrand)),
                        np.append(rho[:stop], r_s)) / r_s
    s_ours = float(s_parameter(eq, t_i))
    s_rel = abs(s_ours - twin) / twin

    rep = tilt_mode_report(eq, t_i, 4.0)
    v_a = float(alfven_speed_m_s(jnp.max(jnp.abs(eq.b_z)),
                                 jnp.max(eq.density)))
    gamma_expect = BELOVA_MHD_GROWTH_COEFFICIENT * v_a / (r_s * 4.0)
    gamma_rel = abs(float(rep.growth_rate_s_inv) - gamma_expect) / gamma_expect
    stable, _ = tilt_mode_stable(eq, t_i, 4.0)

    traj = tilt_trajectory_from_compression(
        eq, t_i, 4.0, t_s=jnp.array([0.0, 1e-6]),
        radius_m=jnp.array([0.3, 0.15]), t_i_ev=jnp.array([500.0, 2000.0]),
        density_m3=jnp.array([2e20, 8e20]), b_ext_t=jnp.array([1.5, 6.0]))
    s_proj = float(traj.s_parameter[1] / traj.s_parameter[0])
    s_proj_expect = (0.15 / 0.3) * (6.0 / 1.5) * np.sqrt(500.0 / 2000.0)
    proj_rel = abs(s_proj - s_proj_expect) / s_proj_expect

    ok2 = (s_rel <= 1e-6 and gamma_rel <= 1e-6 and stable is False
           and proj_rel <= 1e-6)
    lanes.append(LaneResult(
        name="frc_tilt_diagnostic",
        status="pass" if ok2 else "fail",
        metrics={"s_parameter": s_ours, "s_twin_rel_dev": s_rel,
                 "growth_rate_s_inv": float(rep.growth_rate_s_inv),
                 "growth_rate_rel_dev": gamma_rel,
                 "fail_closed_stable_claim": bool(stable),
                 "self_similar_projection_rel_dev": proj_rel},
        thresholds={"rel_dev_max": 1e-6, "stable_must_be": False},
        notes="Steinhauer Eq.27 vs dense clipped numpy twin; Belova "
              "MHD scaling exact; Table-I parity stays fail-closed"))

    # ── Lane 3: Faraday recovery on a real compression trace ──
    coil = CoilGeometry(n_turns=20, l_coil_m=1.0, resistance_ohm=5e-3,
                        inductance_h=2e-6)
    cfg = CompressionConfig(coil=coil, min_radius_m=0.02, gamma=5.0 / 3.0,
                            plasma_mass_kg=2e-5)
    s0 = initial_state(cfg, radius_m=0.3, t_i_ev=100.0, t_e_ev=100.0,
                       density_m3=5e19)
    trace = run_voltage_driven_compression(cfg, s0, (lambda t: 400.0),
                                           n_steps=800, dt_s=1e-7)
    frep = recovery_from_compression(trace, n_turns=8,
                                     coil_resistance_ohm=0.1)
    ok3 = (frep.flux_derivative_closure_passed
           and float(frep.result.recovered_energy_j) >= 0.0
           and frep.budget_claim_status in ("passed", "failed")
           and frep.source_budget_claim_status in ("passed", "failed"))
    lanes.append(LaneResult(
        name="faraday_recovery_closure",
        status="pass" if ok3 else "fail",
        metrics={
            "flux_derivative_residual_linf": float(
                frep.result.flux_derivative_residual_linf),
            "recovered_energy_j": float(frep.result.recovered_energy_j),
            "budget_claim_status": frep.budget_claim_status,
            "source_budget_claim_status": frep.source_budget_claim_status,
            "max_abs_back_emf_v": float(
                jnp.max(jnp.abs(frep.result.back_emf_v)))},
        thresholds={"flux_derivative_tolerance": 2e-2},
        notes="really-executed voltage-driven compression; budget gates "
              "evaluated from the trace's own work sidecars (diagnostic "
              "EMF^2/R load, no circuit back-reaction — same contract as "
              "the reference)"))

    # ── Lane 4: Maxwell evolution residuals ──
    mcfg = MaxwellEvolutionConfig(n_steps=64, dt=2e-13)
    ev = to_evidence(run_local_maxwell_evolution(mcfg), mcfg)
    ok4 = ev["status"] == "accepted_local_source_free_maxwell_evolution"
    lanes.append(LaneResult(
        name="maxwell_evolution",
        status="pass" if ok4 else "fail",
        metrics={k: ev[k] for k in (
            "max_faraday_linf_residual",
            "max_ampere_maxwell_linf_residual",
            "max_inductive_e_parallel_linf_residual",
            "max_magnetic_divergence_linf_residual",
            "max_relative_total_field_energy_drift",
            "self_consistent_kinetic_current_supported", "status")},
        thresholds={"residual_tolerance": mcfg.residual_tolerance,
                    "relative_energy_tolerance":
                        mcfg.relative_energy_tolerance},
        notes="source-free spectral Maxwell contract; kinetic-current "
              "self-consistency honestly not claimed"))

    # ── Lane 5: heating/neutronics candidate pipeline ──
    cand = quick_candidate(jax.random.PRNGKey(11), 0)
    refined = refine_candidate_tbr(cand, jax.random.PRNGKey(111))
    blend_expect = (0.60 * float(mcnp_lite_tbr(
        raw_tbr=refined["raw_tbr"],
        li6_enrichment=refined["li6_enrichment"],
        be_multiplier_fraction=refined["be_multiplier_fraction"],
        reflector_albedo=refined["reflector_albedo"])[0])
        + 0.40 * refined["tbr_mc"])
    blend_rel = abs(refined["tbr_final"] - blend_expect) / blend_expect
    thin = mcnp_lite_transport_tbr(jax.random.PRNGKey(7), histories=2000,
                                   thickness_cm=5.0, li6_enrichment=0.9,
                                   be_multiplier_fraction=0.5,
                                   reflector_albedo=0.3)
    thick = mcnp_lite_transport_tbr(jax.random.PRNGKey(7), histories=2000,
                                    thickness_cm=100.0, li6_enrichment=0.9,
                                    be_multiplier_fraction=0.5,
                                    reflector_albedo=0.3)
    leak_trend = float(thick["leakage_rate"]) < float(thin["leakage_rate"])
    finite = all(np.isfinite(v) for v in refined.values()
                 if isinstance(v, float))
    ok5 = blend_rel <= 1e-6 and leak_trend and finite
    lanes.append(LaneResult(
        name="heating_neutronics_candidate",
        status="pass" if ok5 else "fail",
        metrics={"tbr_final": refined["tbr_final"],
                 "tbr_mc": refined["tbr_mc"],
                 "raw_tbr": refined["raw_tbr"],
                 "blend_rel_dev": blend_rel,
                 "leakage_thin_cm5": float(thin["leakage_rate"]),
                 "leakage_thick_cm100": float(thick["leakage_rate"]),
                 "q_proxy": refined["q_proxy"],
                 "objective": refined["objective"]},
        thresholds={"blend_rel_dev_max": 1e-6,
                    "leakage_trend": "thick < thin"},
        notes="non-analog weight MC (documented estimator redesign); "
              "volumetric blanket raw TBR feeds the projection"))

    path = write_report("mif_frc", lanes)
    print(f"report: {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
