#!/usr/bin/env python
"""Divertor heat-exhaust + ballooning second-stability evidence lanes.

Round-3 breadth campaign (VERDICT r2: L7 evidence coverage "partial" —
13 scripts vs the reference's 140).  Lanes (fail-closed):

1. divertor_exhaust_comparison — the reference's compact-pilot headline
   (``core/divertor_thermal_sim.py`` __main__ demo, 80 MW / R=2.1 /
   B_pol=2.5): the unmitigated solid-tungsten target MELTS while the
   lithium vapor shield absorbs >= 95% of the flux and regulates the
   surface below 2000 C; Eich width pinned to the formula value.
2. divertor_operating_window — the TEMHD stability index is monotone in
   flow velocity and partitions the window (stable at low flow at
   reduced P_SOL, unstable at high flow at full P_SOL).
3. ballooning_second_stability — the s-alpha eigenvalue scan resolves a
   closed unstable band (first AND second boundaries) at every scanned
   shear in [0.25, 2], the first boundary is non-decreasing in shear
   (the reference artifact's own self-check
   ``pyrokinetics_alpha_crit.json: alpha_crit_non_decreasing_in_shear``),
   and the bisected marginal alpha at s=1 sits in the reduced-model band
   around the Connor-Hastie-Taylor estimate.
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

    from scpn_fusion_tpu.models.physics.ballooning import (
        marginal_alpha,
        second_stability_scan,
    )
    from scpn_fusion_tpu.models.physics.divertor_lab import (
        W_MELT_C,
        divertor_heat_load,
        flow_velocity_scan,
        lithium_vapor_shield,
        tungsten_monoblock,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # ── Lane 1: exhaust comparison at the reference demo point ──
    load = divertor_heat_load(80.0, 2.1, 2.5, expansion_factor=15.0)
    w = tungsten_monoblock(load.q_target)
    li = lithium_vapor_shield(load.q_target)
    lambda_expected = 0.63e-3 * 2.5 ** (-1.19)
    ok1 = (bool(w.melted)
           and float(li.f_rad) >= 0.95
           and float(li.t_surface_c) < 2000.0
           and abs(float(load.lambda_q_m) - lambda_expected)
           < 1e-12 * lambda_expected + 1e-15)
    lanes.append(LaneResult(
        name="divertor_exhaust_comparison",
        status="pass" if ok1 else "fail",
        metrics={"q_target_mw_m2": float(load.q_target) / 1e6,
                 "lambda_q_mm": float(load.lambda_q_m) * 1e3,
                 "w_surface_c": float(w.t_surface_c),
                 "w_melted": bool(w.melted),
                 "li_surface_c": float(li.t_surface_c),
                 "li_shielding_fraction": float(li.f_rad),
                 "w_melting_point_c": W_MELT_C},
        thresholds={"li_shielding_min": 0.95, "li_surface_max_c": 2000.0},
        notes="compact-pilot 80 MW point: solid W fails, Li vapor shield "
              "self-consistently regulates (reference divertor demo)"))

    # ── Lane 2: operating window ──
    v = jnp.asarray([0.5, 2.0, 8.0, 20.0])
    full = flow_velocity_scan(v, 80.0, 2.1, 2.5)
    reduced = flow_velocity_scan(v, 20.0, 2.1, 2.5)
    idx_full = np.asarray(full.stability_index)
    idx_red = np.asarray(reduced.stability_index)
    ok2 = (bool(np.all(np.diff(idx_full) > 0.0))
           and bool(idx_red[0] <= 1.0)
           and bool(idx_full[-1] > 1.0))
    lanes.append(LaneResult(
        name="divertor_operating_window",
        status="pass" if ok2 else "fail",
        metrics={"stability_index_full_power": [round(float(x), 3)
                                                for x in idx_full],
                 "stability_index_reduced_power": [round(float(x), 3)
                                                   for x in idx_red]},
        thresholds={"stable_index_max": 1.0},
        notes="TEMHD index monotone in channel flow speed; stable window "
              "exists at reduced P_SOL, closes at full power + fast flow"))

    # ── Lane 3: ballooning second stability ──
    s_vals = jnp.linspace(0.25, 2.0, 8)
    scan = second_stability_scan(s_vals, alpha_max=5.0, n_alpha=48)
    a1 = np.asarray(scan.alpha_crit_first)
    a2 = np.asarray(scan.alpha_crit_second)
    access = np.asarray(scan.second_access)
    a_marg = float(marginal_alpha(1.0, alpha_hi=2.0))
    cht = 0.5   # s(1 - s/2) at s = 1
    ok3 = (access.all()
           and (a2 > a1).all()
           and (np.diff(a1) >= -1e-12).all()
           and 0.45 < a_marg < 0.75)
    lanes.append(LaneResult(
        name="ballooning_second_stability",
        status="pass" if ok3 else "fail",
        metrics={"alpha_first_range": [float(a1.min()), float(a1.max())],
                 "alpha_second_range": [float(a2.min()), float(a2.max())],
                 "second_access_all": bool(access.all()),
                 "marginal_alpha_s1": a_marg,
                 "cht_estimate_s1": cht},
        thresholds={"marginal_alpha_band": [0.45, 0.75]},
        notes="eigenvalue scan resolves closed unstable bands with "
              "second-stability access at every shear; first boundary "
              "non-decreasing (reference artifact self-check)"))

    path = write_report("divertor_ballooning", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
