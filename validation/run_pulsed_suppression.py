#!/usr/bin/env python
"""Pulsed-compression + turbulence-suppression evidence lanes.

Round-3 breadth campaign.  Lanes (fail-closed):

1. pulsed_compression_energy_budget — voltage-driven FRC compression
   (coil R-L bank + magnetic piston, one scan): the trajectory compresses
   (ratio > 1.3), heats adiabatically, bounces (>= 1 radial turning
   point), and the per-step energy-balance residual stays below 1e-8
   (the reference's flux/energy budget-claim discipline,
   ``pulsed_compression.py:507-545``).
2. pulsed_adiabatic_invariant — with the loss channel off,
   T V^(gamma-1) is conserved along the whole trajectory to 1e-6.
3. turbulence_suppression_performance — the seeded closed loop's
   late-time energy sits below 0.5x the uncontrolled run's, with
   deterministic replay (reference ``run_fno_simulation`` metrics,
   quantified instead of plotted).
4. drive_gradient_sanity — d(min radius)/d(bank voltage) < 0 through
   the full compiled trajectory (the differentiable-drive capability).
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

    from scpn_fusion_tpu.models.physics.pulsed_compression import (
        CompressionConfig,
        initial_state,
        run_voltage_driven_compression,
        trajectory_diagnostics,
    )
    from scpn_fusion_tpu.models.surrogates.turbulence_suppressor import (
        run_suppression_loop,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # ── Lanes 1+2: compression run ──
    cfg = CompressionConfig()
    s0 = initial_state(cfg, radius_m=0.25)

    def drive(t):
        return jnp.asarray(4000.0)

    trace = run_voltage_driven_compression(cfg, s0, drive,
                                           dt_s=2e-8, n_steps=4000)
    diag = trajectory_diagnostics(trace, cfg, 0.25)
    ok1 = (float(diag.compression_ratio) > 1.3
           and int(diag.radial_turning_points) >= 1
           and float(diag.max_balance_residual) < 1e-8
           and bool(np.all(np.isfinite(np.asarray(trace.state.radius_m)))))
    i_min = int(np.argmin(np.asarray(trace.state.radius_m)))
    lanes.append(LaneResult(
        name="pulsed_compression_energy_budget",
        status="pass" if ok1 else "fail",
        metrics={"compression_ratio": float(diag.compression_ratio),
                 "t_i_peak_ev": float(trace.state.t_i_ev[i_min]),
                 "radial_turning_points": int(diag.radial_turning_points),
                 "max_balance_residual": float(diag.max_balance_residual),
                 "peak_b_ext_t": float(jnp.max(trace.b_ext_t))},
        thresholds={"max_balance_residual": 1e-8,
                    "compression_ratio_min": 1.3},
        notes="4000-step voltage-driven compression, energy ledgers "
              "(thermal/work/radiated/ohmic/source) close per step"))

    inv = np.asarray(trace.state.t_i_ev) \
        * (np.pi * np.asarray(trace.state.radius_m) ** 2) ** (cfg.gamma - 1.0)
    inv_dev = float(np.max(np.abs(inv / inv[0] - 1.0)))
    lanes.append(LaneResult(
        name="pulsed_adiabatic_invariant",
        status="pass" if inv_dev < 1e-6 else "fail",
        metrics={"max_rel_invariant_drift": inv_dev},
        thresholds={"max_rel_invariant_drift": 1e-6},
        notes="T V^(gamma-1) conserved with the loss channel off"))

    # ── Lane 3: suppression performance ──
    ctrl = run_suppression_loop(seed=42, n_steps=200, control_on_step=50)
    free = run_suppression_loop(seed=42, n_steps=200,
                                control_on_step=10_000)
    again = run_suppression_loop(seed=42, n_steps=200, control_on_step=50)
    e_ctrl = float(ctrl.mean_energy_last20)
    e_free = float(free.mean_energy_last20)
    ok3 = (e_ctrl < 0.5 * e_free
           and float(again.mean_energy_last20) == e_ctrl)
    lanes.append(LaneResult(
        name="turbulence_suppression_performance",
        status="pass" if ok3 else "fail",
        metrics={"mean_energy_last20_controlled": e_ctrl,
                 "mean_energy_last20_free": e_free,
                 "suppression_ratio": e_ctrl / max(e_free, 1e-30),
                 "deterministic_replay": float(
                     again.mean_energy_last20) == e_ctrl},
        thresholds={"suppression_ratio_max": 0.5},
        notes="seeded closed loop vs never-engaged control at identical "
              "forcing; deterministic replay gated"))

    # ── Lane 4: differentiable drive ──
    def min_radius(v):
        def d(t):
            return v
        tr = run_voltage_driven_compression(cfg, s0, d,
                                            dt_s=2e-8, n_steps=500)
        return jnp.min(tr.state.radius_m)

    g = float(jax.grad(min_radius)(jnp.asarray(3000.0)))
    lanes.append(LaneResult(
        name="drive_gradient_sanity",
        status="pass" if (np.isfinite(g) and g < 0.0) else "fail",
        metrics={"d_min_radius_d_voltage": g},
        thresholds={"gradient_negative": 0.0},
        notes="end-to-end gradient through the compiled trajectory: more "
              "bank voltage -> deeper compression (host-loop reference "
              "cannot provide this)"))

    path = write_report("pulsed_suppression", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
