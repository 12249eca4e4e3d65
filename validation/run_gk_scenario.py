#!/usr/bin/env python
"""Gyrokinetics + integrated-scenario validation campaign.

Lanes (fail-closed, blocked != pass):
1. gk_shard_invariance — the 5D nonlinear GK run sharded over the device
   mesh must match the single-device run (the decomposition invariant the
   reference enforces for its rank-tile plans:
   ``test_gk_domain_decomposition`` tile-reductions == monolithic).
2. gk_linear_growth    — ITG-like drive on a linear run must grow.
3. iter_shot_q         — the staged ITER-like shot reaches sustained
   Q >= 5 in H-mode within all operational limits.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def main() -> int:
    # This campaign runs on the 8-virtual-device CPU mesh: the
    # shard-invariance lane needs multiple devices, and the switch must
    # happen BEFORE the first backend initialisation (querying
    # jax.devices() first would pin the platform).
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp  # noqa: F401

    from scpn_fusion_tpu.control.scenario import (
        FluxBudget,
        standard_shot_schedule,
    )
    from scpn_fusion_tpu.models.gyrokinetics.nonlinear import (
        NonlinearGKConfig,
        run_nonlinear_gk,
    )
    from scpn_fusion_tpu.models.physics.integrated_scenario import run_shot
    from scpn_fusion_tpu.parallel.gk_shard import (
        run_nonlinear_gk_sharded,
        velocity_mesh,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # Lane 1: shard invariance
    n_dev = len(jax.devices())
    if n_dev < 2:
        lanes.append(LaneResult(name="gk_shard_invariance",
                                status="blocked", metrics={},
                                thresholds={},
                                notes="single device only"))
    else:
        cfg = NonlinearGKConfig(n_kx=8, n_ky=8, n_theta=8, n_vpar=8,
                                n_mu=8, n_steps=10, save_interval=5,
                                dtype="complex64")
        _, t_ref = run_nonlinear_gk(cfg, seed=7)
        _, t_sh = run_nonlinear_gk_sharded(cfg, velocity_mesh(), seed=7)
        dev = float(np.max(np.abs(np.asarray(t_sh.phi_rms)
                                  - np.asarray(t_ref.phi_rms)))
                    / max(float(np.max(np.abs(t_ref.phi_rms))), 1e-30))
        lanes.append(LaneResult(
            name="gk_shard_invariance",
            status="pass" if dev < 1e-5 else "fail",
            metrics={"rel_deviation": dev, "n_devices": n_dev},
            thresholds={"rel_deviation_max": 1e-5},
            notes="velocity-space GSPMD sharding vs single device"))

    # Lane 2: linear ITG growth
    cfg = NonlinearGKConfig(
        n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=4, n_steps=60,
        save_interval=10, dt=0.05, dtype="complex64", nonlinear=False,
        collisions=False, hyper_coeff=0.0, r_l_ti=9.0, cfl_adapt=False)
    _, trace = run_nonlinear_gk(cfg, amplitude=1e-6, seed=3)
    growth = float(trace.phi_rms[-1]) / max(float(trace.phi_rms[0]), 1e-30)
    lanes.append(LaneResult(
        name="gk_linear_growth",
        status="pass" if (growth > 1.0 and np.isfinite(growth)) else "fail",
        metrics={"amplitude_ratio": growth},
        thresholds={"amplitude_ratio_min": 1.0},
        notes="ITG-like drive, linear electrostatic run"))

    # Lane 3: ITER-like shot
    sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                   flattop_s=300.0, ne_flat_19=10.0,
                                   p_aux_flat_mw=50.0)
    _, report = run_shot(sched, FluxBudget(phi_cs_vs=280.0,
                                           l_plasma_uh=7.0, r0_m=6.2))
    ok = (bool(report.reached_burn) and not bool(report.flux_exhausted)
          and not bool(report.greenwald_violated))
    lanes.append(LaneResult(
        name="iter_shot_q",
        status="pass" if ok else "fail",
        metrics={"q_flattop": float(report.q_flattop),
                 "p_fusion_peak_mw": float(report.p_fusion_peak_mw),
                 "h_mode_duration_s": float(report.h_mode_duration_s)},
        thresholds={"q_flattop_min": 5.0},
        notes="staged density H-mode access, Ejima flux budget"))

    path = write_report("gk_scenario", lanes)
    print(f"wrote {path}")
    return 0 if all(l.status == "pass" for l in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
