#!/usr/bin/env python
"""Multi-machine validation campaign (5 machines, real solver slices).

Counterpart of the reference's ``validation/multi_machine_validation.py``
(machine-profile collection -> equilibrium / transport / diagnostics
metrics).  The reference's campaign is a randomized smoke surface; this
one runs the repo's REAL machinery per machine: a fixed-boundary GS
solve on machine-scaled geometry, IPB98(y,2) confinement, and a
forward-diagnostics inverse-consistency check.  Machine parameters are
public device values (ITER / SPARC / DIII-D / JET / MAST-U-like).
Lanes (fail-closed):

1. multi_machine_equilibrium — the 65^2 GS solve CONVERGES on all five
   machine geometries (coil pattern scaled by R0, plasma current set to
   the device Ip), with positive flux span and bounded iterations.
2. multi_machine_confinement — IPB98(y,2) tau_E per machine is finite,
   sits in a broad published-expectation window, and the cross-machine
   ordering (ITER > SPARC > JET > DIII-D > MAST) holds.
3. diagnostics_inverse_consistency — per machine, the line-averaged
   density recovered from the synthetic interferometer phase equals the
   profile's true chord average to < 2%, and the core Thomson channel
   tracks the core density monotonically across machines.

Writes checksummed JSON+MD evidence into validation/reports/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

# name, R0 [m], a [m], Ip [MA], Bt [T], kappa, ne19, P_loss [MW],
# tau_window [s]
MACHINES = [
    ("ITER",   6.20, 2.00, 15.0, 5.30, 1.80, 10.0, 100.0, (2.0, 5.0)),
    ("JET",    2.96, 0.95,  4.0, 3.45, 1.70,  5.0,  20.0, (0.2, 1.2)),
    ("SPARC",  1.85, 0.57,  8.7, 12.2, 1.97, 30.0,  25.0, (0.3, 1.5)),
    ("DIII-D", 1.67, 0.67,  1.5, 2.10, 1.80,  6.0,  10.0, (0.05, 0.4)),
    ("MAST-U", 0.85, 0.65,  1.0, 0.55, 2.45,  3.0,   4.0, (0.01, 0.2)),
]

# ITER-like PF pattern in units of R0 (positions) and Ip (currents) —
# scaled per machine below.
_PF_PATTERN = [
    (0.565, +0.774, -1.0 / 15.0), (1.290, +0.774, 4.0 / 15.0),
    (1.742, 0.0, 6.0 / 15.0), (1.290, -0.774, 4.0 / 15.0),
    (0.565, -0.774, -1.0 / 15.0), (1.742, 0.403, 3.0 / 15.0),
]


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from scpn_fusion_tpu.core.config import (
        Coil,
        Dimensions,
        PhysicsParams,
        ReactorConfig,
        SolverParams,
    )
    from scpn_fusion_tpu.core.grid import Grid
    from scpn_fusion_tpu.models.diagnostics.forward import (
        interferometer_phase_shift,
        thomson_scattering_voltage,
    )
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
    from scpn_fusion_tpu.models.physics.scaling_burn import ipb98y2_tau_e
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    ELECTRON_RADIUS_M = 2.8179403262e-15
    lanes = []

    # ── Lane 1: equilibrium convergence per machine ──
    eq_rows = []
    all_conv = True
    for name, r0, a, ip, bt, kappa, ne19, ploss, window in MACHINES:
        coils = tuple(
            Coil(r=r0 * pr, z=r0 * pz, current=ip * pc,
                 name=f"PF{i+1}")
            for i, (pr, pz, pc) in enumerate(_PF_PATTERN))
        span_r = 0.35 * r0, 1.80 * r0
        span_z = 0.70 * r0
        cfg = ReactorConfig(
            reactor_name=name, grid_resolution=(65, 65),
            dimensions=Dimensions(R_min=span_r[0], R_max=span_r[1],
                                  Z_min=-span_z, Z_max=span_z),
            coils=coils,
            physics=PhysicsParams(plasma_current_target=ip,
                                  vacuum_permeability=1.0,
                                  profile_mode="l-mode"),
            solver=SolverParams(max_iterations=600,
                                convergence_threshold=1e-4,
                                relaxation_factor=0.1,
                                solver_method="multigrid",
                                inner_sweeps=1))
        res = solve_equilibrium(cfg, dtype=jnp.float64)
        span = float(jnp.max(res.psi) - jnp.min(res.psi))
        conv = bool(res.converged)
        all_conv &= conv and span > 0 and int(res.iterations) < 600
        eq_rows.append({"machine": name, "converged": conv,
                        "iterations": int(res.iterations),
                        "psi_span": span})
    lanes.append(LaneResult(
        name="multi_machine_equilibrium",
        status="pass" if all_conv else "fail",
        metrics={"machines": eq_rows},
        thresholds={"max_iterations": 600},
        notes="65^2 multigrid-Picard solve on R0-scaled PF pattern, "
              "device Ip as the current target",
    ))

    # ── Lane 2: confinement scaling across machines ──
    taus = {}
    windows_ok = True
    for name, r0, a, ip, bt, kappa, ne19, ploss, window in MACHINES:
        tau = float(ipb98y2_tau_e(ip, bt, ne19, ploss, r0, kappa, a / r0))
        taus[name] = tau
        windows_ok &= np.isfinite(tau) and window[0] <= tau <= window[1]
    # Physical expectation: SPARC's 12.2 T field buys it more confinement
    # than the larger JET (published SPARC tau_E ~ 0.77 s vs JET ~ 0.5 s).
    order = ["ITER", "SPARC", "JET", "DIII-D", "MAST-U"]
    ordering_ok = all(taus[order[i]] > taus[order[i + 1]]
                      for i in range(len(order) - 1))
    ok2 = windows_ok and ordering_ok
    lanes.append(LaneResult(
        name="multi_machine_confinement",
        status="pass" if ok2 else "fail",
        metrics={"tau_e_s": taus, "ordering": order,
                 "ordering_holds": ordering_ok},
        thresholds={m[0]: list(m[8]) for m in MACHINES},
        notes="IPB98(y,2) at public device parameters; windows are broad "
              "published expectations, ordering is the sharper gate",
    ))

    # ── Lane 3: diagnostics inverse consistency ──
    diag_rows = []
    ok3 = True
    core_voltages = []
    for name, r0, a, ip, bt, kappa, ne19, ploss, window in MACHINES:
        grid = Grid.from_bounds(129, 129, r0 - 1.2 * a, r0 + 1.2 * a,
                                -1.2 * a * kappa, 1.2 * a * kappa,
                                dtype=np.float64)
        rho = jnp.sqrt(((grid.RR - r0) / a) ** 2
                       + (grid.ZZ / (a * kappa)) ** 2)
        ne_map = ne19 * 1e19 * jnp.maximum(1.0 - rho**2, 0.0)
        te_map = 10.0 * jnp.maximum(1.0 - rho**2, 0.0) ** 1.5
        chord = jnp.asarray([[[r0, -1.2 * a * kappa],
                              [r0, 1.2 * a * kappa]]])
        phase = float(interferometer_phase_shift(ne_map, grid, chord,
                                                 samples=513)[0])
        lam = 1.064e-6
        length = 2.0 * 1.2 * a * kappa
        nbar_rec = phase / (ELECTRON_RADIUS_M * lam * length)
        # True chord average of the parabolic profile along the chord.
        z = np.linspace(-1.2 * a * kappa, 1.2 * a * kappa, 4097)
        ne_true = ne19 * 1e19 * np.maximum(
            1.0 - (z / (a * kappa)) ** 2, 0.0)
        nbar_true = float(np.trapezoid(ne_true, z) / length)
        rel = abs(nbar_rec - nbar_true) / nbar_true
        v_core = float(thomson_scattering_voltage(
            ne_map, te_map, grid, jnp.asarray([[r0, 0.0]]))[0])
        core_voltages.append((ne19, v_core))
        ok3 &= rel < 0.02
        diag_rows.append({"machine": name, "phase_rad": phase,
                          "nbar_recovered_m3": nbar_rec,
                          "nbar_true_m3": nbar_true,
                          "rel_err": rel, "thomson_core_v": v_core})
    mono = all(v2 > v1 for (n1, v1), (n2, v2)
               in zip(sorted(core_voltages), sorted(core_voltages)[1:]))
    ok3 &= mono
    lanes.append(LaneResult(
        name="diagnostics_inverse_consistency",
        status="pass" if ok3 else "fail",
        metrics={"machines": diag_rows,
                 "thomson_monotone_in_density": mono},
        thresholds={"nbar_rel_err": 0.02},
        notes="line-averaged density recovered from the interferometer "
              "phase vs the analytic chord average; Thomson core channel "
              "monotone in device density",
    ))

    write_report("multi_machine", lanes)
    return 0 if all(ln.status == "pass" for ln in lanes
                    if ln.status != "blocked") else 1


if __name__ == "__main__":
    sys.exit(main())
