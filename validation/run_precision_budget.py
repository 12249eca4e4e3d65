#!/usr/bin/env python
"""f32-vs-f64 error-budget campaign (VERDICT r1 weak #3 completion).

The TPU lane runs f32 (x64 disabled); the reference's headline parity
numbers are FP64 (BASELINE.md "129^2 FP64", precedent
``validation/benchmark_rung2_fp64.py``).  This campaign quantifies what
f32 costs on this framework's own solves, on CPU where both precisions
are available:

1. fixed_boundary_f32_penalty — the full compiled fixed-boundary GS
   solve (multigrid-Picard) at 129^2 in f32 vs f64: span-relative psi
   deviation, per-precision GS residuals, iteration counts.
2. multigrid_operator_f32_penalty — the raw MG solve on a manufactured
   problem at 257^2: f32-vs-f64 deviation and the achievable residual
   floor per precision (f32 stalls near its epsilon; the gate checks the
   f32 solution still sits inside the discretisation error).

Writes checksummed JSON+MD evidence into validation/reports/.
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

    from scpn_fusion_tpu.core.config import (
        Coil,
        Dimensions,
        PhysicsParams,
        ReactorConfig,
        SolverParams,
    )
    from scpn_fusion_tpu.core.grid import Grid
    from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (
        solve_equilibrium,
    )
    from scpn_fusion_tpu.ops import multigrid as mg
    from scpn_fusion_tpu.ops.stencil import (
        apply_dirichlet,
        gs_operator,
        gs_residual_rms,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # ── Lane 1: full fixed-boundary solve, f32 vs f64 ──
    def cfg_named(name):
        coils = (Coil(r=3.5, z=4.8, current=-1.0),
                 Coil(r=8.0, z=4.8, current=4.0),
                 Coil(r=10.8, z=0.0, current=6.0),
                 Coil(r=8.0, z=-4.8, current=4.0),
                 Coil(r=3.5, z=-4.8, current=-1.0),
                 Coil(r=10.8, z=2.5, current=3.0))
        return ReactorConfig(
            reactor_name=name,
            grid_resolution=(129, 129),
            dimensions=Dimensions(R_min=2.0, R_max=10.0,
                                  Z_min=-4.0, Z_max=4.0),
            coils=coils,
            physics=PhysicsParams(plasma_current_target=15.0,
                                  vacuum_permeability=1.0),
            solver=SolverParams(max_iterations=300,
                                convergence_threshold=1e-6,
                                relaxation_factor=0.1,
                                solver_method="multigrid"))

    results = {}
    for dtype, label in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        res = solve_equilibrium(cfg_named(f"prec-{label}"), dtype=dtype)
        results[label] = res
    psi64 = np.asarray(results["f64"].psi, np.float64)
    psi32 = np.asarray(results["f32"].psi, np.float64)
    span = float(psi64.max() - psi64.min())
    dev = float(np.max(np.abs(psi64 - psi32))) / max(span, 1e-30)
    gate_dev = 5e-4   # f32 penalty must stay in the 1e-4 class
    lanes.append(LaneResult(
        name="fixed_boundary_f32_penalty",
        status="pass" if dev < gate_dev else "fail",
        metrics={
            "span_rel_deviation_f32_vs_f64": dev,
            "iterations_f64": int(results["f64"].iterations),
            "iterations_f32": int(results["f32"].iterations),
            "gs_residual_f64": float(results["f64"].gs_residual),
            "gs_residual_f32": float(results["f32"].gs_residual),
            "grid": "129x129",
        },
        thresholds={"span_rel_deviation_f32_vs_f64": gate_dev},
        notes="full compiled multigrid-Picard solve per precision; the "
              "TPU bench lane is f32, so this number IS the headline "
              "precision penalty"))

    # ── Lane 2: raw MG operator, residual floors per precision ──
    grid = Grid.from_bounds(257, 257, 2.0, 10.0, -4.0, 4.0,
                            dtype=np.float64)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact64 = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0),
                              jnp.float64)
    src64 = gs_operator(psi_exact64, grid.R, grid.dR, grid.dZ)
    floors = {}
    errs = {}
    for dtype, label in ((jnp.float64, "f64"), (jnp.float32, "f32")):
        psi_e = psi_exact64.astype(dtype)
        src = src64.astype(dtype)
        r_1d = grid.R.astype(np.float64) if label == "f64" else \
            grid.R.astype(np.float32)
        psi0 = apply_dirichlet(jnp.zeros_like(psi_e), psi_e)
        out = mg.mg_solve(psi0, src, jnp.asarray(r_1d), grid.dR, grid.dZ,
                          n_cycles=40)
        floors[label] = float(gs_residual_rms(
            out, src, jnp.asarray(r_1d), grid.dR, grid.dZ))
        span_e = float(jnp.max(psi_e) - jnp.min(psi_e))
        errs[label] = float(jnp.max(jnp.abs(out - psi_e))) / span_e
    # The source is the DISCRETE operator applied to the exact field, so
    # each precision converges to its own machine-epsilon floor (f64 ~
    # 1e-14, f32 ~ 1e-5 span-rel) — the error budget is each floor's
    # ABSOLUTE level, not their ratio.  The f32 floor must sit below the
    # accuracy the physics lanes actually need (the SPARC reconstruction
    # gate is 5e-2 NRMSE; the full-solve f32 penalty above is ~1e-5).
    ok = (errs["f32"] < 1e-4) and (errs["f64"] < 1e-10)
    lanes.append(LaneResult(
        name="multigrid_operator_precision_floors",
        status="pass" if ok else "fail",
        metrics={
            "err_vs_exact_f64_span_rel": errs["f64"],
            "err_vs_exact_f32_span_rel": errs["f32"],
            "residual_floor_f64": floors["f64"],
            "residual_floor_f32": floors["f32"],
            "grid": "257x257", "n_cycles": 40,
        },
        thresholds={"err_vs_exact_f32_span_rel": 1e-4,
                    "err_vs_exact_f64_span_rel": 1e-10},
        notes="discrete-exact MG solve: each precision reaches its own "
              "epsilon floor; the f32 floor (~1e-5 span-rel) is 3 orders "
              "below the tightest physics gate, which is the basis for "
              "running the TPU lane in f32"))

    path = write_report("precision_budget", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
