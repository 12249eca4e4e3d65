#!/usr/bin/env python
"""Headline benchmark: wall-clock to converged GS equilibrium at 513x513.

North-star metric (BASELINE.json): converged Grad-Shafranov solve at 513^2,
compared against the NumPy reference-twin solver running the *same*
Anderson-accelerated multigrid-Picard algorithm on this host — the target is
>= 20x NumPy speed at reference-tolerance accuracy.  ``vs_baseline`` is the
algorithm-MATCHED hardware speedup (both lanes run Anderson-MG); the
algorithm-advantaged figure vs the plain multigrid-Picard twin is reported
on stderr.  Canonical driver-measured figure (round 2, algorithm-advantaged
accounting): 112.2 ms on one TPU chip (BENCH_r02.json).

Prints ONE JSON line:
  {"metric": ..., "value": <jax_ms>, "unit": "ms", "vs_baseline": <speedup>}
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    import jax.numpy as jnp

    from scpn_fusion_tpu.core.config import (
        Coil, Dimensions, PhysicsParams, ReactorConfig, SolverParams,
    )
    from scpn_fusion_tpu.core.grid import Grid
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
    from scpn_fusion_tpu.utils import npref

    n = 513
    coils = (
        Coil(r=3.5, z=4.8, current=-1.0), Coil(r=8.0, z=4.8, current=4.0),
        Coil(r=10.8, z=0.0, current=6.0), Coil(r=8.0, z=-4.8, current=4.0),
        Coil(r=3.5, z=-4.8, current=-1.0), Coil(r=10.8, z=2.5, current=3.0),
    )
    cfg = ReactorConfig(
        reactor_name="bench-513",
        grid_resolution=(n, n),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=coils,
        physics=PhysicsParams(plasma_current_target=15.0, vacuum_permeability=1.0),
        solver=SolverParams(
            # Anderson-accelerated multigrid-Picard: same fixed point as
            # plain multigrid-Picard (span-rel dev ~5e-5 measured) in
            # ~24 outer iterations instead of 176.  alpha=0.8/m=4 tuned
            # on-chip; never slower than plain multigrid in any measured
            # contention window, ~1.7x faster in congested ones.
            max_iterations=600, convergence_threshold=1e-4,
            relaxation_factor=0.8, solver_method="anderson_mg",
            anderson_depth=4,
        ),
    )

    # ── JAX (device) solve: compile once, then time warm runs ──
    # Timing forces a device->host fetch of the full psi map:
    # block_until_ready is NOT a reliable completion barrier over the
    # remote (axon) TPU tunnel (measured: sub-ms "completions" of
    # 100 ms-class programs), and the fetched solution is what a user
    # actually receives.
    res = solve_equilibrium(cfg, dtype=jnp.float32)
    np.asarray(res.psi)
    assert bool(res.converged), "bench solve did not converge"

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = solve_equilibrium(cfg, dtype=jnp.float32)
        np.asarray(res.psi)
        times.append(time.perf_counter() - t0)
    jax_ms = 1e3 * min(times)

    # ── NumPy twin: SAME Anderson-accelerated multigrid-Picard algorithm
    # (relaxation 0.8, depth-4 Anderson over the V-cycle) so vs_baseline is
    # an algorithm-MATCHED hardware speedup (ADVICE r2 medium).  The plain
    # multigrid-Picard twin (alpha=0.1, no Anderson) is also timed and
    # reported on stderr as the algorithm-advantaged figure.
    grid = Grid.from_config(cfg, dtype=np.float64)
    r_1d = np.asarray(grid.R, dtype=np.float64)
    z_1d = np.asarray(grid.Z, dtype=np.float64)
    from scpn_fusion_tpu.models.equilibrium.vacuum import vacuum_psi_from_config
    psi_bc = np.asarray(
        vacuum_psi_from_config(Grid.from_config(cfg, dtype=np.float64), cfg),
        dtype=np.float64)
    t0 = time.perf_counter()
    np_res = npref.solve_equilibrium_np(
        r_1d, z_1d, psi_bc, 15.0, mu0=1.0,
        max_iter=600, tol=1e-4, alpha=0.8, anderson_m=4)
    np_ms = 1e3 * (time.perf_counter() - t0)

    t0 = time.perf_counter()
    np_plain = npref.solve_equilibrium_np(
        r_1d, z_1d, psi_bc, 15.0, mu0=1.0,
        max_iter=600, tol=1e-4, alpha=0.1)
    np_plain_ms = 1e3 * (time.perf_counter() - t0)

    # Accuracy cross-check: span-relative deviation between lanes.
    psi_j = np.asarray(res.psi, dtype=np.float64)
    span = np_res["psi"].max() - np_res["psi"].min()
    span_rel = float(np.max(np.abs(psi_j - np_res["psi"])) / span)

    speedup = np_ms / jax_ms
    out = {
        "metric": "gs_converged_513_wall_ms",
        "value": round(jax_ms, 3),
        "unit": "ms",
        "vs_baseline": round(speedup, 2),
    }
    print(json.dumps(out))
    print(f"# numpy twin (algorithm-matched Anderson-MG): {np_ms:.1f} ms "
          f"(converged={np_res['converged']}, iters={np_res['iterations']}); "
          f"plain multigrid-Picard twin: {np_plain_ms:.1f} ms "
          f"(iters={np_plain['iterations']}, algorithm-advantaged speedup "
          f"{np_plain_ms / jax_ms:.1f}x); jax converged in "
          f"{int(res.iterations)} iters; span-rel deviation {span_rel:.2e}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
