#!/usr/bin/env python
"""Example 2 — G-EQDSK round-trip + magnetics coil reconstruction.

Solves an ITER-like fixed-boundary equilibrium, exports it as a standard
G-EQDSK file, reads it back (round-trip parity), then reconstructs coil
currents from synthetic magnetic probe measurements with the bounded
least-squares magnetics lane (reference counterparts:
``eqdsk.py`` / ``fusion_kernel_free_boundary.py:315-609``).

Run:  python examples/02_geqdsk_reconstruction.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.core.config import (      # noqa: E402
    Coil, Dimensions, PhysicsParams, ReactorConfig, SolverParams,
)
from scpn_fusion_tpu.io.geqdsk import (        # noqa: E402
    geqdsk_from_solution, read_geqdsk, write_geqdsk,
)
from scpn_fusion_tpu.models.equilibrium import solve_equilibrium  # noqa: E402
from scpn_fusion_tpu.models.equilibrium.free_boundary import (    # noqa: E402
    coilset_from_config,
)
from scpn_fusion_tpu.models.equilibrium.shape_control import (    # noqa: E402
    probe_response_matrix, reconstruct_coil_currents,
)

COILS = (
    Coil(r=3.5, z=4.8, current=-1.0), Coil(r=8.0, z=4.8, current=4.0),
    Coil(r=10.8, z=0.0, current=6.0), Coil(r=8.0, z=-4.8, current=4.0),
    Coil(r=3.5, z=-4.8, current=-1.0), Coil(r=10.8, z=2.5, current=3.0),
)


def main() -> None:
    cfg = ReactorConfig(
        reactor_name="example-iter-like",
        grid_resolution=(129, 129),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=COILS,
        physics=PhysicsParams(plasma_current_target=15.0,
                              vacuum_permeability=1.0),
        solver=SolverParams(max_iterations=600, convergence_threshold=1e-4,
                            relaxation_factor=0.8, solver_method="anderson_mg",
                            anderson_depth=4, inner_sweeps=1),
    )
    res = solve_equilibrium(cfg, dtype=jnp.float64)
    assert bool(res.converged)
    print(f"solved: {int(res.iterations)} Picard iterations, "
          f"residual {float(res.residual):.2e}")

    # ── Round-trip through the on-disk format ──
    eq = geqdsk_from_solution(cfg, res)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "example.geqdsk"
        write_geqdsk(eq, path)
        eq2 = read_geqdsk(path)
    rt = float(np.max(np.abs(eq2.psirz - np.asarray(eq.psirz))))
    span = float(np.ptp(np.asarray(eq.psirz)))
    print(f"G-EQDSK round-trip: psi max dev {rt / span:.2e} (span-rel)")
    assert rt / span < 1e-6

    # ── Magnetics reconstruction: recover the coil set from probes ──
    coils = coilset_from_config(cfg, jnp.float64)
    th = np.linspace(0, 2 * np.pi, 13)[:-1]
    flux_pts = jnp.asarray(
        np.stack([6.0 + 2.8 * np.cos(th), 3.2 * np.sin(th)], axis=1))
    resp = probe_response_matrix(coils, flux_points=flux_pts, mu0=1.0)
    measurements = resp @ coils.currents
    rec = reconstruct_coil_currents(
        resp, measurements, jnp.zeros_like(coils.currents),
        tikhonov_alpha=1e-12, n_iter=300)
    err = float(jnp.max(jnp.abs(rec.coil_currents - coils.currents)))
    print("reconstructed coil currents:",
          np.round(np.asarray(rec.coil_currents), 4))
    assert err < 1e-5, f"coil recovery error {err:.2e}"
    print("OK: coil-current recovery from clean magnetics "
          f"(max dev {err:.1e})")


if __name__ == "__main__":
    main()
