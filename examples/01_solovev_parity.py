#!/usr/bin/env python
"""Example 1 — Solov'ev analytic equilibrium: exact-solution parity.

The Solov'ev family has closed-form Grad-Shafranov solutions; the numerical
solver must reproduce them to discretisation order.  This is the framework's
ground-truth accuracy lane (reference counterpart: ``examples/03`` +
``validation/benchmark_vs_freegs.py`` manufactured-source parity).

Run:  python examples/01_solovev_parity.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")     # deterministic f64 accuracy lane
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.core.grid import Grid                       # noqa: E402
from scpn_fusion_tpu.models.equilibrium.solovev import SolovevParams  # noqa: E402
from scpn_fusion_tpu.ops import multigrid as mg                  # noqa: E402
from scpn_fusion_tpu.ops.stencil import apply_dirichlet          # noqa: E402


def main() -> None:
    params = SolovevParams()
    print("Solov'ev parity: Delta* psi = A R^2 + B with exact polynomial psi")
    print(f"  A = {params.source_r2_coeff:+.4f}  B = {params.source_const:+.4f}")

    prev_err = None
    for n in (65, 129, 257):
        grid = Grid.from_bounds(n, n, 3.0, 9.0, -3.0, 3.0, dtype=np.float64)
        psi_exact = params.psi(grid.RR, grid.ZZ)
        src = params.source(grid.RR)
        psi0 = apply_dirichlet(jnp.zeros_like(psi_exact), psi_exact)

        psi = mg.mg_solve(psi0, src, grid.R, grid.dR, grid.dZ, n_cycles=30)
        span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
        err = float(jnp.max(jnp.abs(psi - psi_exact))) / span

        order = f"  (x{prev_err / err:4.1f} vs previous h)" if prev_err else ""
        print(f"  {n:4d}^2: span-rel max error {err:.3e}{order}")
        prev_err = err

    assert prev_err is not None and prev_err < 2e-5, "parity regressed"
    print("OK: second-order convergence to the analytic equilibrium")


if __name__ == "__main__":
    main()
