"""Convergent 2D-tile distributed multigrid (VERDICT r3 next #3).

Pins the reference's tile == monolithic invariant on the 2D Cartesian
decomposition (``mpi_domain.rs:380-739,804,1009``): V-cycle parity vs the
single-device cycle across shard grids (1x8, 2x4, 4x2, 8x1), residual-gated
convergence of the distributed linear solve, and the full 2D-tiled
equilibrium solve agreeing with the single-device solve.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from scpn_fusion_tpu.core.config import (
    Coil,
    Dimensions,
    PhysicsParams,
    ReactorConfig,
    SolverParams,
)
from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
from scpn_fusion_tpu.ops.multigrid import vcycle
from scpn_fusion_tpu.ops.stencil import apply_dirichlet, gs_operator
from scpn_fusion_tpu.parallel.halo2d import make_2d_mesh, optimal_process_grid
from scpn_fusion_tpu.parallel.sharded_mg2d import (
    sharded_mg_solve_2d,
    sharded_vcycle_2d,
    solve_equilibrium_sharded_2d,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

DTYPE = jnp.float32


def _problem(n=65):
    grid = Grid.from_bounds(n, n, 2.0, 10.0, -4.0, 4.0, dtype=np.float32)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0), DTYPE)
    src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
    psi0 = apply_dirichlet(jnp.zeros_like(psi_exact), psi_exact)
    return grid, psi_exact, src, psi0


class TestVcycleParity:
    @pytest.mark.parametrize("shape", [(1, 8), (2, 4), (4, 2), (8, 1)])
    def test_tile_grid_invariance(self, shape):
        """Every tiling must reproduce the single-device V-cycle exactly
        (identical arithmetic; only reduction order may differ)."""
        grid, _, src, psi0 = _problem(65)
        ref = vcycle(psi0, src, grid.R, grid.dR, grid.dZ)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(shape), ("tz", "tr"))
        out = sharded_vcycle_2d(psi0, src, grid.R, jnp.asarray(1.0, DTYPE),
                                mesh=mesh, d_r=grid.dR, d_z=grid.dZ)
        span = float(jnp.max(ref) - jnp.min(ref))
        dev = float(jnp.max(jnp.abs(out - ref))) / span
        assert dev < 5e-6, f"tiling {shape}: dev {dev:.2e}"

    def test_optimal_process_grid(self):
        assert optimal_process_grid(8) == (2, 4)
        assert optimal_process_grid(4) == (2, 2)
        assert optimal_process_grid(6) == (2, 3)
        assert optimal_process_grid(7) == (1, 7)
        assert optimal_process_grid(16) == (4, 4)


class TestConvergedSolve2D:
    def test_residual_gated_linear_solve(self):
        grid, psi_exact, src, psi0 = _problem(65)
        mesh = make_2d_mesh(8)
        p, res, k = sharded_mg_solve_2d(
            psi0, src, grid.R, mesh=mesh, d_r=grid.dR, d_z=grid.dZ,
            tol=1e-4, max_cycles=40)
        assert float(res) < 1e-4
        assert int(k) < 40
        span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
        err = float(jnp.max(jnp.abs(p - psi_exact))) / span
        assert err < 1e-4

    def test_equilibrium_2d_parity_with_single_device(self):
        coils = (Coil(r=3.5, z=4.8, current=-1.0),
                 Coil(r=8.0, z=4.8, current=4.0),
                 Coil(r=10.8, z=0.0, current=6.0),
                 Coil(r=8.0, z=-4.8, current=4.0),
                 Coil(r=3.5, z=-4.8, current=-1.0),
                 Coil(r=10.8, z=2.5, current=3.0))
        cfg = ReactorConfig(
            reactor_name="mg2d-eq", grid_resolution=(65, 65),
            dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
            coils=coils,
            physics=PhysicsParams(plasma_current_target=15.0,
                                  vacuum_permeability=1.0),
            solver=SolverParams(max_iterations=600,
                                convergence_threshold=1e-4,
                                relaxation_factor=0.8,
                                solver_method="anderson_mg",
                                anderson_depth=4))
        res_1 = solve_equilibrium(cfg, dtype=DTYPE)
        mesh = make_2d_mesh(8)
        res_2d = solve_equilibrium_sharded_2d(cfg, mesh, dtype=DTYPE)
        assert bool(res_1.converged) and bool(res_2d.converged)
        psi_1 = np.asarray(res_1.psi, np.float64)
        psi_2 = np.asarray(res_2d.psi, np.float64)
        span = psi_1.max() - psi_1.min()
        dev = float(np.max(np.abs(psi_2 - psi_1))) / span
        assert dev < 1e-4, f"2D-tiled vs single-device span-rel {dev:.2e}"
