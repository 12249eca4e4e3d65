"""Distributed (sharded) geometric multigrid + converged mesh equilibrium solve.

Round-2 VERDICT #1 gate: a device mesh must *converge* the headline solve —
residual-gated, not fixed sweeps — with span-rel parity vs single-device and
shard-count invariance.  The sharded V-cycle (`parallel/sharded_mg.py`) runs
Z-slab halo smoothing on the fine level and replicated coarse levels
(SURVEY.md §5.7); the full nonlinear Picard loop (`parallel/sharded_solve.py`)
reuses the single-device program with the elliptic inner solve swapped for the
distributed V-cycle.  Reference counterpart: ``mpi_domain.rs:804``
``distributed_gs_solve`` (tile-local sweeps to convergence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.ops.multigrid import vcycle
from scpn_fusion_tpu.ops.stencil import gs_operator, gs_residual
from scpn_fusion_tpu.parallel.halo import make_z_mesh
from scpn_fusion_tpu.parallel.sharded_mg import sharded_mg_solve, sharded_vcycle
from scpn_fusion_tpu.parallel.sharded_solve import solve_equilibrium_sharded
from tests.test_fixed_boundary import ITER_COILS
from scpn_fusion_tpu.core.config import (
    Dimensions, PhysicsParams, ReactorConfig, SolverParams,
)


def _anderson_cfg(n=65):
    """Headline bench settings (anderson_mg, alpha=0.8, depth 4) at test size."""
    return ReactorConfig(
        reactor_name="sharded-mg-test",
        grid_resolution=(n, n),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=ITER_COILS,
        physics=PhysicsParams(plasma_current_target=15.0,
                              vacuum_permeability=1.0),
        solver=SolverParams(max_iterations=600, convergence_threshold=1e-4,
                            relaxation_factor=0.8, solver_method="anderson_mg",
                            anderson_depth=4, inner_sweeps=1),
    )


def _problem(n=65, dtype=jnp.float64):
    """Manufactured GS* problem with a known exact solution."""
    grid = Grid.from_bounds(n, n, 2.0, 10.0, -4.0, 4.0, dtype=np.float64)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0), dtype)
    src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
    rng = np.random.default_rng(3)
    noise = 0.05 * rng.standard_normal(grid.shape)
    noise[0, :] = noise[-1, :] = 0.0
    noise[:, 0] = noise[:, -1] = 0.0
    psi0 = jnp.asarray(np.asarray(psi_exact) + noise, dtype)
    return grid, psi_exact, src, psi0


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_sharded_vcycle_matches_single_device(n_shards):
    """One distributed V-cycle == one single-device V-cycle (same smoothing
    order via global checkerboard parity, same transfer stencils); 65 rows
    over 2/4/8 shards exercises the non-divisible Z-padding path."""
    grid, _, src, psi0 = _problem(65)
    ref = vcycle(psi0, src, grid.R, grid.dR, grid.dZ)
    mesh = make_z_mesh(n_shards)
    out = sharded_vcycle(
        psi0, src, grid.R, jnp.asarray(1.0, psi0.dtype),
        mesh=mesh, axis="z", d_r=grid.dR, d_z=grid.dZ)
    span = float(jnp.max(jnp.abs(ref)))
    dev = float(jnp.max(jnp.abs(out - ref))) / span
    assert dev < 1e-12, f"{n_shards} shards: V-cycle dev {dev:.3e}"


def test_sharded_vcycle_preserves_dirichlet_boundary():
    grid, _, src, psi0 = _problem(65)
    mesh = make_z_mesh(8)
    out = sharded_vcycle(
        psi0, src, grid.R, jnp.asarray(1.0, psi0.dtype),
        mesh=mesh, axis="z", d_r=grid.dR, d_z=grid.dZ)
    np.testing.assert_array_equal(np.asarray(out[0, :]), np.asarray(psi0[0, :]))
    np.testing.assert_array_equal(np.asarray(out[-1, :]), np.asarray(psi0[-1, :]))
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(psi0[:, 0]))
    np.testing.assert_array_equal(np.asarray(out[:, -1]), np.asarray(psi0[:, -1]))


def test_sharded_mg_solve_converges_to_residual_gate():
    """The distributed linear solve is residual-GATED (the convergent
    counterpart of the reference's ``distributed_gs_solve``), not a fixed
    sweep count — and the reported residual matches an independent
    recomputation."""
    grid, psi_exact, src, psi0 = _problem(65)
    mesh = make_z_mesh(8)
    tol = 1e-9
    psi_f, res, k = sharded_mg_solve(
        psi0, src, grid.R, mesh=mesh, axis="z",
        d_r=grid.dR, d_z=grid.dZ, tol=tol, max_cycles=60)
    assert float(res) < tol
    assert 0 < int(k) < 60
    r = gs_residual(psi_f, src, grid.R, grid.dR, grid.dZ)
    rms = float(jnp.sqrt(jnp.sum(r * r) / ((grid.NZ - 2) * (grid.NR - 2))))
    np.testing.assert_allclose(rms, float(res), rtol=1e-6)
    span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
    err = float(jnp.max(jnp.abs(psi_f - psi_exact))) / span
    assert err < 1e-5, f"solution error vs manufactured exact: {err:.3e}"


@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_equilibrium_converges_with_parity(n_shards):
    """Full nonlinear Anderson-MG-Picard equilibrium solve on a device mesh:
    converges (same dual criterion as single-device) with span-rel parity
    and identical outer-iteration count."""
    cfg = _anderson_cfg(65)
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium

    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium as _se
    ref = _se(cfg, dtype=jnp.float64)
    assert bool(ref.converged)

    mesh = make_z_mesh(n_shards)
    res = solve_equilibrium_sharded(cfg, mesh, dtype=jnp.float64)
    assert bool(res.converged), (
        f"{n_shards}-shard solve did not converge in {int(res.iterations)}")
    assert int(res.iterations) == int(ref.iterations)
    span = float(jnp.max(ref.psi) - jnp.min(ref.psi))
    dev = float(jnp.max(jnp.abs(res.psi - ref.psi))) / span
    assert dev < 1e-10, f"{n_shards} shards: equilibrium dev {dev:.3e}"


def test_sharded_equilibrium_shard_count_invariance():
    """2-shard and 8-shard nonlinear solves agree with each other to
    near machine precision (f64)."""
    cfg = _anderson_cfg(65)
    psi2 = np.asarray(
        solve_equilibrium_sharded(cfg, make_z_mesh(2), dtype=jnp.float64).psi)
    psi8 = np.asarray(
        solve_equilibrium_sharded(cfg, make_z_mesh(8), dtype=jnp.float64).psi)
    span = float(psi2.max() - psi2.min())
    dev = float(np.max(np.abs(psi2 - psi8))) / span
    assert dev < 1e-10, f"2 vs 8 shards: dev {dev:.3e}"


def test_sharded_fmg_cascade_converges_and_matches():
    """Distributed FMG: the nested-iteration ladder converges on the
    8-device mesh and lands on the single-device fixed point."""
    from scpn_fusion_tpu.parallel.sharded_solve import (
        solve_equilibrium_sharded_fmg,
    )

    cfg = _anderson_cfg(129)
    res, info = solve_equilibrium_sharded_fmg(
        cfg, make_z_mesh(8), min_coarse=65, dtype=jnp.float64)
    assert [lv["n"] for lv in info] == [65, 129]
    assert all(lv["converged"] for lv in info)

    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium as _se
    ref = _se(cfg, dtype=jnp.float64)
    span = float(jnp.max(ref.psi) - jnp.min(ref.psi))
    dev = float(jnp.max(jnp.abs(res.psi - ref.psi))) / span
    assert dev < 1e-3, dev
    # Warm fine level must not exceed the cold direct iteration count.
    assert info[-1]["iterations"] <= int(ref.iterations)
