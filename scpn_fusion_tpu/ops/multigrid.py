"""Geometric multigrid for the GS* operator, XLA-native.

TPU-first re-design of the reference's recursive NumPy V-cycle
(``core/multigrid_solve.py:57-335``): the level hierarchy is *unrolled at
trace time* (all shapes static), so one ``jit`` of ``vcycle`` compiles the
entire V-cycle — restriction, coarse solves, prolongation, smoothing — into a
single on-device XLA program with no host involvement.  Grid sizes follow the
reference's coarsening rule ``n_c = (n_f + 1) // 2`` (exact for 2^k + 1
grids) and the same full-weighting / bilinear transfer stencils, red-black
Gauss-Seidel smoother (omega = 1.0 by default: over-relaxation smooths
poorly), and sign convention: the coarse-grid right-hand side is
``source - L[psi]`` so the correction is *added*.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.ops.stencil import gs_residual, sor_step


def restrict_full_weight(fine: jnp.ndarray) -> jnp.ndarray:
    """Full-weighting restriction (fine -> coarse, 9-point stencil).

    Boundary rows/columns are injected directly.  Coarse shape is
    ``((nz+1)//2, (nr+1)//2)``.
    """
    nz_f, nr_f = fine.shape
    nz_c, nr_c = (nz_f + 1) // 2, (nr_f + 1) // 2
    interior = (
        4.0 * fine[2:-2:2, 2:-2:2]
        + 2.0 * (fine[1:-3:2, 2:-2:2] + fine[3:-1:2, 2:-2:2]
                 + fine[2:-2:2, 1:-3:2] + fine[2:-2:2, 3:-1:2])
        + (fine[1:-3:2, 1:-3:2] + fine[1:-3:2, 3:-1:2]
           + fine[3:-1:2, 1:-3:2] + fine[3:-1:2, 3:-1:2])
    ) / 16.0
    coarse = jnp.zeros((nz_c, nr_c), dtype=fine.dtype)
    coarse = coarse.at[1:-1, 1:-1].set(interior)
    coarse = coarse.at[0, :].set(fine[0, ::2][:nr_c])
    coarse = coarse.at[-1, :].set(fine[-1, ::2][:nr_c])
    coarse = coarse.at[:, 0].set(fine[::2, 0][:nz_c])
    coarse = coarse.at[:, -1].set(fine[::2, -1][:nz_c])
    return coarse


def prolongate_bilinear(coarse: jnp.ndarray, nz_f: int, nr_f: int) -> jnp.ndarray:
    """Bilinear prolongation (coarse -> fine) for 2^k+1-compatible grids."""
    fine = jnp.zeros((nz_f, nr_f), dtype=coarse.dtype)
    # Coincident points (even rows, even cols)
    fine = fine.at[::2, ::2].set(coarse)
    # Horizontal midpoints (even rows, odd cols)
    fine = fine.at[::2, 1::2].set(0.5 * (coarse[:, :-1] + coarse[:, 1:]))
    # Vertical midpoints (odd rows, even cols)
    fine = fine.at[1::2, ::2].set(0.5 * (coarse[:-1, :] + coarse[1:, :]))
    # Centre points (odd rows, odd cols)
    fine = fine.at[1::2, 1::2].set(
        0.25 * (coarse[:-1, :-1] + coarse[1:, :-1] + coarse[:-1, 1:] + coarse[1:, 1:])
    )
    return fine


def smooth(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega: float,
    n_sweeps: int,
) -> jnp.ndarray:
    """Red-black SOR smoother: ``n_sweeps`` full sweeps, unrolled for XLA fusion."""
    for _ in range(n_sweeps):
        psi = sor_step(psi, source, r_1d, d_r, d_z, omega)
    return psi


def _vcycle_impl(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega: float,
    pre_smooth: int,
    post_smooth: int,
    min_grid: int,
    coarse_sweeps: int,
) -> jnp.ndarray:
    nz, nr = psi.shape
    if min_grid >= nz or min_grid >= nr:
        # Coarsest level: "direct" solve by many smoothing sweeps.
        return smooth(psi, source, r_1d, d_r, d_z, omega, coarse_sweeps)

    psi = smooth(psi, source, r_1d, d_r, d_z, omega, pre_smooth)

    # Coarse-grid RHS: r = source - L[psi]  (the error equation L[e] = r).
    defect = gs_residual(psi, source, r_1d, d_r, d_z)
    d_coarse = restrict_full_weight(defect)
    r_coarse = r_1d[::2]

    e_coarse = _vcycle_impl(
        jnp.zeros_like(d_coarse), d_coarse, r_coarse,
        d_r * 2.0, d_z * 2.0, omega, pre_smooth, post_smooth,
        min_grid, coarse_sweeps,
    )

    psi = psi + prolongate_bilinear(e_coarse, nz, nr)
    return smooth(psi, source, r_1d, d_r, d_z, omega, post_smooth)


@partial(jax.jit, static_argnames=(
    "d_r", "d_z", "omega", "pre_smooth", "post_smooth", "min_grid", "coarse_sweeps"))
def vcycle(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    *,
    omega: float = 1.0,
    pre_smooth: int = 3,
    post_smooth: int = 3,
    min_grid: int = 5,
    coarse_sweeps: int = 50,
) -> jnp.ndarray:
    """One geometric-multigrid V-cycle for ``Delta* psi = source``.

    Dirichlet boundary values of ``psi`` are preserved exactly: smoothing and
    corrections only touch interior points (the correction's boundary ring is
    zero because the defect is zero there).
    """
    return _vcycle_impl(psi, source, r_1d, d_r, d_z, omega,
                        pre_smooth, post_smooth, min_grid, coarse_sweeps)


def mg_solve(
    psi0: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    *,
    n_cycles: int = 20,
    omega: float = 1.0,
    pre_smooth: int = 3,
    post_smooth: int = 3,
    min_grid: int = 5,
) -> jnp.ndarray:
    """Run ``n_cycles`` V-cycles (standalone converged MG solve,
    reference ``multigrid_solve.py:352``)."""
    def body(_, p):
        return _vcycle_impl(p, source, r_1d, d_r, d_z, omega,
                            pre_smooth, post_smooth, min_grid, 50)
    return jax.lax.fori_loop(0, n_cycles, body, psi0)
