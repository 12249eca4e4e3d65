"""Convergent 2D-tile distributed multigrid (VERDICT r3 next #3).

Extends the Z-slab distributed V-cycle (``parallel/sharded_mg.py``) to the
full 2D Cartesian tile decomposition of the reference's MPI layer
(``fusion-core/src/mpi_domain.rs:380-739`` ``CartesianTile`` /
``decompose_2d`` / ``distributed_gs_solve`` :804 with
``optimal_process_grid`` :1009): psi is sharded over a
``Mesh(pz, pr)``; fine-level red-black smoothing and the defect evaluation
run tile-locally with 4 ``ppermute`` halo transfers per half-sweep (one
row/column to each neighbour, nearest-neighbour ICI traffic), and the
coarse hierarchy runs replicated on every tile from one two-axis
``all_gather`` of the fine defect per V-cycle — the same
"distribute the fine level, replicate the coarse levels" design the Z-slab
lane validated (SURVEY §5.7).

Numerics are identical to the single-device ``ops.multigrid.vcycle`` and to
the 1D Z-slab cycle: global checkerboard parity comes from global (row,
col) offsets, so the solve is ITERATION-IDENTICAL across shard grids
(1x8 == 2x4 == 4x2 == single device, up to float reduction order) — the
reference's tile == monolithic invariant, pinned by
``tests/test_sharded_mg2d.py`` and ``validation/run_sharded_convergence.py``.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scpn_fusion_tpu.ops.multigrid import (
    _vcycle_impl,
    prolongate_bilinear,
    restrict_full_weight,
)
from scpn_fusion_tpu.ops.stencil import stencil_coeffs


def _tile_halo_pad(p: jnp.ndarray, az: str, ar: str,
                   pz: int, pr: int) -> jnp.ndarray:
    """Local tile padded with one exchanged halo row/column on each side.

    Edge tiles receive zeros past the global boundary (the boundary ring is
    Dirichlet and never read through the halo): the ppermute has no source
    for them, which yields zeros — exactly the single-device ``jnp.pad``
    semantics of the monolithic stencil ops.
    """
    down = [(i, i + 1) for i in range(pz - 1)]
    up = [(i + 1, i) for i in range(pz - 1)]
    right = [(i, i + 1) for i in range(pr - 1)]
    left = [(i + 1, i) for i in range(pr - 1)]
    top = jax.lax.ppermute(p[-1, :], az, down)
    bot = jax.lax.ppermute(p[0, :], az, up)
    p_z = jnp.concatenate([top[None, :], p, bot[None, :]], axis=0)
    lft = jax.lax.ppermute(p_z[:, -1], ar, right)
    rgt = jax.lax.ppermute(p_z[:, 0], ar, left)
    return jnp.concatenate([lft[:, None], p_z, rgt[:, None]], axis=1)


def _tile_half_sweep(p, src_l, ae_t, aw_t, a_ns, a_c, omega, parity,
                     row_off, col_off, nz_total, nr_total, az, ar, pz, pr):
    """One red-black half-sweep on the local tile (global parity)."""
    pp = _tile_halo_pad(p, az, ar, pz, pr)
    gs = (
        ae_t[None, :] * pp[1:-1, 2:]
        + aw_t[None, :] * pp[1:-1, :-2]
        + a_ns * (pp[:-2, 1:-1] + pp[2:, 1:-1])
        - src_l
    ) / a_c
    lz, lr = p.shape
    iz = jax.lax.broadcasted_iota(jnp.int32, (lz, lr), 0) + row_off
    ir = jax.lax.broadcasted_iota(jnp.int32, (lz, lr), 1) + col_off
    interior = ((iz >= 1) & (iz <= nz_total - 2)
                & (ir >= 1) & (ir <= nr_total - 2))
    par_ok = ((iz + ir) % 2) == parity
    mask = (interior & par_ok).astype(p.dtype)
    return p + mask * omega * (gs - p)


def _tile_defect(p, src_l, ae_t, aw_t, a_ns, a_c,
                 row_off, col_off, nz_total, nr_total, az, ar, pz, pr):
    """Residual r = S - L[psi] on the local tile, zero outside the global
    interior — matches ``ops.stencil.gs_residual``."""
    pp = _tile_halo_pad(p, az, ar, pz, pr)
    lap = (
        ae_t[None, :] * pp[1:-1, 2:]
        + aw_t[None, :] * pp[1:-1, :-2]
        + a_ns * (pp[:-2, 1:-1] + pp[2:, 1:-1])
        - a_c * pp[1:-1, 1:-1]
    )
    res = src_l - lap
    lz, lr = p.shape
    iz = jax.lax.broadcasted_iota(jnp.int32, (lz, lr), 0) + row_off
    ir = jax.lax.broadcasted_iota(jnp.int32, (lz, lr), 1) + col_off
    interior = ((iz >= 1) & (iz <= nz_total - 2)
                & (ir >= 1) & (ir <= nr_total - 2))
    return jnp.where(interior, res, 0.0)


@partial(
    jax.jit,
    static_argnames=("mesh", "d_r", "d_z", "pre_smooth", "post_smooth",
                     "min_grid", "coarse_sweeps"),
)
def sharded_vcycle_2d(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    omega: jnp.ndarray,
    *,
    mesh: Mesh,
    d_r: float,
    d_z: float,
    pre_smooth: int = 3,
    post_smooth: int = 3,
    min_grid: int = 5,
    coarse_sweeps: int = 50,
) -> jnp.ndarray:
    """One distributed V-cycle with the fine level 2D-tiled over ``mesh``.

    ``mesh`` must have exactly two axes (tz, tr); non-divisible grids are
    padded to tile multiples and sliced back on exit.
    """
    az, ar = mesh.axis_names
    pz, pr = mesh.shape[az], mesh.shape[ar]
    nz, nr = psi.shape
    pad_z = (-nz) % pz
    pad_r = (-nr) % pr

    a_e, a_w, a_ns, a_c = stencil_coeffs(r_1d[1:-1], d_r, d_z)
    a_e_f = jnp.zeros((nr + pad_r,), r_1d.dtype).at[1:nr - 1].set(a_e)
    a_w_f = jnp.zeros((nr + pad_r,), r_1d.dtype).at[1:nr - 1].set(a_w)

    psi_p = jnp.pad(psi, ((0, pad_z), (0, pad_r)))
    src_p = jnp.pad(source, ((0, pad_z), (0, pad_r)))

    nz_c = (nz + 1) // 2
    nr_c = (nr + 1) // 2

    def shard_fn(psi_l, src_l, a_e_l, a_w_l, om_l, r_l):
        iz_t = jax.lax.axis_index(az)
        ir_t = jax.lax.axis_index(ar)
        lz, lr = psi_l.shape
        row_off = iz_t * lz
        col_off = ir_t * lr
        ae_t = jax.lax.dynamic_slice(a_e_l, (col_off,), (lr,))
        aw_t = jax.lax.dynamic_slice(a_w_l, (col_off,), (lr,))

        def smooth(p, n_sweeps):
            def one(_, q):
                for parity in (0, 1):
                    q = _tile_half_sweep(
                        q, src_l, ae_t, aw_t, a_ns, a_c, om_l, parity,
                        row_off, col_off, nz, nr, az, ar, pz, pr)
                return q
            return jax.lax.fori_loop(0, n_sweeps, one, p)

        # 1) pre-smooth, tiled
        p = smooth(psi_l, pre_smooth)

        # 2) local defect -> 3) two-axis gather of the full defect
        d_local = _tile_defect(p, src_l, ae_t, aw_t, a_ns, a_c,
                               row_off, col_off, nz, nr, az, ar, pz, pr)
        d_rows = jax.lax.all_gather(d_local, az, tiled=True)        # (nz_p, lr)
        d_full = jax.lax.all_gather(d_rows, ar, tiled=True, axis=1)  # (nz_p, nr_p)
        d_full = d_full[:nz, :nr]

        # 4) replicated coarse solve on the error equation
        d_c = restrict_full_weight(d_full)
        e_c = _vcycle_impl(
            jnp.zeros((nz_c, nr_c), psi_l.dtype), d_c, r_l[::2],
            d_r * 2.0, d_z * 2.0, 1.0, pre_smooth, post_smooth,
            min_grid, coarse_sweeps,
        )

        # 5) prolongate + slice this tile's correction
        corr = prolongate_bilinear(e_c, nz, nr)
        corr = jnp.pad(corr, ((0, pad_z), (0, pad_r)))
        corr_l = jax.lax.dynamic_slice(corr, (row_off, col_off), (lz, lr))
        p = p + corr_l

        # 6) post-smooth, tiled
        return smooth(p, post_smooth)

    spec_grid = P(az, ar)
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_grid, spec_grid, P(), P(), P(), P()),
        out_specs=spec_grid,
    )
    psi_s = jax.device_put(psi_p, NamedSharding(mesh, spec_grid))
    src_s = jax.device_put(src_p, NamedSharding(mesh, spec_grid))
    out = fn(psi_s, src_s, a_e_f, a_w_f, jnp.asarray(omega, psi.dtype), r_1d)
    return out[:nz, :nr]


@partial(jax.jit, static_argnames=("mesh", "d_r", "d_z", "max_cycles"))
def sharded_mg_solve_2d(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    *,
    mesh: Mesh,
    d_r: float,
    d_z: float,
    tol: float | jnp.ndarray = 1e-8,
    max_cycles: int = 50,
):
    """Converged 2D-tile distributed linear solve (residual-gated V-cycles)
    — the convergent counterpart of the reference's ``distributed_gs_solve``
    (``mpi_domain.rs:804-1007``) on its 2D decomposition.  Returns
    ``(psi, res_rms, n_cycles)``."""
    nz, nr = psi.shape
    n_int = (nz - 2) * (nr - 2)
    tol = jnp.asarray(tol, psi.dtype)

    from scpn_fusion_tpu.ops.stencil import gs_residual

    def res_rms(p):
        r = gs_residual(p, source, r_1d, d_r, d_z)
        return jnp.sqrt(jnp.sum(r * r) / n_int)

    def cond(carry):
        _, res, k = carry
        return (k < max_cycles) & (res > tol)

    def body(carry):
        p, _, k = carry
        p = sharded_vcycle_2d(
            p, source, r_1d, jnp.asarray(1.0, p.dtype),
            mesh=mesh, d_r=d_r, d_z=d_z)
        return p, res_rms(p), k + 1

    init = (psi, res_rms(psi), jnp.int32(0))
    return jax.lax.while_loop(cond, body, init)


@lru_cache(maxsize=16)
def _make_elliptic_fn_2d(mesh: Mesh, grid):
    d_r, d_z = float(grid.dR), float(grid.dZ)

    def elliptic(psi, source):
        return sharded_vcycle_2d(
            psi, source, grid.R.astype(psi.dtype),
            jnp.asarray(1.0, psi.dtype),
            mesh=mesh, d_r=d_r, d_z=d_z)

    return elliptic


def solve_equilibrium_sharded_2d(
    cfg,
    mesh: Mesh | None = None,
    *,
    n_devices: int | None = None,
    dtype=jnp.float32,
    psi0: jnp.ndarray | None = None,
    skip_seed: bool = False,
):
    """Full converged GS equilibrium with the elliptic inner solve 2D-tiled.

    Same nonlinear Picard/Anderson loop and result contract as
    ``solve_equilibrium_sharded`` (Z-slab); only the decomposition differs.
    ``mesh`` defaults to the most-square ``optimal_process_grid`` over the
    available devices (``parallel/halo2d.make_2d_mesh``).
    """
    from scpn_fusion_tpu.core.grid import Grid
    from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (
        _solve_fixed_boundary,
    )
    from scpn_fusion_tpu.models.equilibrium.profiles import (
        profile_coeffs_from_physics,
    )
    from scpn_fusion_tpu.models.equilibrium.vacuum import (
        vacuum_psi_from_config,
    )
    from scpn_fusion_tpu.parallel.halo2d import make_2d_mesh

    if mesh is None:
        mesh = make_2d_mesh(n_devices)
    az, ar = mesh.axis_names

    grid = Grid.from_config(cfg, dtype=dtype)
    psi_bc = vacuum_psi_from_config(grid, cfg).astype(dtype)
    p_coeffs, ff_coeffs = profile_coeffs_from_physics(cfg.physics, dtype)
    sol = cfg.solver

    elliptic = _make_elliptic_fn_2d(mesh, grid)

    if psi0 is None:
        psi_init = psi_bc
    else:
        psi_init = psi0.astype(dtype)
        psi_init = psi_init.at[0, :].set(psi_bc[0, :]) \
                           .at[-1, :].set(psi_bc[-1, :]) \
                           .at[:, 0].set(psi_bc[:, 0]) \
                           .at[:, -1].set(psi_bc[:, -1])
    if (grid.NZ % mesh.shape[az] == 0) and (grid.NR % mesh.shape[ar] == 0):
        psi_init = jax.device_put(psi_init, NamedSharding(mesh, P(az, ar)))

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
