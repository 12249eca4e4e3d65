"""Differentiable predictive forward: exact gradients via the IFT adjoint.

Role-parity with the reference's differentiable free-boundary lane
(``core/jax_free_boundary_predictive.py:625-800``
``solve_predictive_equilibrium_diff``: eager fixed-point forward + an
implicit-function-theorem custom VJP whose backward pass solves the
adjoint linear system, and ``core/jax_equilibrium_solver.py:439-512``
coil-current optimisation / ``axis_sensitivity`` Jacobians).

Design here: a generic :func:`fixed_point_ift` wrapper (Christianson
reverse accumulation — the adjoint equation ``w = v + (dF/dpsi)^T w`` is
itself solved by fixed-point iteration with the SAME contraction map the
forward pass used, so no Jacobian is materialised), plus a concrete
predictive forward ``(coil currents, profile coefficients) -> psi`` whose
iteration map is an under-relaxed SOR step with a smooth (softmax)
axis/boundary flux normalisation.  Memory is O(1) in iteration count —
unlike naive backprop-through-the-loop, which stores every sweep.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.profiles import (
    ProfileCoeffs,
    mtanh_profile,
)
from scpn_fusion_tpu.models.equilibrium.topology import (
    soft_axis_flux,
    soft_x_point_flux,
)
from scpn_fusion_tpu.models.equilibrium.vacuum import (
    coil_response_table,
    vacuum_psi_from_table,
)
from scpn_fusion_tpu.ops.stencil import apply_dirichlet, sor_step

MU0 = 4.0e-7 * jnp.pi


# ---------------------------------------------------------------------------
# Generic IFT fixed point
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def fixed_point_ift(step_fn: Callable, theta, psi0, n_fwd: int,
                    n_bwd: int):
    """psi* = step_fn(theta, psi*) by n_fwd iterations; IFT gradients.

    step_fn must be a contraction near the fixed point.  Gradients w.r.t.
    theta are exact at the fixed point regardless of n_fwd (the adjoint is
    evaluated AT psi*, not along the trajectory).
    """
    def body(_, psi):
        return step_fn(theta, psi)

    return jax.lax.fori_loop(0, n_fwd, body, psi0)


def _fp_fwd(step_fn, theta, psi0, n_fwd, n_bwd):
    psi_star = fixed_point_ift(step_fn, theta, psi0, n_fwd, n_bwd)
    return psi_star, (theta, psi_star)


def _fp_bwd(step_fn, n_fwd, n_bwd, res, v):
    theta, psi_star = res
    _, vjp_both = jax.vjp(step_fn, theta, psi_star)

    def adjoint_iter(_, w):
        # w <- v + (dF/dpsi)^T w
        return jax.tree.map(jnp.add, v, vjp_both(w)[1])

    w = jax.lax.fori_loop(0, n_bwd, adjoint_iter, v)
    grad_theta = vjp_both(w)[0]
    return grad_theta, jax.tree.map(jnp.zeros_like, psi_star)


fixed_point_ift.defvjp(_fp_fwd, _fp_bwd)


# ---------------------------------------------------------------------------
# Concrete predictive forward
# ---------------------------------------------------------------------------

class PredictiveTheta(NamedTuple):
    """Differentiable inputs of the predictive forward."""

    coil_currents: jnp.ndarray    # (n_coils,) effective amp-turns
    p_coeffs: jnp.ndarray         # ProfileCoeffs as a flat (4,) vector
    ip_target: jnp.ndarray        # scalar [A]


class PredictiveModel(NamedTuple):
    """Static per-geometry tables."""

    grid: Grid
    coil_table: jnp.ndarray       # (n_coils, NZ, NR)
    relax: float
    sweeps_per_iter: int
    use_vcycle: bool = False


def build_predictive_model(grid: Grid, coil_r, coil_z, *,
                           relax: float = 0.2,
                           sweeps_per_iter: int = 8,
                           use_vcycle: bool = False) -> PredictiveModel:
    """``use_vcycle`` replaces the ``sweeps_per_iter`` SOR sweeps with one
    multigrid V-cycle per Picard step: a near-exact elliptic inner solve
    makes the outer map's contraction factor ~(1 - relax) instead of
    ~(1 - relax * h^2) — the fixed point (and therefore the IFT adjoint)
    converges in O(10^2) iterations instead of O(10^4), which is what the
    campaign-tolerance FD gate (run_adjoint_fd.py, 3.244e-6 rel) needs."""
    table = coil_response_table(grid, jnp.asarray(coil_r),
                                jnp.asarray(coil_z), float(MU0))
    return PredictiveModel(grid=grid, coil_table=table, relax=relax,
                           sweeps_per_iter=sweeps_per_iter,
                           use_vcycle=use_vcycle)


def _predictive_step(model: PredictiveModel, theta: PredictiveTheta,
                     psi: jnp.ndarray) -> jnp.ndarray:
    """One under-relaxed Picard step of the coil-driven GS problem.

    Smoothness: axis/X-point fluxes use the softmax extractors
    (``jax_o_point.py``/``jax_x_point.py`` analogues) so d(step)/d(theta)
    exists everywhere; the Ip renormalisation keeps the source scale
    anchored to theta.ip_target.
    """
    grid = model.grid
    psi_vac = vacuum_psi_from_table(model.coil_table, theta.coil_currents)

    psi_ax = soft_axis_flux(psi)
    psi_bd = soft_x_point_flux(psi, grid.ZZ, grid.dR, grid.dZ,
                               grid.Z_min)
    span = psi_ax - psi_bd
    psi_n = jnp.clip((psi_ax - psi) / jnp.where(
        jnp.abs(span) > 1e-12, span, 1.0), 0.0, 1.0)

    coeffs = ProfileCoeffs(*[theta.p_coeffs[i] for i in range(4)])
    shape = mtanh_profile(psi_n, coeffs)
    inside = (psi_n < 1.0).astype(psi.dtype)
    j_raw = grid.RR / jnp.mean(grid.RR) * shape * inside
    d_area = grid.dR * grid.dZ
    ip_raw = jnp.sum(j_raw) * d_area
    j_phi = j_raw * theta.ip_target / jnp.where(
        jnp.abs(ip_raw) > 1e-12, ip_raw, 1.0)
    source = -MU0 * grid.RR * j_phi

    # Dirichlet boundary from the coil field; elliptic inner solve.
    psi_new = apply_dirichlet(psi, psi_vac)
    if model.use_vcycle:
        from scpn_fusion_tpu.ops.multigrid import _vcycle_impl
        psi_new = _vcycle_impl(psi_new, source, grid.R, grid.dR, grid.dZ,
                               1.0, 3, 3, 5, 50)
    else:
        for _ in range(model.sweeps_per_iter):
            psi_new = sor_step(psi_new, source, grid.R, grid.dR, grid.dZ,
                               omega=1.5)
    return (1.0 - model.relax) * psi + model.relax * psi_new


def solve_predictive_diff(model: PredictiveModel, theta: PredictiveTheta,
                          *, n_fwd: int = 300,
                          n_bwd: int = 200) -> jnp.ndarray:
    """Differentiable psi(theta) (reference
    ``solve_predictive_equilibrium_diff`` contract)."""
    psi0 = vacuum_psi_from_table(model.coil_table, theta.coil_currents)
    step = partial(_predictive_step, model)
    return fixed_point_ift(step, theta, psi0, n_fwd, n_bwd)


def axis_sensitivity(model: PredictiveModel, theta: PredictiveTheta,
                     **kw) -> PredictiveTheta:
    """d(axis flux)/d(theta) through the converged equilibrium (reference
    ``axis_sensitivity`` ``jax_equilibrium_solver.py:484``)."""
    def loss(th):
        psi = solve_predictive_diff(model, th, **kw)
        return soft_axis_flux(psi)

    return jax.grad(loss)(theta)


def optimize_coil_currents_diff(model: PredictiveModel,
                                theta0: PredictiveTheta,
                                target_axis_flux: jnp.ndarray, *,
                                lr: float = 0.05, n_steps: int = 50,
                                **kw) -> PredictiveTheta:
    """Gradient-descent coil-current trim toward a target axis flux —
    the reference's grad-based ``optimize_coil_currents``
    (``jax_equilibrium_solver.py:439``) on the IFT path."""
    def loss(currents):
        th = theta0._replace(coil_currents=currents)
        psi = solve_predictive_diff(model, th, **kw)
        return (soft_axis_flux(psi) - target_axis_flux) ** 2

    def step(c, _):
        g = jax.grad(loss)(c)
        scale = jnp.maximum(jnp.linalg.norm(g), 1e-12)
        return c - lr * g / scale, None

    currents, _ = jax.lax.scan(step, theta0.coil_currents, None,
                               length=n_steps)
    return theta0._replace(coil_currents=currents)
