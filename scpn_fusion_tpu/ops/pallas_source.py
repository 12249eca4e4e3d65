"""Fused topology + GS-source update as ONE Pallas TPU kernel.

Per outer Picard iteration the solver recomputes magnetic topology
(axis max, divertor-region X-point search) and the Ip-renormalised
current-density source.  As separate XLA ops this is ~0.23 ms of the
~0.55 ms outer iteration at 513² (on-chip slope, 2026-08-18) — a chain
of full-grid passes and argmax/argmin reductions, each a round-trip to
HBM.  This kernel keeps psi VMEM-resident and performs the whole
topology→profiles→normalise→source chain in one dispatch.

Numerics deltas vs the unfused pair (`models/equilibrium/topology.py`
``analyze_topology`` + `models/equilibrium/profiles.py`
``plasma_current_density``; reference semantics
``fusion_kernel.py:255-444``), both at f32 tolerance scale:

* X-point selection is bit-identical: the kernel recovers the FIRST
  row-major minimum-|grad psi| site via exact min-reductions (f32
  min/max are reorder-exact), matching XLA ``argmin`` semantics; both
  paths use ``sqrt(dr^2+dz^2)`` for |grad psi| (see ``topology.py``).
* Sum association order (the Ip-normalisation grid sum inside
  ``plasma_current_density``) follows the VPU tree, not XLA's — f32
  rounding differences only (~1e-7 relative), smooth in psi.

The profile/normalisation maths is the SAME code: the kernel calls
``plasma_current_density`` (pure jnp) inside the Pallas trace.
Parity is pinned by ``tests/test_pallas_source.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpn_fusion_tpu.models.equilibrium.profiles import (
    ProfileCoeffs,
    plasma_current_density,
)
from scpn_fusion_tpu.ops.pallas_stencil import _on_tpu, roll32, x64_safe


def _gradient_axis(p: jnp.ndarray, h: float, axis: int) -> jnp.ndarray:
    """``jnp.gradient`` semantics via rolls: central interior, one-sided
    edges (wrap rows from the rolls are overwritten by the edge cases)."""
    n = p.shape[axis]
    fwd = roll32(p, n - 1, axis)   # p[i+1] (wraps at i = n-1)
    bwd = roll32(p, 1, axis)       # p[i-1] (wraps at i = 0)
    i = jax.lax.broadcasted_iota(jnp.int32, p.shape, axis)
    central = (fwd - bwd) / (2.0 * h)
    lo = (fwd - p) / h
    hi = (p - bwd) / h
    return jnp.where(i == 0, lo, jnp.where(i == n - 1, hi, central))


@x64_safe
def _fused_source_kernel(psi_ref, r_ref, mask_ref, par_ref, src_ref, *,
                         nz: int, nr: int, d_r: float, d_z: float,
                         mu0: float, h_mode: bool):
    psi = psi_ref[:]
    rr = jnp.broadcast_to(r_ref[0, :][None, :], (nz, nr))

    # ── magnetic axis: global max (reference fusion_kernel.py:342-355) ──
    psi_axis = jnp.max(psi)
    psi_axis = jnp.where(jnp.abs(psi_axis) < 1e-6, 1e-6, psi_axis)

    # ── X-point: min |grad psi| in the divertor region ZZ < Z_min/2 ──
    # (mask precomputed outside from the true ZZ grid — ulp-exact)
    dpsi_dz = _gradient_axis(psi, d_z, 0)
    dpsi_dr = _gradient_axis(psi, d_r, 1)
    b_mag = jnp.sqrt(dpsi_dr * dpsi_dr + dpsi_dz * dpsi_dz)

    mask = mask_ref[:] > 0.0
    inf = jnp.asarray(jnp.inf, psi.dtype)
    masked_b = jnp.where(mask, b_mag, inf)
    b_min = jnp.min(masked_b)
    # Flux at the FIRST (row-major) minimum site — exact `argmin`
    # emulation.  f32 min is reorder-exact, so this is bit-identical to
    # the XLA path's `argmin(masked_b)` whatever the VPU reduction tree
    # does; the earlier min-psi-over-ties rule could pick a different
    # site than argmin on degenerate |grad psi| flats, giving the Picard
    # loop two competing psi_b fixed points (129^2 f32 outer-loop flap,
    # 2026-08-19).
    lin = (jax.lax.broadcasted_iota(jnp.int32, psi.shape, 0) * nr
           + jax.lax.broadcasted_iota(jnp.int32, psi.shape, 1))
    idx = jnp.min(jnp.where(masked_b == b_min, lin, nz * nr))
    psi_x = jnp.min(jnp.where(lin == idx, psi, inf))
    # ``any(mask)`` is hoisted out of the kernel (par slot 9): a bool
    # reduction lowers through an f64 squeeze under jax_enable_x64, which
    # Mosaic rejects; the mask is loop-invariant anyway.
    psi_b = jnp.where(par_ref[0, 9] > 0.5, psi_x, jnp.min(psi))

    # Degeneracy guard (reference fusion_kernel_newton_solver.py:505-506).
    psi_b = jnp.where(jnp.abs(psi_axis - psi_b) < 0.1, psi_axis * 0.1, psi_b)

    # ── profiles + Ip renormalisation: the SAME pure-jnp code path ──
    # (SMEM refs only support scalar loads — index each parameter.)
    p_c = ProfileCoeffs(par_ref[0, 0], par_ref[0, 1], par_ref[0, 2],
                        par_ref[0, 3])
    ff_c = ProfileCoeffs(par_ref[0, 4], par_ref[0, 5], par_ref[0, 6],
                         par_ref[0, 7])
    i_target = par_ref[0, 8]
    j_phi = plasma_current_density(
        psi, psi_axis, psi_b, rr,
        h_mode=h_mode, p_coeffs=p_c, ff_coeffs=ff_c,
        mu0=mu0, i_target=i_target, d_r=d_r, d_z=d_z,
    )
    src_ref[:] = -mu0 * rr * j_phi


@functools.partial(
    jax.jit,
    static_argnames=("d_r", "d_z", "mu0", "h_mode", "interpret"))
def fused_topology_source(
    psi: jnp.ndarray,
    r_1d: jnp.ndarray,
    divertor_mask: jnp.ndarray,
    p_coeffs: ProfileCoeffs,
    ff_coeffs: ProfileCoeffs,
    i_target: jnp.ndarray,
    *,
    d_r: float,
    d_z: float,
    mu0: float,
    h_mode: bool,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """GS source ``-mu0 R J_phi`` from psi in one fused kernel.

    Drop-in for ``analyze_topology`` → ``plasma_current_density`` →
    ``source`` inside the Picard body.  ``divertor_mask`` is the
    loop-invariant f32 mask ``(ZZ < Z_min/2)`` computed once outside.
    """
    if interpret is None:
        interpret = not _on_tpu()
    nz, nr = psi.shape
    r_row = r_1d.astype(psi.dtype)[None, :]
    par = jnp.stack([
        p_coeffs.ped_top, p_coeffs.ped_width, p_coeffs.ped_height,
        p_coeffs.core_alpha, ff_coeffs.ped_top, ff_coeffs.ped_width,
        ff_coeffs.ped_height, ff_coeffs.core_alpha,
        jnp.asarray(i_target, psi.dtype),
        jnp.any(divertor_mask > 0).astype(psi.dtype),
    ]).astype(psi.dtype)[None, :]

    kernel = functools.partial(
        _fused_source_kernel, nz=nz, nr=nr, d_r=d_r, d_z=d_z,
        mu0=mu0, h_mode=h_mode)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(psi.shape, psi.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(psi, r_row, divertor_mask.astype(psi.dtype), par)
