"""Fused multigrid sub-cycle as ONE Pallas TPU kernel.

VERDICT r3 stretch #9: the 513² headline V-cycle spends ~20 µs in the six
Pallas smoothing sweeps and ~0.38 ms in the XLA residual/restrict/prolong
ladder — the coarse levels are pure per-op dispatch overhead, not
bandwidth.  This kernel runs the ENTIRE sub-V-cycle from a 2^k+1 entry
level down to the coarsest grid and back — pre-smooth, defect, restrict,
..., coarse solve, ..., prolong, post-smooth — as one ``pallas_call``.

Representation: every level lives EMBEDDED in the entry-level array, its
points at stride ``h = 2^k`` (n = 2^k+1 grids coarsen onto exactly these
points; reference coarsening rule ``multigrid_solve.py:57-335``).
Neighbour access at level k is ``pltpu.roll`` by ``h`` — full-tile VPU
arithmetic, no strided memory ops, no reshapes.  Transfers become 9-point
stencils of rolls:

* restriction  = conv([[1,2,1],[2,4,2],[1,2,1]]/16, shift h), masked to
  the 2h-stride interior (identical to ``ops.multigrid.restrict_full_weight``
  on the active points; the boundary ring injects the zero defect);
* prolongation = conv([[1,2,1],[2,4,2],[1,2,1]]/4,  shift h) of the
  embedded (zero-elsewhere) coarse error — coincident points copy,
  edge-midpoints average 2, centres average 4: exactly
  ``ops.multigrid.prolongate_bilinear`` on the active points.

Numerics match ``ops.multigrid._vcycle_impl`` level-for-level (same
red-black masks in level-LOCAL parity, same sweep counts, same
coefficients); parity is pinned by ``tests/test_pallas_mg.py``.  The one
known deviation mirrors ``pallas_stencil``: no 1e12 numeric clip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpn_fusion_tpu.ops.pallas_stencil import _on_tpu, roll32, x64_safe


def _level_plan(n: int, min_grid: int) -> list[int]:
    """Grid sizes visited by the V-cycle, entry first, coarsest last."""
    ns = [n]
    while min_grid < ns[-1]:
        ns.append((ns[-1] + 1) // 2)
    return ns


@x64_safe
def _fused_vcycle_kernel(psi_ref, src_ref, ae_ref, aw_ref, omega_ref,
                         out_ref, *, nz: int, nr: int, n_levels: int,
                         a_ns: tuple, a_c: tuple, pre: int, post: int,
                         coarse_sweeps: int):
    omega = omega_ref[0, 0]
    psi = psi_ref[:]
    src = src_ref[:]
    iz = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 1)

    def interior_mask(h):
        on_lattice = ((iz % h) == 0) & ((ir % h) == 0)
        return (on_lattice & (iz >= h) & (iz <= nz - 1 - h)
                & (ir >= h) & (ir <= nr - 1 - h))

    def rb_masks(h, dtype):
        interior = interior_mask(h)
        par = ((iz // h) + (ir // h)) % 2   # level-LOCAL checkerboard
        red = (interior & (par == 0)).astype(dtype)
        black = (interior & (par == 1)).astype(dtype)
        return interior, red, black

    def nbr(p, h):
        """(east, west, north, south) at level stride h via rolls."""
        return (roll32(p, nr - h, 1), roll32(p, h, 1),
                roll32(p, nz - h, 0), roll32(p, h, 0))

    def smooth(p, s, k, h, n_sweeps, red, black):
        a_e = ae_ref[k, :][None, :]
        a_w = aw_ref[k, :][None, :]
        inv_ac = 1.0 / a_c[k]

        def half(q, mask):
            q_e, q_w, q_n, q_s = nbr(q, h)
            gs = (a_e * q_e + a_w * q_w + a_ns[k] * (q_n + q_s) - s) * inv_ac
            return q + (mask * omega) * (gs - q)

        def sweep(_, q):
            return half(half(q, red), black)

        return jax.lax.fori_loop(0, n_sweeps, sweep, p)

    def conv9(d, h, w_c, w_edge, w_diag):
        """w_c*d + w_edge*(4 edge rolls) + w_diag*(4 diagonal rolls)."""
        d_e, d_w, d_n, d_s = nbr(d, h)
        d_ne = roll32(d_n, nr - h, 1)
        d_nw = roll32(d_n, h, 1)
        d_se = roll32(d_s, nr - h, 1)
        d_sw = roll32(d_s, h, 1)
        return (w_c * d + w_edge * (d_e + d_w + d_n + d_s)
                + w_diag * (d_ne + d_nw + d_se + d_sw))

    # ── Down sweep ──
    saved = []
    p, s = psi, src
    for k in range(n_levels - 1):
        h = 1 << k
        interior, red, black = rb_masks(h, p.dtype)
        p = smooth(p, s, k, h, pre, red, black)
        # Defect s - L[p] on the level interior (zero elsewhere).
        a_e = ae_ref[k, :][None, :]
        a_w = aw_ref[k, :][None, :]
        p_e, p_w, p_n, p_s = nbr(p, h)
        lap = a_e * p_e + a_w * p_w + a_ns[k] * (p_n + p_s) - a_c[k] * p
        zero = jnp.zeros_like(p)
        defect = jnp.where(interior, s - lap, zero)
        # Full-weighting restriction onto the 2h lattice interior.
        weighted = conv9(defect, h, 4.0 / 16.0, 2.0 / 16.0, 1.0 / 16.0)
        interior_c = interior_mask(2 * h)
        saved.append((p, s, red, black))
        s = jnp.where(interior_c, weighted, zero)
        p = zero

    # ── Coarsest level: "direct" solve by many sweeps ──
    kc = n_levels - 1
    hc = 1 << kc
    _, red_c, black_c = rb_masks(hc, p.dtype)
    p = smooth(p, s, kc, hc, coarse_sweeps, red_c, black_c)

    # ── Up sweep ──
    for k in reversed(range(n_levels - 1)):
        h = 1 << k
        p_f, s_f, red, black = saved[k]
        # Bilinear prolongation of the embedded coarse error.
        corr = conv9(p, h, 1.0, 0.5, 0.25)
        interior = interior_mask(h)
        p = p_f + jnp.where(interior, corr, jnp.zeros_like(p_f))
        p = smooth(p, s_f, k, h, post, red, black)

    out_ref[:] = p


@functools.partial(
    jax.jit,
    static_argnames=("d_r", "d_z", "pre_smooth", "post_smooth", "min_grid",
                     "coarse_sweeps", "interpret"))
def fused_coarse_vcycle(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    *,
    pre_smooth: int = 3,
    post_smooth: int = 3,
    min_grid: int = 5,
    coarse_sweeps: int = 50,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """One full V-cycle on a square 2^k+1 grid as ONE Pallas kernel.

    Drop-in equivalent of ``ops.multigrid.vcycle`` for grids small enough
    to keep every level VMEM-resident (entry ≤ 257² comfortably).  Used by
    ``_vcycle_impl`` as the fused tail of larger cycles.
    """
    nz, nr = psi.shape
    if nz != nr or ((nz - 1) & (nz - 2)) != 0:
        raise ValueError(f"fused V-cycle needs a square 2^k+1 grid; got "
                         f"{psi.shape}")
    if interpret is None:
        interpret = not _on_tpu()

    plan = _level_plan(nz, min_grid)
    n_levels = len(plan)
    dtype = psi.dtype

    # Per-level stencil coefficient rows at the EMBEDDED positions: level k
    # uses columns j*2^k of the fine r row with spacing 2^k * d_r.
    r_safe = jnp.maximum(r_1d.astype(dtype), 1e-10)
    ae_rows, aw_rows, ans_l, ac_l = [], [], [], []
    for k in range(n_levels):
        drk = float(d_r) * (1 << k)
        dzk = float(d_z) * (1 << k)
        inv_dr2 = 1.0 / (drk * drk)
        ae_rows.append(inv_dr2 - 1.0 / (2.0 * r_safe * drk))
        aw_rows.append(inv_dr2 + 1.0 / (2.0 * r_safe * drk))
        ans_l.append(1.0 / (dzk * dzk))
        ac_l.append(2.0 * inv_dr2 + 2.0 / (dzk * dzk))
    ae = jnp.stack(ae_rows)
    aw = jnp.stack(aw_rows)
    omega_arr = jnp.asarray(omega, dtype).reshape(1, 1)

    kernel = functools.partial(
        _fused_vcycle_kernel, nz=nz, nr=nr, n_levels=n_levels,
        a_ns=tuple(ans_l), a_c=tuple(ac_l), pre=pre_smooth,
        post=post_smooth, coarse_sweeps=coarse_sweeps)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(psi.shape, dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(psi, source, ae, aw, omega_arr)


# ── Fine-level wrap kernels (entry levels too large for the fused tail) ──
#
# At 513² the level arrays no longer all fit in VMEM together (the embedded
# representation keeps every saved level at full entry size), so the fused
# tail is capped at 257².  The remaining fine-level cost is NOT the
# smoothing (the ``sor_sweeps_pallas`` sweeps are ~20 µs) but the XLA
# transfer ladder: residual + full-weighting restriction + bilinear
# prolongation measure ~0.22 ms of the ~0.28 ms 513² V-cycle (on-chip slope,
# 2026-08-18).  These two kernels fuse that ladder into the smoothing
# dispatches, so a 513² V-cycle is 3 Pallas calls (pre+restrict, fused
# 257-tail, prolong+post) plus two cheap XLA pad/reshape compaction passes.
#
# Numerics match ``ops.multigrid._vcycle_impl``'s unfused fine level (same
# masks, coefficients, stencils; parity pinned by tests/test_pallas_mg.py).


def _fine_masks(nz: int, nr: int, dtype):
    iz = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 1)
    interior = ((iz >= 1) & (iz <= nz - 2) & (ir >= 1) & (ir <= nr - 2))
    parity = (iz + ir) % 2
    red = (interior & (parity == 0)).astype(dtype)
    black = (interior & (parity == 1)).astype(dtype)
    return interior, red, black


def _nbr1(p, nz, nr):
    return (roll32(p, nr - 1, 1), roll32(p, 1, 1),
            roll32(p, nz - 1, 0), roll32(p, 1, 0))


def _conv9_1(d, nz, nr, w_c, w_edge, w_diag):
    d_e, d_w, d_n, d_s = _nbr1(d, nz, nr)
    d_ne = roll32(d_n, nr - 1, 1)
    d_nw = roll32(d_n, 1, 1)
    d_se = roll32(d_s, nr - 1, 1)
    d_sw = roll32(d_s, 1, 1)
    return (w_c * d + w_edge * (d_e + d_w + d_n + d_s)
            + w_diag * (d_ne + d_nw + d_se + d_sw))


def _rb_smooth(p, src, a_e, a_w, omega, red, black, nz, nr,
               a_ns: float, a_c: float, n_sweeps: int):
    inv_ac = 1.0 / a_c

    def half(q, mask):
        q_e, q_w, q_n, q_s = _nbr1(q, nz, nr)
        gs = (a_e * q_e + a_w * q_w + a_ns * (q_n + q_s) - src) * inv_ac
        return q + (mask * omega) * (gs - q)

    def sweep(_, q):
        return half(half(q, red), black)

    return jax.lax.fori_loop(0, n_sweeps, sweep, p)


@x64_safe
def _fine_pre_kernel(psi_ref, src_ref, ae_ref, aw_ref, omega_ref,
                     psi_out_ref, w_out_ref, *, nz: int, nr: int,
                     a_ns: float, a_c: float, pre: int):
    """Pre-smooth + defect + 9-point full-weighting, one kernel.

    ``w_out`` holds the full-weighted defect still at FINE resolution; the
    caller compacts it onto the coarse lattice with a pad/reshape (strided
    slicing is pathological on TPU — see ``multigrid._downsample_even``).
    """
    psi = psi_ref[:]
    src = src_ref[:]
    a_e = ae_ref[0, :][None, :]
    a_w = aw_ref[0, :][None, :]
    omega = omega_ref[0, 0]
    interior, red, black = _fine_masks(nz, nr, psi.dtype)

    p = _rb_smooth(psi, src, a_e, a_w, omega, red, black, nz, nr,
                   a_ns, a_c, pre)

    p_e, p_w, p_n, p_s = _nbr1(p, nz, nr)
    lap = a_e * p_e + a_w * p_w + a_ns * (p_n + p_s) - a_c * p
    defect = jnp.where(interior, src - lap, jnp.zeros_like(p))
    psi_out_ref[:] = p
    w_out_ref[:] = _conv9_1(defect, nz, nr, 4.0 / 16.0, 2.0 / 16.0, 1.0 / 16.0)


@x64_safe
def _fine_post_kernel(psi_ref, src_ref, e_ref, ae_ref, aw_ref, omega_ref,
                      out_ref, *, nz: int, nr: int,
                      a_ns: float, a_c: float, post: int):
    """Bilinear prolongation of the embedded coarse error + correction +
    post-smooth, one kernel.  ``e_ref`` is the coarse error embedded at
    stride 2 in a fine-size array (zeros elsewhere)."""
    psi = psi_ref[:]
    src = src_ref[:]
    e = e_ref[:]
    a_e = ae_ref[0, :][None, :]
    a_w = aw_ref[0, :][None, :]
    omega = omega_ref[0, 0]
    interior, red, black = _fine_masks(nz, nr, psi.dtype)

    corr = _conv9_1(e, nz, nr, 1.0, 0.5, 0.25)
    p = psi + jnp.where(interior, corr, jnp.zeros_like(psi))
    out_ref[:] = _rb_smooth(p, src, a_e, a_w, omega, red, black, nz, nr,
                            a_ns, a_c, post)


def _fine_coeff_rows(r_1d, d_r: float, d_z: float, dtype):
    r_safe = jnp.maximum(r_1d.astype(dtype), 1e-10)
    inv_dr2 = 1.0 / (d_r * d_r)
    ae = (inv_dr2 - 1.0 / (2.0 * r_safe * d_r))[None, :]
    aw = (inv_dr2 + 1.0 / (2.0 * r_safe * d_r))[None, :]
    a_ns = 1.0 / (d_z * d_z)
    a_c = 2.0 * inv_dr2 + 2.0 / (d_z * d_z)
    return ae, aw, float(a_ns), float(a_c)


@functools.partial(
    jax.jit, static_argnames=("d_r", "d_z", "pre_smooth", "interpret"))
def fine_presmooth_restrict(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    *,
    pre_smooth: int = 3,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused fine-level down-leg: returns ``(psi_smoothed, d_coarse)``.

    Equivalent to ``smooth(pre) -> gs_residual -> restrict_full_weight``
    in ``multigrid._vcycle_impl`` (reference ladder
    ``multigrid_solve.py:57-335``), with the coarse boundary ring zero
    (the restricted defect is zero there).
    """
    if interpret is None:
        interpret = not _on_tpu()
    nz, nr = psi.shape
    nz_c, nr_c = (nz + 1) // 2, (nr + 1) // 2
    ae, aw, a_ns, a_c = _fine_coeff_rows(r_1d, d_r, d_z, psi.dtype)
    omega_arr = jnp.asarray(omega, psi.dtype).reshape(1, 1)

    kernel = functools.partial(
        _fine_pre_kernel, nz=nz, nr=nr, a_ns=a_ns, a_c=a_c, pre=pre_smooth)
    psi_s, w = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(psi.shape, psi.dtype),
                   jax.ShapeDtypeStruct(psi.shape, psi.dtype)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(psi, source, ae, aw, omega_arr)

    from scpn_fusion_tpu.ops.multigrid import downsample_even_mxu
    d_c = downsample_even_mxu(w, nz_c, nr_c)
    # Boundary ring: the restricted defect is exactly zero there (the
    # kernel's wrap-around rolls pollute only the ring).
    iz = jax.lax.broadcasted_iota(jnp.int32, (nz_c, nr_c), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (nz_c, nr_c), 1)
    ring = (iz == 0) | (iz == nz_c - 1) | (ir == 0) | (ir == nr_c - 1)
    d_c = jnp.where(ring, jnp.zeros_like(d_c), d_c)
    return psi_s, d_c


@functools.partial(
    jax.jit, static_argnames=("d_r", "d_z", "post_smooth", "interpret"))
def fine_prolong_smooth(
    psi_s: jnp.ndarray,
    source: jnp.ndarray,
    e_coarse: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    *,
    post_smooth: int = 3,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused fine-level up-leg: bilinear prolongation + correction +
    post-smooth.  Equivalent to ``psi + prolongate_bilinear(e) -> smooth``.
    """
    if interpret is None:
        interpret = not _on_tpu()
    nz, nr = psi_s.shape
    ae, aw, a_ns, a_c = _fine_coeff_rows(r_1d, d_r, d_z, psi_s.dtype)
    omega_arr = jnp.asarray(omega, psi_s.dtype).reshape(1, 1)

    # Embed the coarse error at stride 2 (zeros on the three odd phases)
    # via exact MXU selection scatter (see multigrid.upsample_even_mxu —
    # the former stack/reshape interleave is a lane relayout that costs
    # real time whenever the error is loop-varying).
    from scpn_fusion_tpu.ops.multigrid import upsample_even_mxu
    e_emb = upsample_even_mxu(e_coarse, nz, nr)

    kernel = functools.partial(
        _fine_post_kernel, nz=nz, nr=nr, a_ns=a_ns, a_c=a_c, post=post_smooth)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(psi_s.shape, psi_s.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(psi_s, source, e_emb, ae, aw, omega_arr)
