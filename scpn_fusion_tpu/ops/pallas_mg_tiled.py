"""Tiled fused fine-level V-cycle legs for grids above the VMEM budget.

VERDICT r4 next #2: the fused Pallas fine-level wrap (``ops/pallas_mg.py``)
is capped at 513² — psi + source + two outputs at 1025² f32 are ~16.8 MB,
over the ~16 MB VMEM — so 1025²/2049² fell back to the unfused XLA ladder
and the per-point-per-iteration cost regressed 1.85× from 513² to 1025²
(``resolution_scaling.json:on_scaling``).

These kernels run the same two fused legs *tiled over Z-chunks* with a
Pallas grid, so VMEM holds one (chunk + 2·halo, NR) slab at a time while
the pipeline double-buffers the next chunk's blocks:

* down-leg  = pre-smooth (red-black SOR) + defect + 9-point full-weighting,
* up-leg    = bilinear prolongation of the embedded coarse error +
  correction + post-smooth,

identical numerics to the unfused ``ops.multigrid._vcycle_impl`` fine level
(reference ladder ``multigrid_solve.py:57-335``; parity pinned by
``tests/test_pallas_mg_tiled.py``).

Halo contract (overlapping-domain redundant compute)
----------------------------------------------------
Pallas BlockSpecs cannot overlap, so each chunk's halo rows arrive as
SEPARATE operands: the caller pre-slices ``(n_chunks, H, NR)`` top/bottom
halo strips from the padded field (one cheap XLA gather per call) and the
kernel concatenates ``[top, chunk, bottom]`` into a VMEM slab.  All slab
rows inside the *global* interior are updated (redundant compute in the
halo); staleness creeps inward one row per half-sweep from the slab edge,
so with ``H >= 2*n_sweeps + 2`` (down-leg: 2 half-sweeps per red-black
sweep, +1 defect radius, +1 full-weighting radius) the emitted chunk rows
``[H, H+T)`` are exactly the monolithic values.  Red/black parity and the
interior mask are computed from GLOBAL row indices (``chunk_idx*T + row -
H``), so the checkerboard is the global one regardless of tiling.  At the
physical top/bottom edges the Dirichlet boundary row insulates the slab
from the (garbage) out-of-range halo: boundary rows are never updated and
interior updates only ever read them, never the rows beyond.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpn_fusion_tpu.ops.pallas_mg import _fine_coeff_rows
from scpn_fusion_tpu.ops.pallas_stencil import _on_tpu, roll32, x64_safe


def _slab_masks(i_chunk, t_rows: int, halo: int, nz: int, nr: int, dtype):
    """Global interior + red/black masks for the (T+2H, NR) slab of chunk
    ``i_chunk`` (global row of slab row h = i_chunk*T + h - H)."""
    slab = t_rows + 2 * halo
    h = jax.lax.broadcasted_iota(jnp.int32, (slab, nr), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (slab, nr), 1)
    iz = i_chunk * t_rows + h - halo
    interior = ((iz >= 1) & (iz <= nz - 2) & (ir >= 1) & (ir <= nr - 2))
    parity = (iz + ir) % 2
    red = (interior & (parity == 0)).astype(dtype)
    black = (interior & (parity == 1)).astype(dtype)
    return interior, red, black


def _nbr_slab(p, slab: int, nr: int):
    return (roll32(p, nr - 1, 1), roll32(p, 1, 1),
            roll32(p, slab - 1, 0), roll32(p, 1, 0))


def _conv9_slab(d, slab: int, nr: int, w_c, w_edge, w_diag):
    d_e, d_w, d_n, d_s = _nbr_slab(d, slab, nr)
    d_ne = roll32(d_n, nr - 1, 1)
    d_nw = roll32(d_n, 1, 1)
    d_se = roll32(d_s, nr - 1, 1)
    d_sw = roll32(d_s, 1, 1)
    return (w_c * d + w_edge * (d_e + d_w + d_n + d_s)
            + w_diag * (d_ne + d_nw + d_se + d_sw))


def _rb_smooth_slab(p, src, a_e, a_w, omega, red, black, slab, nr,
                    a_ns: float, a_c: float, n_sweeps: int):
    inv_ac = 1.0 / a_c

    def half(q, mask):
        q_e, q_w, q_n, q_s = _nbr_slab(q, slab, nr)
        gs = (a_e * q_e + a_w * q_w + a_ns * (q_n + q_s) - src) * inv_ac
        return q + (mask * omega) * (gs - q)

    def sweep(_, q):
        return half(half(q, red), black)

    return jax.lax.fori_loop(0, n_sweeps, sweep, p)


@x64_safe
def _tiled_pre_kernel(psi_ref, ptop_ref, pbot_ref, src_ref, stop_ref,
                      sbot_ref, ae_ref, aw_ref, omega_ref,
                      psi_out_ref, w_out_ref, *, t_rows: int, halo: int,
                      nz: int, nr: int, a_ns: float, a_c: float, pre: int):
    i = pl.program_id(0)
    slab = t_rows + 2 * halo
    psi = jnp.concatenate([ptop_ref[0], psi_ref[:], pbot_ref[0]], axis=0)
    src = jnp.concatenate([stop_ref[0], src_ref[:], sbot_ref[0]], axis=0)
    a_e = ae_ref[0, :][None, :]
    a_w = aw_ref[0, :][None, :]
    omega = omega_ref[0, 0]
    interior, red, black = _slab_masks(i, t_rows, halo, nz, nr, psi.dtype)

    p = _rb_smooth_slab(psi, src, a_e, a_w, omega, red, black, slab, nr,
                        a_ns, a_c, pre)

    p_e, p_w, p_n, p_s = _nbr_slab(p, slab, nr)
    lap = a_e * p_e + a_w * p_w + a_ns * (p_n + p_s) - a_c * p
    defect = jnp.where(interior, src - lap, jnp.zeros_like(p))
    w = _conv9_slab(defect, slab, nr, 4.0 / 16.0, 2.0 / 16.0, 1.0 / 16.0)

    psi_out_ref[:] = p[halo:halo + t_rows, :]
    w_out_ref[:] = w[halo:halo + t_rows, :]


@x64_safe
def _tiled_post_kernel(psi_ref, ptop_ref, pbot_ref, src_ref, stop_ref,
                       sbot_ref, e_ref, etop_ref, ebot_ref, ae_ref, aw_ref,
                       omega_ref, out_ref, *, t_rows: int, halo: int,
                       nz: int, nr: int, a_ns: float, a_c: float, post: int):
    i = pl.program_id(0)
    slab = t_rows + 2 * halo
    psi = jnp.concatenate([ptop_ref[0], psi_ref[:], pbot_ref[0]], axis=0)
    src = jnp.concatenate([stop_ref[0], src_ref[:], sbot_ref[0]], axis=0)
    e = jnp.concatenate([etop_ref[0], e_ref[:], ebot_ref[0]], axis=0)
    a_e = ae_ref[0, :][None, :]
    a_w = aw_ref[0, :][None, :]
    omega = omega_ref[0, 0]
    interior, red, black = _slab_masks(i, t_rows, halo, nz, nr, psi.dtype)

    corr = _conv9_slab(e, slab, nr, 1.0, 0.5, 0.25)
    p = psi + jnp.where(interior, corr, jnp.zeros_like(psi))
    p = _rb_smooth_slab(p, src, a_e, a_w, omega, red, black, slab, nr,
                        a_ns, a_c, post)
    out_ref[:] = p[halo:halo + t_rows, :]


def _chunk_plan(nz: int, t_rows: int) -> int:
    return -(-nz // t_rows)  # cdiv


def _default_t_rows(nr: int) -> int:
    """Chunk height scaled so one slab row-block stays ~0.5 MB: VMEM per
    grid step is dominated by the (t_rows + 2H, NR) slab temporaries of
    the red-black sweeps plus the pipeline's double-buffered body blocks;
    128 rows fit at 1025 lanes but OOM at 2049 (measured 17.03M > 16M,
    2026-08-20), so halve with width: 128 @ <=1152, 64 @ <=2304, 32 above.
    """
    t = 128
    while t > 32 and t * nr * 4 > 600_000:
        t //= 2
    return t


def _pad_and_strips(x: jnp.ndarray, n_chunks: int, t_rows: int, halo: int):
    """Zero-pad to ``n_chunks*t_rows`` rows and pre-slice the per-chunk
    (n_chunks, H, NR) top/bottom halo strips (one XLA gather each)."""
    nz, nr = x.shape
    nz_p = n_chunks * t_rows
    xp = jnp.pad(x, ((halo, nz_p - nz + halo), (0, 0)))
    top = jnp.stack([xp[k * t_rows: k * t_rows + halo, :]
                     for k in range(n_chunks)])
    bot = jnp.stack([xp[(k + 1) * t_rows + halo:
                        (k + 1) * t_rows + 2 * halo, :]
                     for k in range(n_chunks)])
    body = xp[halo:halo + nz_p, :]
    return body, top, bot


def _chunk_specs(t_rows: int, halo: int, nr: int):
    body = pl.BlockSpec((t_rows, nr), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    strip = pl.BlockSpec((1, halo, nr), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return body, strip


@functools.partial(
    jax.jit, static_argnames=("d_r", "d_z", "pre_smooth", "t_rows",
                              "interpret"))
def tiled_presmooth_restrict(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    *,
    pre_smooth: int = 3,
    t_rows: int | None = None,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tiled fused fine-level down-leg: ``(psi_smoothed, d_coarse)``.

    Drop-in equivalent of ``pallas_mg.fine_presmooth_restrict`` for grids
    whose whole-array slabs exceed VMEM (1025², 2049²): pre-smooth +
    defect + full-weighting in ONE pallas_call over Z-chunks.
    """
    if interpret is None:
        interpret = not _on_tpu()
    nz, nr = psi.shape
    if t_rows is None:
        t_rows = _default_t_rows(nr)
    halo = 2 * pre_smooth + 2
    n_chunks = _chunk_plan(nz, t_rows)
    nz_c, nr_c = (nz + 1) // 2, (nr + 1) // 2
    ae, aw, a_ns, a_c = _fine_coeff_rows(r_1d, d_r, d_z, psi.dtype)
    omega_arr = jnp.asarray(omega, psi.dtype).reshape(1, 1)

    p_body, p_top, p_bot = _pad_and_strips(psi, n_chunks, t_rows, halo)
    s_body, s_top, s_bot = _pad_and_strips(source, n_chunks, t_rows, halo)
    body, strip = _chunk_specs(t_rows, halo, nr)
    rep = pl.BlockSpec((1, nr), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _tiled_pre_kernel, t_rows=t_rows, halo=halo, nz=nz, nr=nr,
        a_ns=a_ns, a_c=a_c, pre=pre_smooth)
    # Build + call under x64-disabled tracing: the grid index_maps'
    # integer literals must stay i32 or Mosaic rejects the (i32, i64)
    # block-index tuple when the HOST program runs under jax_enable_x64
    # (mixed-precision 2049²/4097² lanes; same contract as @x64_safe).
    with jax.enable_x64(False):
        psi_s, w = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=(jax.ShapeDtypeStruct((n_chunks * t_rows, nr),
                                            psi.dtype),
                       jax.ShapeDtypeStruct((n_chunks * t_rows, nr),
                                            psi.dtype)),
            in_specs=[body, strip, strip, body, strip, strip, rep, rep, sm],
            out_specs=(body, body),
            interpret=interpret,
        )(p_body, p_top, p_bot, s_body, s_top, s_bot, ae, aw, omega_arr)
    psi_s = psi_s[:nz, :]
    w = w[:nz, :]

    from scpn_fusion_tpu.ops.multigrid import downsample_even_mxu
    d_c = downsample_even_mxu(w, nz_c, nr_c)
    # Boundary ring of the restricted defect is exactly zero (the kernel's
    # wrap-around rolls pollute only the ring).
    iz = jax.lax.broadcasted_iota(jnp.int32, (nz_c, nr_c), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (nz_c, nr_c), 1)
    ring = (iz == 0) | (iz == nz_c - 1) | (ir == 0) | (ir == nr_c - 1)
    d_c = jnp.where(ring, jnp.zeros_like(d_c), d_c)
    return psi_s, d_c


@functools.partial(
    jax.jit, static_argnames=("d_r", "d_z", "post_smooth", "t_rows",
                              "interpret"))
def tiled_prolong_smooth(
    psi_s: jnp.ndarray,
    source: jnp.ndarray,
    e_coarse: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    *,
    post_smooth: int = 3,
    t_rows: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Tiled fused fine-level up-leg: prolongation + correction +
    post-smooth in ONE pallas_call over Z-chunks (drop-in equivalent of
    ``pallas_mg.fine_prolong_smooth`` above the whole-grid VMEM budget)."""
    if interpret is None:
        interpret = not _on_tpu()
    nz, nr = psi_s.shape
    if t_rows is None:
        t_rows = _default_t_rows(nr)
    halo = 2 * post_smooth + 2
    n_chunks = _chunk_plan(nz, t_rows)
    ae, aw, a_ns, a_c = _fine_coeff_rows(r_1d, d_r, d_z, psi_s.dtype)
    omega_arr = jnp.asarray(omega, psi_s.dtype).reshape(1, 1)

    # Embed the coarse error at stride 2 via exact MXU selection scatter
    # (the stack/reshape interleave is a lane relayout costing ~0.6 ms at
    # 1025² when the error is loop-varying — see upsample_even_mxu).
    from scpn_fusion_tpu.ops.multigrid import upsample_even_mxu
    e_emb = upsample_even_mxu(e_coarse, nz, nr)

    p_body, p_top, p_bot = _pad_and_strips(psi_s, n_chunks, t_rows, halo)
    s_body, s_top, s_bot = _pad_and_strips(source, n_chunks, t_rows, halo)
    e_body, e_top, e_bot = _pad_and_strips(e_emb, n_chunks, t_rows, halo)
    body, strip = _chunk_specs(t_rows, halo, nr)
    rep = pl.BlockSpec((1, nr), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sm = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _tiled_post_kernel, t_rows=t_rows, halo=halo, nz=nz, nr=nr,
        a_ns=a_ns, a_c=a_c, post=post_smooth)
    # x64-disabled tracing: see the down-leg note (i32 index_map literals).
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((n_chunks * t_rows, nr),
                                           psi_s.dtype),
            in_specs=[body, strip, strip, body, strip, strip,
                      body, strip, strip, rep, rep, sm],
            out_specs=body,
            interpret=interpret,
        )(p_body, p_top, p_bot, s_body, s_top, s_bot,
          e_body, e_top, e_bot, ae, aw, omega_arr)
    return out[:nz, :]
