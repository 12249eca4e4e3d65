"""Pallas TPU kernels for the GS* stencil: VMEM-resident red-black SOR.

The reference's accelerator lane is a C++ OpenMP red-black SOR
(``hpc/solver.cpp:93-128``) and a WGPU f32 checkerboard shader
(``fusion-gpu/src/gs_solver.wgsl``).  The TPU equivalent here runs *many*
sweeps inside ONE kernel with psi and source resident in VMEM — no HBM
traffic between sweeps, no per-sweep kernel launches.  A 513 x 513 f32 grid
is ~1 MB; psi + source + coefficients fit comfortably in the ~16 MB VMEM, so
the whole smoothing stage of a multigrid level is a single ``pallas_call``.

Numerics are identical to ``ops/stencil.sor_step`` (true Gauss-Seidel
red-black ordering, same toroidal coefficients); parity is pinned by
``tests/test_pallas_stencil.py``.  On non-TPU backends the kernels run in
interpreter mode (slow, tests only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scpn_fusion_tpu.ops.stencil import stencil_coeffs


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def x64_safe(kernel_fn):
    """Trace a Pallas kernel body with x64 disabled.

    These kernels are f32/i32 by construction (TPU Pallas has no f64
    path), but when the HOST program runs under ``jax_enable_x64`` —
    e.g. the mixed-precision solve driving f32 coarse levels from an f64
    master loop — Python int/float literals inside the kernel trace as
    weak-i64/f64 constants, and Mosaic cannot lower the resulting
    64->32-bit demotion converts (its ``_convert_helper`` recurses).
    Tracing the body under ``jax.enable_x64(False)`` keeps literals
    32-bit; ref dtypes are unaffected.
    """
    @functools.wraps(kernel_fn)
    def wrapped(*args, **kwargs):
        with jax.enable_x64(False):
            return kernel_fn(*args, **kwargs)
    return wrapped


def roll32(x, shift, axis: int):
    """``pltpu.roll`` with the shift pinned to i32.

    The shift is always bound as a dynamic operand; under ``jax_enable_x64``
    a Python-int shift traces as i64, which Mosaic's ``tpu.dynamic_rotate``
    rejects.  Pinning to i32 is semantics- and performance-neutral (grid
    extents are far below 2^31).
    """
    return pltpu.roll(x, jnp.asarray(shift, jnp.int32), axis)


@x64_safe
def _sor_kernel(psi_ref, src_ref, ae_ref, aw_ref, omega_ref, out_ref,
                *, n_sweeps: int, a_ns: float, a_c: float):
    """n_sweeps red-black sweeps entirely in VMEM.

    Works on full-shape arrays: neighbour access is ``pltpu.roll`` (the
    wrap-around rows/cols are killed by the interior mask), so no dynamic
    slicing is needed — everything is VPU-friendly full-tile arithmetic.
    ``ae_ref``/``aw_ref`` hold full-width (1, NR) east/west coefficient rows;
    ``omega_ref`` is a (1, 1) SMEM scalar.
    """
    psi = psi_ref[:]
    src = src_ref[:]
    a_e = ae_ref[0, :][None, :]
    a_w = aw_ref[0, :][None, :]
    omega = omega_ref[0, 0]
    nz, nr = psi.shape

    iz = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 0)
    ir = jax.lax.broadcasted_iota(jnp.int32, (nz, nr), 1)
    interior = ((iz >= 1) & (iz <= nz - 2) & (ir >= 1) & (ir <= nr - 2))
    parity = (iz + ir) % 2
    red = (interior & (parity == 0)).astype(psi.dtype)
    black = (interior & (parity == 1)).astype(psi.dtype)

    inv_ac = 1.0 / a_c

    def half(p, mask):
        # pltpu.roll requires non-negative shifts: roll by n-1 == roll by -1.
        p_e = roll32(p, nr - 1, 1)   # east neighbour  (R+)
        p_w = roll32(p, 1, 1)        # west neighbour  (R-)
        p_n = roll32(p, nz - 1, 0)   # north (Z+)
        p_s = roll32(p, 1, 0)        # south (Z-)
        gs = (a_e * p_e + a_w * p_w + a_ns * (p_n + p_s) - src) * inv_ac
        return p + (mask * omega) * (gs - p)

    def sweep(_, p):
        p = half(p, red)
        p = half(p, black)
        return p

    out_ref[:] = jax.lax.fori_loop(0, n_sweeps, sweep, psi)


@functools.partial(
    jax.jit,
    static_argnames=("d_r", "d_z", "n_sweeps", "interpret"),
)
def sor_sweeps_pallas(
    psi: jnp.ndarray,
    source: jnp.ndarray,
    r_1d: jnp.ndarray,
    d_r: float,
    d_z: float,
    omega,
    n_sweeps: int,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``n_sweeps`` red-black SOR sweeps as one VMEM-resident Pallas kernel.

    Drop-in replacement for ``ops.stencil.sor_sweeps`` (same numerics).
    """
    if interpret is None:
        interpret = not _on_tpu()
    a_e, a_w, a_ns, a_c = stencil_coeffs(r_1d[1:-1], d_r, d_z)
    ae_full = jnp.zeros((1, r_1d.shape[0]), psi.dtype).at[0, 1:-1].set(a_e)
    aw_full = jnp.zeros((1, r_1d.shape[0]), psi.dtype).at[0, 1:-1].set(a_w)
    omega_arr = jnp.asarray(omega, psi.dtype).reshape(1, 1)

    kernel = functools.partial(
        _sor_kernel, n_sweeps=n_sweeps, a_ns=float(a_ns), a_c=float(a_c))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(psi.shape, psi.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(psi, source, ae_full, aw_full, omega_arr)
