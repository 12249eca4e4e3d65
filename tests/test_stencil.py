"""Stencil kernels vs NumPy reference twins + manufactured-solution gates."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.ops import multigrid as mg
from scpn_fusion_tpu.ops import stencil as st
from scpn_fusion_tpu.utils import npref


@pytest.fixture
def grid65():
    return Grid.from_bounds(65, 65, 2.0, 10.0, -4.0, 4.0, dtype=np.float64)


def _rand_fields(grid, seed=0):
    rng = np.random.default_rng(seed)
    psi = rng.standard_normal(grid.shape)
    src = rng.standard_normal(grid.shape)
    return psi, src


def test_gs_operator_matches_numpy_twin(grid65):
    psi, _ = _rand_fields(grid65)
    r = np.asarray(grid65.R)
    ours = np.asarray(st.gs_operator(jnp.asarray(psi), grid65.R, grid65.dR, grid65.dZ))
    ref = npref.gs_operator_np(psi, r, grid65.dR, grid65.dZ)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_jacobi_step_matches_numpy_twin(grid65):
    psi, src = _rand_fields(grid65)
    ours = np.asarray(st.jacobi_step(jnp.asarray(psi), jnp.asarray(src),
                                     grid65.R, grid65.dR, grid65.dZ))
    ref = npref.jacobi_step_np(psi, src, np.asarray(grid65.R), grid65.dR, grid65.dZ)
    np.testing.assert_allclose(ours, ref, rtol=1e-12, atol=1e-12)


def test_sor_step_matches_numpy_twin(grid65):
    """The red-black sweep must be true Gauss-Seidel (black sees updated red),
    bit-matching the reference's sequential-equivalent vectorised sweep."""
    psi, src = _rand_fields(grid65)
    ours = np.asarray(st.sor_step(jnp.asarray(psi), jnp.asarray(src),
                                  grid65.R, grid65.dR, grid65.dZ, omega=1.6))
    ref = npref.sor_step_np(psi, src, np.asarray(grid65.R), grid65.dR, grid65.dZ, 1.6)
    np.testing.assert_allclose(ours, ref, rtol=1e-11, atol=1e-11)


def test_gs_residual_zero_for_discrete_solution(grid65):
    """Manufactured discrete problem: source := L[psi_exact] gives residual 0."""
    psi, _ = _rand_fields(grid65)
    psi_j = jnp.asarray(psi)
    src = st.gs_operator(psi_j, grid65.R, grid65.dR, grid65.dZ)
    res = st.gs_residual(psi_j, src, grid65.R, grid65.dR, grid65.dZ)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-9)


def test_sor_converges_to_manufactured_solution(grid65):
    """SOR sweeps must converge to the exact discrete solution."""
    rng = np.random.default_rng(1)
    # Smooth manufactured field, zero-extended boundary handled via Dirichlet.
    rr, zz = np.asarray(grid65.RR), np.asarray(grid65.ZZ)
    psi_exact = np.sin(np.pi * (rr - 2.0) / 8.0) * np.cos(np.pi * zz / 8.0)
    psi_exact_j = jnp.asarray(psi_exact)
    src = st.gs_operator(psi_exact_j, grid65.R, grid65.dR, grid65.dZ)

    psi0 = jnp.asarray(psi_exact + 0.5 * rng.standard_normal(grid65.shape))
    psi0 = st.apply_dirichlet(psi0, psi_exact_j)
    out = st.sor_sweeps(psi0, src, grid65.R, grid65.dR, grid65.dZ, 1.8, 2000)
    err = np.max(np.abs(np.asarray(out) - psi_exact))
    assert err < 1e-6, f"SOR did not converge: max err {err}"


def test_multigrid_vcycle_beats_sor(grid65):
    """One V-cycle must reduce the residual far more than one SOR sweep."""
    rng = np.random.default_rng(2)
    rr, zz = np.asarray(grid65.RR), np.asarray(grid65.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 4.0))
    src = st.gs_operator(psi_exact, grid65.R, grid65.dR, grid65.dZ)
    psi0 = jnp.asarray(np.asarray(psi_exact) + rng.standard_normal(grid65.shape))
    psi0 = st.apply_dirichlet(psi0, psi_exact)

    r0 = float(st.gs_residual_rms(psi0, src, grid65.R, grid65.dR, grid65.dZ))
    after_v = mg.vcycle(psi0, src, grid65.R, d_r=grid65.dR, d_z=grid65.dZ)
    rv = float(st.gs_residual_rms(after_v, src, grid65.R, grid65.dR, grid65.dZ))
    after_s = st.sor_step(psi0, src, grid65.R, grid65.dR, grid65.dZ, 1.6)
    rs = float(st.gs_residual_rms(after_s, src, grid65.R, grid65.dR, grid65.dZ))

    assert rv < 0.05 * r0, f"V-cycle weak: {rv} vs {r0}"
    assert rv < rs, "V-cycle should beat a single SOR sweep"


def test_multigrid_solve_converges(grid65):
    rng = np.random.default_rng(3)
    rr, zz = np.asarray(grid65.RR), np.asarray(grid65.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 4.0))
    src = st.gs_operator(psi_exact, grid65.R, grid65.dR, grid65.dZ)
    psi0 = jnp.asarray(np.asarray(psi_exact) + rng.standard_normal(grid65.shape))
    psi0 = st.apply_dirichlet(psi0, psi_exact)

    out = mg.mg_solve(psi0, src, grid65.R, grid65.dR, grid65.dZ, n_cycles=12)
    err = np.max(np.abs(np.asarray(out) - np.asarray(psi_exact)))
    assert err < 1e-8, f"MG solve max err {err}"


def test_dirichlet_preserved_by_vcycle(grid65):
    psi, src = _rand_fields(grid65, 4)
    psi_j = jnp.asarray(psi)
    out = mg.vcycle(psi_j, jnp.asarray(src), grid65.R, d_r=grid65.dR, d_z=grid65.dZ)
    out = np.asarray(out)
    np.testing.assert_allclose(out[0, :], psi[0, :], rtol=0, atol=0)
    np.testing.assert_allclose(out[-1, :], psi[-1, :], rtol=0, atol=0)
    np.testing.assert_allclose(out[:, 0], psi[:, 0], rtol=0, atol=0)
    np.testing.assert_allclose(out[:, -1], psi[:, -1], rtol=0, atol=0)
