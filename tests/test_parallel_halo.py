"""Distributed Z-slab SOR must be numerically identical to the monolithic
sweep (the reference's tile==monolithic invariant, 1e-12)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.ops import stencil as st
from scpn_fusion_tpu.parallel.halo import make_z_mesh, sharded_sor_solve


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_sor_matches_monolithic(n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip("not enough virtual devices")
    # NZ divisible by n_dev for even slabs.
    grid = Grid.from_bounds(65, 64, 2.0, 10.0, -4.0, 4.0, dtype=np.float64)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(grid.shape))
    src = jnp.asarray(rng.standard_normal(grid.shape))

    mesh = make_z_mesh(n_dev)
    out_sharded, res = sharded_sor_solve(
        psi, src, grid.R, jnp.asarray(1.6),
        mesh=mesh, axis="z", d_r=grid.dR, d_z=grid.dZ,
        n_sweeps=5, nz_total=grid.NZ,
    )

    out_ref = psi
    for _ in range(5):
        out_ref = st.sor_step(out_ref, src, grid.R, grid.dR, grid.dZ, 1.6)

    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_ref), rtol=1e-12, atol=1e-12)
    assert float(res) > 0.0


def test_sharded_sor_converges():
    grid = Grid.from_bounds(65, 64, 2.0, 10.0, -4.0, 4.0, dtype=np.float64)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0))
    src = st.gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
    rng = np.random.default_rng(1)
    psi0 = jnp.asarray(np.asarray(psi_exact) + 0.3 * rng.standard_normal(grid.shape))
    psi0 = st.apply_dirichlet(psi0, psi_exact)

    mesh = make_z_mesh(4)
    out, _ = sharded_sor_solve(
        psi0, src, grid.R, jnp.asarray(1.8),
        mesh=mesh, axis="z", d_r=grid.dR, d_z=grid.dZ,
        n_sweeps=2000, nz_total=grid.NZ,
    )
    err = np.max(np.abs(np.asarray(out) - np.asarray(psi_exact)))
    assert err < 1e-6, f"distributed SOR did not converge: {err}"
