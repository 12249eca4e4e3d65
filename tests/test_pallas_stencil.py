"""Pallas SOR kernel parity vs the XLA-native sweep (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.ops import stencil as st
from scpn_fusion_tpu.ops.pallas_stencil import sor_sweeps_pallas


@pytest.mark.parametrize("n_sweeps", [1, 7])
@pytest.mark.parametrize("shape", [(33, 33), (65, 48)])
def test_pallas_sor_matches_xla(shape, n_sweeps):
    nr, nz = shape[1], shape[0]
    grid = Grid.from_bounds(nr, nz, 2.0, 10.0, -4.0, 4.0, dtype=np.float32)
    rng = np.random.default_rng(0)
    psi = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    src = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    r32 = grid.R.astype(jnp.float32)

    ours = sor_sweeps_pallas(psi, src, r32, grid.dR, grid.dZ,
                             1.6, n_sweeps, interpret=True)
    ref = psi
    for _ in range(n_sweeps):
        ref = st.sor_step(ref, src, r32, grid.dR, grid.dZ, 1.6)

    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_pallas_sor_preserves_boundary():
    grid = Grid.from_bounds(33, 33, 2.0, 10.0, -4.0, 4.0, dtype=np.float32)
    rng = np.random.default_rng(1)
    psi = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    src = jnp.asarray(rng.standard_normal(grid.shape), jnp.float32)
    out = np.asarray(sor_sweeps_pallas(psi, src, grid.R.astype(jnp.float32),
                                       grid.dR, grid.dZ, 1.6, 3, interpret=True))
    p = np.asarray(psi)
    np.testing.assert_array_equal(out[0, :], p[0, :])
    np.testing.assert_array_equal(out[-1, :], p[-1, :])
    np.testing.assert_array_equal(out[:, 0], p[:, 0])
    np.testing.assert_array_equal(out[:, -1], p[:, -1])
