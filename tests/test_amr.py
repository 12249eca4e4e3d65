"""AMR X-point patch: refinement sharpens the saddle localisation."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.amr import (
    _bilinear_upsample,
    refine_x_point,
)


def _analytic_saddle(nr=65, nz=65, x_r=6.3, x_z=-3.1):
    """psi with an exact saddle at (x_r, x_z) and a maximum above it."""
    r = np.linspace(4.0, 9.0, nr)
    z = np.linspace(-5.0, 5.0, nz)
    rr, zz = np.meshgrid(r, z)
    # saddle: quadratic form rotated; plus a gaussian core "plasma"
    saddle = -((rr - x_r) ** 2 - 2.0 * (zz - x_z) ** 2) * 0.1
    core = 3.0 * np.exp(-((rr - 6.3) ** 2 + (zz - 0.5) ** 2) / 1.5)
    return (jnp.asarray(r), jnp.asarray(z),
            jnp.asarray(saddle + core))


class TestUpsample:
    def test_bilinear_endpoints_and_midpoints(self):
        tile = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])
        up = _bilinear_upsample(tile, 2)
        assert up.shape == (3, 3)
        np.testing.assert_allclose(np.asarray(up),
                                   [[0.0, 0.5, 1.0],
                                    [1.0, 1.5, 2.0],
                                    [2.0, 2.5, 3.0]])


class TestRefine:
    def test_refined_x_point_beats_coarse_grid(self):
        x_r, x_z = 6.313, -3.147  # deliberately off-node
        r, z, psi = _analytic_saddle(x_r=x_r, x_z=x_z)
        d_r = float(r[1] - r[0])
        d_z = float(z[1] - z[0])
        source = jnp.zeros_like(psi)
        res = refine_x_point(psi, source, r, z, window=6, factor=4,
                             n_sweeps=0)
        err_r = abs(float(res.x_point_r) - x_r)
        err_z = abs(float(res.x_point_z) - x_z)
        # quadratic refinement on the fine patch: sub-coarse-cell accuracy
        assert err_r < 0.5 * d_r
        assert err_z < 0.5 * d_z
        assert float(res.grad_psi_at_x) < 1.0

    def test_patch_solve_consistent_with_frozen_boundary(self):
        r, z, psi = _analytic_saddle()
        source = jnp.zeros_like(psi)
        res0 = refine_x_point(psi, source, r, z, window=6, factor=2,
                              n_sweeps=0)
        res1 = refine_x_point(psi, source, r, z, window=6, factor=2,
                              n_sweeps=100)
        # boundary is frozen -> corners identical
        np.testing.assert_allclose(
            np.asarray(res1.psi_fine[0, :]), np.asarray(res0.psi_fine[0, :]))
        assert bool(jnp.all(jnp.isfinite(res1.psi_fine)))

    def test_jit_static_shapes(self):
        r, z, psi = _analytic_saddle()
        res = refine_x_point(psi, jnp.zeros_like(psi), r, z,
                             window=4, factor=3, n_sweeps=10)
        assert res.psi_fine.shape == ((2 * 4 + 1 - 1) * 3 + 1,) * 2
