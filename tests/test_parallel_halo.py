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


class TestDecompositionPlan:
    """Rank-tile planner + invariant certification (reference
    gk_domain_decomposition.py:25-260 contract)."""

    def test_balanced_partition_and_validation(self):
        from scpn_fusion_tpu.parallel.plan import build_decomposition
        plan = build_decomposition(10, 7, radial_ranks=3,
                                   toroidal_ranks=2, halo=1)
        assert plan.total_ranks == 6
        # Owned blocks cover exactly; imbalance bounded by +1 cell rule.
        assert plan.owned_cell_imbalance <= 2.0
        assert plan.halo_overhead_ratio > 1.0

    def test_invalid_plans_rejected(self):
        import dataclasses
        from scpn_fusion_tpu.parallel.plan import (
            AxisBlock, DecompositionPlan, PlanError, RankTile,
            build_decomposition, validate_plan)
        import pytest
        with pytest.raises(PlanError, match="cannot split"):
            build_decomposition(3, 3, radial_ranks=5, toroidal_ranks=1)
        # Overlapping hand-built plan must fail closed.
        tile = RankTile(0, AxisBlock(0, 3), AxisBlock(0, 3),
                        AxisBlock(0, 3), AxisBlock(0, 3))
        bad = DecompositionPlan(n_radial=4, n_toroidal=3, halo=0,
                                tiles=(tile, tile))
        with pytest.raises(PlanError, match="partition"):
            validate_plan(bad)

    def test_invariant_metrics_pass_on_any_state(self):
        import numpy as np
        from scpn_fusion_tpu.parallel.plan import (
            build_decomposition, invariant_metrics)
        rng = np.random.default_rng(3)
        state = rng.standard_normal((8, 6, 4, 5, 3))
        plan = build_decomposition(8, 6, radial_ranks=2,
                                   toroidal_ranks=3, halo=1)
        m = invariant_metrics(plan, state)
        assert m.decomposition_invariant_pass
        assert m.reconstruction_linf_error == 0.0
        assert m.inventory_relative_error <= 1e-12
        assert m.free_energy_relative_error <= 1e-12

    def test_halo_views_contain_neighbour_cells(self):
        import numpy as np
        from scpn_fusion_tpu.parallel.plan import (
            build_decomposition, extract_tile)
        state = np.arange(8 * 6 * 2 * 2 * 2, dtype=float).reshape(
            8, 6, 2, 2, 2)
        plan = build_decomposition(8, 6, radial_ranks=2,
                                   toroidal_ranks=1, halo=1)
        inner = extract_tile(state, plan.tiles[1], with_halo=False)
        padded = extract_tile(state, plan.tiles[1], with_halo=True)
        assert padded.shape[0] == inner.shape[0] + 1   # domain-edge clamp
        np.testing.assert_array_equal(padded[1:], inner)
        # The halo row is the neighbour's last owned row.
        np.testing.assert_array_equal(padded[0], state[3])
