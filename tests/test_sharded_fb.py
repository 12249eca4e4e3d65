"""Distributed free-boundary forward: parity + shard-count invariance.

VERDICT r4 missing #2 / next #4: the free-boundary predictive forward (the
flagship perf lane) must have a multi-device variant.  These tests pin
``parallel/sharded_fb.solve_free_boundary_sharded`` — the single-device
coil<->GS outer ``while_loop`` with the elliptic inner solve Z-slab-sharded
(``parallel/sharded_mg.sharded_vcycle``) — against the single-device
``solve_free_boundary``: identical outer-iteration counts (the convergence
trajectory, not just the fixed point) and span-relative psi parity on
1/2/4/8 shards of the virtual CPU mesh.  Reference counterpart:
``mpi_domain.rs:804`` (``distributed_gs_solve`` is not fixed-boundary-only).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.free_boundary import solve_free_boundary
from scpn_fusion_tpu.parallel.halo import make_z_mesh
from scpn_fusion_tpu.parallel.sharded_fb import solve_free_boundary_sharded
from tests.test_fixed_boundary import make_cfg


@pytest.fixture(scope="module")
def single_device_solution():
    cfg = make_cfg("multigrid", max_iter=600)
    res = solve_free_boundary(cfg, max_outer_iter=10, tol=1e-5,
                              mu0_green=1.0, dtype=jnp.float64)
    assert bool(res.converged)
    return cfg, res


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
def test_sharded_fb_matches_single_device(n_shards, single_device_solution):
    cfg, ref = single_device_solution
    mesh = make_z_mesh(n_shards)
    res = solve_free_boundary_sharded(
        cfg, mesh=mesh, max_outer_iter=10, tol=1e-5,
        mu0_green=1.0, dtype=jnp.float64)
    assert bool(res.converged)
    # Iteration-identical convergence trajectory: the sharded V-cycle is the
    # same operator up to float reduction order, so in f64 the outer loop
    # must walk the same number of steps.
    assert int(res.outer_iterations) == int(ref.outer_iterations)
    psi_1 = np.asarray(ref.psi)
    span = float(psi_1.max() - psi_1.min())
    dev = float(np.max(np.abs(np.asarray(res.psi) - psi_1))) / span
    assert dev < 1e-8, f"{n_shards} shards: span-rel dev {dev:.3e}"


def test_sharded_fb_shard_count_invariance(single_device_solution):
    cfg, _ = single_device_solution
    sols = [
        np.asarray(solve_free_boundary_sharded(
            cfg, mesh=make_z_mesh(k), max_outer_iter=10, tol=1e-5,
            mu0_green=1.0, dtype=jnp.float64).psi)
        for k in (2, 8)
    ]
    span = float(sols[0].max() - sols[0].min())
    dev = float(np.max(np.abs(sols[0] - sols[1]))) / span
    assert dev < 1e-10, f"2 vs 8 shards span-rel dev {dev:.3e}"


def test_sharded_fb_coil_currents_passthrough(single_device_solution):
    """Without shape optimisation the coil currents must come back
    untouched (same semantics as the single-device path)."""
    cfg, _ = single_device_solution
    res = solve_free_boundary_sharded(
        cfg, mesh=make_z_mesh(4), max_outer_iter=10, tol=1e-5,
        mu0_green=1.0, dtype=jnp.float64)
    expected = np.asarray([c.current for c in cfg.coils], np.float64)
    np.testing.assert_allclose(np.asarray(res.coil_currents), expected,
                               rtol=0, atol=0)
