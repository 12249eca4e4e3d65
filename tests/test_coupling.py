"""GS <-> transport self-consistent coupling tests."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.vacuum import vacuum_psi_from_config
from scpn_fusion_tpu.models.transport import TransportParams, initial_state
from scpn_fusion_tpu.models.transport.coupling import (
    compute_confinement_time,
    map_profiles_to_2d,
    run_self_consistent,
)
from tests.test_fixed_boundary import make_cfg


def test_map_profiles_ip_normalised():
    cfg = make_cfg("multigrid", n=33, max_iter=100)
    grid = Grid.from_config(cfg, dtype=np.float64)
    tp = TransportParams(nr=25)
    ts = initial_state(tp, jnp.float64)
    rng = np.random.default_rng(0)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0) * 10.0)
    j = map_profiles_to_2d(psi, ts, tp, grid, jnp.float64(15.0), 1.0)
    ip = float(jnp.sum(j)) * grid.dR * grid.dZ
    np.testing.assert_allclose(ip, 15.0, rtol=1e-6)


def test_confinement_time_positive_scaling():
    tp = TransportParams()
    ts = initial_state(tp, jnp.float64)
    tau_lo = float(compute_confinement_time(ts, tp, jnp.float64(100.0)))
    tau_hi = float(compute_confinement_time(ts, tp, jnp.float64(10.0)))
    assert 0 < tau_lo < tau_hi


def test_self_consistent_runs_and_converges():
    cfg = make_cfg("multigrid", n=33, max_iter=150)
    grid = Grid.from_config(cfg, dtype=np.float64)
    tp = TransportParams(nr=25, multi_ion=False)
    ts = initial_state(tp, jnp.float64)
    psi_bc = vacuum_psi_from_config(grid, cfg).astype(jnp.float64)

    res = run_self_consistent(
        cfg, grid, tp, ts, psi_bc, psi_bc,
        p_aux_mw=jnp.float64(20.0), dt=jnp.float64(0.02),
        n_inner=10, n_outer=6, psi_tol=1e-3,
    )
    assert np.all(np.isfinite(np.asarray(res.psi)))
    assert np.all(np.isfinite(np.asarray(res.transport.ti)))
    assert int(res.outer_iterations) >= 1
    assert float(res.t_core) > 0
    # The outer fixed point should converge for this mild configuration.
    assert bool(res.converged), f"psi residual {float(res.psi_residual):.2e}"
