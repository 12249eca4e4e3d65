"""Newton-Krylov equilibrium solver (exact-JVP Jacobian) tests."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
from scpn_fusion_tpu.models.equilibrium.newton import solve_equilibrium_newton
from tests.test_fixed_boundary import make_cfg


def test_newton_converges_quadratically():
    cfg = make_cfg("multigrid", n=65, max_iter=600)
    res = solve_equilibrium_newton(cfg, dtype=jnp.float64)
    assert bool(res.converged)
    n = int(res.iterations)
    assert n <= 8, f"Newton took {n} iterations"
    h = np.asarray(res.residual_history)[:n]
    # Quadratic-ish contraction: each step reduces the residual > 10x.
    assert np.all(h[1:] < 0.1 * h[:-1]), h


def test_newton_matches_picard_fixed_point():
    cfg = make_cfg("multigrid", n=65, max_iter=600)
    res_n = solve_equilibrium_newton(cfg, dtype=jnp.float64)
    res_p = solve_equilibrium(cfg, dtype=jnp.float64)
    span = float(jnp.max(res_p.psi) - jnp.min(res_p.psi))
    dev = float(jnp.max(jnp.abs(res_n.psi - res_p.psi))) / span
    # Newton drives the true residual far below Picard's update-diff
    # stopping rule; agreement is bounded by Picard's own tolerance.
    assert dev < 1e-3, f"span-rel deviation {dev:.2e}"


def test_newton_hmode():
    cfg = make_cfg("multigrid", n=65, profile_mode="h-mode")
    res = solve_equilibrium_newton(cfg, dtype=jnp.float64)
    assert bool(res.converged)
    assert np.all(np.isfinite(np.asarray(res.psi)))
