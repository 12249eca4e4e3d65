"""Mixed-precision (f32 V-cycle + f64 residual) solve path.

VERDICT r3 next #2: the headline must converge on the GS-residual
criterion; pure f32 cannot measure residuals below ~1e-3 at large grids
(second difference of rounding noise).  These tests pin the mixed path's
contracts on CPU (where true f64 is available for comparison):

* defect-correction refinement reaches f64-class elliptic residuals while
  all smoothing runs in f32;
* the full mixed GS solve converges on the residual criterion and agrees
  with the all-f64 solve far below f32 epsilon;
* the f32-Gram Anderson still accelerates (iteration parity with f64 Gram).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.config import (
    Coil,
    Dimensions,
    PhysicsParams,
    ReactorConfig,
    SolverParams,
)
from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
from scpn_fusion_tpu.models.equilibrium.mixed_precision import (
    make_refinement_elliptic,
    solve_equilibrium_mixed,
    solve_equilibrium_mixed_fmg,
)
from scpn_fusion_tpu.ops.stencil import apply_dirichlet, gs_operator, gs_residual_rms

COILS = (Coil(r=3.5, z=4.8, current=-1.0), Coil(r=8.0, z=4.8, current=4.0),
         Coil(r=10.8, z=0.0, current=6.0), Coil(r=8.0, z=-4.8, current=4.0),
         Coil(r=3.5, z=-4.8, current=-1.0), Coil(r=10.8, z=2.5, current=3.0))


def _cfg(n, gs_tol, method="anderson_mg", m=4, tol=1e-6, max_iter=400):
    return ReactorConfig(
        reactor_name=f"mp-{n}-{method}", grid_resolution=(n, n),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=COILS,
        physics=PhysicsParams(plasma_current_target=15.0,
                              vacuum_permeability=1.0),
        solver=SolverParams(max_iterations=max_iter,
                            convergence_threshold=tol,
                            relaxation_factor=1.0, solver_method=method,
                            anderson_depth=m, gs_residual_threshold=gs_tol))


class TestRefinementElliptic:
    def test_f64_class_residual_from_f32_cycles(self):
        """Manufactured Dirichlet problem: iterated f32 defect correction
        must push the *f64-measured* residual far below the f32 stall."""
        n = 129
        grid = Grid.from_bounds(n, n, 2.0, 10.0, -4.0, 4.0,
                                dtype=np.float64)
        rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
        psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0),
                                jnp.float64)
        src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
        elliptic = make_refinement_elliptic(grid, n_refine=8)
        psi0 = apply_dirichlet(jnp.zeros_like(psi_exact), psi_exact)
        out = elliptic(psi0, src)
        assert out.dtype == jnp.float64
        res = float(gs_residual_rms(out, src, grid.R, grid.dR, grid.dZ))
        src_rms = float(jnp.sqrt(jnp.mean(src[1:-1, 1:-1] ** 2)))
        # relative residual far below anything a pure-f32 iterate can show
        assert res / src_rms < 1e-7
        err = float(jnp.max(jnp.abs(out - psi_exact)))
        span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
        assert err / span < 1e-8

    def test_correction_is_f32_limited_not_iterate(self):
        """One refinement round's correction accuracy is f32; the ITERATE
        keeps f64 information (the point of the scheme)."""
        n = 65
        grid = Grid.from_bounds(n, n, 2.0, 10.0, -4.0, 4.0,
                                dtype=np.float64)
        rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
        psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0),
                                jnp.float64)
        src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
        elliptic = make_refinement_elliptic(grid, n_refine=1)
        # start from the exact solution: a single round must not DAMAGE it
        out = elliptic(psi_exact, src)
        span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
        drift = float(jnp.max(jnp.abs(out - psi_exact))) / span
        assert drift < 1e-7      # f32 V-cycle of a ~0 defect stays ~0


class TestMixedSolve:
    def test_residual_gated_convergence_and_f64_parity(self):
        n = 129
        gs_tol = 1e-5
        r64 = solve_equilibrium(_cfg(n, gs_tol, method="multigrid", m=1,
                                     max_iter=300),
                                dtype=jnp.float64)
        rm = solve_equilibrium_mixed(_cfg(n, gs_tol), n_refine=2)
        assert bool(r64.converged) and bool(rm.converged)
        assert float(rm.gs_residual) < gs_tol
        # within ~10x of the all-f64 residual (VERDICT gate language)
        assert float(rm.gs_residual) < 10.0 * max(float(r64.gs_residual),
                                                  1e-9)
        span = float(jnp.max(r64.psi) - jnp.min(r64.psi))
        dev = float(jnp.max(jnp.abs(rm.psi - r64.psi))) / span
        # agreement far below f32 epsilon: the iterate is genuinely f64
        assert dev < 1e-6

    def test_fmg_cascade_converges_on_residual(self):
        res, info = solve_equilibrium_mixed_fmg(_cfg(257, 1e-5, tol=1e-5),
                                                n_refine=2)
        assert bool(res.converged)
        assert float(res.gs_residual) < 1e-5
        assert [lvl["n"] for lvl in info] == [65, 129, 257]
        assert all(lvl["converged"] for lvl in info)

    def test_requires_x64(self):
        if not jax.config.jax_enable_x64:  # pragma: no cover
            pytest.skip("suite runs with x64 on")
        # simulate the guard directly
        from scpn_fusion_tpu.models.equilibrium.mixed_precision import (
            require_x64,
        )
        require_x64()  # should not raise under the test config


class TestAndersonGramF32:
    def test_f32_gram_keeps_acceleration(self):
        """The f32 Gram build must not cost outer iterations vs f64 Gram."""
        from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (
            _anderson_mix,
        )
        rng = np.random.default_rng(0)
        m, nz, nr = 4, 17, 17
        psi_buf = jnp.asarray(rng.normal(size=(m, nz, nr)))
        f_buf = jnp.asarray(0.1 * rng.normal(size=(m, nz, nr)))
        a64 = _anderson_mix(psi_buf, f_buf, jnp.int32(m), gram_in_f32=False)
        a32 = _anderson_mix(psi_buf, f_buf, jnp.int32(m), gram_in_f32=True)
        assert a32.dtype == jnp.float64
        # weights differ at f32 precision only -> mixes agree to ~1e-5
        denom = float(jnp.max(jnp.abs(a64)) + 1e-30)
        assert float(jnp.max(jnp.abs(a64 - a32))) / denom < 1e-4
