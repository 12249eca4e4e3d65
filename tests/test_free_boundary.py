"""Free-boundary solver + bounded least-squares tests."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
from scpn_fusion_tpu.models.equilibrium.free_boundary import (
    CoilSet,
    coilset_from_config,
    interp_psi_at_points,
    mutual_inductance_matrix,
    solve_free_boundary,
)
from scpn_fusion_tpu.ops.lstsq import bounded_lstsq, tikhonov_coil_lstsq
from tests.test_fixed_boundary import make_cfg


class TestBoundedLstsq:
    def test_unbounded_matches_lstsq(self):
        rng = np.random.default_rng(0)
        a = rng.standard_normal((20, 6))
        b = rng.standard_normal(20)
        big = np.full(6, 1e30)
        x = np.asarray(bounded_lstsq(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(-big), jnp.asarray(big)))
        x_ref = np.linalg.lstsq(a, b, rcond=None)[0]
        np.testing.assert_allclose(x, x_ref, rtol=1e-6, atol=1e-8)

    def test_bounded_matches_scipy_trf(self):
        rng = np.random.default_rng(1)
        a = rng.standard_normal((30, 5))
        b = 3.0 * rng.standard_normal(30)
        lb, ub = -0.5 * np.ones(5), 0.5 * np.ones(5)
        x = np.asarray(bounded_lstsq(jnp.asarray(a), jnp.asarray(b),
                                     jnp.asarray(lb), jnp.asarray(ub),
                                     n_iter=2000))
        ref = scipy.optimize.lsq_linear(a, b, bounds=(lb, ub), method="trf").x
        np.testing.assert_allclose(x, ref, rtol=1e-4, atol=1e-6)

    def test_tikhonov_augmented_system(self):
        rng = np.random.default_rng(2)
        m = rng.standard_normal((4, 12))  # (n_coils, n_pts)
        target = rng.standard_normal(12)
        alpha = 1e-3
        big = np.full(4, 1e30)
        x = np.asarray(tikhonov_coil_lstsq(
            jnp.asarray(m.T), jnp.asarray(target), alpha,
            jnp.asarray(-big), jnp.asarray(big)))
        a_aug = np.vstack([m.T, np.sqrt(alpha) * np.eye(4)])
        b_aug = np.concatenate([target, np.zeros(4)])
        ref = np.linalg.lstsq(a_aug, b_aug, rcond=None)[0]
        np.testing.assert_allclose(x, ref, rtol=1e-5, atol=1e-7)

    def test_differentiable(self):
        import jax
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((10, 3)))
        big = jnp.full((3,), 1e30)

        def loss(b):
            x = bounded_lstsq(a, b, -big, big, n_iter=100)
            return jnp.sum(x**2)

        g = jax.grad(loss)(jnp.asarray(rng.standard_normal(10)))
        assert np.all(np.isfinite(np.asarray(g)))


class TestFreeBoundary:
    def test_matches_fixed_boundary_without_shape_opt(self):
        """With fixed currents, the free-boundary outer loop must converge to
        the same equilibrium as the fixed-boundary solve with vacuum BC."""
        cfg = make_cfg("multigrid", max_iter=600)
        fixed = solve_equilibrium(cfg, dtype=jnp.float64)
        free = solve_free_boundary(cfg, max_outer_iter=10, tol=1e-5,
                                   mu0_green=1.0, dtype=jnp.float64)
        assert bool(free.converged)
        psi_f = np.asarray(fixed.psi)
        psi_fb = np.asarray(free.psi)
        span = psi_f.max() - psi_f.min()
        rel = np.max(np.abs(psi_f - psi_fb)) / span
        assert rel < 5e-3, f"free-boundary deviates from fixed-boundary: {rel:.2e}"

    def test_mixed_precision_matches_full_f64(self):
        """Mixed inner elliptic (f64 defect -> f32 V-cycle correction) must
        reproduce the full-f64 free-boundary fixed point — same outer
        iteration count, span-rel parity at the correction scale.  This is
        the accuracy gate behind the warm_forward_129_device_mixed perf
        lane (validation/run_free_boundary_forward.py)."""
        import dataclasses
        cfg = make_cfg("anderson_mg", max_iter=400, anderson_depth=4,
                       inner_sweeps=1)
        cfg = dataclasses.replace(cfg, solver=dataclasses.replace(
            cfg.solver, relaxation_factor=1.0))
        full = solve_free_boundary(cfg, max_outer_iter=16, tol=1e-4,
                                   mu0_green=1.0, dtype=jnp.float64,
                                   anderson_gram_f32=True)
        mixed = solve_free_boundary(cfg, max_outer_iter=16, tol=1e-4,
                                    mu0_green=1.0, dtype=jnp.float64,
                                    anderson_gram_f32=True, mixed_n_refine=2)
        assert bool(full.converged) and bool(mixed.converged)
        assert int(mixed.outer_iterations) == int(full.outer_iterations)
        p_f, p_m = np.asarray(full.psi), np.asarray(mixed.psi)
        span = p_f.max() - p_f.min()
        rel = np.max(np.abs(p_f - p_m)) / span
        assert rel < 1e-5, f"mixed vs full-f64 span-rel {rel:.2e}"

    def test_mixed_precision_requires_f64(self):
        cfg = make_cfg("anderson_mg", max_iter=100, inner_sweeps=1)
        with pytest.raises(ValueError, match="float64"):
            solve_free_boundary(cfg, mixed_n_refine=1, dtype=jnp.float32)

    def test_shape_optimization_runs_and_bounds_respected(self):
        cfg = make_cfg("multigrid", max_iter=400)
        coils = coilset_from_config(cfg, jnp.float64)
        theta = np.linspace(0, 2 * np.pi, 16, endpoint=False)
        pts = np.stack([6.0 + 2.0 * np.cos(theta), 2.4 * np.sin(theta)], axis=1)
        limits = jnp.asarray(np.full(len(cfg.coils), 8.0))
        coils = coils._replace(
            target_flux_points=jnp.asarray(pts),
            current_limits=limits,
        )
        res = solve_free_boundary(
            cfg, coils, max_outer_iter=6, tol=1e-5,
            optimize_shape=True, tikhonov_alpha=1e-4,
            mu0_green=1.0, dtype=jnp.float64)
        cur = np.asarray(res.coil_currents)
        assert np.all(np.isfinite(cur))
        assert np.all(np.abs(cur) <= 8.0 + 1e-9)
        assert np.all(np.isfinite(np.asarray(res.psi)))
        # Optimiser objective check: the fitted coil currents must reproduce
        # the isoflux target at the control points better than the initial
        # currents did (the optimiser controls only the coil flux — the
        # plasma contribution is not in its objective).
        grid = Grid.from_config(cfg, dtype=np.float64)
        m = np.asarray(mutual_inductance_matrix(
            coils.r, coils.z, coils.turns, jnp.asarray(pts), 1.0))
        samples = np.asarray(interp_psi_at_points(res.psi, grid, jnp.asarray(pts)))
        target = np.full(len(pts), samples.mean())
        rmse_new = np.sqrt(np.mean((m.T @ cur - target) ** 2))
        rmse_old = np.sqrt(np.mean((m.T @ np.asarray(coils.currents) - target) ** 2))
        assert rmse_new <= rmse_old + 1e-9, (rmse_new, rmse_old)

    def test_mutual_inductance_symmetry(self):
        """Flux response must be symmetric under source<->observer swap
        (Green's reciprocity) for unit turns."""
        r = jnp.asarray([3.0, 7.0])
        z = jnp.asarray([1.0, -2.0])
        ones = jnp.ones(2)
        pts = jnp.stack([r, z], axis=1)
        m = np.asarray(mutual_inductance_matrix(r, z, ones, pts, 1.0))
        np.testing.assert_allclose(m[0, 1], m[1, 0], rtol=1e-6)
        # Self entries regularised to zero.
        assert m[0, 0] == 0.0 and m[1, 1] == 0.0

    def test_interp_psi_matches_reference_semantics(self):
        grid = Grid.from_bounds(17, 17, 2.0, 10.0, -4.0, 4.0, dtype=np.float64)
        rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
        psi = jnp.asarray(2.0 * rr + 3.0 * zz)  # bilinear-exact field
        pts = jnp.asarray([[2.0, -4.0], [10.0, 4.0], [5.37, 1.22], [9.99, -3.7]])
        out = np.asarray(interp_psi_at_points(psi, grid, pts))
        expected = 2.0 * np.asarray(pts)[:, 0] + 3.0 * np.asarray(pts)[:, 1]
        # atol covers the 1e-6 in-range clip at the exact domain corner
        np.testing.assert_allclose(out, expected, rtol=1e-10, atol=1e-4)
