"""1.5D transport stepper tests: tridiagonal parity, CN stability,
conservation behaviour, closure sanity."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.transport import (
    TransportParams,
    evolve_profiles,
    initial_state,
    run_transport,
)
from scpn_fusion_tpu.models.transport.closures import (
    bosch_hale_sigmav,
    chang_hinton_chi,
    sauter_bootstrap_current,
)
from scpn_fusion_tpu.models.transport.solver import (
    build_cn_tridiag,
    explicit_diffusion_rhs,
)
from scpn_fusion_tpu.ops.tridiag import thomas_solve, thomas_solve_batched


class TestThomas:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        n = 50
        a = rng.standard_normal(n - 1)
        c = rng.standard_normal(n - 1)
        b = 4.0 + rng.standard_normal(n)  # diagonally dominant
        d = rng.standard_normal(n)
        mat = np.diag(b) + np.diag(a, -1) + np.diag(c, 1)
        x_ref = np.linalg.solve(mat, d)
        x = np.asarray(thomas_solve(*map(jnp.asarray, (a, b, c, d))))
        np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)

    def test_batched(self):
        rng = np.random.default_rng(1)
        B, n = 7, 33
        a = rng.standard_normal((B, n - 1))
        c = rng.standard_normal((B, n - 1))
        b = 4.0 + rng.standard_normal((B, n))
        d = rng.standard_normal((B, n))
        xs = np.asarray(thomas_solve_batched(*map(jnp.asarray, (a, b, c, d))))
        for k in range(B):
            mat = np.diag(b[k]) + np.diag(a[k], -1) + np.diag(c[k], 1)
            np.testing.assert_allclose(xs[k], np.linalg.solve(mat, d[k]),
                                       rtol=1e-9, atol=1e-9)

    def test_degenerate_pivot_fail_soft(self):
        n = 5
        a = jnp.zeros(n - 1)
        b = jnp.zeros(n)  # all-zero diagonal — must not produce NaN
        c = jnp.zeros(n - 1)
        d = jnp.ones(n)
        x = np.asarray(thomas_solve(a, b, c, d))
        assert np.all(np.isfinite(x))


class TestCN:
    def test_cn_matrix_consistent_with_explicit_rhs(self):
        """(I - 0.5 dt L) T - (T + 0.5 dt L T) == -dt L T for any T."""
        params = TransportParams()
        rho = np.asarray(params.rho(jnp.float64))
        rng = np.random.default_rng(2)
        t = jnp.asarray(rng.uniform(0.5, 2.0, params.nr))
        chi = jnp.asarray(rng.uniform(0.5, 2.0, params.nr))
        dt = 0.05
        a, b, c = build_cn_tridiag(chi, dt, jnp.asarray(rho), params.drho)
        mat = (np.diag(np.asarray(b)) + np.diag(np.asarray(a), -1)
               + np.diag(np.asarray(c), 1))
        lh = np.asarray(explicit_diffusion_rhs(t, chi, jnp.asarray(rho), params.drho))
        lhs = mat @ np.asarray(t)
        # Interior identity: (I - 0.5 dt L) T = T - 0.5 dt L_h(T)
        np.testing.assert_allclose(lhs[1:-1], np.asarray(t)[1:-1] - 0.5 * dt * lh[1:-1],
                                   rtol=1e-10)

    def test_flat_profile_stationary_without_sources(self):
        """A flat temperature with no sources must stay flat (up to BCs)."""
        params = TransportParams(multi_ion=False)
        s = initial_state(params, jnp.float64)
        flat = jnp.full((params.nr,), 0.1, jnp.float64)
        s = s._replace(ti=flat, te=flat, n_imp=jnp.zeros_like(flat))
        s2 = evolve_profiles(s, jnp.float64(0.01), jnp.float64(0.0), params)
        np.testing.assert_allclose(np.asarray(s2.ti), 0.1, atol=1e-6)


class TestEvolve:
    @pytest.mark.parametrize("multi_ion", [False, True])
    def test_step_finite_and_positive(self, multi_ion):
        params = TransportParams(multi_ion=multi_ion)
        s = initial_state(params, jnp.float64)
        for _ in range(5):
            s = evolve_profiles(s, jnp.float64(0.05), jnp.float64(20.0), params)
        for arr in (s.ti, s.te):
            a = np.asarray(arr)
            assert np.all(np.isfinite(a))
            assert np.all(a > 0)
        ne = np.asarray(s.ne)
        assert np.all(np.isfinite(ne)) and np.all(ne >= 0)

    def test_heating_raises_core_temperature(self):
        params = TransportParams(multi_ion=True)
        s0 = initial_state(params, jnp.float64)
        s_hot, _ = run_transport(s0, jnp.float64(0.05), jnp.float64(50.0),
                                 params, 40)
        s_cold, _ = run_transport(s0, jnp.float64(0.05), jnp.float64(1.0),
                                  params, 40)
        assert float(s_hot.ti[1]) > float(s_cold.ti[1])

    def test_large_dt_stable(self):
        """CN is unconditionally stable: dt = 1.0 s must not blow up
        (reference docstring claim, runtime.py:303-306)."""
        params = TransportParams(multi_ion=True)
        s = initial_state(params, jnp.float64)
        s = evolve_profiles(s, jnp.float64(1.0), jnp.float64(30.0), params)
        assert np.all(np.isfinite(np.asarray(s.ti)))
        assert np.all(np.asarray(s.ti) <= 1e3)

    def test_helium_ash_accumulates_when_burning(self):
        params = TransportParams(multi_ion=True)
        s = initial_state(params, jnp.float64)
        # Hot plasma burns: seed 10 keV profiles.
        hot = 10.0 * (1.0 - np.asarray(params.rho(jnp.float64)) ** 2) + 0.1
        s = s._replace(ti=jnp.asarray(hot), te=jnp.asarray(hot))
        s2, _ = run_transport(s, jnp.float64(0.05), jnp.float64(30.0), params, 20)
        assert float(jnp.max(s2.n_he)) > 0.0

    def test_edge_bcs_enforced(self):
        params = TransportParams(multi_ion=True)
        s = initial_state(params, jnp.float64)
        s2 = evolve_profiles(s, jnp.float64(0.05), jnp.float64(20.0), params)
        assert float(s2.ti[-1]) == pytest.approx(0.1)
        assert float(s2.te[-1]) == pytest.approx(params.t_edge_kev)
        # Axis Neumann: T0 == T1
        assert float(s2.ti[0]) == pytest.approx(float(s2.ti[1]))


class TestClosures:
    def test_bosch_hale_peak_location(self):
        """D-T reactivity peaks near 64 keV and is ~1.1e-22 at 10 keV."""
        sv10 = float(bosch_hale_sigmav(jnp.asarray(10.0)))
        assert 1.0e-22 < sv10 < 1.3e-22
        t = np.linspace(1, 100, 300)
        sv = np.asarray(bosch_hale_sigmav(jnp.asarray(t)))
        assert 55.0 < t[np.argmax(sv)] <= 100.0
        assert np.all(np.diff(sv[t < 50]) > 0)  # monotone rising below 50 keV

    def test_chang_hinton_positive_and_scales_with_density(self):
        rho = jnp.linspace(0, 1, 50)
        q = 1.0 + 2.0 * rho**2
        ti = 5.0 * (1 - rho**2) + 0.1
        chi_lo = chang_hinton_chi(rho, ti, 2.0 * jnp.ones(50), q, 6.2, 2.0, 5.3)
        chi_hi = chang_hinton_chi(rho, ti, 8.0 * jnp.ones(50), q, 6.2, 2.0, 5.3)
        assert np.all(np.asarray(chi_lo) >= 0.01)
        # Collisional neoclassical transport increases with density.
        assert float(jnp.sum(chi_hi)) > float(jnp.sum(chi_lo))

    def test_sauter_bootstrap_sign_and_edges(self):
        rho = jnp.linspace(0, 1, 50)
        q = 1.0 + 2.0 * rho**2
        te = 5.0 * (1 - rho**2) + 0.1
        ne = 5.0 * (1 - rho**2) ** 0.5 + 0.1
        j = np.asarray(sauter_bootstrap_current(rho, te, te, ne, q,
                                                6.2, 2.0, 5.3))
        assert j[0] == 0.0 and j[-1] == 0.0
        assert np.all(np.isfinite(j))
        # Peaked profiles (negative gradients) drive positive bootstrap
        # current somewhere in the gradient region.
        assert np.max(np.abs(j)) > 0.0
