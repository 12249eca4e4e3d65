"""Current-diffusion (resistive flux evolution) tests."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.transport.current_diffusion import (
    CurrentDiffusionParams,
    initial_psi,
    neoclassical_resistivity,
    q_from_psi,
    resistive_diffusion_time,
    run_current_diffusion,
    step_current_diffusion,
)


def _params(nr=50):
    return CurrentDiffusionParams(nr=nr, r0=6.2, a=2.0, b0=5.3)


class TestBasics:
    def test_initial_q_matches_seed_profile(self):
        """initial_psi integrates q = 1 + 2 rho^2; q_from_psi must invert it."""
        p = _params(200)
        psi = initial_psi(p)
        q = np.asarray(q_from_psi(p.rho(), psi, p.r0, p.a, p.b0))
        rho = np.asarray(p.rho())
        expected = 1.0 + 2.0 * rho**2
        # Interior agreement (finite-difference inversion, skip edges).
        np.testing.assert_allclose(q[5:-5], expected[5:-5], rtol=0.03)

    def test_resistivity_above_spitzer(self):
        te = jnp.asarray([1.0, 10.0])
        ne = jnp.asarray([5.0, 5.0])
        eta = np.asarray(neoclassical_resistivity(
            te, ne, 1.5, jnp.asarray([0.1, 0.3]), jnp.asarray([1.5, 2.0]), 6.2))
        spitzer = 1.65e-9 * 1.5 * 17.0 / np.asarray([1.0, 10.0]) ** 1.5
        assert np.all(eta >= spitzer * (1 - 1e-12))
        assert eta[0] > eta[1]  # hotter = less resistive

    def test_diffusion_time(self):
        tau = float(resistive_diffusion_time(2.0, 1e-8))
        np.testing.assert_allclose(tau, 4e-7 * np.pi * 4.0 / 1e-8, rtol=1e-12)


class TestEvolution:
    def test_flux_relaxes_with_hot_plasma_slowly(self):
        """Hot plasma: resistive time >> dt, psi barely moves in one step."""
        p = _params()
        psi0 = initial_psi(p)
        te = 10.0 * jnp.ones(p.nr)
        ne = 5.0 * jnp.ones(p.nr)
        psi1 = step_current_diffusion(p, psi0, 1e-3, te, ne, 1.5,
                                      jnp.zeros(p.nr))
        rel = float(jnp.max(jnp.abs(psi1 - psi0)) /
                    jnp.max(jnp.abs(psi0)))
        assert rel < 1e-3, rel

    def test_cold_plasma_diffuses_faster(self):
        p = _params()
        psi0 = initial_psi(p)
        ne = 5.0 * jnp.ones(p.nr)
        hot = step_current_diffusion(p, psi0, 0.1, 10.0 * jnp.ones(p.nr),
                                     ne, 1.5, jnp.zeros(p.nr))
        cold = step_current_diffusion(p, psi0, 0.1, 0.1 * jnp.ones(p.nr),
                                      ne, 1.5, jnp.zeros(p.nr))
        d_hot = float(jnp.max(jnp.abs(hot - psi0)))
        d_cold = float(jnp.max(jnp.abs(cold - psi0)))
        assert d_cold > 10.0 * d_hot

    def test_current_drive_source_raises_flux(self):
        p = _params()
        psi0 = initial_psi(p)
        te = 1.0 * jnp.ones(p.nr)
        ne = 5.0 * jnp.ones(p.nr)
        j_cd = 1e5 * jnp.exp(-((np.asarray(p.rho()) - 0.3) / 0.1) ** 2)
        with_cd = step_current_diffusion(p, psi0, 0.1, te, ne, 1.5,
                                         jnp.asarray(j_cd))
        without = step_current_diffusion(p, psi0, 0.1, te, ne, 1.5,
                                         jnp.zeros(p.nr))
        assert float(jnp.max(jnp.abs(with_cd - without))) > 0.0

    def test_scan_evolution_finite(self):
        p = _params()
        psi0 = initial_psi(p)
        te = 2.0 * jnp.ones(p.nr)
        ne = 5.0 * jnp.ones(p.nr)
        psi_f, trace = run_current_diffusion(
            p, psi0, 0.05, te, ne, 1.5, jnp.zeros(p.nr), n_steps=100)
        assert np.all(np.isfinite(np.asarray(psi_f)))
        assert np.all(np.isfinite(np.asarray(trace["q0"])))
        # Edge Dirichlet held exactly.
        np.testing.assert_allclose(float(psi_f[-1]), float(psi0[-1]), atol=1e-12)
