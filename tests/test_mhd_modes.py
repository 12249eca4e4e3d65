"""TAE, tearing/Rutherford, locked mode, MRTI tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.mhd_modes import (
    alfven_speed,
    delta_prime_cylindrical,
    locked_mode_evolution,
    mrti_growth_rate,
    rutherford_island_evolution,
    tae_frequency,
    tae_stability,
)


class TestTAE:
    def test_iter_tae_frequency_ballpark(self):
        # ITER-like: B=5.3, n=1e20, q=1.5, R=6.2 -> f_TAE ~ 50-200 kHz
        f = float(tae_frequency(5.3, 10.0, 1.5, 6.2))
        assert 3e4 < f < 3e5

    def test_alfven_speed_scaling(self):
        v1 = float(alfven_speed(5.0, 10.0))
        v2 = float(alfven_speed(10.0, 10.0))
        assert v2 == pytest.approx(2.0 * v1)

    def test_drive_threshold(self):
        stable = tae_stability(b_t=5.3, n_i_19=10.0, q=1.5, r0_m=6.2,
                               a_m=2.0, beta_fast_pct=0.1,
                               v_fast_over_va=0.8)
        assert not bool(stable.unstable)   # sub-Alfvenic: no drive
        hot = tae_stability(b_t=5.3, n_i_19=10.0, q=1.5, r0_m=6.2,
                            a_m=2.0, beta_fast_pct=8.0,
                            v_fast_over_va=1.8)
        assert bool(hot.unstable)


class TestTearing:
    def _profile(self, width):
        rho = jnp.linspace(0.01, 1.0, 64)
        q = 1.0 + 2.5 * rho ** 2
        j = jnp.exp(-(rho / width) ** 2)
        return rho, q, j

    def test_gradient_at_rational_surface_destabilises(self):
        # q=2 sits at rho ~ 0.632.  A current channel whose steep flank
        # crosses that surface (width ~ r_s) is tearing-unstable; a very
        # peaked channel leaves no gradient there and is stable.
        rho, q, j_flank = self._profile(0.632)
        _, _, j_peaked = self._profile(0.15)
        res_f = delta_prime_cylindrical(rho, q, j_flank, 2.0)
        res_p = delta_prime_cylindrical(rho, q, j_peaked, 2.0)
        assert bool(res_f.classically_unstable)
        assert not bool(res_p.classically_unstable)
        # rational surface q=2 at rho = sqrt(0.4) ~ 0.63
        assert float(res_f.r_s_m) == pytest.approx(2.0 * 0.632, rel=0.05)

    def test_rutherford_growth_and_saturation(self):
        tr = rutherford_island_evolution(
            delta_prime=jnp.asarray(5.0), r_s_m=jnp.asarray(1.2),
            eta_ohm_m=jnp.asarray(1e-7), n_steps=5000, dt=1e-2)
        w = np.asarray(tr.w_m)
        assert w[-1] > w[0]
        assert w[-1] == pytest.approx(float(tr.saturated_w_m), rel=0.05)

    def test_stable_delta_prime_decays(self):
        tr = rutherford_island_evolution(
            delta_prime=jnp.asarray(-4.0), r_s_m=jnp.asarray(1.2),
            eta_ohm_m=jnp.asarray(1e-7), w0_m=0.02, n_steps=3000, dt=1e-2)
        assert float(tr.w_m[-1]) < 0.02
        assert not bool(tr.locked_risk)


class TestLockedMode:
    def test_locking_bifurcation_in_error_field(self):
        ok = locked_mode_evolution(w_island_m=0.03, b_error_mt=0.05,
                                   omega0_hz=5000.0)
        assert not bool(ok.locked)
        bad = locked_mode_evolution(w_island_m=0.12, b_error_mt=5.0,
                                    omega0_hz=100.0)
        assert bool(bad.locked)
        assert float(bad.omega_final) < float(ok.omega_final)


class TestMRTI:
    def test_unmagnetised_classical_rate(self):
        res = mrti_growth_rate(g_eff_m_s2=1e9, k_m=100.0, b_t=0.0,
                               n_i_19=1.0)
        assert float(res.gamma_s) == pytest.approx(np.sqrt(1e9 * 100.0),
                                                   rel=1e-6)

    def test_tension_stabilises_short_wavelengths(self):
        res = mrti_growth_rate(g_eff_m_s2=1e9, k_m=1e6, b_t=2.0,
                               n_i_19=0.01, theta_kb_rad=0.0)
        assert bool(res.stabilised)
        # perpendicular k (k.B = 0): no stabilisation
        perp = mrti_growth_rate(g_eff_m_s2=1e9, k_m=1e6, b_t=2.0,
                                n_i_19=0.01, theta_kb_rad=np.pi / 2)
        assert not bool(perp.stabilised)

    def test_cutoff_consistency(self):
        res = mrti_growth_rate(g_eff_m_s2=1e9, k_m=1.0, b_t=2.0,
                               n_i_19=0.01)
        k_c = float(res.k_cutoff_m)
        at_cut = mrti_growth_rate(g_eff_m_s2=1e9, k_m=k_c * 1.01, b_t=2.0,
                                  n_i_19=0.01)
        assert bool(at_cut.stabilised)
