"""RF heating (ICRH ray tracing, ECRH deposition) + current-drive tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.current_drive import (
    CurrentDriveMix,
    ECCDSource,
    LHCDSource,
    NBISource,
)
from scpn_fusion_tpu.models.physics.rf_heating import (
    ECRHParams,
    ICRHParams,
    ecrh_deposition,
    icrh_dispersion,
    icrh_power_deposition,
    trace_icrh_rays,
)


class TestICRH:
    def test_resonance_field(self):
        p = ICRHParams()
        # 50 MHz fundamental D resonance: B = 2 pi f m / q ~ 6.55 T.
        np.testing.assert_allclose(p.b_resonance, 6.55, rtol=0.02)

    def test_dispersion_vacuum_limit(self):
        p = ICRHParams()
        # Far outside the blob the density is ~0 -> vacuum D = 1.
        d = float(icrh_dispersion(p, 12.0, 5.0, -10.0, 0.0))
        np.testing.assert_allclose(d, 1.0, atol=1e-3)

    def test_rays_launch_inward_and_stay_finite(self):
        p = ICRHParams()
        rays = trace_icrh_rays(p, n_rays=6, n_steps=80)
        r = np.asarray(rays.r)
        assert r.shape == (6, 80)
        assert np.all(np.isfinite(r))
        assert np.all(np.isfinite(np.asarray(rays.z)))
        # Launched with k_R < 0 from R=9: rays move inward initially.
        assert np.all(r[:, 10] < 9.0)

    def test_frozen_rays_hold_last_state(self):
        p = ICRHParams()
        rays = trace_icrh_rays(p, n_rays=4, n_steps=60)
        frozen = np.asarray(rays.frozen)
        r = np.asarray(rays.r)
        # Wherever frozen, the state must stop changing.
        for i in range(4):
            idx = np.nonzero(frozen[i])[0]
            if idx.size > 1:
                np.testing.assert_array_equal(r[i, idx], r[i, idx[0]])

    def test_power_deposition_conserves_and_bins(self):
        p = ICRHParams()
        rays = trace_icrh_rays(p, n_rays=8, n_steps=100)
        rho, p_dep, eff = icrh_power_deposition(p, rays, 20.0)
        p_dep = np.asarray(p_dep)
        assert p_dep.shape == (50,)
        assert np.all(p_dep >= 0)
        assert 0.0 <= float(eff) <= 1.0
        # Something is absorbed inside the plasma.
        assert float(eff) > 0.01
        assert p_dep.sum() > 0


class TestECRH:
    def test_resonance_radius_fundamental(self):
        p = ECRHParams(freq_ghz=170.0, harmonic=1)
        # B_res = omega m_e / e ~ 6.07 T -> R_res = B0 R0 / B_res ~ 5.41 m.
        np.testing.assert_allclose(p.resonance_radius, 5.41, rtol=0.02)

    def test_deposition_centred_at_resonance(self):
        p = ECRHParams()
        rho, p_dep, eff = ecrh_deposition(p, p_ecrh_mw=20.0)
        rho = np.asarray(rho)
        p_dep = np.asarray(p_dep)
        rho_res = abs(p.resonance_radius - p.r0_major) / p.a_minor
        peak = rho[int(np.argmax(p_dep))]
        assert abs(peak - rho_res) < 0.1
        assert 0.01 <= float(eff) <= 0.9901

    def test_second_harmonic_moves_layer(self):
        r1 = ECRHParams(harmonic=1).resonance_radius
        r2 = ECRHParams(harmonic=2).resonance_radius
        np.testing.assert_allclose(r2, 2 * r1, rtol=1e-9)

    def test_differentiable_in_angle(self):
        p = ECRHParams()

        def eff_of_angle(angle):
            _, _, eff = ecrh_deposition(p, launch_angle_deg=angle)
            return eff

        g = float(jax.grad(eff_of_angle)(10.0))
        assert np.isfinite(g)


class TestCurrentDrive:
    def _profiles(self, nr=50):
        rho = jnp.linspace(0.0, 1.0, nr)
        ne = 8.0 * (1 - np.asarray(rho) ** 2) ** 0.5 + 1.0
        te = 20.0 * (1 - np.asarray(rho) ** 2) + 0.5
        return rho, jnp.asarray(ne), jnp.asarray(te)

    def test_eccd_profile_and_current(self):
        rho, ne, te = self._profiles()
        src = ECCDSource(p_mw=10.0, rho_dep=0.3, sigma_rho=0.08)
        j = np.asarray(src.j_cd(rho, ne, te))
        assert np.all(j >= 0)
        assert abs(float(rho[int(np.argmax(j))]) - 0.3) < 0.1
        # Off-axis Gaussian integrates to ~P.
        p_tot = float(jnp.sum(src.p_absorbed(rho)) * (rho[1] - rho[0]))
        np.testing.assert_allclose(p_tot, 10e6, rtol=0.05)

    def test_lhcd_more_efficient_than_eccd(self):
        rho, ne, te = self._profiles()
        ec = ECCDSource(p_mw=10.0, rho_dep=0.5, sigma_rho=0.1)
        lh = LHCDSource(p_mw=10.0, rho_dep=0.5, sigma_rho=0.1)
        j_ec = float(jnp.max(ec.j_cd(rho, ne, te)))
        j_lh = float(jnp.max(lh.j_cd(rho, ne, te)))
        assert j_lh > 2.0 * j_ec

    def test_nbi_slowing_down_finite_f32(self):
        rho, ne, te = self._profiles()
        src = NBISource(p_mw=33.0, e_beam_kev=1000.0, rho_tangency=0.2)
        j = np.asarray(src.j_cd(rho.astype(jnp.float32),
                                ne.astype(jnp.float32),
                                te.astype(jnp.float32)))
        assert np.all(np.isfinite(j))
        assert np.all(j >= 0)
        assert j.max() > 0
        # Hotter plasma -> longer slowing time -> more driven current.
        j_hot = np.asarray(src.j_cd(rho, ne, 2.0 * te))
        assert j_hot.max() > j.max()

    def test_mix_totals(self):
        rho, ne, te = self._profiles()
        mix = (CurrentDriveMix(a_minor=2.0)
               .with_source(ECCDSource(10.0, 0.3, 0.08))
               .with_source(NBISource(33.0, 1000.0, 0.2)))
        j = np.asarray(mix.total_j_cd(rho, ne, te, te))
        p = np.asarray(mix.total_heating_power(rho))
        assert np.all(j >= 0) and np.all(p >= 0)
        i_tot = float(mix.total_driven_current(rho, ne, te, te,
                                               elongation=1.7))
        assert np.isfinite(i_tot) and i_tot > 0
        # Elongation increases the cross-section -> more total current.
        i_circ = float(mix.total_driven_current(rho, ne, te, te))
        assert i_tot > i_circ
