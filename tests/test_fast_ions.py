"""Fast-ion ensemble physics: classification, prompt loss, slowing-down.

Gates mirror the reference's ``orbit_following.py`` semantics
(classifier :171-201, ensemble prior :220-242, prompt-loss scaling
:295-336, NRL/Stix formulary :337-442) plus integrator-integrity checks
the reference does not run (whole-ensemble energy audit)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.models.physics.fast_ions import (
    ALPHA_AMU,
    ALPHA_BIRTH_KEV,
    ALPHA_Z,
    coulomb_log_ei,
    critical_velocity,
    first_orbit_loss,
    follow_ensemble,
    heating_partition,
    sample_fast_ion_birth,
    slowing_down_time,
    tau_spitzer_electron,
    tokamak_field,
)

R0, A, B0 = 6.2, 2.0, 5.3


@pytest.fixture(scope="module")
def iter_field():
    return tokamak_field(B0, R0, A)


@pytest.fixture(scope="module")
def followed(iter_field):
    """One followed 256-particle alpha population (module-scoped: the
    compile + run is shared by every gate below)."""
    key = jax.random.PRNGKey(0)
    states = sample_fast_ion_birth(key, 256, iter_field, r0=R0, a=A)
    stats = follow_ensemble(
        states, iter_field, m_amu=ALPHA_AMU, charge_z=ALPHA_Z,
        dt=1e-8, n_steps=4000,
        r_wall_in=R0 - A - 0.5, r_wall_out=R0 + A + 0.5, z_wall=A + 0.5)
    return states, stats


def test_birth_prior_shape(iter_field):
    states = sample_fast_ion_birth(jax.random.PRNGKey(1), 2048,
                                   iter_field, r0=R0, a=A)
    rm = np.hypot(np.asarray(states.r) - R0, np.asarray(states.z))
    # Beta(2,5): centrally peaked, vanishing at the edge.
    assert rm.max() < A
    assert np.median(rm) < 0.45 * A
    # Isotropic pitch: both co- and counter-going present.
    v_par = np.asarray(states.v_par)
    assert (v_par > 0).mean() > 0.35 and (v_par < 0).mean() > 0.35
    # Birth energy is exact: m v_tot^2 / 2 with v_perp from mu B.
    m = ALPHA_AMU * 1.66053906660e-27
    br, bz, bp = iter_field(states.r, states.z)
    b_mag = np.sqrt(np.asarray(br)**2 + np.asarray(bz)**2
                    + np.asarray(bp)**2)
    e_kev = (0.5 * m * v_par**2 + np.asarray(states.mu) * b_mag) \
        / 1.602176634e-19 / 1e3
    np.testing.assert_allclose(e_kev, ALPHA_BIRTH_KEV, rtol=1e-6)


def test_ensemble_classification_partition(followed):
    _, stats = followed
    n = 256
    assert int(stats.n_passing + stats.n_trapped + stats.n_lost) == n
    # A centrally-born 3.5 MeV alpha population in an ITER-like field:
    # most particles confined, a real trapped population present.
    assert float(stats.loss_fraction) < 0.35
    assert 0.05 < float(stats.trapped_fraction) < 0.75
    # Energy audit: surviving orbits conserve E to well under 1%.
    assert float(stats.energy_drift_rel_max) < 1e-2


def test_ensemble_deterministic(iter_field, followed):
    states, stats = followed
    again = follow_ensemble(
        states, iter_field, m_amu=ALPHA_AMU, charge_z=ALPHA_Z,
        dt=1e-8, n_steps=4000,
        r_wall_in=R0 - A - 0.5, r_wall_out=R0 + A + 0.5, z_wall=A + 0.5)
    assert int(again.n_lost) == int(stats.n_lost)
    np.testing.assert_array_equal(np.asarray(again.final.r),
                                  np.asarray(stats.final.r))


def test_trapped_fraction_grows_with_birth_radius(iter_field):
    """Wider-born populations see larger mirror ratios -> more trapping
    (the banana-fraction ~ sqrt(epsilon) trend)."""
    def trapped_frac(a_birth, key):
        states = sample_fast_ion_birth(key, 512, iter_field,
                                       r0=R0, a=a_birth)
        stats = follow_ensemble(
            states, iter_field, m_amu=ALPHA_AMU, charge_z=ALPHA_Z,
            dt=1e-8, n_steps=4000,
            r_wall_in=R0 - A - 0.5, r_wall_out=R0 + A + 0.5,
            z_wall=A + 0.5)
        return float(stats.trapped_fraction)

    key = jax.random.PRNGKey(7)
    narrow = trapped_frac(0.4, key)
    wide = trapped_frac(1.6, key)
    # Absolute fractions are well below the naive outboard-midplane
    # sqrt(2*eps) cone estimate because the uniform-poloidal-angle birth
    # puts many particles inboard, where the local cone closes; the
    # radial TREND is the physics gate.
    assert wide > narrow + 0.02


def test_first_orbit_loss_scaling():
    # Falls with plasma current (B_pol confines the banana), grows with
    # birth energy; matches the closed form.
    lo = float(first_orbit_loss(R0, A, 15.0))
    hi = float(first_orbit_loss(R0, A, 3.0))
    assert lo < hi <= 1.0
    hot = float(first_orbit_loss(R0, A, 15.0, e_kev=2 * ALPHA_BIRTH_KEV))
    assert hot > lo
    m = ALPHA_AMU * 1.66053906660e-27
    v = np.sqrt(2 * ALPHA_BIRTH_KEV * 1e3 * 1.602176634e-19 / m)
    b_pol = 1.25663706212e-6 * 15e6 / (2 * np.pi * A)
    rho = m * v / (ALPHA_Z * 1.602176634e-19 * b_pol)
    np.testing.assert_allclose(lo, min(1.0, rho / A), rtol=1e-12)


def test_slowing_down_formulary():
    # ITER-like: Te=20 keV, ne=1e20 -> lnL ~ 17-18, tau_se ~ 1.0 s
    # (the standard alpha slowing-down time; the reference's "~0.3 s"
    # docstring anchor is the ~10 keV value of the same formula).
    lnl = float(coulomb_log_ei(20.0, 1.0))
    assert 15.0 < lnl < 20.0
    tau = float(tau_spitzer_electron(20.0, 1.0))
    assert 0.6 < tau < 1.5
    assert 0.2 < float(tau_spitzer_electron(10.0, 1.0)) < 0.5

    v_c = float(critical_velocity(20.0))
    m = ALPHA_AMU * 1.66053906660e-27
    v_birth = np.sqrt(2 * ALPHA_BIRTH_KEV * 1e3 * 1.602176634e-19 / m)
    # 3.5 MeV alpha is born super-critical: heats electrons first.
    assert v_birth > v_c
    f_i, f_e = heating_partition(v_birth, v_c)
    assert float(f_e) > 0.5 > float(f_i)
    assert np.isclose(float(f_i) + float(f_e), 1.0)
    # Below v_c the partition flips to ions.
    f_i2, f_e2 = heating_partition(0.5 * v_c, v_c)
    assert float(f_i2) > 0.5 > float(f_e2)

    # Slow-down time from birth to v_c is a finite fraction of tau_se,
    # and monotone in the target speed.
    t1 = float(slowing_down_time(v_birth, v_c, v_c, tau))
    t2 = float(slowing_down_time(v_birth, 2.0 * v_c, v_c, tau))
    assert 0.0 < t2 < t1 < 3.0 * tau

    # Vectorised over a profile in one call.
    te = jnp.linspace(5.0, 25.0, 16)
    taus = tau_spitzer_electron(te, jnp.full((16,), 1.0))
    assert taus.shape == (16,)
    assert bool(jnp.all(jnp.diff(taus) > 0))   # hotter -> slower drag
