"""Reduced Hall-MHD discovery sandbox: tearing drive, sweep, threshold.

Reference parity anchors: ``core/hall_mhd_discovery.py:103-345`` (HallMHD,
parameter_sweep, find_tearing_threshold).
"""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.physics.hall_mhd_discovery import (
    HallMHDState,
    background_flux_k,
    find_tearing_threshold,
    init_hall_mhd,
    parameter_sweep,
    run_hall_mhd,
)


def test_unforced_run_decays_and_stays_finite():
    """With no background drive the perturbation must not grow (decaying
    sandbox): finite energies, late energy below the initial peak."""
    s0 = init_hall_mhd(jax.random.PRNGKey(0))
    tr = run_hall_mhd(s0, n_steps=300)
    e = np.asarray(tr.total_energy)
    assert np.all(np.isfinite(e))
    assert e[-1] < 5.0 * e.max()           # bounded
    assert e[-1] <= np.max(e[:50]) * 2.0   # no sustained growth


def test_determinism_per_seed():
    s0 = init_hall_mhd(jax.random.PRNGKey(7))
    e1 = np.asarray(run_hall_mhd(s0, n_steps=100).total_energy)
    e2 = np.asarray(run_hall_mhd(s0, n_steps=100).total_energy)
    np.testing.assert_array_equal(e1, e2)


def test_current_sheet_injects_energy():
    """The driven sheet sustains more late-time energy than the unforced
    decay from the same seed — reconnection at the sheet feeds the
    perturbation.  (The reference's own tests gate only plumbing; this is
    the strongest physics statement its 'empirical sandbox' drive
    supports, and the eta-bisection threshold below inherits the same
    disclosure.)"""
    s0 = init_hall_mhd(jax.random.PRNGKey(1))
    free = run_hall_mhd(s0, eta=1e-4, background_amplitude=0.0,
                        n_steps=400)
    driven = run_hall_mhd(s0, eta=1e-4, background_amplitude=1.0,
                          n_steps=400)
    e_free = float(np.asarray(free.total_energy)[-1])
    e_driven = float(np.asarray(driven.total_energy)[-1])
    assert np.isfinite(e_driven)
    assert e_driven > 1.05 * e_free


def test_zonal_energy_subset_of_total():
    s0 = init_hall_mhd(jax.random.PRNGKey(2))
    tr = run_hall_mhd(s0, background_amplitude=1.0, n_steps=150)
    assert np.all(np.asarray(tr.zonal_energy)
                  <= np.asarray(tr.total_energy) + 1e-12)


def test_background_flux_is_cos_x_sheet():
    psi0 = np.asarray(jnp.fft.ifft2(background_flux_k(64, 2.0)).real)
    x = np.linspace(0.0, 2 * np.pi, 64, endpoint=False)
    np.testing.assert_allclose(psi0[0, :], 2.0 * np.cos(x), atol=1e-10)
    np.testing.assert_allclose(psi0[10, :], psi0[0, :], atol=1e-10)


def test_parameter_sweep_growth_decreases_with_eta():
    """Vmapped (eta, nu) sweep: averaged growth at the lowest eta exceeds
    the highest eta (resistive suppression of the driven sheet)."""
    etas, nus, growth = parameter_sweep(
        jax.random.PRNGKey(3), eta_range=(1e-5, 3e-3),
        nu_range=(1e-5, 1e-4), n_points=3, sim_steps=250)
    etas, growth = np.asarray(etas), np.asarray(growth)
    lo = growth[etas == etas.min()].mean()
    hi = growth[etas == etas.max()].mean()
    assert np.all(np.isfinite(growth))
    assert lo > hi


def test_tearing_threshold_bracketed():
    res = find_tearing_threshold(
        jax.random.PRNGKey(4), eta_range=(1e-6, 1e-2),
        n_bisect=6, sim_steps=300)
    thr = float(res["threshold_eta"])
    assert 1e-6 <= thr <= 1e-2
    assert float(res["lo"]) <= thr <= float(res["hi"])
