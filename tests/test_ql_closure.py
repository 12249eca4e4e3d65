"""Quasilinear gyrokinetic transport closure (reference gyrokinetic_transport.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.gyrokinetics.ql_closure import (
    QLLocalParams, QLTransportModel, compute_spectrum, etg_dispersion,
    infer_nu_star, ion_scale_dispersion, quasilinear_fluxes,
)


def params(**kw) -> QLLocalParams:
    base = dict(r_l_ti=9.0, r_l_te=6.0, r_l_ne=2.0, q=1.4, s_hat=0.8,
                te_ti=1.0, z_eff=1.5, nu_star=0.1, epsilon=0.18)
    base.update(kw)
    return QLLocalParams(**{k: jnp.asarray(v, jnp.float64)
                            for k, v in base.items()})


def test_itg_unstable_above_dimits_threshold():
    p = params(r_l_ti=9.0)
    g, w, m = ion_scale_dispersion(p, jnp.asarray(0.5))
    assert float(g) > 0.0
    assert int(m) == 1
    assert float(w) < 0.0    # ion diamagnetic direction


def test_stable_below_all_thresholds():
    p = params(r_l_ti=0.5, r_l_te=0.5, r_l_ne=0.0)
    spec = compute_spectrum(p, n_modes=16, include_etg=True)
    assert float(jnp.max(spec.gamma)) == 0.0
    flux = quasilinear_fluxes(p, spec)
    assert float(flux.chi_i) == 0.0
    assert float(flux.chi_e) == 0.0


def test_tem_branch_selected_with_density_drive():
    p = params(r_l_ti=1.0, r_l_ne=6.0, nu_star=0.05)
    spec = compute_spectrum(p, n_modes=16)
    assert int(jnp.max(spec.mode_type)) == 2
    flux = quasilinear_fluxes(p, spec)
    assert float(flux.d_e) > 0.0


def test_collisionality_damps_tem():
    lo = quasilinear_fluxes(params(r_l_ti=1.0, r_l_ne=6.0, nu_star=0.05),
                            compute_spectrum(params(r_l_ti=1.0, r_l_ne=6.0,
                                                    nu_star=0.05)))
    hi = quasilinear_fluxes(params(r_l_ti=1.0, r_l_ne=6.0, nu_star=5.0),
                            compute_spectrum(params(r_l_ti=1.0, r_l_ne=6.0,
                                                    nu_star=5.0)))
    assert float(hi.d_e) < float(lo.d_e)


def test_etg_above_jenko_threshold_adds_chi_e():
    p = params(r_l_ti=0.5, r_l_te=12.0, r_l_ne=0.0)
    no_etg = quasilinear_fluxes(p, compute_spectrum(p, include_etg=False))
    with_etg = quasilinear_fluxes(p, compute_spectrum(p, include_etg=True))
    assert float(with_etg.chi_e) > float(no_etg.chi_e)
    g, w, m = etg_dispersion(p, jnp.asarray(10.0))
    assert int(m) == 3 and float(g) > 0.0


def test_nu_star_inference_scaling():
    nu = infer_nu_star(r0=6.2, q=1.5, te_kev=10.0, ne_1e19=10.0,
                       epsilon=0.3)
    nu_hot = infer_nu_star(r0=6.2, q=1.5, te_kev=20.0, ne_1e19=10.0,
                           epsilon=0.3)
    assert float(nu) > 0.0
    assert float(nu_hot) == pytest.approx(float(nu) / 4.0, rel=1e-12)


def test_profile_evaluation_vmapped_matches_pointwise():
    model = QLTransportModel(n_modes=16, include_etg=True)
    nr = 12
    rho = jnp.linspace(0.0, 1.0, nr)
    te = 10.0 * (1.0 - 0.9 * rho ** 2)
    ti = te
    ne = 8.0 * (1.0 - 0.6 * rho ** 2)
    q = 1.0 + 2.5 * rho ** 2
    s_hat = jnp.full(nr, 1.0)
    a, r0, b0 = 2.0, 6.2, 5.3
    dr = float(rho[1] - rho[0]) * a
    dte = jnp.gradient(te, dr)
    dti = jnp.gradient(ti, dr)
    dne = jnp.gradient(ne, dr)
    chi_i, chi_e, d_e = model.evaluate_profile(
        rho, te, ti, ne, q, s_hat, dte, dti, dne, r0, a, b0)
    assert chi_i.shape == (nr,)
    assert np.isfinite(np.asarray(chi_i)).all()
    # Axis guard
    assert float(chi_i[0]) == pytest.approx(model.axis_chi)
    # Off-axis ITG region transports heat
    assert float(jnp.max(chi_i)) > model.axis_chi
    # Pointwise spot check at mid-radius equals the vmapped row
    i = 6
    p = model.local_params(rho[i], te[i], ti[i], ne[i], q[i], s_hat[i],
                           dte[i], dti[i], dne[i], r0, a)
    ci, ce, de = model.evaluate_point(rho[i], p, te[i], b0, r0)
    assert float(ci) == pytest.approx(float(chi_i[i]), rel=1e-10)
    assert float(ce) == pytest.approx(float(chi_e[i]), rel=1e-10)


def test_profile_closure_is_differentiable():
    """The whole profile-level closure differentiates w.r.t. the
    temperature profile — the reference's host-loop version cannot."""
    model = QLTransportModel(n_modes=8)
    nr = 8
    rho = jnp.linspace(0.0, 1.0, nr)
    a, r0, b0 = 2.0, 6.2, 5.3

    def total_chi(te):
        dr = float(rho[1] - rho[0]) * a
        dte = jnp.gradient(te, dr)
        chi_i, chi_e, d_e = model.evaluate_profile(
            rho, te, te, jnp.full(nr, 8.0), jnp.full(nr, 1.5),
            jnp.full(nr, 1.0), dte, dte, jnp.zeros(nr), r0, a, b0)
        return jnp.sum(chi_i)

    te = 10.0 * (1.0 - 0.9 * rho ** 2)
    g = jax.grad(total_chi)(te)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0
