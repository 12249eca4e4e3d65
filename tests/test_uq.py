"""UQ tests: PCE fit/predict/Sobol, LHS, MC chains."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.uq.mc import (
    EquilibriumUncertainty,
    PlasmaScenario,
    TransportUncertainty,
    fusion_power_from_tau,
    ipb98_covariance,
    ipb98_tau_e,
    quantify_full_chain,
    quantify_uncertainty,
)
from scpn_fusion_tpu.models.uq.pce import (
    design_matrix,
    fit_pce,
    hermite_table,
    latin_hypercube,
    predict_pce,
    sobol_first_order,
    total_order_multi_index,
)

ITER = PlasmaScenario(i_p_ma=15.0, b_t=5.3, p_heat_mw=50.0, n_e_19=10.1,
                      r_major=6.2, aspect=3.1, kappa=1.7)


class TestPCE:
    def test_multi_index_counts(self):
        # Total order p in d dims: C(d+p, p) terms.
        assert len(total_order_multi_index(2, 2)) == 6
        assert len(total_order_multi_index(3, 2)) == 10
        mi = total_order_multi_index(2, 2)
        assert mi[0] == (0, 0)   # constant term first

    def test_hermite_values(self):
        x = jnp.asarray([0.0, 1.0, 2.0])
        he = np.asarray(hermite_table(x, 3))
        np.testing.assert_allclose(he[:, 0], 1.0)
        np.testing.assert_allclose(he[:, 1], [0.0, 1.0, 2.0])
        np.testing.assert_allclose(he[:, 2], [-1.0, 0.0, 3.0])   # x^2 - 1
        np.testing.assert_allclose(he[:, 3], [0.0, -2.0, 2.0])   # x^3 - 3x

    def test_fit_recovers_polynomial(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (400, 2))

        def f(x):
            return 2.0 + 0.5 * x[:, 0] + 1.5 * (x[:, 1]**2 - 1.0) \
                + 0.3 * x[:, 0] * x[:, 1]

        y = f(x)[:, None]
        model = fit_pce(x, y, order=2)
        x_test = jax.random.normal(jax.random.PRNGKey(1), (50, 2))
        pred = predict_pce(model, x_test)[:, 0]
        np.testing.assert_allclose(np.asarray(pred), np.asarray(f(x_test)),
                                   atol=1e-4)

    def test_single_point_predict(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (100, 2))
        y = (x[:, :1] * 3.0)
        model = fit_pce(x, y, order=1)
        out = predict_pce(model, jnp.asarray([1.0, 0.0]))
        np.testing.assert_allclose(float(out[0]), 3.0, atol=1e-5)

    def test_sobol_identifies_dominant_input(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (500, 3))
        y = (5.0 * x[:, 0] + 0.5 * x[:, 2])[:, None]
        model = fit_pce(x, y, order=2)
        s = np.asarray(sobol_first_order(model))
        assert s.shape == (3,)
        assert s[0] > 0.9
        assert s[1] < 0.05
        np.testing.assert_allclose(s.sum(), 1.0, atol=0.05)

    def test_fit_validation(self):
        with pytest.raises(ValueError):
            fit_pce(jnp.zeros((3, 2)), jnp.zeros((4, 1)), 1)
        with pytest.raises(ValueError):
            fit_pce(jnp.asarray([[jnp.nan, 0.0]]), jnp.zeros((1, 1)), 1)

    def test_latin_hypercube_stratified(self):
        pts = np.asarray(latin_hypercube(jax.random.PRNGKey(0), 100, 3))
        assert pts.shape == (100, 3)
        assert np.all((pts >= 0) & (pts <= 1))
        # Stratification: exactly one sample per 1/n slice in each dim.
        for d in range(3):
            bins = np.floor(pts[:, d] * 100).astype(int)
            assert len(np.unique(bins)) == 100


class TestMC:
    def test_central_tau_matches_scaling(self):
        from scpn_fusion_tpu.models.uq.mc import IPB98_CENTRAL
        tau = float(ipb98_tau_e(ITER, jnp.asarray(IPB98_CENTRAL)))
        # ITER-like point at P_loss = 50 MW: IPB98(y,2) gives ~5.3 s
        # (the canonical 3.7 s uses ~87 MW loss power).
        assert 4.0 < tau < 6.5

    def test_fusion_power_reasonable(self):
        pfus = float(fusion_power_from_tau(ITER, 3.7))
        assert 100.0 < pfus < 2000.0

    def test_quantify_uncertainty_bands(self):
        res = quantify_uncertainty(ITER, n_samples=4000, seed=0)
        assert res.n_samples == 4000
        tau_p = np.asarray(res.tau_e_percentiles)
        assert np.all(np.diff(tau_p) >= 0)         # ordered percentiles
        assert tau_p[0] < float(res.tau_e) < tau_p[-1]
        assert float(res.tau_e_sigma) > 0
        assert float(res.q_sigma) > 0
        assert np.all(np.isfinite(np.asarray(res.p_fusion_percentiles)))

    def test_reproducible_with_seed(self):
        r1 = quantify_uncertainty(ITER, n_samples=500, seed=7)
        r2 = quantify_uncertainty(ITER, n_samples=500, seed=7)
        np.testing.assert_allclose(float(r1.tau_e), float(r2.tau_e))

    def test_covariance_symmetric_negdef_pair(self):
        cov = ipb98_covariance()
        np.testing.assert_allclose(cov, cov.T)
        assert cov[0, 5] < 0     # C <-> alpha_R anti-correlation
        np.linalg.cholesky(cov + 1e-12 * np.eye(9))

    def test_full_chain_widens_uncertainty(self):
        base = quantify_uncertainty(ITER, n_samples=3000, seed=1)
        full = quantify_full_chain(
            ITER, EquilibriumUncertainty(), TransportUncertainty(),
            n_samples=3000, seed=1)
        # Transport channels add variance on top of the scaling posterior.
        assert float(full.tau_e_sigma) > float(base.tau_e_sigma)
        bands = np.asarray(full.q_bands)
        assert bands[0] <= bands[1] <= bands[2]
        assert np.all(np.isfinite(np.asarray(full.psi_nrmse_bands)))
