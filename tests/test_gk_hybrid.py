"""Hybrid surrogate+GK lane: OOD, scheduler, corrector, online learner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.gyrokinetics.hybrid import (
    REASON_ANCHOR,
    REASON_CHI_CHANGE,
    REASON_CRITICAL,
    REASON_OOD,
    SchedulerConfig,
    corrector_apply,
    corrector_update,
    fit_ood,
    init_corrector,
    init_learner,
    learner_add,
    learner_predict,
    learner_refit,
    mahalanobis_distance,
    ood_check,
    schedule_spot_checks,
)


@pytest.fixture(scope="module")
def ood_params():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 10)) * 0.5 + 1.0
    return fit_ood(jnp.asarray(x))


class TestOOD:
    def test_training_points_in_distribution(self, ood_params):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((50, 10)) * 0.5 + 1.0)
        res = ood_check(x, ood_params)
        assert np.asarray(res.is_ood).mean() < 0.1

    def test_far_point_flagged(self, ood_params):
        x = jnp.full((1, 10), 25.0)
        res = ood_check(x, ood_params)
        assert bool(res.is_ood[0])
        assert float(res.confidence[0]) == 1.0

    def test_mahalanobis_zero_at_mean(self, ood_params):
        d = mahalanobis_distance(ood_params.mean, ood_params)
        assert float(d[0]) < 1e-6

    def test_ensemble_disagreement_flags(self, ood_params):
        x = jnp.broadcast_to(ood_params.mean, (3, 10))
        res = ood_check(x, ood_params,
                        ensemble_std=jnp.asarray([0.0, 0.5, 0.1]))
        assert not bool(res.is_ood[0])
        assert bool(res.is_ood[1])


class TestScheduler:
    def setup_method(self):
        self.rho = jnp.linspace(0.0, 1.0, 32)
        self.chi = jnp.ones(32)

    def test_periodic_fires_on_period(self):
        cfg = SchedulerConfig(strategy="periodic", period=5, budget=4)
        plan0 = schedule_spot_checks(cfg, jnp.asarray(4), self.rho,
                                     self.chi, self.chi)
        assert not bool(plan0.any_requested)
        plan1 = schedule_spot_checks(cfg, jnp.asarray(5), self.rho,
                                     self.chi, self.chi)
        assert bool(plan1.any_requested)
        assert int(plan1.valid.sum()) == 3  # three anchors
        assert np.all(np.asarray(plan1.reasons)[np.asarray(plan1.valid)]
                      == REASON_ANCHOR)

    def test_adaptive_prioritises_ood_then_change(self):
        cfg = SchedulerConfig(strategy="adaptive", budget=3)
        ood = jnp.zeros(32, bool).at[7].set(True)
        prev = self.chi.at[20].set(10.0)   # big relative change at 20
        plan = schedule_spot_checks(cfg, jnp.asarray(1), self.rho,
                                    self.chi, prev, ood_mask=ood)
        idx = np.asarray(plan.indices)[np.asarray(plan.valid)]
        reasons = np.asarray(plan.reasons)[np.asarray(plan.valid)]
        assert 7 in idx and reasons[list(idx).index(7)] == REASON_OOD
        assert 20 in idx and reasons[list(idx).index(20)] == REASON_CHI_CHANGE

    def test_budget_enforced(self):
        cfg = SchedulerConfig(strategy="critical_region", budget=4)
        plan = schedule_spot_checks(cfg, jnp.asarray(1), self.rho,
                                    self.chi, self.chi)
        assert int(plan.valid.sum()) <= 4
        reasons = np.asarray(plan.reasons)[np.asarray(plan.valid)]
        assert np.all(np.isin(reasons, (REASON_CRITICAL, REASON_ANCHOR)))

    def test_jit_compatible(self):
        cfg = SchedulerConfig(strategy="adaptive", budget=3)
        fn = jax.jit(lambda s, r, c, p: schedule_spot_checks(cfg, s, r, c, p))
        plan = fn(jnp.asarray(1), self.rho, self.chi, self.chi)
        assert plan.indices.shape == (3,)

    def test_config_validation(self):
        with pytest.raises(ValueError):
            SchedulerConfig(strategy="random")
        with pytest.raises(ValueError):
            SchedulerConfig(budget=0)


class TestCorrector:
    def test_update_pulls_toward_gk(self):
        rho = jnp.linspace(0, 1, 16)
        st = init_corrector(16)
        spot_rho = jnp.asarray([0.3, 0.7, 0.0])
        valid = jnp.asarray([True, True, False])
        gk = jnp.full((3, 3), 2.0)      # GK says fluxes are 2x surrogate
        surr = jnp.ones((3, 3))
        st1 = corrector_update(st, rho, spot_rho, valid, gk, surr,
                               smoothing_alpha=0.5)
        # factors move halfway from 1.0 toward 2.0
        mid = float(st1.alpha_chi_i[8])
        assert 1.4 < mid < 1.6
        chi_i, chi_e, d_e = corrector_apply(st1, jnp.ones(16), jnp.ones(16),
                                            jnp.ones(16))
        assert float(chi_i[8]) == pytest.approx(mid)

    def test_no_valid_spots_is_identity(self):
        rho = jnp.linspace(0, 1, 8)
        st = init_corrector(8)
        st1 = corrector_update(st, rho, jnp.zeros(2),
                               jnp.asarray([False, False]),
                               jnp.ones((2, 3)) * 9.0, jnp.ones((2, 3)))
        np.testing.assert_allclose(np.asarray(st1.alpha_chi_i), 1.0)


class TestLearner:
    def test_ring_buffer_and_ridge_recovers_linear_map(self):
        rng = np.random.default_rng(3)
        w_true = rng.standard_normal((10, 3))
        st = init_learner(capacity=128)
        for _ in range(100):
            x = rng.standard_normal(10)
            y = x @ w_true + 0.5
            st = learner_add(st, jnp.asarray(x), jnp.asarray(y))
        st = learner_refit(st, l2=1e-6)
        x_test = rng.standard_normal((20, 10))
        pred = np.asarray(learner_predict(st, jnp.asarray(x_test)))
        np.testing.assert_allclose(pred, x_test @ w_true + 0.5, atol=1e-3)

    def test_wraparound(self):
        st = init_learner(capacity=4, d=2, m=1)
        for i in range(6):
            st = learner_add(st, jnp.asarray([float(i), 0.0]),
                             jnp.asarray([float(i)]))
        assert int(st.count) == 6
        # slots hold samples 4, 5, 2, 3
        assert float(st.x_buf[0, 0]) == 4.0
        assert float(st.x_buf[1, 0]) == 5.0


class TestSessionReport:
    """Verification-report parity (reference gk_verification_report.py:25-97)."""

    def test_accumulation_and_summary(self):
        from scpn_fusion_tpu.models.gyrokinetics.hybrid import (
            init_corrector, init_report, report_add_step, report_to_dict,
        )
        rep = init_report()
        sv = jnp.array([True, True, False])
        rep = report_add_step(
            rep, spot_valid=sv, ood_flags=jnp.array([False] * 9 + [True]),
            gk_chi_i=jnp.array([1.0, 2.0, 0.0]),
            surr_chi_i=jnp.array([1.2, 1.6, 5.0]),
            corrector=init_corrector(16))
        # an unverified step (no spot checks)
        rep = report_add_step(
            rep, spot_valid=jnp.zeros(3, bool),
            ood_flags=jnp.zeros(10, bool), gk_chi_i=jnp.zeros(3),
            surr_chi_i=jnp.zeros(3))
        d = report_to_dict(rep)
        assert d["total_steps"] == 2 and d["steps_verified"] == 1
        assert d["verification_fraction"] == 0.5
        assert d["total_spot_checks"] == 2 and d["ood_triggers"] == 1
        assert abs(d["max_rel_error_chi_i"] - 0.2) < 1e-6
        assert abs(d["mean_rel_error_chi_i"] - 0.2) < 1e-6

    def test_tiny_gk_flux_guard(self):
        from scpn_fusion_tpu.models.gyrokinetics.hybrid import (
            init_report, report_add_step, report_to_dict,
        )
        rep = report_add_step(
            init_report(), spot_valid=jnp.array([True]),
            ood_flags=jnp.zeros(4, bool), gk_chi_i=jnp.array([1e-12]),
            surr_chi_i=jnp.array([7.0]))
        assert report_to_dict(rep)["max_rel_error_chi_i"] == 0.0

    def test_scan_carry_and_json(self, tmp_path):
        import jax
        from scpn_fusion_tpu.models.gyrokinetics.hybrid import (
            init_report, report_add_step, report_to_json,
        )

        def step(rep, x):
            rep = report_add_step(
                rep, spot_valid=x > 0.5, ood_flags=jnp.zeros(4, bool),
                gk_chi_i=jnp.ones(3), surr_chi_i=1.0 + x)
            return rep, None

        xs = jnp.abs(jnp.sin(jnp.arange(30.0)))[:, None] * jnp.ones((30, 3))
        rep, _ = jax.lax.scan(step, init_report(), xs)
        p = tmp_path / "report.json"
        report_to_json(rep, p)
        import json
        d = json.loads(p.read_text())
        assert d["total_steps"] == 30
        assert 0.0 < d["verification_fraction"] <= 1.0
