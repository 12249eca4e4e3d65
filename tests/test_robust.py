"""mu-synthesis (D-K lite) + RWM feedback tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.robust import (
    build_rwm_plant,
    mu_synthesis,
    rwm_feedback_design,
)


class TestMuSynthesis:
    def test_stabilises_unstable_plant_with_bound(self):
        a = jnp.asarray([[0.5, 1.0], [0.0, -2.0]])   # one unstable pole
        b = jnp.asarray([[0.0], [1.0]])
        c = jnp.eye(2)
        res = mu_synthesis(a, b, c, n_dk_iters=3)
        a_cl = np.asarray(a - b @ res.k_gain)
        assert np.max(np.real(np.linalg.eigvals(a_cl))) < 0.0
        assert bool(res.converged)
        assert np.isfinite(float(res.mu_upper_bound))
        assert res.d_scales.shape == (2,)

    def test_mu_bound_grows_with_uncertainty(self):
        a = jnp.asarray([[0.2, 0.5], [0.0, -1.0]])
        b = jnp.asarray([[0.0], [1.0]])
        c = jnp.eye(2)
        lo = mu_synthesis(a, b, c, uncertainty_scale=0.1)
        hi = mu_synthesis(a, b, c, uncertainty_scale=0.5)
        assert float(hi.mu_upper_bound) >= float(lo.mu_upper_bound)


class TestRWM:
    def test_open_loop_unstable_closed_loop_stable(self):
        plant = build_rwm_plant(gamma_rwm=50.0)
        open_rate = float(np.max(np.real(
            np.linalg.eigvals(np.asarray(plant.a)))))
        assert open_rate > 0.0
        res = rwm_feedback_design(plant)
        assert bool(res.stabilised), float(res.closed_loop_rate)
        amp = np.asarray(res.trace)
        assert abs(amp[-1]) < abs(amp[0])

    def test_feedback_through_wall_only(self):
        # actuation enters only through the wall state (b[0] == 0): the
        # controller must work through the wall dynamics.
        plant = build_rwm_plant()
        assert float(plant.b[0, 0]) == 0.0
        res = rwm_feedback_design(plant, q_weight=500.0)
        assert bool(res.stabilised)


class TestStructuredMu:
    """Structured uncertainty + block-diagonal mu bound (reference
    mu_synthesis.py:23-140 D-scaling semantics, exact-gradient here)."""

    def test_block_validation(self):
        from scpn_fusion_tpu.control.robust import (
            StructuredUncertainty, UncertaintyBlock)
        with pytest.raises(ValueError, match="size"):
            UncertaintyBlock("d1", 0, 0.1)
        with pytest.raises(ValueError, match="bound"):
            UncertaintyBlock("d1", 1, -0.5)
        with pytest.raises(ValueError, match="block type"):
            UncertaintyBlock("d1", 1, 0.1, "weird")
        with pytest.raises(ValueError, match="at least one"):
            StructuredUncertainty(())

    def test_unstructured_equals_spectral_norm(self):
        from scpn_fusion_tpu.control.robust import mu_upper_bound
        m = jnp.asarray([[3.0, 1.0], [0.0, 2.0]])
        assert float(mu_upper_bound(m)) == pytest.approx(
            float(jnp.linalg.norm(m, 2)), rel=1e-6)

    def test_d_scaling_tightens_bound(self):
        """For an upper-triangular M, the structured bound over scalar
        blocks approaches the spectral radius (D-scaling removes the
        off-diagonal contribution) — strictly below sigma_max."""
        from scpn_fusion_tpu.control.robust import (
            StructuredUncertainty, UncertaintyBlock, mu_upper_bound)
        m = jnp.asarray([[1.0, 10.0], [0.0, 1.0]])
        struct = StructuredUncertainty((
            UncertaintyBlock("d1", 1, 0.1),
            UncertaintyBlock("d2", 1, 0.1)))
        mu = float(mu_upper_bound(m, struct, n_steps=300, lr=0.3))
        sigma = float(jnp.linalg.norm(m, 2))
        assert mu < 0.5 * sigma      # D-scaling bites hard here
        assert mu >= 1.0 - 1e-3      # never below the spectral radius

    def test_structure_size_mismatch(self):
        from scpn_fusion_tpu.control.robust import (
            StructuredUncertainty, UncertaintyBlock, mu_upper_bound)
        struct = StructuredUncertainty((UncertaintyBlock("d1", 3, 0.1),))
        with pytest.raises(ValueError, match="match"):
            mu_upper_bound(jnp.eye(2), struct)

    def test_dk_iteration_structured_stabilises(self):
        from scpn_fusion_tpu.control.robust import (
            StructuredUncertainty, UncertaintyBlock,
            dk_iteration_structured)
        a = jnp.asarray([[0.5, 1.0], [0.0, -2.0]])   # one unstable mode
        b = jnp.asarray([[0.0], [1.0]])
        c = jnp.eye(2)
        struct = StructuredUncertainty((
            UncertaintyBlock("mode", 1, 0.2),
            UncertaintyBlock("wall", 1, 0.2)))
        res = dk_iteration_structured(a, b, c, struct)
        assert bool(res.converged)
        a_cl = a - b @ res.k_gain
        assert float(jnp.max(jnp.real(jnp.linalg.eigvals(a_cl)))) < 0.0
        assert float(res.mu_upper_bound) > 0.0
