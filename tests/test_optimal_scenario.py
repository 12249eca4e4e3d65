"""Gradient shot-design through the integrated scenario."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.optimal_scenario import (
    OptimizerConfig,
    ShotKnobs,
    optimize_shot,
    shot_objective,
)
from scpn_fusion_tpu.control.scenario import FluxBudget

BUDGET = FluxBudget(phi_cs_vs=280.0, l_plasma_uh=7.0, r0_m=6.2)


def _knobs(p=30.0, ne=8.0, ip=12.0):
    return ShotKnobs(p_aux_flat_mw=jnp.asarray(p),
                     ne_flat_19=jnp.asarray(ne),
                     ip_flat_ma=jnp.asarray(ip))


class TestObjective:
    def test_differentiable_through_the_shot(self):
        cfg = OptimizerConfig(n_iters=1)

        def f(p_aux):
            loss, _ = shot_objective(_knobs(p=p_aux), BUDGET,
                                     m=__import__(
                'scpn_fusion_tpu.models.physics.integrated_scenario',
                fromlist=['ScenarioMachine']).ScenarioMachine(), cfg=cfg)
            return loss

        g = jax.grad(f)(jnp.asarray(30.0))
        assert np.isfinite(float(g))
        assert float(g) != 0.0

    def test_constraint_penalty_activates(self):
        from scpn_fusion_tpu.models.physics.integrated_scenario import (
            ScenarioMachine,
        )
        cfg = OptimizerConfig()
        tight = FluxBudget(phi_cs_vs=105.0, l_plasma_uh=7.0, r0_m=6.2)
        loss_ok, _ = shot_objective(_knobs(), BUDGET, ScenarioMachine(),
                                    cfg)
        loss_tight, _ = shot_objective(_knobs(), tight, ScenarioMachine(),
                                       cfg)
        assert float(loss_tight) > float(loss_ok)


class TestOptimizer:
    def test_improves_q_from_conservative_start(self):
        cfg = OptimizerConfig(n_iters=25, learning_rate=0.6)
        k0 = _knobs(p=20.0, ne=6.0, ip=10.0)
        from scpn_fusion_tpu.models.physics.integrated_scenario import (
            ScenarioMachine,
        )
        loss0, rep0 = shot_objective(k0, BUDGET, ScenarioMachine(), cfg)
        res = optimize_shot(k0, BUDGET, cfg=cfg)
        assert float(res.q_flattop) > float(rep0.q_flattop)
        assert bool(res.feasible)
        # knobs stayed inside the box
        assert cfg.ip_bounds[0] <= float(res.knobs.ip_flat_ma) \
            <= cfg.ip_bounds[1]
        assert cfg.p_aux_bounds[0] <= float(res.knobs.p_aux_flat_mw) \
            <= cfg.p_aux_bounds[1]
