"""SOC predator-prey sandpile + soft-Q learning tests (reference
``control/advanced_soc_fusion_learning.py`` contract)."""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.control.soc_learning import (
    CoupledSandpileConfig,
    SoftQConfig,
    coupled_sandpile_step,
    discretize_state,
    run_soc_learning,
    soft_q_update,
)


class TestCoupledSandpile:
    def test_shear_raises_critical_slope_and_suppresses(self):
        cfg = CoupledSandpileConfig()
        z = jnp.zeros(cfg.size)
        flow = jnp.asarray(0.0)
        tot_low = tot_high = 0.0
        z_l = z_h = z
        f_l = f_h = flow
        for _ in range(150):
            z_l = z_l.at[0].add(1.0)
            z_l, f_l, t_l, _ = coupled_sandpile_step(cfg, z_l, f_l, 0.0)
            tot_low += float(t_l)
            z_h = z_h.at[0].add(1.0)
            z_h, f_h, t_h, _ = coupled_sandpile_step(cfg, z_h, f_h, 1.0)
            tot_high += float(t_h)
        # External shear raises z_crit -> fewer topples (turbulence
        # suppression), the predator-prey contract.
        assert tot_high < tot_low

    def test_flow_bounded(self):
        cfg = CoupledSandpileConfig()
        z = jnp.full((cfg.size,), 50.0)
        flow = jnp.asarray(4.9)
        for _ in range(20):
            z, flow, _, _ = coupled_sandpile_step(cfg, z, flow, 0.0)
            assert cfg.flow_lo <= float(flow) <= cfg.flow_hi


class TestSoftQ:
    def test_discretize_bounds(self):
        q = SoftQConfig()
        st, sf = discretize_state(q, 1e9, 1e9)
        assert int(st) == q.n_states_turb - 1
        assert int(sf) == q.n_states_flow - 1
        st, sf = discretize_state(q, -5.0, -5.0)
        assert int(st) == 0 and int(sf) == 0

    def test_update_moves_toward_target(self):
        q = SoftQConfig(alpha=0.5, entropy_beta=0.0)
        table = jnp.zeros((5, 5, 3))
        s = (jnp.int32(1), jnp.int32(1))
        table2 = soft_q_update(q, table, s, jnp.int32(0), s, 10.0)
        assert float(table2[1, 1, 0]) == 5.0      # alpha * reward
        assert float(table2[1, 1, 1]) == 0.0      # untouched


class TestLearningSim:
    def test_runs_and_learns(self):
        trace, summary, q_table = run_soc_learning(
            jax.random.PRNGKey(0), n_steps=800)
        assert float(summary["q_table_max_abs"]) > 0.0
        assert 0.0 <= float(summary["max_external_shear"]) <= 1.0
        assert np.all(np.asarray(trace.flow) <= 5.0)
        assert np.all(np.asarray(trace.flow) >= 0.0)
        assert float(summary["mean_core_temp"]) > 0.0

    def test_deterministic(self):
        _, s1, q1 = run_soc_learning(jax.random.PRNGKey(7), n_steps=300)
        _, s2, q2 = run_soc_learning(jax.random.PRNGKey(7), n_steps=300)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        assert float(s1["total_reward"]) == float(s2["total_reward"])

    def test_greedy_epsilon_zero_differs_from_random_policy(self):
        _, s_greedy, _ = run_soc_learning(
            jax.random.PRNGKey(3), n_steps=400,
            qcfg=SoftQConfig(epsilon=0.0))
        _, s_random, _ = run_soc_learning(
            jax.random.PRNGKey(3), n_steps=400,
            qcfg=SoftQConfig(epsilon=1.0))
        assert float(s_greedy["total_reward"]) != float(
            s_random["total_reward"])
