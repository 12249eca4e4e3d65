"""Safe RL tests: plant, shield, guard, constraint costs, Lagrangian PPO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.safe_rl import (
    ACT_DIM,
    OBS_DIM,
    PPOConfig,
    TokamakEnvParams,
    collect_batch,
    constraint_costs,
    env_reset,
    env_step,
    init_policy,
    init_shield,
    interlock_allowed,
    policy_log_prob,
    policy_sample,
    position_lyapunov_v,
    ppo_update,
    predict,
    shield_action,
    shielded_env_step,
    train,
    update_lambdas,
)

P = TokamakEnvParams()


class TestPlant:
    def test_reset_and_step_shapes(self):
        s, obs = env_reset(P, jax.random.PRNGKey(0))
        assert obs.shape == (OBS_DIM,)
        s2, obs2, r, term = env_step(P, s, jnp.zeros(ACT_DIM))
        assert obs2.shape == (OBS_DIM,)
        assert np.isfinite(float(r))

    def test_vertical_instability_grows_uncontrolled(self):
        s, _ = env_reset(TokamakEnvParams(noise=0.0), jax.random.PRNGKey(1))
        s = s._replace(z=jnp.asarray(0.05))
        for _ in range(40):
            s, obs, r, term = env_step(TokamakEnvParams(noise=0.0), s,
                                       jnp.zeros(ACT_DIM))
        assert abs(float(s.z)) > 0.2 or bool(term)

    def test_current_drive_raises_ip(self):
        p = TokamakEnvParams(noise=0.0)
        s, _ = env_reset(p, jax.random.PRNGKey(2))
        ip0 = float(s.ip)
        for _ in range(20):
            s, *_ = env_step(p, s, jnp.asarray([1.0, 0.0, 0.0]))
        assert float(s.ip) > ip0


class TestShield:
    def test_interlock_gates(self):
        obs_ok = jnp.asarray([12.0, 2.0, 3.5, 0.0, 0.0, 0.0])
        allowed = interlock_allowed(P, obs_ok, obs_ok)
        assert all(bool(v) for v in allowed.values())
        obs_hot = obs_ok.at[1].set(4.0)
        assert not bool(interlock_allowed(P, obs_hot, obs_hot)["heating"])
        obs_fast = obs_ok.at[3].set(0.2)   # dZ jumps 0.2 in one dt=0.05
        assert not bool(interlock_allowed(P, obs_fast, obs_ok)["vertical"])

    def test_shield_clamps_modes(self):
        action = jnp.asarray([0.8, 0.9, -0.7])
        a, trips = shield_action(action, {"heating": jnp.bool_(False),
                                          "current": jnp.bool_(False),
                                          "vertical": jnp.bool_(False)})
        a = np.asarray(a)
        assert a[1] == 0.0            # heating frozen
        assert a[0] <= 0.0            # current ramp-up denied
        assert a[2] == 0.0            # vertical frozen
        assert int(trips) == 3
        # Non-positive current command passes the current gate unchanged.
        a2, trips2 = shield_action(jnp.asarray([-0.5, 0.0, 0.0]),
                                   {"heating": jnp.bool_(True),
                                    "current": jnp.bool_(False),
                                    "vertical": jnp.bool_(True)})
        assert float(a2[0]) == pytest.approx(-0.5)
        assert int(trips2) == 0

    def test_lyapunov_v_properties(self):
        obs0 = jnp.zeros(OBS_DIM)
        assert float(position_lyapunov_v(obs0)) == pytest.approx(0.0)
        obs_big = obs0.at[4].set(5.0).at[5].set(5.0)
        v = float(position_lyapunov_v(obs_big))
        assert 1.9 < v < 2.0

    def test_guard_halts_runaway_vertical(self):
        p = TokamakEnvParams(noise=0.0, z_gamma=6.0)
        s, obs = env_reset(p, jax.random.PRNGKey(3))
        s = s._replace(z=jnp.asarray(0.05))
        sh = init_shield(window=10)
        prev = obs
        halted = False
        for _ in range(60):
            s, obs2, r, term, sh, a = shielded_env_step(
                p, s, sh, prev, jnp.zeros(ACT_DIM))
            prev = obs
            obs = obs2
            if bool(sh.halted):
                halted = True
                break
        assert halted


class TestConstraints:
    def test_cost_vector(self):
        next_obs = jnp.asarray([15.0, 2.0, 3.5, 0.0, 0.0, 0.0])
        c = np.asarray(constraint_costs(None, None, next_obs))
        np.testing.assert_allclose(c, 0.0)
        bad = jnp.asarray([-1.0, 4.0, 1.5, 0.0, 0.0, 0.0])
        c = np.asarray(constraint_costs(None, None, bad))
        np.testing.assert_allclose(c, [0.5, 0.5, 1.0])


class TestPPO:
    def test_policy_log_prob_matches_gaussian(self):
        params = init_policy(jax.random.PRNGKey(0))
        obs = jnp.ones(OBS_DIM)
        act = jnp.zeros(ACT_DIM)
        lp = float(policy_log_prob(params, obs, act))
        # Manual Gaussian log-density.
        mu = np.asarray(obs @ params.w + params.b)
        std = np.exp(np.asarray(params.log_std))
        manual = np.sum(-0.5 * ((0 - mu) / std) ** 2 - np.log(std)
                        - 0.5 * np.log(2 * np.pi))
        np.testing.assert_allclose(lp, manual, rtol=1e-5)

    def test_collect_batch_shapes(self):
        cfg = PPOConfig(batch_episodes=4, max_episode_steps=20)
        params = init_policy(jax.random.PRNGKey(0))
        roll = collect_batch(P, cfg, params, jnp.zeros(3),
                             jax.random.PRNGKey(1))
        assert roll.obs.shape == (4, 20, OBS_DIM)
        assert roll.costs.shape == (4, 20, 3)
        assert bool(jnp.all((roll.mask == 0) | (roll.mask == 1)))

    def test_dual_update_raises_lambda_on_violation(self):
        cfg = PPOConfig()
        roll_costs = jnp.zeros((2, 5, 3)).at[:, :, 1].set(1.0)
        roll = type("R", (), {})()
        from scpn_fusion_tpu.control.safe_rl import Rollout
        roll = Rollout(jnp.zeros((2, 5, OBS_DIM)), jnp.zeros((2, 5, ACT_DIM)),
                       jnp.zeros((2, 5)), jnp.zeros((2, 5)), roll_costs,
                       jnp.ones((2, 5)), jnp.zeros(2, jnp.int32),
                       jnp.zeros(2, bool))
        lam = update_lambdas(cfg, jnp.zeros(3), roll)
        lam = np.asarray(lam)
        assert lam[1] > 0 and lam[0] == 0 and lam[2] == 0

    def test_training_improves_return(self):
        cfg = PPOConfig(batch_episodes=8, max_episode_steps=60,
                        policy_lr=0.02)
        params, lambdas, hist = train(P, cfg, n_iterations=15, seed=0)
        first = np.mean([h["mean_return"] for h in hist[:3]])
        last = np.mean([h["mean_return"] for h in hist[-3:]])
        assert last > first, f"return did not improve: {first} -> {last}"
        a = np.asarray(predict(params, jnp.zeros(OBS_DIM)))
        assert a.shape == (ACT_DIM,)
        assert np.all(np.isfinite(a))
