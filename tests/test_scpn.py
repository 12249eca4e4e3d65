"""SCPN Petri-net builder + jitted controller runtime tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.scpn import (
    CompiledController,
    ControllerConfig,
    StochasticPetriNet,
    controller_step,
    initial_controller_state,
    run_controller,
)
from scpn_fusion_tpu.scpn.controller import build_controller, extract_features, oracle_step


def build_vertical_control_net():
    """Minimal R/Z shape-control net: error places drive up/down transitions
    that move tokens into actuator command places (the reference's flight-sim
    controller shape)."""
    net = StochasticPetriNet()
    for p in ("err_R_pos", "err_R_neg", "cmd_R_pos", "cmd_R_neg"):
        net.add_place(p)
    net.add_transition("t_R_up", threshold=0.1)
    net.add_transition("t_R_down", threshold=0.1)
    net.add_arc("err_R_pos", "t_R_up", 1.0)
    net.add_arc("t_R_up", "cmd_R_pos", 1.0)
    net.add_arc("err_R_neg", "t_R_down", 1.0)
    net.add_arc("t_R_down", "cmd_R_neg", 1.0)
    return net


def make_controller(net=None, dtype=jnp.float64):
    net = net or build_vertical_control_net()
    compiled = net.compile()
    ctrl = build_controller(
        compiled,
        axis_targets=[6.2],           # R target [m]
        axis_scales=[0.5],
        injections=[("err_R_pos", 0, True, 1.0, 0.0),
                    ("err_R_neg", 0, False, 1.0, 0.0)],
        actions=[("cmd_R_pos", "cmd_R_neg", 2.0, 5.0, 100.0)],
        dtype=dtype,
    )
    return ctrl


class TestStructure:
    def test_builder_validation(self):
        net = StochasticPetriNet()
        net.add_place("p1")
        net.add_transition("t1")
        with pytest.raises(ValueError):
            net.add_place("p1")
        with pytest.raises(ValueError):
            net.add_arc("p1", "p1")        # place->place
        with pytest.raises(ValueError):
            net.add_arc("p1", "t1", weight=-1.0)
        with pytest.raises(ValueError):
            net.add_place("bad", initial_tokens=2.0)

    def test_compile_incidence_matrices(self):
        net = build_vertical_control_net()
        c = net.compile()
        assert c.w_in.shape == (2, 4)
        assert c.w_out.shape == (4, 2)
        assert c.w_in[c.transition_index("t_R_up"),
                      c.place_index("err_R_pos")] == 1.0
        assert c.w_out[c.place_index("cmd_R_pos"),
                       c.transition_index("t_R_up")] == 1.0

    def test_inhibitor_arc_negative_weight(self):
        net = build_vertical_control_net()
        net.add_arc("cmd_R_pos", "t_R_down", weight=0.5, inhibitor=True)
        c = net.compile()
        assert c.w_in[c.transition_index("t_R_down"),
                      c.place_index("cmd_R_pos")] == -0.5

    def test_boundedness_and_liveness(self):
        net = build_vertical_control_net()
        b = net.verify_boundedness()
        assert b["bounded"] in (True, False)  # report contract
        li = net.verify_liveness()
        assert li["live"] is True, li


class TestController:
    def test_feature_extraction(self):
        ctrl = make_controller()
        pos, neg = extract_features(ctrl, jnp.asarray([6.0]))  # obs below target
        # err = (6.2 - 6.0)/0.5 = +0.4 -> pos channel
        np.testing.assert_allclose(float(pos[0]), 0.4, rtol=1e-6)
        assert float(neg[0]) == 0.0
        pos2, neg2 = extract_features(ctrl, jnp.asarray([7.2]))
        np.testing.assert_allclose(float(neg2[0]), 1.0)  # clamped at 1

    def test_step_pushes_action_towards_target(self):
        ctrl = make_controller()
        cfg = ControllerConfig(dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        # Plasma at R=6.0 < target 6.2 -> err pos -> t_R_up fires -> positive cmd.
        s, actions, diag = controller_step(ctrl, cfg, s, jnp.asarray([6.0]), jnp.int32(0))
        assert float(actions[0]) > 0.0
        # Opposite error gives opposite action (fresh state).
        s2 = initial_controller_state(ctrl, cfg)
        s2, actions2, _ = controller_step(ctrl, cfg, s2, jnp.asarray([6.4]), jnp.int32(0))
        assert float(actions2[0]) < 0.0

    def test_slew_and_abs_clamps(self):
        ctrl = make_controller()
        cfg = ControllerConfig(dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        _, actions, _ = controller_step(ctrl, cfg, s, jnp.asarray([5.0]), jnp.int32(0))
        # slew: max step from 0 is slew_per_s * dt = 100 * 0.01 = 1.0
        assert abs(float(actions[0])) <= 1.0 + 1e-9

    def test_deterministic_by_tick(self):
        """Same (state, obs, k) must give identical actions — the reference's
        deterministic-stochastic contract."""
        ctrl = make_controller()
        cfg = ControllerConfig(firing_mode="binary", sc_binary_margin=0.2,
                               sc_n_passes=32, dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        _, a1, d1 = controller_step(ctrl, cfg, s, jnp.asarray([6.0]), jnp.int32(7))
        _, a2, d2 = controller_step(ctrl, cfg, s, jnp.asarray([6.0]), jnp.int32(7))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        # Different tick -> different stochastic sample (almost surely).
        _, a3, _ = controller_step(ctrl, cfg, s, jnp.asarray([6.0]), jnp.int32(8))
        assert a3.shape == a1.shape

    def test_stochastic_estimates_match_oracle_in_expectation(self):
        ctrl = make_controller()
        cfg_sc = ControllerConfig(firing_mode="fractional", firing_margin=0.5,
                                  sc_n_passes=512, dt=0.01)
        s = initial_controller_state(ctrl, cfg_sc)
        obs = jnp.asarray([6.0])
        # Average stochastic firing over ticks vs float oracle.
        fires = []
        for k in range(24):
            _, _, diag = controller_step(ctrl, cfg_sc, s, obs, jnp.int32(k))
            fires.append(np.asarray(diag["firing"]))
        mean_fire = np.mean(fires, axis=0)
        pos, neg = extract_features(ctrl, obs)
        m = s.marking.at[ctrl.inj_place_ids].set(
            jnp.where(ctrl.inj_is_pos, pos[ctrl.inj_axis_idx], neg[ctrl.inj_axis_idx]))
        f_oracle, _ = oracle_step(ctrl, cfg_sc, m)
        np.testing.assert_allclose(mean_fire, np.asarray(f_oracle), atol=0.05)

    def test_delay_ring_buffer(self):
        net = StochasticPetriNet()
        net.add_place("src", initial_tokens=1.0)
        net.add_place("dst")
        net.add_transition("t_delayed", threshold=0.5, delay_ticks=3)
        net.add_arc("src", "t_delayed")
        net.add_arc("t_delayed", "dst")
        compiled = net.compile()
        ctrl = build_controller(
            compiled, axis_targets=[0.0], axis_scales=[1.0],
            injections=[], actions=[("dst", "src", 1.0, 10.0, 1e6)],
            dtype=jnp.float64)
        cfg = ControllerConfig(max_delay_ticks=4, dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        outputs = []
        for k in range(6):
            s, actions, diag = controller_step(
                ctrl, cfg, s, jnp.asarray([0.0]), jnp.int32(k))
            outputs.append(float(np.asarray(diag["firing"]).max()))
        # The transition is enabled from tick 0 but its effect must only
        # materialise after 3 ticks of delay.
        assert outputs[0] == 0.0 and outputs[1] == 0.0 and outputs[2] == 0.0
        assert max(outputs[3:]) > 0.0

    def test_bitflip_fault_injection_bounded(self):
        ctrl = make_controller(dtype=jnp.float32)
        cfg = ControllerConfig(sc_bitflip_rate=0.3, dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        for k in range(10):
            s, actions, diag = controller_step(
                ctrl, cfg, s, jnp.asarray([6.0], jnp.float32), jnp.int32(k))
            m = np.asarray(diag["marking"])
            assert np.all(np.isfinite(m))
            assert np.all((m >= 0.0) & (m <= 1.0))

    def test_run_controller_scan(self):
        ctrl = make_controller()
        cfg = ControllerConfig(dt=0.01)
        s = initial_controller_state(ctrl, cfg)
        obs_seq = jnp.asarray(np.linspace(5.8, 6.6, 50)[:, None])
        final, trace = run_controller(ctrl, cfg, s, obs_seq)
        trace = np.asarray(trace)
        assert trace.shape == (50, 1)
        assert np.all(np.isfinite(trace))
        # Early obs (below target) push positive; late obs (above) negative.
        assert trace[0, 0] >= 0.0
        assert trace[-1, 0] <= 0.0
