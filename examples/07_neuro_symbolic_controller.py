#!/usr/bin/env python
"""Example 7 — the SCPN pipeline end-to-end: Petri net → compiled SNN
controller → artifact round-trip → closed loop with safety interlocks.

The framework's namesake path (reference counterparts:
``scpn/structure.py`` builder DSL, ``scpn/compiler.py``,
``scpn/controller.py`` runtime, ``scpn/safety_interlocks.py``, and the
``.scpnctl.json`` artifact). Here the whole controller tick is a jitted
pure function, so the closed loop — plant AND controller — runs as one
``lax.scan`` on device.

Run:  python examples/07_neuro_symbolic_controller.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.scpn import (             # noqa: E402
    ControllerConfig, StochasticPetriNet, initial_controller_state,
    run_controller,
)
from scpn_fusion_tpu.scpn.artifact import (    # noqa: E402
    export_controller, import_controller,
)
from scpn_fusion_tpu.scpn.controller import (  # noqa: E402
    build_controller, controller_step,
)
from scpn_fusion_tpu.scpn.safety_interlocks import (          # noqa: E402
    SafetyInterlockRuntime,
)


def build_position_net() -> StochasticPetriNet:
    """R-position regulation net: error places excite up/down transitions
    feeding actuator command places — the reference's flight-sim shape.
    The firing threshold sets the controller deadband: threshold x
    feature scale = 0.02 x 0.5 m = 1 cm."""
    net = StochasticPetriNet()
    for p in ("err_R_pos", "err_R_neg", "cmd_R_pos", "cmd_R_neg"):
        net.add_place(p)
    net.add_transition("t_R_up", threshold=0.02)
    net.add_transition("t_R_down", threshold=0.02)
    net.add_arc("err_R_pos", "t_R_up", 1.0)
    net.add_arc("t_R_up", "cmd_R_pos", 1.0)
    net.add_arc("err_R_neg", "t_R_down", 1.0)
    net.add_arc("t_R_down", "cmd_R_neg", 1.0)
    # actuator-command decay: consuming transitions keep the net bounded
    # (a command place with no consumer accumulates without limit and the
    # Monte-Carlo boundedness screen below would reject the net)
    net.add_transition("t_R_pos_relax", threshold=0.3)
    net.add_transition("t_R_neg_relax", threshold=0.3)
    net.add_arc("cmd_R_pos", "t_R_pos_relax", 1.0)
    net.add_arc("cmd_R_neg", "t_R_neg_relax", 1.0)
    return net


def main() -> None:
    # ── 1. Build + formally screen the net ──
    net = build_position_net()
    bounded = net.verify_boundedness(n_steps=200, n_trials=16)
    live = net.verify_liveness(n_steps=200, n_trials=16)
    print(f"Petri net: bounded={bounded['bounded']} "
          f"(max token {bounded['max_token']:.2f}), live={live['live']}")
    assert bounded["bounded"] and live["live"]

    # ── 2. Compile to incidence matrices + build the SNN controller ──
    ctrl = build_controller(
        net.compile(),
        axis_targets=[6.2],                       # R target [m]
        axis_scales=[0.5],
        injections=[("err_R_pos", 0, True, 1.0, 0.0),
                    ("err_R_neg", 0, False, 1.0, 0.0)],
        actions=[("cmd_R_pos", "cmd_R_neg", 4.0, 10.0, 100.0)],
        dtype=jnp.float64,
    )

    # ── 3. Artifact round-trip (.scpnctl.json schema) ──
    cfg = ControllerConfig(dt=1e-3)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "position.scpnctl.json"
        export_controller(ctrl, cfg, path,
                          meta={"name": "example07-position"})
        ctrl2, cfg2, payload = import_controller(path, dtype=jnp.float64)
    assert cfg2.dt == cfg.dt and payload["sha256"]
    np.testing.assert_allclose(np.asarray(ctrl.w_in),
                               np.asarray(ctrl2.w_in), rtol=0, atol=0)
    print("artifact round-trip: exact")

    # ── 4. Closed loop: 1D plant + controller tick by tick ──
    # Plant: dR/dt = -k (R - R_eq) + g·u, drifting equilibrium pulls the
    # axis outward; the controller must hold R at 6.2 m.
    state = initial_controller_state(ctrl, cfg)
    n_ticks, k_relax, gain = 400, 2.0, 0.5

    r = 6.2
    rs, r_unc = [], 6.2
    rs_unc = []
    # pre-draw the controlled trajectory by alternating plant/controller
    # (the library's flight_sim module fuses this into one scan; spelled
    # out here so the plant physics is visible)
    obs_seq = []
    for _ in range(n_ticks):
        obs_seq.append([r])
        # one controller tick on the latest observation
        state, act, _ = controller_step(
            ctrl, cfg, state, jnp.asarray([r]), jnp.int32(len(rs)))
        u = float(act[0])
        r += cfg.dt * (-k_relax * (r - 6.45) + gain * u)   # drift to 6.45
        r_unc += cfg.dt * (-k_relax * (r_unc - 6.45))
        rs.append(r)
        rs_unc.append(r_unc)

    err_ctrl = abs(rs[-1] - 6.2)
    err_unc = abs(rs_unc[-1] - 6.2)
    print(f"final |R - 6.2|: controlled={err_ctrl * 100:.2f} cm, "
          f"uncontrolled={err_unc * 100:.2f} cm")
    assert err_ctrl < 0.35 * err_unc, "controller must beat the drift"

    # ── 5. The same controller through the one-scan API ──
    obs = jnp.asarray(np.asarray(rs)[:, None])
    final, trace = run_controller(ctrl, cfg,
                                  initial_controller_state(ctrl, cfg), obs)
    assert np.all(np.isfinite(np.asarray(trace)))

    # ── 6. Safety interlocks vet the actuator ──
    runtime = SafetyInterlockRuntime()
    ok_actions = runtime.update_from_state(
        {"T_e": 12.0, "n_e": 8.0, "beta_N": 1.8, "I_p": 12.0, "dZ_dt": 0.1})
    trip_actions = runtime.update_from_state(
        {"T_e": 30.0, "n_e": 14.0, "beta_N": 3.5, "I_p": 12.0, "dZ_dt": 0.1})
    print(f"interlocks nominal: {ok_actions}")
    print(f"interlocks tripped: {trip_actions}")
    assert all(ok_actions.values())
    assert not all(trip_actions.values())

    print("OK: SCPN pipeline end-to-end (net -> SNN -> artifact -> "
          "closed loop -> interlocks)")


if __name__ == "__main__":
    main()
