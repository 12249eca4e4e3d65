"""SCPN controller + plant fused closed loop (the Q10-demo shape)."""

import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.scpn import ControllerConfig, StochasticPetriNet
from scpn_fusion_tpu.scpn.controller import build_controller
from scpn_fusion_tpu.control.neuro_closed_loop import (
    ReducedPlantState,
    run_neuro_closed_loop,
)


def build_rz_controller(dtype=jnp.float64, gain=0.5):
    """R/Z regulation net: 4 error places -> 4 transitions -> 4 command places."""
    net = StochasticPetriNet()
    for p in ("eR+", "eR-", "eZ+", "eZ-", "cR+", "cR-", "cZ+", "cZ-"):
        net.add_place(p)
    for t, src, dst in (("tR+", "eR+", "cR+"), ("tR-", "eR-", "cR-"),
                        ("tZ+", "eZ+", "cZ+"), ("tZ-", "eZ-", "cZ-")):
        net.add_transition(t, threshold=0.02)
        net.add_arc(src, t)
        net.add_arc(t, dst)
    compiled = net.compile()
    return build_controller(
        compiled,
        axis_targets=[6.2, 0.0],
        axis_scales=[0.5, 0.5],
        injections=[("eR+", 0, True, 1.0, 0.0), ("eR-", 0, False, 1.0, 0.0),
                    ("eZ+", 1, True, 1.0, 0.0), ("eZ-", 1, False, 1.0, 0.0)],
        actions=[("cR+", "cR-", gain, 5.0, 1e4),
                 ("cZ+", "cZ-", gain, 5.0, 1e4)],
        dtype=dtype,
    )


def test_closed_loop_regulates_position():
    ctrl = build_rz_controller()
    cfg = ControllerConfig(firing_mode="fractional", firing_margin=0.5, dt=1e-3)
    plant0 = ReducedPlantState(jnp.float64(6.5), jnp.float64(0.3))
    _, plant_f, trace = run_neuro_closed_loop(
        ctrl, cfg, plant0, n_ticks=4000, dt=1e-3)
    r = np.asarray(trace["r"])
    z = np.asarray(trace["z"])
    assert np.all(np.isfinite(r)) and np.all(np.isfinite(z))
    # Controller pulls the axis towards target from the offset start.
    assert abs(r[-1] - 6.2) < abs(r[0] - 6.2)
    assert abs(z[-1] - 0.0) < abs(z[0] - 0.0)
    assert abs(float(plant_f.r) - 6.2) < 0.15
    assert abs(float(plant_f.z)) < 0.15


def test_uncontrolled_plant_drifts_away():
    """Negative control: zero-gain actions leave the vertical drift unopposed."""
    ctrl = build_rz_controller(gain=0.0)
    cfg = ControllerConfig(firing_mode="fractional", firing_margin=0.5, dt=1e-3)
    plant0 = ReducedPlantState(jnp.float64(6.2), jnp.float64(0.0))
    _, plant_f, _ = run_neuro_closed_loop(ctrl, cfg, plant0, n_ticks=4000, dt=1e-3)
    assert float(plant_f.z) > 0.05  # drift 0.02 m/s * 4 s unopposed


def test_stochastic_loop_stays_bounded():
    ctrl = build_rz_controller(dtype=jnp.float32)
    cfg = ControllerConfig(firing_mode="binary", sc_binary_margin=0.3,
                           sc_n_passes=16, dt=1e-3)
    plant0 = ReducedPlantState(jnp.float32(6.4), jnp.float32(0.2))
    _, plant_f, trace = run_neuro_closed_loop(
        ctrl, cfg, plant0, n_ticks=2000, dt=1e-3)
    r = np.asarray(trace["r"])
    assert np.all((r >= 2.0) & (r <= 10.0))
    assert abs(float(plant_f.r) - 6.2) < 0.5
