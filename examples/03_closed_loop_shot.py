#!/usr/bin/env python
"""Example 3 — Closed-loop plasma shot: 10 kHz PID position control.

Runs the reduced flight simulator (plant + actuator envelopes + PID control
compiled as ONE ``lax.scan`` program — reference counterpart:
``flight_sim.rs`` host loop) twice: with the controller on (the shot
survives) and with zero gains (the vertical instability escapes — the plant
is genuinely unstable without feedback).

Run:  python examples/03_closed_loop_shot.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.control.flight_sim import (  # noqa: E402
    FlightSimParams, run_shot_reduced,
)


def main() -> None:
    params = FlightSimParams(control_hz=10_000.0, shot_duration_s=0.5)
    trace, metrics = run_shot_reduced(params, dtype=jnp.float64)
    print(f"controlled shot: {int(params.n_steps)} steps at "
          f"{params.control_hz:.0f} Hz")
    print(f"  disruption fraction: {float(metrics['disruption_fraction']):.3f}")
    print(f"  R error p95: {float(metrics['r_err_p95']):.4f} m, "
          f"Z error p95: {float(metrics['z_err_p95']):.4f} m")
    print(f"  Ip ramp: {float(np.asarray(trace.ip_ma)[0]):.1f} -> "
          f"{float(np.asarray(trace.ip_ma)[-1]):.1f} MA")
    assert float(metrics["disruption_fraction"]) == 0.0

    open_loop = FlightSimParams(
        control_hz=1000.0, shot_duration_s=30.0,
        pid_r_kp=0.0, pid_r_ki=0.0, pid_r_kd=0.0,
        pid_z_kp=0.0, pid_z_ki=0.0, pid_z_kd=0.0)
    _, m2 = run_shot_reduced(open_loop, dtype=jnp.float64)
    print(f"open-loop (zero gains): disruption fraction "
          f"{float(m2['disruption_fraction']):.3f}")
    assert float(m2["disruption_fraction"]) > 0.0
    print("OK: feedback keeps the shot alive; the uncontrolled plant "
          "disrupts")


if __name__ == "__main__":
    main()
