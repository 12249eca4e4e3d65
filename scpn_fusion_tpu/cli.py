"""Command-line interface: `python -m scpn_fusion_tpu.cli <mode> ...`.

The L6 surface (reference: ``cli.py`` console script with a 30-mode registry
dispatched through *subprocesses*, ``cli.py:39-243``).  TPU-first redesign:
modes are plain function calls in-process — there is no subprocess
indirection to amortise because solvers are compiled functions, not scripts.
argparse only (no third-party CLI dependency).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _mode_kernel(args) -> int:
    """Fixed-boundary equilibrium solve from a JSON reactor config."""
    import jax.numpy as jnp

    from scpn_fusion_tpu.core.config import load_config
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium

    cfg = load_config(args.config)
    res = solve_equilibrium(cfg)
    out = {
        "reactor": cfg.reactor_name,
        "converged": bool(res.converged),
        "iterations": int(res.iterations),
        "residual": float(res.residual),
        "gs_residual": float(res.gs_residual),
    }
    print(json.dumps(out))
    if args.output:
        np.savez(args.output, psi=np.asarray(res.psi),
                 j_phi=np.asarray(res.j_phi),
                 b_r=np.asarray(res.b_r), b_z=np.asarray(res.b_z))
        print(f"saved: {args.output}", file=sys.stderr)
    return 0 if out["converged"] else 1


def _mode_free_boundary(args) -> int:
    from scpn_fusion_tpu.core.config import load_config
    from scpn_fusion_tpu.models.equilibrium.free_boundary import solve_free_boundary

    cfg = load_config(args.config)
    res = solve_free_boundary(cfg, max_outer_iter=args.max_outer)
    out = {
        "converged": bool(res.converged),
        "outer_iterations": int(res.outer_iterations),
        "final_diff": float(res.final_diff),
        "coil_currents": np.asarray(res.coil_currents).tolist(),
    }
    print(json.dumps(out))
    if args.output:
        np.savez(args.output, psi=np.asarray(res.psi))
    return 0 if out["converged"] else 1


def _mode_geqdsk(args) -> int:
    """Reconstruct an equilibrium from a G-EQDSK file (parity lane)."""
    from scpn_fusion_tpu.io import read_geqdsk
    from scpn_fusion_tpu.models.equilibrium.eqdsk_solve import solve_from_geqdsk

    eq = read_geqdsk(args.file)
    res = solve_from_geqdsk(eq, max_iter=args.max_iter)
    out = {
        "file": str(args.file),
        "grid": [eq.nw, eq.nh],
        "converged": bool(res.converged),
        "iterations": int(res.iterations),
        "span_rel_rmse": float(res.span_rel_rmse),
        "span_rel_rmse_core": float(res.span_rel_rmse_core),
    }
    print(json.dumps(out))
    return 0 if out["converged"] else 1


def _mode_transport(args) -> int:
    import jax.numpy as jnp

    from scpn_fusion_tpu.models.transport import (
        TransportParams, initial_state, run_transport)

    params = TransportParams()
    state = initial_state(params)
    final, trace = run_transport(state, jnp.float32(args.dt),
                                 jnp.float32(args.p_aux), params, args.steps)
    out = {
        "steps": args.steps,
        "ti_core_kev": float(final.ti[1]),
        "te_core_kev": float(final.te[1]),
        "he_ash_peak": float(np.max(np.asarray(final.n_he))),
        "z_eff": float(final.z_eff),
    }
    print(json.dumps(out))
    return 0


def _mode_flight_sim(args) -> int:
    from scpn_fusion_tpu.control.flight_sim import FlightSimParams, run_shot_reduced

    params = FlightSimParams(control_hz=args.hz, shot_duration_s=args.duration)
    _, metrics = run_shot_reduced(params)
    out = {k: float(v) for k, v in metrics.items()}
    out["ticks"] = params.n_steps
    print(json.dumps(out))
    return 0 if out["disruption_fraction"] == 0.0 else 1


def _mode_burn(args) -> int:
    from scpn_fusion_tpu.models.physics.scaling_burn import burn_equilibrium_0d

    pt = burn_equilibrium_0d(
        ne19=args.ne19, p_aux_mw=args.p_aux, ip_ma=args.ip, bt_t=args.bt,
        r_m=args.r0, a_m=args.a, kappa=args.kappa)
    out = {"Q": float(pt.q_fusion), "P_fusion_MW": float(pt.p_fusion_mw),
           "T_keV": float(pt.t_kev), "tau_E_s": float(pt.tau_e_s),
           "converged": bool(pt.converged)}
    print(json.dumps(out))
    return 0


def _mode_validate(args) -> int:
    import runpy
    script = Path(__file__).resolve().parents[1] / "validation" / \
        "run_equilibrium_parity.py"
    try:
        runpy.run_path(str(script), run_name="__main__")
    except SystemExit as exc:
        return int(exc.code or 0)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="scpn-fusion-tpu",
        description="TPU-native plasma physics and control framework")
    sub = p.add_subparsers(dest="mode", required=True)

    k = sub.add_parser("kernel", help="fixed-boundary GS solve from config")
    k.add_argument("config")
    k.add_argument("--output", default=None)
    k.set_defaults(fn=_mode_kernel)

    fb = sub.add_parser("free-boundary", help="free-boundary GS solve")
    fb.add_argument("config")
    fb.add_argument("--max-outer", type=int, default=20)
    fb.add_argument("--output", default=None)
    fb.set_defaults(fn=_mode_free_boundary)

    g = sub.add_parser("geqdsk", help="reconstruct from a G-EQDSK file")
    g.add_argument("file")
    g.add_argument("--max-iter", type=int, default=400)
    g.set_defaults(fn=_mode_geqdsk)

    t = sub.add_parser("transport", help="1.5D transport scenario")
    t.add_argument("--steps", type=int, default=200)
    t.add_argument("--dt", type=float, default=0.05)
    t.add_argument("--p-aux", type=float, default=40.0)
    t.set_defaults(fn=_mode_transport)

    f = sub.add_parser("flight-sim", help="closed-loop reduced flight sim")
    f.add_argument("--hz", type=float, default=10000.0)
    f.add_argument("--duration", type=float, default=1.0)
    f.set_defaults(fn=_mode_flight_sim)

    b = sub.add_parser("burn", help="0D burn operating point")
    b.add_argument("--ne19", type=float, default=10.0)
    b.add_argument("--p-aux", type=float, default=50.0)
    b.add_argument("--ip", type=float, default=15.0)
    b.add_argument("--bt", type=float, default=5.3)
    b.add_argument("--r0", type=float, default=6.2)
    b.add_argument("--a", type=float, default=2.0)
    b.add_argument("--kappa", type=float, default=1.7)
    b.set_defaults(fn=_mode_burn)

    v = sub.add_parser("validate", help="run the validation campaign")
    v.set_defaults(fn=_mode_validate)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
