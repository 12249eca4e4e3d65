#!/usr/bin/env python
"""Example 6 — FMG cascade solve + fault-tolerant magnetic control.

Two of the framework's production features in one runnable script:

1. The FMG (nested-iteration) equilibrium cascade
   (``fixed_boundary.solve_equilibrium_fmg``): converge coarse, prolong,
   warm-start fine — the 513^2 headline path (reference counterpart: the
   warm-start forward economics of
   ``jax_predictive_forward_compiled.py``, without needing a previous
   shot).  Here at 257^2 on CPU.
2. A fault-tolerant closed-loop shot (``control.fault_tolerant``):
   two coils are lost mid-shot, the Tikhonov allocation reconfigures
   inside the compiled scan, tracking recovers to machine precision
   (reference counterpart: ``control/fault_tolerant_control.py``).

Run:  python examples/06_fmg_and_fault_tolerance.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.control.fault_tolerant import (  # noqa: E402
    ACTUATOR_LOSS,
    run_fault_tolerant_shot,
)
from scpn_fusion_tpu.core.config import (      # noqa: E402
    Coil, Dimensions, PhysicsParams, ReactorConfig, SolverParams,
)
from scpn_fusion_tpu.models.equilibrium import solve_equilibrium  # noqa: E402
from scpn_fusion_tpu.models.equilibrium.fixed_boundary import (   # noqa: E402
    solve_equilibrium_fmg,
)


def main() -> None:
    # ── 1) FMG cascade ──
    coils = (
        Coil(r=3.5, z=4.8, current=-1.0), Coil(r=8.0, z=4.8, current=4.0),
        Coil(r=10.8, z=0.0, current=6.0), Coil(r=8.0, z=-4.8, current=4.0),
        Coil(r=3.5, z=-4.8, current=-1.0), Coil(r=10.8, z=2.5, current=3.0),
    )
    cfg = ReactorConfig(
        reactor_name="example-fmg", grid_resolution=(257, 257),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=coils,
        physics=PhysicsParams(plasma_current_target=15.0,
                              vacuum_permeability=1.0),
        solver=SolverParams(max_iterations=600, convergence_threshold=1e-4,
                            relaxation_factor=1.0,
                            solver_method="anderson_mg", anderson_depth=4))

    res, info = solve_equilibrium_fmg(cfg, min_coarse=65)
    direct = solve_equilibrium(cfg, dtype=jnp.float64)
    span = float(jnp.max(direct.psi) - jnp.min(direct.psi))
    dev = float(jnp.max(jnp.abs(res.psi - direct.psi))) / span
    ladder = " -> ".join(f"{lv['n']}^2({lv['iterations']}it)"
                         for lv in info)
    print(f"FMG cascade: {ladder}; direct solve: "
          f"{int(direct.iterations)} iterations at 257^2")
    print(f"same fixed point: span-rel deviation {dev:.2e}")
    assert bool(res.converged) and dev < 1e-3
    assert info[-1]["iterations"] < int(direct.iterations)

    # ── 2) Fault-tolerant shot ──
    rng = np.random.default_rng(11)
    jac = jnp.asarray(rng.standard_normal((4, 6)))
    target = jnp.asarray([1.0, -0.5, 0.3, 0.8])
    trace = run_fault_tolerant_shot(
        jac, target,
        fault_times=jnp.asarray([50, 80, -1]),
        fault_kinds=jnp.asarray([ACTUATOR_LOSS, ACTUATOR_LOSS, 0]),
        fault_indices=jnp.asarray([0, 3, -1]),
        n_steps=200)
    errs = np.asarray(trace.error_norm)
    print(f"fault-tolerant shot: coils 0 and 3 lost at t=50/80; "
          f"error at t=49: {errs[49]:.2e}, spike after fault: "
          f"{errs[50:90].max():.2e}, final: {errs[-1]:.2e}")
    assert errs[-1] < 1e-6 and bool(trace.controllable[-1])
    print("OK: reallocation recovered tracking with 4 of 6 coils")


if __name__ == "__main__":
    main()
