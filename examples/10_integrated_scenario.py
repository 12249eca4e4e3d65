#!/usr/bin/env python
"""Example 10 — a whole discharge: scenario schedule → GS↔transport
self-consistency → TGLF-informed turbulent transport → flight report.

Reference counterpart: the ``07_multi_ion_transport`` notebook + the
WDM one-scan discharge (``integrated_scenario.py``,
``integrated_transport_solver_coupling.py``, ``gk_tglf_native.py``).
Three altitudes of the same physics, all compiled:

1. **0D whole shot**: ramp-up → flattop → ramp-down as one `lax.scan`
   with H-mode access, flux-budget and Greenwald accounting.
2. **1.5D↔2D self-consistency**: the multi-ion Crank-Nicolson transport
   stepper coupled to the Grad-Shafranov solve (profiles → J_phi source
   → psi → metric → profiles) iterated to a joint fixed point.
3. **Turbulence closure**: native TGLF (SAT rules) growth rates on the
   converged profiles — the gyrokinetic lane that sets chi in the
   hybrid closure.

Run:  python examples/10_integrated_scenario.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.control.scenario import (  # noqa: E402
    FluxBudget, standard_shot_schedule,
)
from scpn_fusion_tpu.core.grid import Grid      # noqa: E402
from scpn_fusion_tpu.models.equilibrium.vacuum import (  # noqa: E402
    vacuum_psi_from_config,
)
from scpn_fusion_tpu.models.physics.integrated_scenario import (  # noqa: E402
    run_shot,
)
from scpn_fusion_tpu.models.transport import (  # noqa: E402
    TransportParams, initial_state,
)
from scpn_fusion_tpu.models.transport.coupling import (  # noqa: E402
    run_self_consistent,
)
from tests.test_fixed_boundary import make_cfg  # noqa: E402


def main() -> None:
    # ── 1. 0D whole shot (one scan) ──
    sched = standard_shot_schedule(ip_flat_ma=15.0, ramp_s=60.0,
                                   flattop_s=300.0, ne_flat_19=10.0,
                                   p_aux_flat_mw=50.0)
    trace, report = run_shot(sched, FluxBudget(phi_cs_vs=280.0,
                                               l_plasma_uh=7.0, r0_m=6.2))
    print(f"ITER-like shot: Q_flattop = {float(report.q_flattop):.1f}, "
          f"H-mode {float(report.h_mode_duration_s):.0f} s, "
          f"flux_exhausted={bool(report.flux_exhausted)}, "
          f"greenwald_violated={bool(report.greenwald_violated)}")
    assert bool(report.reached_burn) and float(report.q_flattop) > 5.0
    assert not bool(report.flux_exhausted)

    # ── 2. GS <-> multi-ion transport joint fixed point ──
    cfg = make_cfg("multigrid", n=33, max_iter=150)
    grid = Grid.from_config(cfg, dtype=np.float64)
    tp = TransportParams(nr=25, multi_ion=True)
    ts = initial_state(tp, jnp.float64)
    psi_bc = vacuum_psi_from_config(grid, cfg).astype(jnp.float64)

    res = run_self_consistent(
        cfg, grid, tp, ts, psi_bc, psi_bc,
        p_aux_mw=jnp.float64(30.0), dt=jnp.float64(0.02),
        n_inner=10, n_outer=6, psi_tol=1e-3)
    ti = np.asarray(res.transport.ti)
    print(f"self-consistent point: outer iters = "
          f"{int(res.outer_iterations)}, converged = "
          f"{bool(res.converged)}, T_i(0) = {ti[0]:.2f} keV, "
          f"tau_core = {float(res.t_core):.3f}")
    assert bool(res.converged)
    assert ti[0] > ti[-1] > 0.0, "core must be hotter than edge"

    # ── 3. TGLF-native growth rates on the converged profiles ──
    from scpn_fusion_tpu.models.gyrokinetics.tglf_native import (
        tglf_native_fluxes,
    )
    # mid-radius dimensionless gradients from the converged state
    rho = np.linspace(0.0, 1.0, ti.shape[0])
    mid = ti.shape[0] // 2
    a_over_lt = float(-np.gradient(np.log(np.maximum(ti, 1e-3)),
                                   rho)[mid])
    ne = np.asarray(res.transport.ne)
    a_over_ln = float(-np.gradient(np.log(np.maximum(ne, 1e-3)),
                                   rho)[mid])
    # a/L -> R/L with R0/a = 3.1
    fl = tglf_native_fluxes(
        3.1 * a_over_lt, 3.1 * a_over_lt, 3.1 * a_over_ln,
        q=1.8, s_hat=0.8, epsilon=0.16, te_ti=1.0, nu_star=0.1,
        a=2.0, b0=5.3, r0=6.2, t_i_kev=float(ti[mid]))
    ky, gamma = fl.k_y, fl.gamma
    g = np.asarray(gamma)
    print(f"chi_i (SAT1 quasilinear) = {float(fl.chi_i):.2f} m^2/s")
    print(f"TGLF spectrum on converged profiles: peak gamma = "
          f"{g.max():.3f} c_s/a at ky rho_s = "
          f"{float(np.asarray(ky)[int(g.argmax())]):.2f} "
          f"(a/L_T = {a_over_lt:.2f})")
    assert np.all(np.isfinite(g))
    assert g.max() > 0.0, "driven profiles must be ITG/TEM unstable"

    print("OK: schedule -> coupled equilibrium/transport -> GK closure")


if __name__ == "__main__":
    main()
