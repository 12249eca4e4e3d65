#!/usr/bin/env python
"""Example 8 — gradient-based inverse design + uncertainty quantification.

Two capabilities the reference showcases in its ``06_inverse_and_transport
_benchmarks`` / ``09_coil_optimization`` / ``10_uncertainty_quantification``
notebooks, here as one script:

1. **Inverse design through the solver.** The predictive free-boundary
   forward is differentiable end-to-end via the implicit-function-theorem
   adjoint (``models/equilibrium/differentiable.py``, reference
   ``jax_free_boundary_predictive.py:625-800``), so coil currents are
   optimised by plain gradient descent THROUGH the converged equilibrium
   — no finite differences, no surrogate.
2. **UQ.** Monte-Carlo over the IPB98(y,2) coefficient posterior
   (vectorised — one ``vmap`` instead of the reference's per-sample loop)
   plus a polynomial-chaos (PCE) Sobol decomposition identifying which
   coefficient dominates the Q uncertainty.

Run:  python examples/08_inverse_design_and_uq.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.core.grid import Grid      # noqa: E402
from scpn_fusion_tpu.models.equilibrium.differentiable import (  # noqa: E402
    PredictiveTheta, axis_sensitivity, build_predictive_model,
    optimize_coil_currents_diff, solve_predictive_diff,
)
from scpn_fusion_tpu.models.equilibrium.topology import (  # noqa: E402
    soft_axis_flux,
)
from scpn_fusion_tpu.models.uq.mc import (      # noqa: E402
    IPB98_CENTRAL, PlasmaScenario, fusion_power_from_tau, ipb98_tau_e,
    quantify_uncertainty,
)
from scpn_fusion_tpu.models.uq.pce import (     # noqa: E402
    fit_pce, latin_hypercube, predict_pce, sobol_first_order,
)


def main() -> None:
    # ── 1. Inverse design: drive the axis flux to a target ──
    grid = Grid(NR=33, NZ=33, R_min=4.0, R_max=9.0, Z_min=-4.0, Z_max=4.0,
                dtype=np.dtype("float64"))
    model = build_predictive_model(grid, coil_r=(3.6, 9.4, 9.4, 3.6),
                                   coil_z=(3.8, 2.2, -2.2, -3.8))
    theta0 = PredictiveTheta(
        coil_currents=jnp.asarray([2e6, 4e6, 4e6, 2e6]),
        p_coeffs=jnp.asarray([1.0, 0.1, 0.1, 1.5]),
        ip_target=jnp.asarray(1.5e7))

    psi0 = solve_predictive_diff(model, theta0, n_fwd=150)
    target = soft_axis_flux(psi0) * 1.10       # ask for 10% more axis flux
    theta1 = optimize_coil_currents_diff(
        model, theta0, target, lr=5e4, n_steps=12, n_fwd=100, n_bwd=100)
    psi1 = solve_predictive_diff(model, theta1, n_fwd=150)

    l0 = float((soft_axis_flux(psi0) - target) ** 2)
    l1 = float((soft_axis_flux(psi1) - target) ** 2)
    print(f"inverse design: axis-flux loss {l0:.3e} -> {l1:.3e} "
          f"({l0 / max(l1, 1e-30):.0f}x) in 12 adjoint-gradient steps")
    assert l1 < 0.25 * l0

    # exact sensitivities come with the same adjoint machinery
    g = axis_sensitivity(model, theta1, n_fwd=120, n_bwd=120)
    print("d(axis flux)/d(coil currents) =",
          np.array2string(np.asarray(g.coil_currents), precision=2))
    assert np.all(np.isfinite(np.asarray(g.coil_currents)))

    # ── 2. Monte-Carlo UQ over the IPB98 posterior ──
    iter_like = PlasmaScenario(i_p_ma=15.0, b_t=5.3, p_heat_mw=50.0,
                               n_e_19=10.0, r_major=6.2, aspect=3.1,
                               kappa=1.8)
    uq = quantify_uncertainty(iter_like, n_samples=20000)
    p5, p50, p95 = (float(uq.q_percentiles[i]) for i in (0, 2, 4))
    print(f"UQ (20k MC samples): tau_E = {float(uq.tau_e):.2f} s, "
          f"Q median {p50:.1f}, 90% band [{p5:.1f}, {p95:.1f}]")
    assert p5 < p50 < p95 and p50 > 5.0

    # ── 3. PCE surrogate + Sobol attribution ──
    # vary (Ip, P_heat, n_e) multipliers; which drives Q spread?
    key = jax.random.PRNGKey(7)
    u = latin_hypercube(key, 256, 3)            # LHS in [0,1]^3
    x = jax.scipy.special.ndtri(jnp.clip(u, 1e-4, 1 - 1e-4))  # -> N(0,1)
    mult = 1.0 + 0.05 * np.clip(np.asarray(x), -3, 3)  # ±5% 1-sigma inputs

    central = jnp.asarray(IPB98_CENTRAL)

    def q_of(m):
        # central-coefficient Q at the perturbed machine point (the jitted
        # MC path retraces per scenario — the deterministic chain is the
        # right tool for a 256-point design sweep)
        s = PlasmaScenario(i_p_ma=15.0 * float(m[0]), b_t=5.3,
                           p_heat_mw=50.0 * float(m[1]),
                           n_e_19=10.0 * float(m[2]),
                           r_major=6.2, aspect=3.1, kappa=1.8)
        tau = ipb98_tau_e(s, central)
        return float(fusion_power_from_tau(s, tau) / s.p_heat_mw)

    y = jnp.asarray([q_of(m) for m in mult])[:, None]
    pce = fit_pce(jnp.asarray(x), y, order=2)
    sob = np.asarray(sobol_first_order(pce))
    names = ("Ip", "P_heat", "n_e")
    print("Sobol first-order indices:",
          {n: round(float(s), 3) for n, s in zip(names, sob)})
    # IPB98: tau ∝ Ip^0.93 with Q compounding through self-heating — the
    # current multiplier must dominate heating at fixed fractional spread
    assert int(np.argmax(sob)) == 0

    r2 = 1.0 - float(jnp.var(y[:, 0] - predict_pce(pce, jnp.asarray(x))[:, 0])
                     / jnp.var(y[:, 0]))
    print(f"PCE order-2 surrogate R^2 = {r2:.3f}")
    assert r2 > 0.9

    print("OK: adjoint inverse design + MC/PCE uncertainty chain")


if __name__ == "__main__":
    main()
