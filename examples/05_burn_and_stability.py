#!/usr/bin/env python
"""Example 5 — 0D burn operating point + full MHD stability screen.

Finds the ITER-like steady-state burn point (power balance with IPB98(y,2)
confinement), then runs the seven-criterion MHD stability suite including
the s-alpha ballooning eigenvalue scan with second-stability access
(reference counterparts: the Q>=10 scan, ``stability_mhd.py``,
``ballooning_solver.py`` + ``ballooning_second_stability.py``).

Run:  python examples/05_burn_and_stability.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.models.physics.ballooning import (   # noqa: E402
    second_stability_scan,
)
from scpn_fusion_tpu.models.physics.scaling_burn import (  # noqa: E402
    burn_equilibrium_0d,
)
from scpn_fusion_tpu.models.physics.stability_mhd import (  # noqa: E402
    compute_q_profile, mercier_stability, troyon_beta_limit,
)


def main() -> None:
    # ── Burn point ──
    burn = burn_equilibrium_0d(ne19=10.0, p_aux_mw=50.0, ip_ma=15.0,
                               bt_t=5.3, r_m=6.2, a_m=2.0, kappa=1.8)
    print("ITER-like burn point:")
    print(f"  Q = {float(burn.q_fusion):.1f}, "
          f"P_fus = {float(burn.p_fusion_mw):.0f} MW, "
          f"<T> = {float(burn.t_kev):.1f} keV, "
          f"tau_E = {float(burn.tau_e_s):.2f} s")
    assert float(burn.q_fusion) >= 10.0 and bool(burn.converged)

    # ── q profile + pointwise criteria ──
    rho = jnp.linspace(0.05, 1.0, 64)
    ne = 10.0 * (1.0 - 0.8 * rho**2)
    t = float(burn.t_kev) * (1.0 - 0.9 * rho**2) ** 1.5
    qp = compute_q_profile(rho, ne, t, t, r0=6.2, a=2.0, b0=5.3,
                           ip_ma=15.0, kappa=1.8, delta=0.33)
    print(f"  q0 = {float(qp.q[0]):.2f}, q_edge = {float(qp.q_edge):.2f}")

    mer = mercier_stability(qp)
    troy = troyon_beta_limit(beta_t=0.025, ip_ma=15.0, a=2.0, b0=5.3)
    print(f"  Mercier all-stable: {bool(mer.all_stable)}, "
          f"beta_N = {float(troy.beta_n):.2f} "
          f"(no-wall limit {float(troy.beta_n_crit_nowall):.1f})")

    # ── Ballooning eigenvalue scan: first + second stability ──
    s_vals = jnp.linspace(0.2, 2.0, 8)
    scan = second_stability_scan(s_vals, alpha_max=5.0, n_alpha=48)
    print("  s-alpha ballooning boundaries (eigenvalue scan):")
    for i, s in enumerate(np.asarray(s_vals)):
        a1 = float(scan.alpha_crit_first[i])
        a2 = float(scan.alpha_crit_second[i])
        print(f"    s={s:4.2f}: unstable band alpha in "
              f"[{a1:.2f}, {a2:.2f}] -> second-stable above")
    assert bool(np.asarray(scan.second_access).all())
    print("OK: burn point closes, stability screen passes, second-"
          "stability access resolved")


if __name__ == "__main__":
    main()
