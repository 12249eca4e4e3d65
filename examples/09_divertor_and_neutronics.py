#!/usr/bin/env python
"""Example 9 — the power-exhaust and fuel-cycle chain: divertor heat
loads → target material choice → wall erosion → tritium breeding.

Reference counterpart: the ``04_divertor_and_neutronics`` notebook
(``divertor_thermal_sim.py``, ``pwi_erosion.py``,
``nuclear/blanket_neutronics.py``). The chain answers the reactor
engineer's questions in order: how hard is the target hit, does solid
tungsten survive, how fast does the wall erode, and does the blanket
breed enough tritium to close the fuel cycle.

Run:  python examples/09_divertor_and_neutronics.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp                        # noqa: E402
import numpy as np                             # noqa: E402

from scpn_fusion_tpu.models.nuclear.blanket import (   # noqa: E402
    MultiGroupConfig, enrichment_scan, multigroup_tbr,
)
from scpn_fusion_tpu.models.nuclear.pwi import (       # noqa: E402
    SputteringMaterial, erosion_rate,
)
from scpn_fusion_tpu.models.physics.divertor_lab import (  # noqa: E402
    divertor_heat_load, lithium_vapor_shield, tungsten_monoblock,
)


def main() -> None:
    # ── 1. Divertor heat load (Eich scaling) for a compact pilot ──
    load = divertor_heat_load(80.0, 2.1, 2.5, expansion_factor=15.0)
    print(f"Eich lambda_q = {float(load.lambda_q_m) * 1e3:.2f} mm, "
          f"q_parallel = {float(load.q_parallel) / 1e9:.1f} GW/m^2, "
          f"q_target = {float(load.q_target) / 1e6:.0f} MW/m^2")

    # ── 2. Target survival: solid tungsten vs lithium vapor shield ──
    w = tungsten_monoblock(load.q_target)
    li = lithium_vapor_shield(load.q_target)
    print(f"tungsten surface: {float(w.t_surface_c):.0f} C "
          f"(melted={bool(w.melted)}); lithium-shielded surface: "
          f"{float(li.t_surface_c):.0f} C (f_rad={float(li.f_rad):.2f})")
    assert bool(w.melted), "unmitigated compact-pilot W target must melt"
    assert float(li.t_surface_c) < 2000.0, "vapor shield must regulate"

    # ── 3. First-wall erosion at detached vs attached conditions ──
    tungsten = SputteringMaterial.from_name("Tungsten")
    attached = erosion_rate(tungsten, 1e23, 50.0)
    detached = erosion_rate(tungsten, 1e23, 5.0)
    a_mm, d_mm = (float(attached["Erosion_mm_year"]),
                  float(detached["Erosion_mm_year"]))
    print(f"W erosion: attached (50 eV) {a_mm:.3f} mm/yr, "
          f"detached (5 eV) {d_mm:.2e} mm/yr")
    assert d_mm < 1e-3 * a_mm, \
        "detachment must suppress sputtering below threshold"

    # ── 4. Tritium breeding: the reference's pinned configuration ──
    res = multigroup_tbr(MultiGroupConfig())
    print(f"3-group blanket TBR = {float(res.tbr):.4f} "
          f"(per-group {np.round(np.asarray(res.tbr_per_group), 3)})")
    assert 1.05 < float(res.tbr) < 1.25, "fuel cycle must close (TBR > 1)"

    # enrichment is the design lever: TBR must rise monotonically
    scan = np.asarray(enrichment_scan(jnp.asarray([0.3, 0.6, 0.9])))
    print(f"TBR vs Li-6 enrichment 30/60/90%: {np.round(scan, 3)}")
    assert scan[2] > scan[1] > scan[0]

    print("OK: divertor -> material -> erosion -> breeding chain closed")


if __name__ == "__main__":
    main()
