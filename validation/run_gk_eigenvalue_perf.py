#!/usr/bin/env python
"""GK linear-eigenvalue solve cost vs the reference's per-surface figure.

The reference's hybrid-GK scheduler budgets its native linear eigenvalue
spot-check at ~0.3 s per flux surface (BASELINE.md "GK hybrid surrogate
path ... native linear eigenvalue ~0.3 s/surface", local CPU).  This
lane times the repo's kinetic dispersion eigenvalue solve
(``models/gyrokinetics/linear.py:solve_eigenvalue_single_ky`` via the
10-point ``solve_linear_gk`` spectrum) on the same class of hardware
(host CPU).  Lanes (fail-closed):

1. gk_eigenvalue_per_solve — warm per-k_y eigenvalue solve <= 0.3 s
   (the reference's whole per-surface budget buys ONE mode here; a full
   10-point spectrum costs about what the reference's single surface
   spot-check does), all rates finite with labelled mode types.

Writes checksummed JSON+MD evidence into validation/reports/.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

REF_PER_SURFACE_S = 0.3


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from scpn_fusion_tpu.models.gyrokinetics.linear import solve_linear_gk
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    solve_linear_gk()                      # warm the jit caches
    t0 = time.perf_counter()
    res = solve_linear_gk()
    spectrum_s = time.perf_counter() - t0
    per_solve_s = spectrum_s / len(res.k_y)

    finite = bool(np.all(np.isfinite(res.gamma))
                  and np.all(np.isfinite(res.omega_r)))
    labelled = all(isinstance(m, str) and m for m in res.mode_type)
    ok = finite and labelled and per_solve_s <= REF_PER_SURFACE_S
    lanes = [LaneResult(
        name="gk_eigenvalue_per_solve",
        status="pass" if ok else "fail",
        metrics={"per_ky_solve_s": round(per_solve_s, 4),
                 "full_10ky_spectrum_s": round(spectrum_s, 3),
                 "n_ky": int(len(res.k_y)),
                 "reference_per_surface_s": REF_PER_SURFACE_S,
                 "all_rates_finite": finite,
                 "mode_types": sorted(set(res.mode_type))},
        thresholds={"per_ky_solve_s": REF_PER_SURFACE_S},
        notes=("warm host-CPU timing, default 8x12 velocity grid "
               "(the quantitative rate gates live in "
               "gk_growth_rates.json); the reference budget is its "
               "hybrid scheduler's spot-check cost"),
    )]

    write_report("gk_eigenvalue_perf", lanes)
    return 0 if all(ln.status == "pass" for ln in lanes
                    if ln.status != "blocked") else 1


if __name__ == "__main__":
    sys.exit(main())
