#!/usr/bin/env python
"""Transport uncertainty-envelope contract over the ITPA table.

Counterpart of the reference's
``validation/benchmark_transport_uncertainty_envelope.py`` (contract:
fraction of shots within 2 sigma >= 0.70, abs-relative-error p95 <= 2.5,
z-score p95 <= 4.0, evaluated against the committed ITPA H-mode table).
The repo's envelope is the IPB98(y,2) coefficient posterior
(``models/uq/mc.py`` IPB98_CENTRAL/IPB98_SIGMA, Verdoolaege-2021-style)
propagated to per-shot tau_E — one einsum over (samples x shots), no
per-shot recompile.  Lanes (fail-closed):

1. itpa_2sigma_envelope — all three reference contract thresholds over
   the 53-shot / 24-machine table (read-only CSV).
2. envelope_calibration — the nominal (central-coefficient) prediction
   sits inside every shot's envelope, widths are strictly positive, and
   the MC sigma is converged (4k vs 16k samples within 10%).

Writes checksummed JSON+MD evidence into validation/reports/.
"""

import csv
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

ITPA_CSV = Path("/root/reference/validation/reference_data/itpa/"
                "hmode_confinement.csv")
# Reference CONTRACT_THRESHOLDS (benchmark_transport_uncertainty_envelope
# .py:42-46 + validate_real_shots.py:52).
MIN_2SIGMA_FRACTION = 0.70
MAX_ABS_REL_ERR_P95 = 2.5
MAX_ZSCORE_P95 = 4.0


def _log_tau_samples(coeffs, ip, bt, ne, pl, rm, kap, eps, m_amu):
    """log tau_E for (n_samples, 9) coefficient draws over (n_shots,)
    features — one outer product (models/uq/mc.py:ipb98_tau_e order)."""
    c = np.maximum(coeffs[:, 0:1], 1e-4)
    alpha_p = np.minimum(coeffs[:, 3:4], -0.1)
    feats = np.stack([np.log(ip), np.log(bt), np.log(pl), np.log(ne),
                      np.log(rm), np.log(eps), np.log(kap),
                      np.log(m_amu)])                  # (8, n_shots)
    alphas = np.concatenate(
        [coeffs[:, 1:3], alpha_p, coeffs[:, 4:9]], axis=1)  # (n, 8)
    return np.log(c) + alphas @ feats                 # (n_samples, n_shots)


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from scpn_fusion_tpu.models.uq.mc import IPB98_CENTRAL, IPB98_SIGMA
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []
    if not ITPA_CSV.is_file():
        lanes.append(LaneResult(
            name="itpa_2sigma_envelope", status="blocked",
            notes=f"reference ITPA table not found at {ITPA_CSV}"))
        return write_report("transport_uq_envelope", lanes)

    rows = list(csv.DictReader(ITPA_CSV.open()))
    ip = np.array([float(r["Ip_MA"]) for r in rows])
    bt = np.array([float(r["BT_T"]) for r in rows])
    ne = np.array([float(r["ne19_1e19m3"]) for r in rows])
    pl = np.array([float(r["Ploss_MW"]) for r in rows])
    rm = np.array([float(r["R_m"]) for r in rows])
    am = np.array([float(r["a_m"]) for r in rows])
    kap = np.array([float(r["kappa"]) for r in rows])
    m_amu = np.array([float(r["M_AMU"]) for r in rows])
    tau_meas = np.array([float(r["tau_E_s"]) for r in rows])
    eps = am / rm

    rng = np.random.default_rng(0)

    def envelope(n_samples):
        z = rng.standard_normal((n_samples, len(IPB98_CENTRAL)))
        coeffs = IPB98_CENTRAL[None, :] + z * IPB98_SIGMA[None, :]
        lt = _log_tau_samples(coeffs, ip, bt, ne, pl, rm, kap, eps, m_amu)
        return lt.mean(axis=0), lt.std(axis=0)

    mean_lt, sigma_lt = envelope(4000)
    zscores = (np.log(tau_meas) - mean_lt) / sigma_lt
    within2 = float(np.mean(np.abs(zscores) <= 2.0))
    tau_pred = np.exp(mean_lt)
    rel_err = np.abs(tau_pred - tau_meas) / tau_meas
    rel_p95 = float(np.percentile(rel_err, 95.0))
    z_p95 = float(np.percentile(np.abs(zscores), 95.0))
    ok1 = (within2 >= MIN_2SIGMA_FRACTION
           and rel_p95 <= MAX_ABS_REL_ERR_P95
           and z_p95 <= MAX_ZSCORE_P95)
    lanes.append(LaneResult(
        name="itpa_2sigma_envelope",
        status="pass" if ok1 else "fail",
        metrics={"n_shots": len(rows),
                 "n_machines": len({r['machine'] for r in rows}),
                 "within_2sigma_fraction": within2,
                 "abs_relative_error_p95": rel_p95,
                 "zscore_p95": z_p95,
                 "worst_zscore_machine":
                     rows[int(np.argmax(np.abs(zscores)))]["machine"]},
        thresholds={"min_within_2sigma_fraction": MIN_2SIGMA_FRACTION,
                    "max_abs_relative_error_p95": MAX_ABS_REL_ERR_P95,
                    "max_zscore_p95": MAX_ZSCORE_P95},
        notes="IPB98 coefficient-posterior envelope over the reference's "
              "committed ITPA table; thresholds are the reference's own "
              "contract values",
    ))

    # ── Lane 2: envelope calibration / MC convergence ──
    nominal_lt = _log_tau_samples(IPB98_CENTRAL[None, :], ip, bt, ne, pl,
                                  rm, kap, eps, m_amu)[0]
    nominal_inside = bool(np.all(np.abs(nominal_lt - mean_lt)
                                 <= 2.0 * sigma_lt))
    widths_pos = bool(np.all(sigma_lt > 0.0))
    _, sigma_16k = envelope(16000)
    sigma_dev = float(np.max(np.abs(sigma_16k - sigma_lt)
                             / np.maximum(sigma_16k, 1e-12)))
    ok2 = nominal_inside and widths_pos and sigma_dev <= 0.10
    lanes.append(LaneResult(
        name="envelope_calibration",
        status="pass" if ok2 else "fail",
        metrics={"nominal_inside_envelope": nominal_inside,
                 "widths_positive": widths_pos,
                 "sigma_mc_rel_dev_4k_vs_16k": sigma_dev},
        thresholds={"sigma_mc_rel_dev": 0.10},
        notes="central prediction inside every per-shot envelope; MC "
              "sigma converged in sample count",
    ))

    return write_report("transport_uq_envelope", lanes)


if __name__ == "__main__":
    sys.exit(main())
