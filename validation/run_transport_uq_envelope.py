#!/usr/bin/env python
"""Transport uncertainty-envelope contract over the ITPA table.

Counterpart of the reference's
``validation/benchmark_transport_uncertainty_envelope.py`` (contract:
fraction of shots within 2 sigma >= 0.70, abs-relative-error p95 <= 2.5,
z-score p95 <= 4.0, evaluated against the committed ITPA H-mode table).
Lane 1 mirrors the reference's analytic log-linear propagation
(``core/scaling_laws.py:ipb98y2_with_uncertainty:361-447``, sigma_lnC =
0.14 + Verdoolaege exponent sigmas, z in linear tau space); lane 2
cross-checks it against the repo's MC coefficient-posterior envelope
(``models/uq/mc.py``) — one einsum over (samples x shots), no per-shot
recompile.  Lanes (fail-closed):

1. itpa_2sigma_envelope — all three reference contract thresholds over
   the 53-shot / 24-machine table (read-only CSV).
2. envelope_calibration — the nominal prediction sits inside every
   shot's MC envelope, widths are strictly positive, MC sigma is
   converged (4k vs 16k within 10%), and MC widths are
   order-of-magnitude compatible with the analytic propagation.

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


def _log_tau_samples(coeffs, ip, bt, ne, pl, rm, kap, aspect, m_amu):
    """log tau_E for (n_samples, 9) coefficient draws over (n_shots,)
    features — one outer product (models/uq/mc.py:ipb98_tau_e order;
    ``aspect`` is R/a, carrying the -0.58 exponent)."""
    c = np.maximum(coeffs[:, 0:1], 1e-4)
    alpha_p = np.minimum(coeffs[:, 3:4], -0.1)
    feats = np.stack([np.log(ip), np.log(bt), np.log(pl), np.log(ne),
                      np.log(rm), np.log(aspect), np.log(kap),
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
        write_report("transport_uq_envelope", lanes)
        return 0

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
    aspect = rm / am

    rng = np.random.default_rng(0)

    def envelope(n_samples):
        z = rng.standard_normal((n_samples, len(IPB98_CENTRAL)))
        coeffs = IPB98_CENTRAL[None, :] + z * IPB98_SIGMA[None, :]
        lt = _log_tau_samples(coeffs, ip, bt, ne, pl, rm, kap, aspect, m_amu)
        return lt.mean(axis=0), lt.std(axis=0)

    mean_lt, sigma_lt = envelope(4000)

    # Reference envelope (scaling_laws.py:ipb98y2_with_uncertainty
    # :361-447): analytic log-linear propagation with the published
    # Verdoolaege-2021 exponent sigmas and sigma_lnC = 0.14, z-scored in
    # LINEAR tau space: z = |tau_pred - tau_meas| / (tau_pred sigma_ln).
    exp_unc = {"Ip": 0.03, "BT": 0.05, "ne19": 0.04, "Ploss": 0.02,
               "R": 0.08, "kappa": 0.07, "epsilon": 0.06, "M": 0.04}
    sigma_ln_c = 0.14
    feats_lin = {"Ip": ip, "BT": bt, "ne19": ne, "Ploss": pl, "R": rm,
                 "kappa": kap, "epsilon": am / rm, "M": m_amu}
    sigma_ln_ref = np.sqrt(
        sigma_ln_c**2
        + sum(np.log(feats_lin[k]) ** 2 * exp_unc[k] ** 2
              for k in exp_unc))
    nominal_lt0 = _log_tau_samples(IPB98_CENTRAL[None, :], ip, bt, ne, pl,
                                   rm, kap, aspect, m_amu)[0]
    tau_pred = np.exp(nominal_lt0)
    sigma_s = tau_pred * sigma_ln_ref
    zscores = np.abs(tau_pred - tau_meas) / np.maximum(sigma_s, 1e-12)
    within2 = float(np.mean(zscores <= 2.0))
    rel_err = np.abs(tau_pred - tau_meas) / tau_meas
    rel_p95 = float(np.percentile(rel_err, 95.0))
    z_p95 = float(np.percentile(zscores, 95.0))
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
        notes="analytic log-linear propagation with the reference's own "
              "sigma_lnC=0.14 and Verdoolaege exponent sigmas, z-scored "
              "in linear tau space (scaling_laws.py:361-447); thresholds "
              "are the reference's contract values",
    ))

    # ── Lane 2: envelope calibration / MC cross-check ──
    nominal_inside = bool(np.all(np.abs(nominal_lt0 - mean_lt)
                                 <= 2.0 * sigma_lt))
    widths_pos = bool(np.all(sigma_lt > 0.0) and np.all(sigma_ln_ref > 0.0))
    _, sigma_16k = envelope(16000)
    sigma_dev = float(np.max(np.abs(sigma_16k - sigma_lt)
                             / np.maximum(sigma_16k, 1e-12)))
    # The MC posterior (models/uq/mc.py sigmas) and the reference's
    # analytic defaults are different published priors; require same
    # order of magnitude, not identity.
    width_ratio = sigma_lt / sigma_ln_ref
    widths_compatible = bool(np.all(width_ratio > 0.3)
                             and np.all(width_ratio < 3.0))
    ok2 = (nominal_inside and widths_pos and sigma_dev <= 0.10
           and widths_compatible)
    lanes.append(LaneResult(
        name="envelope_calibration",
        status="pass" if ok2 else "fail",
        metrics={"nominal_inside_envelope": nominal_inside,
                 "widths_positive": widths_pos,
                 "sigma_mc_rel_dev_4k_vs_16k": sigma_dev,
                 "mc_vs_analytic_width_ratio_minmax":
                     [float(width_ratio.min()), float(width_ratio.max())]},
        thresholds={"sigma_mc_rel_dev": 0.10,
                    "width_ratio_band": [0.3, 3.0]},
        notes="central prediction inside every per-shot MC envelope; MC "
              "sigma converged in sample count and order-of-magnitude "
              "compatible with the analytic propagation",
    ))

    write_report("transport_uq_envelope", lanes)
    return 0 if all(ln.status == "pass" for ln in lanes
                    if ln.status != "blocked") else 1


if __name__ == "__main__":
    sys.exit(main())
