#!/usr/bin/env python
"""Aggregate all validation reports into RESULTS.md.

Role-parity with the reference's ``validation/collect_results.py`` →
``RESULTS.md`` evidence aggregation: every checksummed JSON report under
``validation/reports/`` is summarised into one table with per-lane status,
headline metrics, payload checksums, and git provenance.  Fail-closed:
blocked lanes are surfaced as blocked, never folded into pass.
"""

import json
import sys
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPORTS = Path(__file__).resolve().parent / "reports"
OUT = Path(__file__).resolve().parents[1] / "RESULTS.md"

_STATUS_ICON = {"pass": "PASS", "fail": "FAIL", "blocked": "BLOCKED"}


def _fmt_metric(v) -> str:
    if isinstance(v, float):
        return f"{v:.4g}"
    return str(v)


def _verify_checksums(reports: list[Path]) -> list[str]:
    """Recompute every report's payload sha256 (tamper check)."""
    import hashlib

    bad = []
    for path in reports:
        rep = json.loads(path.read_text())
        recorded = rep.get("payload_sha256")
        if recorded is None:
            # The meta-runner summary (full_pipeline_summary.json) is an
            # aggregate index, not a checksummed evidence report.
            if "lanes" in rep:
                bad.append(f"{path.name}: no payload_sha256")
            continue
        body = {k: v for k, v in rep.items() if k != "payload_sha256"}
        digest = hashlib.sha256(
            json.dumps(body, sort_keys=True, default=str).encode()).hexdigest()
        if digest != recorded:
            bad.append(f"{path.name}: checksum mismatch "
                       f"({digest[:12]} != {recorded[:12]})")
    return bad


# Reports whose gates are anchored OUTSIDE this repo: published figures,
# committed external-code outputs, digitised experimental data, or the
# reference's own artifacts.  The score is the reference's
# ``external_parity_score.py`` role: one number for "how much of this
# framework is held to external truth".
EXTERNAL_ANCHOR_REPORTS = (
    "aurora_public", "torax_parity", "blind_demo", "slough_anchors",
    "real_shot_accuracy", "equilibrium_parity", "implementation_parity",
    "confinement_burn", "runaway_dream", "eped_tiers",
    "quasi3d_contracts", "multi_machine", "gk_growth_rates",
    "disruption_transfer", "physics_closures", "adjoint_fd",
)


def _write_external_parity_score() -> None:
    """Aggregate external-anchor lanes into one scored evidence report."""
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    n_pass = n_fail = n_blocked = 0
    per_source = {}
    missing = []
    for stem in EXTERNAL_ANCHOR_REPORTS:
        path = REPORTS / f"{stem}.json"
        if not path.exists():
            missing.append(stem)
            continue
        rep = json.loads(path.read_text())
        statuses = [l["status"] for l in rep.get("lanes", [])]
        per_source[stem] = {s: statuses.count(s)
                            for s in ("pass", "fail", "blocked")}
        n_pass += statuses.count("pass")
        n_fail += statuses.count("fail")
        n_blocked += statuses.count("blocked")
    total = n_pass + n_fail + n_blocked
    score = n_pass / total if total else 0.0
    lane = LaneResult(
        name="external_parity_score",
        status="pass" if (n_fail == 0 and not missing and total > 0)
        else ("blocked" if not missing else "fail"),
        metrics={"score": round(score, 4), "lanes_pass": n_pass,
                 "lanes_fail": n_fail, "lanes_blocked": n_blocked,
                 "sources": len(per_source),
                 **{f"{k}_pass_frac":
                    round(v["pass"] / max(sum(v.values()), 1), 3)
                    for k, v in per_source.items()}},
        notes="score = externally-anchored lanes passing / total across "
              f"{len(EXTERNAL_ANCHOR_REPORTS)} campaigns (published "
              "figures, committed external-code outputs, digitised "
              "experiments, reference artifacts); blocked lanes count "
              "against the score, never as pass"
              + (f"; MISSING sources: {missing}" if missing else ""))
    write_report("external_parity_score", [lane], out_dir=REPORTS)


def main() -> int:
    check = "--check" in sys.argv
    if not check:
        _write_external_parity_score()
    reports = sorted(REPORTS.glob("*.json"))
    if check:
        bad = _verify_checksums(reports)
        if bad:
            print("TAMPERED/INVALID reports:\n  " + "\n  ".join(bad))
            return 1
        print(f"all {len(reports)} report checksums verify")
    lines = [
        "# RESULTS — scpn_fusion_tpu validation evidence",
        "",
        f"_Generated {datetime.now(timezone.utc).isoformat(timespec='seconds')} "
        f"by `validation/collect_results.py` from {len(reports)} report(s)._",
        "",
        "Fail-closed semantics: a blocked lane is never a pass.",
        "",
    ]
    overall_ok = True
    for path in reports:
        rep = json.loads(path.read_text())
        name = rep.get("schema", path.stem).replace("scpn-fusion-tpu.", "").replace(".v1", "")
        status = rep.get("overall_status", "blocked")
        overall_ok &= status == "pass"
        lines.append(f"## {name} — {_STATUS_ICON.get(status, status)}")
        lines.append("")
        lines.append(f"- source: `validation/reports/{path.name}` "
                     f"(sha256 `{rep.get('payload_sha256', '?')[:16]}…`)")
        lines.append(f"- git: `{rep.get('git_sha', '?')}`  "
                     f"generated: {rep.get('generated_unix', '?')}")
        lines.append("")
        lines.append("| lane | status | headline metrics |")
        lines.append("|---|---|---|")
        for lane in rep.get("lanes", []):
            metrics = lane.get("metrics", {})
            head = ", ".join(f"{k}={_fmt_metric(v)}"
                             for k, v in list(metrics.items())[:4])
            lines.append(f"| {lane['name']} | "
                         f"{_STATUS_ICON.get(lane['status'], lane['status'])}"
                         f" | {head} |")
        lines.append("")
        notes = [l.get("notes") for l in rep.get("lanes", [])
                 if l.get("notes")]
        if notes:
            lines.append("Notes: " + " / ".join(notes))
            lines.append("")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({'all pass' if overall_ok else 'NOT all pass'})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
