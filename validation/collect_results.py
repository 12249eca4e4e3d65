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


def main() -> int:
    check = "--check" in sys.argv
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
