#!/usr/bin/env python
"""Full validation pipeline: run every campaign, then aggregate.

Counterpart of the reference's ``validation/full_validation_pipeline.py``
(one entry point that executes the whole evidence surface).  Discovers
every ``validation/run_*.py`` campaign, executes each in its own
interpreter with a per-campaign timeout, reads back the campaign's
checksummed report, and finishes by regenerating ``RESULTS.md`` via
``collect_results.py``.

Exit code 0 only if NO campaign fails (blocked lanes are surfaced but do
not fail the pipeline — fail-closed semantics live inside each lane).

Usage:
    python validation/run_all.py            # everything
    python validation/run_all.py --quick    # skip the slow TPU/stress set
"""

import json
import subprocess
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent
REPORTS = HERE / "reports"

# Campaigns needing the real chip or long wall-clock; skipped by --quick.
SLOW = {
    "run_pallas_tpu.py", "run_sharded_gs_tpu.py", "run_stress_campaign.py",
    "run_micro_kernels.py",
    "run_batched_amortisation.py", "run_real_shot_accuracy.py",
    "run_free_boundary_forward.py", "run_resolution_scaling.py",
}
PER_CAMPAIGN_TIMEOUT_S = 3600   # resolution_scaling compiles 2049^2 programs


def main() -> int:
    quick = "--quick" in sys.argv
    scripts = sorted(p for p in HERE.glob("run_*.py")
                     if p.name != "run_all.py")
    if quick:
        scripts = [p for p in scripts if p.name not in SLOW]

    rows = []
    t0 = time.monotonic()
    for script in scripts:
        name = script.stem.removeprefix("run_")
        start = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, str(script)], capture_output=True,
                text=True, timeout=PER_CAMPAIGN_TIMEOUT_S)
            rc = proc.returncode
            err_tail = proc.stderr.strip().splitlines()[-1:] if rc else []
        except subprocess.TimeoutExpired:
            rc, err_tail = -1, ["timeout"]
        wall = time.monotonic() - start

        report = REPORTS / f"{name}.json"
        status = "missing-report"
        lane_statuses = {}
        if report.is_file():
            try:
                payload = json.loads(report.read_text())
                status = payload.get("overall_status", "unknown")
                lane_statuses = {ln["name"]: ln["status"]
                                 for ln in payload.get("lanes", [])}
            except (json.JSONDecodeError, KeyError, TypeError):
                status = "unreadable-report"
        rows.append({"campaign": name, "rc": rc, "wall_s": round(wall, 1),
                     "overall": status, "lanes": lane_statuses,
                     "stderr_tail": err_tail})
        print(f"[{status:>7}] {name} ({wall:.0f}s)", flush=True)

    failed = [r for r in rows if r["overall"]
              not in ("pass", "blocked") or r["rc"] not in (0,)]
    summary = {
        "schema": "scpn-fusion-tpu.full-pipeline.v1",
        "quick": quick,
        "n_campaigns": len(rows),
        "n_failed": len(failed),
        "total_wall_s": round(time.monotonic() - t0, 1),
        "campaigns": rows,
    }
    out = REPORTS / "full_pipeline_summary.json"
    out.write_text(json.dumps(summary, indent=2) + "\n")
    print(f"wrote {out}")

    collect = subprocess.run([sys.executable,
                              str(HERE / "collect_results.py")],
                             capture_output=True, text=True)
    if collect.returncode != 0:
        print("collect_results failed:", collect.stderr[-300:])
        return 2

    if failed:
        print("FAILED campaigns:",
              ", ".join(r["campaign"] for r in failed))
        return 1
    print(f"all {len(rows)} campaigns pass "
          f"({summary['total_wall_s']:.0f}s total)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
