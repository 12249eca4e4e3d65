#!/usr/bin/env python
"""Preflight gate: cheap structural checks before the test matrix runs.

Role parity with the reference's ``tools/run_python_preflight.py`` CI gate,
sized to this repo: import the package surface, validate the driver
contracts (``bench.py`` emits one JSON line schema; ``__graft_entry__``
exposes ``entry``/``dryrun_multichip``), verify workflow YAML parses, and
verify evidence-report checksums.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def check(name: str, ok: bool, detail: str = "") -> bool:
    print(f"  [{'ok' if ok else 'FAIL'}] {name}" + (f" — {detail}" if detail else ""))
    return ok


def check_docs() -> bool:
    """Internal-link check: relative markdown links must resolve."""
    import re

    ok = True
    md_files = list(ROOT.glob("*.md")) + list((ROOT / "docs").glob("*.md"))
    link_re = re.compile(r"\]\(([^)#:?\s]+)(?:#[^)]*)?\)")
    for md in md_files:
        for target in link_re.findall(md.read_text(encoding="utf-8")):
            if target.startswith(("http", "mailto")):
                continue
            resolved = (md.parent / target).resolve()
            if not resolved.exists():
                ok = check(f"link {md.name} -> {target}", False)
    return check("docs internal links", ok)


def main() -> int:
    if "--docs-only" in sys.argv:
        return 0 if check_docs() else 1

    ok = True

    # 1. Package surface imports (catches syntax + circular-import rot).
    import importlib

    for mod in ("scpn_fusion_tpu", "scpn_fusion_tpu.cli",
                "scpn_fusion_tpu.models.equilibrium",
                "scpn_fusion_tpu.ops.multigrid",
                "scpn_fusion_tpu.parallel",
                "scpn_fusion_tpu.scpn",
                "scpn_fusion_tpu.utils.evidence"):
        try:
            importlib.import_module(mod)
            ok &= check(f"import {mod}", True)
        except Exception as exc:  # noqa: BLE001 - report any import failure
            ok &= check(f"import {mod}", False, repr(exc))

    # 2. Driver contracts.
    try:
        import __graft_entry__ as graft

        ok &= check("__graft_entry__.entry", callable(graft.entry))
        ok &= check("__graft_entry__.dryrun_multichip",
                    callable(graft.dryrun_multichip))
    except Exception as exc:  # noqa: BLE001
        ok &= check("__graft_entry__", False, repr(exc))

    ok &= check("bench.py exists", (ROOT / "bench.py").exists())

    # 3. Workflow YAML parses (authorable even without a runner).
    try:
        import yaml

        for wf in sorted((ROOT / ".github" / "workflows").glob("*.yml")):
            try:
                parsed = yaml.safe_load(wf.read_text())
                ok &= check(f"workflow {wf.name}",
                            isinstance(parsed, dict) and "jobs" in parsed)
            except yaml.YAMLError as exc:
                ok &= check(f"workflow {wf.name}", False, str(exc))
    except ImportError:
        check("workflow YAML lint", True, "pyyaml not installed; skipped")

    # 4. Evidence checksums.
    rc = subprocess.run(
        [sys.executable, str(ROOT / "validation" / "collect_results.py"),
         "--check"], capture_output=True, text=True)
    ok &= check("evidence checksums", rc.returncode == 0,
                rc.stdout.strip().splitlines()[0] if rc.stdout else rc.stderr[:200])

    # 5. Fuzz corpus completeness.
    fuzz = ROOT / "fuzz"
    targets = {p.stem.removeprefix("fuzz_") for p in fuzz.glob("fuzz_*.py")}
    corpora = {p.name for p in (fuzz / "seeds").iterdir() if p.is_dir()}
    ok &= check("fuzz corpus completeness", targets == corpora,
                f"targets={sorted(targets)} corpora={sorted(corpora)}")

    # 6. Docs internal links.
    ok &= check_docs()

    print("preflight:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
