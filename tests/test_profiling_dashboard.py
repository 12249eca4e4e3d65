"""Profiling taxonomy + dashboard generator tests."""

import json

import jax
import jax.numpy as jnp
import pytest

from scpn_fusion_tpu.ui.dashboard import generate_dashboard
from scpn_fusion_tpu.utils.profiling import StepTimer, time_fn


class TestProfiling:
    def test_time_fn_stats(self):
        @jax.jit
        def f(x):
            return x * 2.0 + 1.0

        stats = time_fn(f, jnp.ones(16), n_repeats=5)
        assert stats["n"] == 5
        assert 0.0 < stats["min_s"] <= stats["mean_s"] <= stats["max_s"]

    def test_step_timer_taxonomy_and_jsonl(self, tmp_path):
        timer = StepTimer()
        for _ in range(3):
            with timer.measure("control.pid_kernel_step_us", shot=7):
                sum(range(100))
        with timer.measure("control.closed_loop_step_us"):
            pass
        summary = timer.summary()
        assert summary["control.pid_kernel_step_us"]["n"] == 3
        assert summary["control.closed_loop_step_us"]["p50_us"] >= 0.0
        p = timer.dump_jsonl(tmp_path / "t.jsonl")
        rows = [json.loads(l) for l in p.read_text().splitlines()]
        assert len(rows) == 4
        assert rows[0]["shot"] == 7


class TestDashboard:
    def test_generates_markdown_with_sections(self, tmp_path):
        out = generate_dashboard(tmp_path / "DASH.md")
        text = out.read_text()
        assert "# scpn_fusion_tpu — mission dashboard" in text
        assert "## Validation evidence" in text
        assert "## Benchmark history" in text
        assert "## Fallback telemetry" in text

    def test_live_equilibrium_section(self, tmp_path):
        out = generate_dashboard(
            tmp_path / "DASH.md",
            config_path="validation/configs/diiid_config.json")
        text = out.read_text()
        assert "## Live equilibrium — DIII-D-like" in text
        assert "converged: True" in text
        assert "```" in text   # ASCII flux map present


class TestHtmlDashboard:
    """Static HTML studio view + federation manifest (reference ui/app.py
    + studio/federation.py roles; streamlit absent in this image)."""

    def test_generates_selfcontained_page(self, tmp_path):
        from scpn_fusion_tpu.ui.html_dashboard import generate_html_dashboard
        out = generate_html_dashboard(".", tmp_path / "dash.html")
        page = out.read_text()
        assert page.startswith("<!doctype html>")
        assert "<svg" in page            # accuracy chart rendered
        assert "chip pass" in page       # campaign chips present
        assert "gate" in page            # reference gate line
        assert "prefers-color-scheme: dark" in page   # dark mode selected

    def test_bars_respect_mark_spec(self, tmp_path):
        import re
        from scpn_fusion_tpu.ui.html_dashboard import generate_html_dashboard
        page = generate_html_dashboard(".", tmp_path / "d.html").read_text()
        bars = re.findall(
            r'<rect class="bar" [^>]*height="(\d+)" rx="4"/>', page)
        assert bars and all(int(h) <= 24 for h in bars)

    def test_manifest_checksums(self, tmp_path):
        import hashlib
        import json
        from scpn_fusion_tpu.ui.html_dashboard import emit_studio_manifest
        out = emit_studio_manifest(".", tmp_path / "manifest.json")
        m = json.loads(out.read_text())
        assert m["schema"] == "scpn-fusion-tpu.studio-manifest.v1"
        assert m["n_entries"] == len(m["entries"]) > 0
        entry = m["entries"][0]
        actual = hashlib.sha256(
            open(entry["path"], "rb").read()).hexdigest()
        assert entry["sha256"] == actual
