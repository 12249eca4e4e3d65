"""Proof manifest: executed property checks (Lean-theorem analogues)."""

import json

import pytest

from scpn_fusion_tpu.scpn.proof_manifest import (
    build_proof_manifest,
    check_interlock_replay_invariance,
    check_pid_bounded_output,
    check_token_boundedness,
    verify_manifest_matches,
)
from scpn_fusion_tpu.scpn.structure import StochasticPetriNet


def _demo_net():
    net = StochasticPetriNet()
    for p in ("e+", "e-", "c+", "c-"):
        net.add_place(p)
    for t, s, d in (("t+", "e+", "c+"), ("t-", "e-", "c-")):
        net.add_transition(t, threshold=0.1)
        net.add_arc(s, t)
        net.add_arc(t, d)
    # drain transitions: command places are consumed (a net whose outputs
    # only accumulate is genuinely unbounded and must FAIL verification)
    for t, s in (("d+", "c+"), ("d-", "c-")):
        net.add_transition(t, threshold=0.3)
        net.add_arc(s, t)
    return net


class TestChecks:
    def test_interlock_replay_invariance_holds(self):
        res = check_interlock_replay_invariance(n_steps=100)
        assert res["passed"], res["evidence"]

    def test_pid_actuation_bounded_under_pathological_errors(self):
        res = check_pid_bounded_output(n_trials=100, abs_max=5.0)
        assert res["passed"], res["evidence"]
        assert res["evidence"]["worst_abs_actuation"] <= 5.0 + 1e-9

    def test_token_boundedness_on_demo_net(self):
        res = check_token_boundedness(_demo_net(), n_trials=4,
                                      n_steps=50)
        assert res["passed"], res["evidence"]

    def test_unbounded_net_fails_verification(self):
        net = StochasticPetriNet()
        net.add_place("src")
        net.add_place("sink_less")
        net.add_transition("t", threshold=0.1)
        net.add_arc("src", "t")
        net.add_arc("t", "sink_less")   # accumulates forever
        res = check_token_boundedness(net, n_trials=2, n_steps=50)
        assert not res["passed"]


class TestManifest:
    def test_build_and_write(self, tmp_path):
        spn = _demo_net()
        path = tmp_path / "proofs.json"
        manifest = build_proof_manifest(spn, out_path=path)
        assert manifest["all_passed"], manifest["checks"]
        assert len(manifest["checks"]) == 4
        on_disk = json.loads(path.read_text())
        assert on_disk["net_sha256"] == manifest["net_sha256"]

    def test_manifest_binds_to_exact_net(self):
        spn = _demo_net()
        manifest = build_proof_manifest(spn)
        assert verify_manifest_matches(manifest, spn)
        other = _demo_net()
        other.add_place("extra")
        other.add_transition("tx", threshold=0.5)
        other.add_arc("extra", "tx")
        assert not verify_manifest_matches(manifest, other)
