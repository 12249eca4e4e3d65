"""CODAC-style pulse gateway tests (fail-closed supervisory logic)."""

import pytest

from scpn_fusion_tpu.io.codac import CodacError, PulseGateway, PulseState


class TestGateway:
    def test_nominal_pulse_sequence(self):
        gw = PulseGateway()
        visited = gw.run_nominal_pulse()
        assert visited[0] is PulseState.IDLE
        assert visited[-1] is PulseState.TERMINATED
        assert gw.state is PulseState.TERMINATED
        kinds = [e["kind"] for e in gw.events]
        assert kinds.count("transition") == 5

    def test_illegal_transition_rejected(self):
        gw = PulseGateway()
        with pytest.raises(CodacError, match="illegal transition"):
            gw.transition(PulseState.FLATTOP)
        assert gw.state is PulseState.IDLE
        assert gw.events[-1]["kind"] == "transition_rejected"

    def test_abort_from_any_live_state(self):
        gw = PulseGateway()
        gw.transition(PulseState.PLASMA_INIT)
        gw.transition(PulseState.RAMP_UP)
        gw.abort("VDE detected")
        assert gw.state is PulseState.ABORTED
        assert gw.abort_reason == "VDE detected"
        # terminal states ignore further aborts
        gw.abort("again")
        assert gw.events[-1]["kind"] == "abort_ignored"
        # recovery back to IDLE is legal
        gw.transition(PulseState.IDLE)
        assert gw.state is PulseState.IDLE

    def test_command_admission_by_phase(self):
        gw = PulseGateway()
        assert gw.admit("configure")["accepted"]
        res = gw.admit("heating")
        assert not res["accepted"]          # no heating while IDLE
        gw.run_nominal_pulse()
        assert not gw.admit("ip_target")["accepted"]  # terminated
        with pytest.raises(CodacError, match="unknown command"):
            gw.admit("self_destruct")

    def test_seeding_only_at_flattop(self):
        gw = PulseGateway()
        gw.transition(PulseState.PLASMA_INIT)
        gw.transition(PulseState.RAMP_UP)
        assert not gw.admit("seeding")["accepted"]
        gw.transition(PulseState.FLATTOP)
        assert gw.admit("seeding", {"species": "Ne"})["accepted"]
