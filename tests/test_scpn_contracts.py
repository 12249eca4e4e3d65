"""Standalone SCPN contracts audit surface (VERDICT r3 weak #7).

Parity targets: reference ``scpn/contracts.py:250-494`` (PhysicsInvariant
taxonomy, violation severity bands, mitigation gate, inhibitor safety
contracts) plus this framework's compiled vectorised audit path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.scpn.contracts import (
    DEFAULT_INVARIANTS,
    DEFAULT_SAFETY_CONTRACTS,
    InvariantViolation,
    PhysicsInvariant,
    check_all,
    check_invariant,
    check_invariants_compiled,
    invariant_table,
    should_trigger_mitigation,
    verify_safety_contracts,
)


class TestInvariantTaxonomy:
    def test_default_set_covers_reference_envelope(self):
        names = {i.name for i in DEFAULT_INVARIANTS}
        assert names == {"q_min", "beta_N", "greenwald", "T_i",
                         "energy_conservation_error"}

    def test_comparator_validation(self):
        with pytest.raises(ValueError, match="comparator"):
            PhysicsInvariant("x", "d", 1.0, "!=")
        with pytest.raises(ValueError, match="finite"):
            PhysicsInvariant("x", "d", float("nan"), "gt")

    def test_severity_bands(self):
        inv = PhysicsInvariant("beta_N", "d", 2.8, "lt")
        assert check_invariant(inv, 2.0) is None
        warn = check_invariant(inv, 3.0)       # margin 0.2 < 0.56
        assert warn is not None and warn.severity == "warning"
        crit = check_invariant(inv, 3.6)       # margin 0.8 > 0.56
        assert crit.severity == "critical"

    def test_non_finite_is_always_critical(self):
        inv = PhysicsInvariant("q_min", "d", 1.0, "gt")
        v = check_invariant(inv, float("nan"))
        assert v is not None and v.severity == "critical"
        assert v.margin == float("inf")

    def test_check_all_and_mitigation_gate(self):
        vals = {"q_min": 1.4, "beta_N": 3.6, "greenwald": 0.8}
        violations = check_all(vals)
        assert [v.invariant.name for v in violations] == ["beta_N"]
        assert should_trigger_mitigation(violations)
        warn_only = [InvariantViolation(DEFAULT_INVARIANTS[0], 0.99, 0.01,
                                        "warning")]
        assert not should_trigger_mitigation(warn_only)


class TestCompiledAudit:
    def test_matches_host_path(self):
        table = invariant_table()
        rng = np.random.default_rng(0)
        # random readings around each threshold
        base = np.asarray([float(i.threshold) for i in DEFAULT_INVARIANTS])
        vals = base * (1.0 + 0.5 * rng.standard_normal((64, base.size)))
        audit = jax.jit(lambda v: check_invariants_compiled(table, v))
        violated, critical, mitigate = audit(jnp.asarray(vals, jnp.float32))
        violated = np.asarray(violated)
        critical = np.asarray(critical)
        for row in range(vals.shape[0]):
            host = {v.invariant.name: v
                    for v in check_all(dict(zip(table.names, vals[row])))}
            for k, name in enumerate(table.names):
                assert violated[row, k] == (name in host), (row, name)
                if name in host:
                    assert critical[row, k] == (host[name].severity
                                                == "critical")
        assert np.asarray(mitigate).shape == (64,)

    def test_trajectory_audit_under_scan(self):
        table = invariant_table()
        t = jnp.linspace(0.0, 1.0, 50)
        # beta_N ramps through the limit; everything else nominal
        traj = jnp.stack([
            jnp.full_like(t, 2.0),          # q_min ok
            2.0 + 2.0 * t,                  # beta_N crosses 2.8 then 3.36
            jnp.full_like(t, 0.5),          # greenwald ok
            jnp.full_like(t, 10.0),         # T_i ok
            jnp.full_like(t, 1e-4),         # energy ok
        ], axis=-1)
        _, crit, mitigate = check_invariants_compiled(table, traj)
        m = np.asarray(mitigate)
        assert not m[0] and m[-1]
        # critical only once 20% past the threshold (beta_N > 3.36)
        first_crit = int(np.argmax(m))
        assert float(traj[first_crit, 1]) > 3.36 - 1e-3


class TestSafetyContracts:
    def test_inhibitor_violations(self):
        tokens = {"thermal_limit": 1.0, "beta_limit": 0.0}
        enabled = {"heat_ramp": True, "power_ramp": True}
        v = verify_safety_contracts(safety_tokens=tokens,
                                    transition_enabled=enabled)
        assert v == ["thermal_limit inhibits heat_ramp"]

    def test_runtime_integration(self):
        """The contracts audit consumes the interlock runtime's snapshots."""
        from scpn_fusion_tpu.scpn.safety_interlocks import (
            SafetyLimits,
            safety_tokens_from_state,
        )
        lim = SafetyLimits()
        hot = {"T_e": 1e9, "beta_N": 0.0}
        tokens = safety_tokens_from_state(hot, limits=lim)
        enabled = {c.control_transition: True
                   for c in DEFAULT_SAFETY_CONTRACTS}
        v = verify_safety_contracts(safety_tokens=tokens,
                                    transition_enabled=enabled)
        assert any("thermal_limit" in s for s in v)
