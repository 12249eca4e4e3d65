"""Local electromagnetic Maxwell evolution evidence tests."""

import numpy as np
import pytest

from scpn_fusion_tpu.models.gyrokinetics.maxwell_evolution import (
    MaxwellEvolutionConfig,
    run_local_maxwell_evolution,
    to_evidence,
)


def test_default_run_accepted():
    cfg = MaxwellEvolutionConfig()
    res = run_local_maxwell_evolution(cfg)
    ev = to_evidence(res, cfg)
    assert ev["status"] == "accepted_local_source_free_maxwell_evolution", ev
    assert ev["max_faraday_linf_residual"] <= cfg.residual_tolerance
    assert ev["max_ampere_maxwell_linf_residual"] <= cfg.residual_tolerance
    assert ev["max_inductive_e_parallel_linf_residual"] <= cfg.residual_tolerance
    assert ev["max_magnetic_divergence_linf_residual"] <= cfg.residual_tolerance
    assert ev["max_relative_total_field_energy_drift"] <= cfg.relative_energy_tolerance
    assert ev["self_consistent_kinetic_current_supported"] is False


def test_energy_partition_oscillates_but_total_constant():
    cfg = MaxwellEvolutionConfig(n_steps=64, dt=2e-13)
    res = run_local_maxwell_evolution(cfg)
    e_par = np.asarray(res.electric_parallel_energy_t)
    total = np.asarray(res.total_field_energy_t)
    # Partition genuinely exchanges energy ...
    assert e_par.max() > 1.5 * e_par.min()
    # ... while the total stays flat to roundoff.
    assert np.max(np.abs(total - total[0])) / total[0] < 1e-11


def test_deterministic_by_seed():
    a = run_local_maxwell_evolution(MaxwellEvolutionConfig(seed=7))
    b = run_local_maxwell_evolution(MaxwellEvolutionConfig(seed=7))
    c = run_local_maxwell_evolution(MaxwellEvolutionConfig(seed=8))
    np.testing.assert_array_equal(np.asarray(a.total_field_energy_t),
                                  np.asarray(b.total_field_energy_t))
    assert not np.array_equal(np.asarray(a.total_field_energy_t),
                              np.asarray(c.total_field_energy_t))


def test_courant_guard():
    with pytest.raises(ValueError, match="Courant"):
        run_local_maxwell_evolution(MaxwellEvolutionConfig(dt=1e-6))


def test_config_validation():
    with pytest.raises(ValueError, match="two kx"):
        run_local_maxwell_evolution(MaxwellEvolutionConfig(n_kx=1))
    with pytest.raises(ValueError, match="saved steps"):
        run_local_maxwell_evolution(MaxwellEvolutionConfig(n_steps=1))
    with pytest.raises(ValueError, match="positive dt"):
        run_local_maxwell_evolution(MaxwellEvolutionConfig(dt=-1.0))
