"""Config schema validation (fail-closed semantics parity)."""

import json

import pytest

from scpn_fusion_tpu.core.config import (
    Coil,
    ConfigError,
    Dimensions,
    ProfileParams,
    ReactorConfig,
    SolverParams,
    config_from_dict,
    load_config,
)


def _minimal_raw():
    return {
        "reactor_name": "TEST",
        "grid_resolution": [33, 33],
        "dimensions": {"R_min": 2.0, "R_max": 10.0, "Z_min": -4.0, "Z_max": 4.0},
        "coils": [{"r": 3.0, "z": 5.0, "current": 1e6}],
        "physics": {"plasma_current_target": 15e6},
        "solver": {"max_iterations": 200, "convergence_threshold": 1e-5},
    }


def test_roundtrip_from_dict():
    cfg = config_from_dict(_minimal_raw())
    assert cfg.reactor_name == "TEST"
    assert cfg.NR == 33 and cfg.NZ == 33
    assert cfg.coils[0].current == 1e6
    assert cfg.physics.plasma_current_target == 15e6
    assert cfg.solver.max_iterations == 200


def test_config_is_hashable_static():
    cfg = config_from_dict(_minimal_raw())
    assert hash(cfg) == hash(config_from_dict(_minimal_raw()))


def test_rejects_bad_domain():
    with pytest.raises(ConfigError):
        Dimensions(R_min=5.0, R_max=2.0, Z_min=-1.0, Z_max=1.0)
    with pytest.raises(ConfigError):
        Dimensions(R_min=-1.0, R_max=2.0, Z_min=-1.0, Z_max=1.0)


def test_rejects_nonfinite():
    with pytest.raises(ConfigError):
        Coil(r=float("nan"), z=0.0)
    with pytest.raises(ConfigError):
        Dimensions(R_min=1.0, R_max=float("inf"), Z_min=-1.0, Z_max=1.0)


def test_rejects_tiny_grid():
    raw = _minimal_raw()
    raw["grid_resolution"] = [3, 3]
    with pytest.raises(ConfigError):
        config_from_dict(raw)


def test_rejects_bad_solver_params():
    with pytest.raises(ConfigError):
        SolverParams(sor_omega=2.5)
    with pytest.raises(ConfigError):
        SolverParams(relaxation_factor=0.0)
    with pytest.raises(ConfigError):
        SolverParams(solver_method="quantum")


def test_rejects_bad_profile():
    with pytest.raises(ConfigError):
        ProfileParams(ped_width=0.0)


def test_load_config_size_cap(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(_minimal_raw()))
    cfg = load_config(p)
    assert cfg.reactor_name == "TEST"
    with pytest.raises(ConfigError):
        load_config(p, max_bytes=10)


def test_reads_reference_shaped_config(tmp_path):
    """Configs shaped like the reference's JSON (profiles block, extra keys)
    must parse, with extension keys ignored."""
    raw = _minimal_raw()
    raw["physics"]["profiles"] = {
        "mode": "h-mode",
        "p_prime": {"ped_top": 0.95, "ped_width": 0.04},
    }
    raw["physics"]["unknown_extension"] = 123
    cfg = config_from_dict(raw)
    assert cfg.physics.profile_mode == "h-mode"
    assert cfg.physics.p_prime.ped_top == 0.95
    assert cfg.physics.p_prime.ped_width == 0.04
    # untouched channel keeps defaults
    assert cfg.physics.ff_prime == ProfileParams()
