"""CAD raytrace + fueling mode + TORAX hybrid campaign.

Parity anchors: reference engineering/cad_raytrace.py (STL parse, mesh
validation, Moller-Trumbore occlusion, |cos|/4 pi d^2 loading),
control/fueling_mode.py (PI + gated-SNN density control reaching the
target), control/torax_hybrid_loop.py (hybrid campaign within limits).
"""

import struct

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.fueling_torax import (
    run_fueling_mode,
    run_torax_hybrid_campaign,
)
from scpn_fusion_tpu.models.engineering.cad_raytrace import (
    estimate_surface_loading,
    load_cad_mesh,
    validate_mesh,
)


def _unit_square_mesh():
    """Two triangles forming a unit square in the z=0 plane."""
    vertices = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                          dtype=float)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]])
    return vertices, faces


class TestSTL:
    def test_ascii_round_trip(self, tmp_path):
        path = tmp_path / "tri.stl"
        path.write_text(
            "solid t\nfacet normal 0 0 1\nouter loop\n"
            "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
            "endloop\nendfacet\nendsolid t\n")
        v, f = load_cad_mesh(path)
        assert v.shape == (3, 3)
        assert f.shape == (1, 3)

    def test_binary_round_trip(self, tmp_path):
        tri = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        blob = b"\x00" * 80 + struct.pack("<I", 1)
        blob += struct.pack("<3f", 0, 0, 1)
        for row in tri:
            blob += struct.pack("<3f", *row)
        blob += b"\x00\x00"
        path = tmp_path / "tri_bin.stl"
        path.write_bytes(blob)
        v, f = load_cad_mesh(path)
        assert v.shape == (3, 3)

    def test_truncated_binary_rejected(self, tmp_path):
        path = tmp_path / "bad.stl"
        path.write_bytes(b"\x00" * 80 + struct.pack("<I", 5) + b"\x00" * 10)
        with pytest.raises(ValueError, match="truncated"):
            load_cad_mesh(path)

    def test_validate_mesh_degenerate(self):
        v = np.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], float)
        f = np.asarray([[0, 1, 2]])
        with pytest.raises(ValueError, match="non-degenerate"):
            validate_mesh(v, f)


class TestLoading:
    def test_inverse_square_and_cosine(self):
        v, f = _unit_square_mesh()
        # Source directly above the square centre at height h.
        h = 2.0
        rep = estimate_surface_loading(
            v, f, np.asarray([[0.5, 0.5, h]]), np.asarray([100.0]))
        # Normal incidence: loading ~ P/(4 pi d^2) with d ~ h.
        expect = 100.0 / (4 * np.pi * h**2)
        assert rep.face_loading_w_m2 == pytest.approx(
            [expect, expect], rel=0.1)

    def test_occlusion_shadows_back_plate(self):
        # Front square at z=1 shadows the square at z=0 from a source
        # above at z=3 (same lateral footprint).
        v0, f0 = _unit_square_mesh()
        v1 = v0 + np.asarray([0.0, 0.0, 1.0])
        vertices = np.vstack([v0, v1])
        faces = np.vstack([f0, f0 + 4])
        src = np.asarray([[0.5, 0.5, 3.0]])
        power = np.asarray([100.0])
        plain = estimate_surface_loading(vertices, faces, src, power)
        culled = estimate_surface_loading(vertices, faces, src, power,
                                          occlusion_cull=True)
        # Bottom faces (0, 1) shadowed; top faces (2, 3) unchanged.
        assert culled.face_loading_w_m2[0] == 0.0
        assert culled.face_loading_w_m2[1] == 0.0
        np.testing.assert_allclose(culled.face_loading_w_m2[2:],
                                   plain.face_loading_w_m2[2:], rtol=1e-6)
        assert plain.face_loading_w_m2[0] > 0.0

    def test_input_validation(self):
        v, f = _unit_square_mesh()
        with pytest.raises(ValueError, match="shape"):
            estimate_surface_loading(v, f, np.zeros((1, 2)), np.ones(1))
        with pytest.raises(ValueError, match="non-negative"):
            estimate_surface_loading(v, f, np.zeros((1, 3)),
                                     np.asarray([-1.0]))


class TestFuelingMode:
    def test_density_converges_to_target(self):
        res = run_fueling_mode(steps=3000)
        assert float(res.final_abs_error) < 0.02
        assert float(res.rmse) < 0.2
        assert float(jnp.max(jnp.abs(res.command_trace))) <= 2.0
        d = np.asarray(res.density_trace)
        assert np.all(d >= 0.0) and np.all(np.isfinite(d))

    def test_reaches_different_targets(self):
        hi = run_fueling_mode(target_density=1.2, steps=3000)
        lo = run_fueling_mode(target_density=0.8, steps=3000)
        assert float(hi.final_density) > float(lo.final_density)
        assert float(hi.final_abs_error) < 0.05


class TestToraxHybrid:
    def test_campaign_within_limits(self):
        res = run_torax_hybrid_campaign(episodes=8, steps=220)
        assert bool(jnp.all(res.within_limits))
        assert float(jnp.max(res.beta_rmse)) < 0.4
        # beta_N regulated near target across disturbance amplitudes.
        assert float(jnp.max(jnp.abs(res.beta_n_final - 1.85))) < 0.3
        assert bool(jnp.all(jnp.isfinite(res.risk_peak)))

    def test_risk_rises_with_disturbance(self):
        from scpn_fusion_tpu.control.fueling_torax import _risk_signal
        base = float(_risk_signal(1.85, 4.9, 0.95, 0.0))
        hot = float(_risk_signal(2.3, 4.0, 1.4, 0.8))
        assert hot > base
