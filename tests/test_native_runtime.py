"""Native C++ GS runtime: build, trust checks, parity vs the NumPy twin."""

import numpy as np
import pytest

from scpn_fusion_tpu.native import runtime as native_rt
from scpn_fusion_tpu.utils import npref

pytestmark = pytest.mark.skipif(
    not native_rt.is_available(), reason="no C++ toolchain available")


def _case(nz=33, nr=33, seed=0):
    rng = np.random.default_rng(seed)
    r_1d = np.linspace(2.0, 8.0, nr)
    d_r = float(r_1d[1] - r_1d[0])
    d_z = 12.0 / (nz - 1)
    psi = rng.standard_normal((nz, nr))
    psi[0, :] = psi[-1, :] = psi[:, 0] = psi[:, -1] = 0.0
    source = rng.standard_normal((nz, nr))
    return r_1d, d_r, d_z, psi, source


class TestNativeParity:
    def test_single_sweep_matches_numpy_twin(self):
        r_1d, d_r, d_z, psi, source = _case()
        solver = native_rt.NativeGSSolver(r_1d, d_r, d_z, nz=psi.shape[0])
        solver.set_state(psi, source)
        solver.sweeps(1, omega=1.6)
        expected = npref.sor_step_np(psi, source, r_1d, d_r, d_z, omega=1.6)
        np.testing.assert_allclose(solver.psi, expected, rtol=0, atol=1e-12)

    def test_many_sweeps_match_trajectory(self):
        r_1d, d_r, d_z, psi, source = _case(seed=1)
        solver = native_rt.NativeGSSolver(r_1d, d_r, d_z, nz=psi.shape[0])
        solver.set_state(psi, source)
        solver.sweeps(50, omega=1.5)
        expected = psi
        for _ in range(50):
            expected = npref.sor_step_np(expected, source, r_1d, d_r, d_z,
                                         omega=1.5)
        np.testing.assert_allclose(solver.psi, expected, rtol=0, atol=1e-9)

    def test_run_converged_reduces_residual(self):
        r_1d, d_r, d_z, psi, source = _case(seed=2)
        solver = native_rt.NativeGSSolver(r_1d, d_r, d_z, nz=psi.shape[0])
        solver.set_state(psi, source)
        r0 = solver.residual_rms()
        used = solver.run_converged(max_sweeps=5000, tol=1e-12, omega=1.7)
        assert used > 0
        assert solver.residual_rms() < 1e-6 * max(r0, 1.0)

    def test_boundary_imposition(self):
        r_1d, d_r, d_z, psi, source = _case(seed=3)
        solver = native_rt.NativeGSSolver(r_1d, d_r, d_z, nz=psi.shape[0])
        solver.set_state(psi, source)
        boundary = np.full_like(psi, 7.5)
        solver.set_boundary(boundary)
        out = solver.psi
        np.testing.assert_allclose(out[0, :], 7.5)
        np.testing.assert_allclose(out[-1, :], 7.5)
        np.testing.assert_allclose(out[:, 0], 7.5)
        np.testing.assert_allclose(out[:, -1], 7.5)
        # interior untouched
        np.testing.assert_allclose(out[1:-1, 1:-1], psi[1:-1, 1:-1])

    def test_shape_validation(self):
        r_1d, d_r, d_z, psi, source = _case()
        solver = native_rt.NativeGSSolver(r_1d, d_r, d_z, nz=psi.shape[0])
        with pytest.raises(ValueError):
            solver.set_state(psi[:-1], source)


class TestTrustStamp:
    def test_stamp_matches_source(self):
        import hashlib
        import json
        stamp = json.loads(native_rt._STAMP.read_text())
        assert stamp["source_sha256"] == hashlib.sha256(
            native_rt._SRC.read_bytes()).hexdigest()
        assert stamp["library_sha256"] == hashlib.sha256(
            native_rt._LIB.read_bytes()).hexdigest()
        assert stamp["abi"] == 1

    def test_tampered_library_refuses_to_load(self, tmp_path):
        import json
        import shutil
        # Copy the build dir, corrupt the stamp, and check the loader fails.
        lib_copy = tmp_path / "libsfc_gs_runtime.so"
        shutil.copy(native_rt._LIB, lib_copy)
        stamp = json.loads(native_rt._STAMP.read_text())
        stamp["library_sha256"] = "0" * 64
        orig = native_rt._STAMP.read_text()
        try:
            native_rt._STAMP.write_text(json.dumps(stamp))
            with pytest.raises(RuntimeError, match="trust check"):
                native_rt.NativeGSRuntimeLib(native_rt._LIB)
        finally:
            native_rt._STAMP.write_text(orig)
