"""GEQDSK reconstruction lane.

The reference repo's DIII-D/SPARC fixtures are synthetic (their psirz does
NOT satisfy the GS PDE with their own p'/FF' tables — measured correlation
~0.5, Ip mismatch ~3x), so exact recovery is impossible by construction; the
reference's own public-fixture lane records psi_N RMSE ~0.21 for its
DIII-D-like case ("blocked lane, recorded honestly", README Key Results).
These gates pin stability + an honest RMSE envelope on the same fixtures;
exact-accuracy parity lives in the Solov'ev analytic lane
(test_solovev.py)."""

from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.io import read_geqdsk
from scpn_fusion_tpu.models.equilibrium.eqdsk_solve import solve_from_geqdsk

REF_DATA = Path("/root/reference/validation/reference_data")

CASES = [
    ("diiid/diiid_hmode_2MA.geqdsk", 0.25),
    ("diiid/diiid_lmode_1MA.geqdsk", 0.30),
    ("sparc/sparc_1300.eqdsk", 0.25),
]


@pytest.mark.parametrize("rel,gate", CASES)
def test_reconstruction_within_envelope(rel, gate):
    p = REF_DATA / rel
    if not p.exists():
        pytest.skip("reference data not mounted")
    eq = read_geqdsk(p)
    res = solve_from_geqdsk(eq, max_iter=400)
    assert bool(res.converged), f"{rel}: no convergence"
    rmse = float(res.span_rel_rmse)
    assert np.isfinite(rmse)
    assert rmse < gate, f"{rel}: span-rel RMSE {rmse:.3f} exceeds gate {gate}"
    assert np.all(np.isfinite(np.asarray(res.psi)))


def test_reconstruction_preserves_plasma_current():
    p = REF_DATA / "diiid/diiid_hmode_2MA.geqdsk"
    if not p.exists():
        pytest.skip("reference data not mounted")
    eq = read_geqdsk(p)
    res = solve_from_geqdsk(eq, max_iter=300)
    grid_dr = eq.rdim / (eq.nw - 1)
    grid_dz = eq.zdim / (eq.nh - 1)
    ip = float(jnp.sum(res.j_phi)) * grid_dr * grid_dz
    np.testing.assert_allclose(ip, eq.current, rtol=1e-3)
