"""GEQDSK reader/writer: round-trip + real public fixtures from the
reference repo's validation data (read-only parity inputs)."""

from pathlib import Path

import numpy as np
import pytest

from scpn_fusion_tpu.io.geqdsk import GEqdsk, GeqdskError, read_geqdsk, write_geqdsk

REF_DATA = Path("/root/reference/validation/reference_data")


def _synthetic_eq(nw=33, nh=33):
    r = np.linspace(1.0, 3.0, nw)
    z = np.linspace(-1.5, 1.5, nh)
    rr, zz = np.meshgrid(r, z)
    psi = np.exp(-((rr - 2.0) ** 2 + zz**2))
    x = np.linspace(0, 1, nw)
    theta = np.linspace(0, 2 * np.pi, 17)
    return GEqdsk(
        description="synthetic test equilibrium",
        nw=nw, nh=nh,
        rdim=2.0, zdim=3.0, rcentr=2.0, rleft=1.0, zmid=0.0,
        rmaxis=2.0, zmaxis=0.0, simag=1.0, sibry=0.1,
        bcentr=2.5, current=1.2e6,
        fpol=5.0 - x, pres=1e5 * (1 - x) ** 2, ffprime=-1.0 + x,
        pprime=-2e5 * (1 - x), qpsi=1.0 + 2 * x**2,
        psirz=psi,
        rbdry=2.0 + 0.8 * np.cos(theta), zbdry=1.2 * np.sin(theta),
        rlim=2.0 + 0.95 * np.cos(theta), zlim=1.4 * np.sin(theta),
    )


def test_roundtrip(tmp_path):
    eq = _synthetic_eq()
    p = tmp_path / "test.geqdsk"
    write_geqdsk(eq, p)
    eq2 = read_geqdsk(p)
    assert eq2.nw == eq.nw and eq2.nh == eq.nh
    for nm in ("rdim", "zdim", "rcentr", "rleft", "zmid", "rmaxis",
               "zmaxis", "simag", "sibry", "bcentr", "current"):
        np.testing.assert_allclose(getattr(eq2, nm), getattr(eq, nm), rtol=1e-9)
    for nm in ("fpol", "pres", "ffprime", "pprime", "qpsi", "psirz",
               "rbdry", "zbdry", "rlim", "zlim"):
        np.testing.assert_allclose(getattr(eq2, nm), getattr(eq, nm), rtol=1e-8)


@pytest.mark.parametrize("rel", [
    "diiid/diiid_hmode_2MA.geqdsk",
    "diiid/diiid_lmode_1MA.geqdsk",
    "diiid/diiid_negdelta.geqdsk",
    "sparc/sparc_1300.eqdsk",
    "sparc/lmode_vv.geqdsk",
])
def test_reads_public_fixtures(rel):
    p = REF_DATA / rel
    if not p.exists():
        pytest.skip("reference data not mounted")
    eq = read_geqdsk(p)
    assert eq.nw >= 2 and eq.nh >= 2
    assert eq.psirz.shape == (eq.nh, eq.nw)
    assert np.all(np.isfinite(eq.psirz))
    # Axis flux must lie within the global psi range of the map.
    lo, hi = eq.psirz.min(), eq.psirz.max()
    assert lo - 1e-6 <= eq.simag <= hi + 1e-6


def test_fixture_roundtrip_preserves_psi(tmp_path):
    src = REF_DATA / "diiid/diiid_hmode_2MA.geqdsk"
    if not src.exists():
        pytest.skip("reference data not mounted")
    eq = read_geqdsk(src)
    out = tmp_path / "roundtrip.geqdsk"
    write_geqdsk(eq, out)
    eq2 = read_geqdsk(out)
    np.testing.assert_allclose(eq2.psirz, eq.psirz, rtol=1e-8)
    np.testing.assert_allclose(eq2.qpsi, eq.qpsi, rtol=1e-8)
    np.testing.assert_allclose(eq2.rbdry, eq.rbdry, rtol=1e-8)


def test_run_together_negative_floats(tmp_path):
    """Fortran output may glue negative numbers together — the SPARC fixtures
    do this; make sure the tokenizer splits them."""
    eq = _synthetic_eq()
    eq.simag = -6.037668974e-02
    eq.sibry = -8.328064869e-06
    p = tmp_path / "glued.geqdsk"
    write_geqdsk(eq, p)
    # Manually glue two numbers on the scalar record line.
    text = p.read_text().replace("-6.037668974E-02 ", "-6.037668974E-02")
    p.write_text(text)
    eq2 = read_geqdsk(p)
    np.testing.assert_allclose(eq2.simag, -6.037668974e-02)


def test_rejects_truncated(tmp_path):
    eq = _synthetic_eq()
    p = tmp_path / "t.geqdsk"
    write_geqdsk(eq, p)
    lines = p.read_text().splitlines()
    p.write_text("\n".join(lines[: len(lines) // 2]))
    with pytest.raises(GeqdskError):
        read_geqdsk(p)


def test_rejects_size_bomb(tmp_path):
    p = tmp_path / "bomb.geqdsk"
    p.write_text("huge 0 100000 100000\n" + "0.0 " * 20)
    with pytest.raises(GeqdskError):
        read_geqdsk(p)


def test_to_config_bridges_to_solver():
    eq = _synthetic_eq()
    cfg_raw = eq.to_config("bridge-test")
    from scpn_fusion_tpu.core.config import config_from_dict
    cfg = config_from_dict(cfg_raw)
    assert cfg.NR == eq.nw and cfg.NZ == eq.nh
    assert cfg.dimensions.R_min == pytest.approx(1.0)
    assert cfg.physics.plasma_current_target == pytest.approx(1.2e6)


def test_bare_exponent_three_digit(tmp_path):
    """Legal EFIT output with a 3-digit exponent drops the 'E' ("1.5-101");
    the tokenizer must parse it as one float, not shift the token stream
    (ADVICE.md r1: a shifted stream silently corrupts every later array)."""
    eq = _synthetic_eq()
    eq.sibry = 1.5e-101
    p = tmp_path / "bare.geqdsk"
    write_geqdsk(eq, p)
    # Fortran writes 1.5e-101 as "1.500000000-101" (no room for the E).
    text = p.read_text().replace("1.500000000E-101", " 1.500000000-101")
    text = text.replace("1.5000000000E-101", "1.5000000000-101")
    assert "-101" in text
    p.write_text(text)
    eq2 = read_geqdsk(p)
    np.testing.assert_allclose(eq2.sibry, 1.5e-101)
    # The stream did NOT shift: psirz still round-trips.
    np.testing.assert_allclose(eq2.psirz, eq.psirz, rtol=1e-8)


def test_bare_exponent_does_not_split_adjacent_negatives():
    from scpn_fusion_tpu.io.geqdsk import _FLOAT_RE
    # Adjacent fixed-format fields: "-0.456" must stay a separate token,
    # not become an exponent of the previous number.
    assert _FLOAT_RE.findall("0.9722-0.2065") == ["0.9722", "-0.2065"]
    assert _FLOAT_RE.findall("1.5-101") == ["1.5-101"]
    assert _FLOAT_RE.findall("1.2E-10-0.23") == ["1.2E-10", "-0.23"]


def test_geqdsk_from_solution_roundtrip(tmp_path):
    """Solve -> export -> parse: psirz survives bit-faithfully (to format
    precision), Ip matches the solved current integral, and the exported
    profile tables are physically consistent (p(1) = 0, F(1) = R0*B0)."""
    import jax.numpy as jnp

    from scpn_fusion_tpu.io.geqdsk import geqdsk_from_solution
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
    from tests.test_fixed_boundary import make_cfg

    cfg = make_cfg("multigrid", n=33, inner_sweeps=1)
    res = solve_equilibrium(cfg, dtype=jnp.float64)
    assert bool(res.converged)

    eq = geqdsk_from_solution(cfg, res)
    p = tmp_path / "sol.geqdsk"
    write_geqdsk(eq, p)
    eq2 = read_geqdsk(p)

    span = float(np.ptp(eq.psirz))
    np.testing.assert_allclose(eq2.psirz, eq.psirz, atol=1e-6 * span)
    ip = float(jnp.sum(res.j_phi)) * (8.0 / 32) * (8.0 / 32)
    np.testing.assert_allclose(eq.current, ip, rtol=1e-10)
    assert eq.pres[-1] == 0.0
    np.testing.assert_allclose(eq.fpol[-1], eq.rcentr * eq.bcentr,
                               rtol=1e-12)
    assert eq.simag == float(np.max(eq.psirz))
