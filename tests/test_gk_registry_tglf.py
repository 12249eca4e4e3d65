"""GK path A: solver interface, registry, external adapters, native TGLF.

Parity anchors: reference core/gk_interface.py (params/output contract),
gk_registry.py (registry semantics), gk_tglf.py + gk_gene.py + gk_gs2.py +
gk_cgyro.py (deck/parse contracts, tested without binaries exactly like
reference tests/test_gk_tglf.py), gk_tglf_native.py (SAT-rule properties,
mirroring tests/test_gk_tglf_native.py), and the canonical regime fixtures
validation/tglf_reference/*.json.
"""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.gyrokinetics import registry as reg
from scpn_fusion_tpu.models.gyrokinetics.external import (
    CGYROSolver,
    GENESolver,
    GS2Solver,
    TGLFSolver,
    classify_dominant_mode,
)
from scpn_fusion_tpu.models.gyrokinetics.interface import (
    GKLocalParams,
    GKOutput,
    GKSolverBase,
)
from scpn_fusion_tpu.models.gyrokinetics.local_dispersion import (
    solve_local_kinetic_dispersion,
)
from scpn_fusion_tpu.models.gyrokinetics.tglf_native import (
    TGLFNativeConfig,
    TGLFNativeSolver,
    exb_shear_rate,
    sat_phi_sq,
    spectral_weight,
    tglf_native_fluxes_profile,
    trapped_fraction,
    trapped_particle_damping,
)

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "validation" / \
    "configs" / "tglf_reference"


def _params_from_fixture(name: str) -> tuple[GKLocalParams, dict]:
    payload = json.loads((FIXTURE_DIR / name).read_text())
    p = payload["input_parameters"]
    rho = float(p["rho_tor"])
    eps = float(p["a_minor_m"]) / float(p["R_major_m"]) * rho
    params = GKLocalParams(
        r_l_ti=p["R_LT_i"], r_l_te=p["R_LT_e"], r_l_ne=p["R_Ln_e"],
        q=p["q"], s_hat=p["s_hat"], te_ti=p["T_e_T_i"], z_eff=p["Z_eff"],
        nu_star=p["nu_ei_norm"], beta_e=p["beta_e"], epsilon=eps,
        kappa=p["kappa"], delta=p["delta"], rho=rho,
        r0=p["R_major_m"], a=p["a_minor_m"], b0=p["B_toroidal_T"])
    return params, payload["tglf_output"]


# ── Interface contract ───────────────────────────────────────────────────


class TestInterface:
    def test_rejects_unknown_physics_model(self):
        with pytest.raises(ValueError, match="physics_model"):
            GKLocalParams(r_l_ti=9.0, r_l_te=6.9, r_l_ne=2.2, q=1.4,
                          s_hat=0.8, physics_model="quantum")

    def test_rejects_nonpositive_grid(self):
        with pytest.raises(ValueError, match="n_parallel_grid"):
            GKLocalParams(r_l_ti=9.0, r_l_te=6.9, r_l_ne=2.2, q=1.4,
                          s_hat=0.8, n_parallel_grid=0)

    def test_nonlinear_needs_resolved_5d(self):
        with pytest.raises(ValueError, match="5D"):
            GKLocalParams(r_l_ti=9.0, r_l_te=6.9, r_l_ne=2.2, q=1.4,
                          s_hat=0.8, physics_model="nonlinear_electrostatic",
                          n_binormal_modes=1)

    def test_properties(self):
        p = GKLocalParams(r_l_ti=9.0, r_l_te=6.9, r_l_ne=2.2, q=1.4,
                          s_hat=0.8,
                          physics_model="nonlinear_electromagnetic",
                          n_binormal_modes=4)
        assert p.requires_nonlinear_solver
        assert p.is_electromagnetic
        assert p.phase_space_dimensions == 5
        assert hash(p)  # frozen => hashable => jit-static capable


# ── Registry ─────────────────────────────────────────────────────────────


class TestRegistry:
    def test_builtin_keys(self):
        keys = reg.registered_gk_solvers()
        assert {"tglf", "tglf-native", "gene", "gs2", "cgyro",
                "qualikiz"} <= set(keys)

    def test_create_and_type(self):
        s = reg.create_gk_solver("tglf-native")
        assert isinstance(s, GKSolverBase)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError, match="registered"):
            reg.gk_solver_class("does-not-exist")

    def test_availability_probe_fail_closed(self):
        avail = reg.available_gk_solvers()
        assert avail["tglf-native"] is True
        # No external GK binaries in this image.
        assert avail["tglf"] is False
        assert avail["gene"] is False

    def test_resolve_tglf_falls_back_to_native(self):
        s = reg.resolve_tglf_solver()
        assert isinstance(s, TGLFNativeSolver)

    def test_reregister_replaces(self):
        class Dummy(TGLFNativeSolver):
            pass

        reg.register_gk_solver("tglf-native", lambda: Dummy)
        try:
            assert reg.gk_solver_class("tglf-native") is Dummy
        finally:
            reg.register_gk_solver(
                "tglf-native",
                lambda: TGLFNativeSolver)
        assert reg.gk_solver_class("tglf-native") is TGLFNativeSolver

    def test_loader_type_check(self):
        reg.register_gk_solver("bogus", lambda: int)
        try:
            with pytest.raises(TypeError, match="GKSolverBase"):
                reg.gk_solver_class("bogus")
        finally:
            reg._LOADERS.pop("bogus", None)


# ── External adapters: decks + parsers, no binaries needed ──────────────


@pytest.fixture
def cyclone():
    return GKLocalParams(r_l_ti=6.9, r_l_te=6.9, r_l_ne=2.2,
                         q=1.4, s_hat=0.8, epsilon=0.18)


class TestExternalAdapters:
    def test_tglf_deck_contains_parameters(self, tmp_path, cyclone):
        s = TGLFSolver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        deck = (run_dir / "input.tglf").read_text()
        assert "RLTS_2 = 6.9" in deck
        assert "Q_LOC = 1.4" in deck
        assert "SHAT = 0.8" in deck

    def test_tglf_not_available(self):
        assert TGLFSolver().is_available() is False

    def test_tglf_parse_synthetic_outputs(self, tmp_path, cyclone):
        s = TGLFSolver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        (run_dir / "out.tglf.transport").write_text(
            "chi_i 2.5\nchi_e 1.1\nd_e 0.4\n")
        (run_dir / "out.tglf.eigenvalue_spectrum").write_text(
            "# ky gamma omega\n0.3 0.2 -0.4\n0.5 0.3 -0.5\n")
        out = s.run(run_dir)
        assert out.converged
        assert out.chi_i == pytest.approx(2.5)
        assert out.chi_e == pytest.approx(1.1)
        assert out.d_e == pytest.approx(0.4)
        assert out.dominant_mode == "ITG"
        np.testing.assert_allclose(out.k_y, [0.3, 0.5])

    def test_tglf_missing_outputs_fail_soft(self, tmp_path, cyclone):
        s = TGLFSolver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        out = s.run(run_dir)
        assert not out.converged
        assert out.chi_i == 0.0

    def test_tglf_missing_deck_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            TGLFSolver().run(tmp_path)

    def test_gene_deck_namelist(self, tmp_path, cyclone):
        s = GENESolver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        deck = (run_dir / "parameters").read_text()
        assert "omt = 6.9" in deck
        assert "magn_geometry = 'miller'" in deck
        assert "nonlinear = F" in deck

    def test_gs2_deck_and_omega_parse(self, tmp_path, cyclone):
        s = GS2Solver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        assert "tprim = 6.9" in (run_dir / "gs2.in").read_text()
        (run_dir / "gs2.omega").write_text("0.3 0.45 0.12\n0.5 0.55 0.20\n")
        out = s.run(run_dir)
        assert out.converged
        assert out.dominant_mode == "TEM"     # positive omega_r
        np.testing.assert_allclose(out.gamma, [0.12, 0.20])

    def test_cgyro_deck_and_freq_parse(self, tmp_path, cyclone):
        s = CGYROSolver(work_dir=tmp_path)
        run_dir = s.prepare_input(cyclone)
        assert "DLNTDR_1 = 6.9" in (run_dir / "input.cgyro").read_text()
        (run_dir / "out.cgyro.freq").write_text("-0.40 0.05\n-0.42 0.21\n")
        out = s.run(run_dir)
        assert out.converged
        assert out.gamma[-1] == pytest.approx(0.21)
        assert out.dominant_mode == "ITG"

    def test_classify_dominant_mode(self):
        assert classify_dominant_mode(np.array([]), np.array([])) == "stable"
        assert classify_dominant_mode(
            np.array([-0.1, -0.2]), np.array([0.5, 0.2])) == "stable"
        assert classify_dominant_mode(
            np.array([0.1, 0.3]), np.array([0.5, -0.2])) == "ITG"
        assert classify_dominant_mode(
            np.array([0.3, 0.1]), np.array([0.5, -0.2])) == "TEM"


# ── Native TGLF: SAT-rule properties (reference test parity) ─────────────


class TestNativeSatRules:
    def test_exb_shear_linear_in_s_hat(self):
        a = float(exb_shear_rate(0.8, 1.4, 0.18, 9.0))
        b = float(exb_shear_rate(1.6, 1.4, 0.18, 9.0))
        assert b == pytest.approx(2.0 * a, rel=1e-10)

    def test_exb_zero_at_zero_q(self):
        assert float(exb_shear_rate(0.8, 0.0, 0.18, 9.0)) == 0.0

    def test_trapped_fraction_formula(self):
        eps = 0.18
        assert float(trapped_fraction(eps)) == pytest.approx(
            np.sqrt(2 * eps / (1 + eps)), rel=1e-10)

    def test_trapped_damping_below_one(self):
        assert float(trapped_particle_damping(0.18, 0.3)) < 1.0
        assert float(trapped_particle_damping(0.9, 10.0)) >= 0.1

    def test_spectral_weight_normalised(self):
        g = jnp.asarray([0.1, 0.3, 0.2, 0.0])
        ky = jnp.asarray([0.2, 0.4, 0.6, 0.8])
        w = spectral_weight(g, ky)
        assert float(jnp.sum(w)) == pytest.approx(1.0, abs=1e-12)
        assert float(w[3]) == 0.0

    def test_all_stable_gives_zero_phi(self):
        g = jnp.zeros(4)
        ky = jnp.asarray([0.2, 0.4, 3.0, 6.0])
        om = jnp.asarray([-0.5, -0.6, 1.0, 2.0])
        for sat in ("SAT0", "SAT1", "SAT2"):
            assert float(jnp.sum(sat_phi_sq(g, om, ky, sat, 3.0))) == 0.0

    def test_sat2_enhances_unstable_etg(self):
        g = jnp.asarray([0.2, 0.3, 0.25, 0.15])
        ky = jnp.asarray([0.3, 0.6, 3.0, 6.0])
        om = jnp.asarray([-0.4, -0.5, 2.0, 4.0])
        p1 = sat_phi_sq(g, om, ky, "SAT1", 3.0, etg_unit_scale=60.0)
        p2 = sat_phi_sq(g, om, ky, "SAT2", 3.0, etg_unit_scale=60.0)
        np.testing.assert_allclose(np.asarray(p2[:2]), np.asarray(p1[:2]))
        assert float(p2[2]) > float(p1[2])
        assert float(p2[3]) > float(p1[3])

    def test_sat2_enhancement_bounded_when_ion_scales_stable(self):
        # gamma_ITG floor must not blow up the Maeyama ratio.
        g = jnp.asarray([0.0, 0.0, 0.25, 0.15])
        ky = jnp.asarray([0.3, 0.6, 3.0, 6.0])
        om = jnp.asarray([-0.4, -0.5, 2.0, 4.0])
        p2 = sat_phi_sq(g, om, ky, "SAT2", 3.0, etg_unit_scale=60.0)
        p1 = sat_phi_sq(g, om, ky, "SAT1", 3.0, etg_unit_scale=60.0)
        ratio = float(p2[2] / p1[2])
        assert ratio <= 1.0 + 3.0 * 2.0 + 1e-9   # clamped at ratio 2

    def test_sat2_config_forces_multiscale(self):
        cfg = TGLFNativeConfig(sat_model="SAT2")
        assert cfg.multiscale
        assert cfg.n_ky_etg > 0

    def test_unknown_sat_model_rejected(self):
        with pytest.raises(ValueError, match="SAT"):
            TGLFNativeConfig(sat_model="SAT9")


# ── Native TGLF: fixture parity + deck round-trip ────────────────────────


class TestNativeFixtureParity:
    def test_itg_case(self):
        params, ref = _params_from_fixture("itg_dominated.json")
        out = TGLFNativeSolver().run_from_params(params)
        assert out.dominant_mode == ref["dominant_mode"] == "ITG"
        assert out.chi_i > out.chi_e > 0.0
        # Growth-rate order parity against the published regime value.
        gmax = float(np.max(out.gamma))
        assert 0.1 * ref["gamma_max_cs_a"] < gmax < 10 * ref["gamma_max_cs_a"]
        # chi_i within an order of magnitude of the published m^2/s value.
        assert 0.1 * ref["chi_i_m2_s"] < out.chi_i < 10 * ref["chi_i_m2_s"]

    def test_etg_case_multiscale(self):
        params, ref = _params_from_fixture("etg_dominated.json")
        solver = TGLFNativeSolver(TGLFNativeConfig(sat_model="SAT2"))
        r = solver.solve(params)
        out = solver.run_from_params(params)
        assert float(r.chi_e_etg) > 0.0
        assert out.chi_e > out.chi_i          # electron-channel dominance
        assert 0.1 * ref["chi_e_m2_s"] < float(r.chi_e_etg) \
            < 10 * ref["chi_e_m2_s"]

    def test_tem_branch_exists_at_dispersion_level(self):
        """Kinetic trapped electrons open a positive-omega_r (electron
        direction) unstable branch where the adiabatic lane is stable —
        the TEM fixture's drive (R/L_ne = 5.5)."""
        kw = dict(r_l_t=3.5, r_l_n=5.5, tau=1.0 / 1.1, q=2.0,
                  epsilon_r=0.19)
        ad = solve_local_kinetic_dispersion(0.45, **kw)
        kin = solve_local_kinetic_dispersion(
            0.45, **kw, kinetic_electrons=True, r_l_te=5.0,
            nu_detrap=0.26)
        assert float(ad.gamma) <= 1e-6
        assert float(kin.gamma) > 0.0
        assert float(kin.omega_r) > 0.0      # electron diamagnetic direction

    def test_deck_round_trip(self):
        params, _ = _params_from_fixture("itg_dominated.json")
        solver = TGLFNativeSolver()
        deck = solver.prepare_input(params)
        try:
            out = solver.run(deck)
            direct = solver.run_from_params(params)
            assert out.chi_i == pytest.approx(direct.chi_i, rel=1e-12)
            assert out.dominant_mode == direct.dominant_mode
        finally:
            deck.unlink()

    def test_run_rejects_non_json(self, tmp_path):
        bad = tmp_path / "deck.txt"
        bad.write_text("{}")
        with pytest.raises(ValueError, match="json"):
            TGLFNativeSolver().run(bad)

    def test_run_from_params_returns_gk_output(self):
        params, _ = _params_from_fixture("itg_dominated.json")
        out = reg.resolve_tglf_solver().run_from_params(params)
        assert isinstance(out, GKOutput)
        assert out.converged


class TestProfileVectorisation:
    def test_profile_matches_per_surface(self):
        """One compiled vmap over surfaces == per-surface evaluation."""
        n = 3
        r_l_ti = jnp.asarray([4.0, 6.0, 9.0])
        r_l_te = jnp.asarray([4.0, 5.5, 6.9])
        r_l_ne = jnp.asarray([1.5, 2.0, 2.2])
        q = jnp.asarray([1.2, 1.4, 1.8])
        s_hat = jnp.asarray([0.5, 0.8, 1.2])
        eps = jnp.asarray([0.06, 0.12, 0.18])
        cfg = TGLFNativeConfig(n_ky_ion=6, n_energy=16, n_lambda=12)
        prof = tglf_native_fluxes_profile(
            r_l_ti, r_l_te, r_l_ne, q, s_hat, eps, 1.0, 0.1,
            2.0, 5.3, 6.2, 8.0, cfg=cfg)
        assert prof.chi_i.shape == (n,)
        from scpn_fusion_tpu.models.gyrokinetics.tglf_native import (
            tglf_native_fluxes,
        )
        for i in range(n):
            single = tglf_native_fluxes(
                r_l_ti[i], r_l_te[i], r_l_ne[i], q[i], s_hat[i], eps[i],
                1.0, 0.1, 2.0, 5.3, 6.2, 8.0, cfg=cfg)
            np.testing.assert_allclose(
                float(prof.chi_i[i]), float(single.chi_i), rtol=1e-6)
        assert bool(jnp.all(jnp.isfinite(prof.chi_e)))
