"""Edge (SOL/EPED), orbits, FRC rigid rotor, sawtooth, SCPN safety/artifact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.edge import (
    eich_heat_flux_width,
    eped_pedestal,
    peak_target_heat_flux,
    two_point_sol,
)
from scpn_fusion_tpu.models.physics.frc import solve_rigid_rotor
from scpn_fusion_tpu.models.physics.orbits import (
    BorisState,
    boris_step,
    init_guiding_center,
    run_boris,
    run_guiding_center,
)
from scpn_fusion_tpu.models.physics.sawtooth import (
    find_q1_radius,
    kadomtsev_crash,
    sawtooth_step,
)


class TestSOL:
    def test_eich_width_iter_scale(self):
        """ITER-like: lambda_q ~ 1 mm (Eich 2013 prediction)."""
        lam = float(eich_heat_flux_width(100.0, 6.2, 1.2, 2.0 / 6.2))
        assert 0.5 < lam < 2.0, lam

    def test_two_point_invariants(self):
        """Sheath-limited at low density (T_t clamps to T_u, the reference's
        own clamp); conduction-limited cooling at high density with pressure
        balance n_t T_t = n_u T_u / 2."""
        low = two_point_sol(p_sol_mw=100.0, n_u_19=3.0, r0=6.2, a=2.0,
                            q95=3.0, b_pol=1.2)
        assert float(low.t_target_ev) == pytest.approx(float(low.t_upstream_ev))
        assert float(low.q_parallel_mw_m2) > 100.0  # upstream GW/m^2 range

        high = two_point_sol(p_sol_mw=100.0, n_u_19=30.0, r0=6.2, a=2.0,
                             q95=3.0, b_pol=1.2, f_rad=0.9)
        t_t, t_u = float(high.t_target_ev), float(high.t_upstream_ev)
        assert 0 < t_t < t_u
        np.testing.assert_allclose(
            float(high.n_target_19) * t_t, 30.0 * t_u / 2.0, rtol=1e-6)

    def test_radiation_cools_target(self):
        hot = two_point_sol(p_sol_mw=100.0, n_u_19=30.0, r0=6.2, a=2.0,
                            q95=3.0, b_pol=1.2, f_rad=0.0)
        cool = two_point_sol(p_sol_mw=100.0, n_u_19=30.0, r0=6.2, a=2.0,
                             q95=3.0, b_pol=1.2, f_rad=0.9)
        assert float(cool.t_target_ev) < float(hot.t_target_ev)

    def test_peak_flux_scales_inverse_width(self):
        q1 = float(peak_target_heat_flux(100.0, 6.2, 1e-3))
        q2 = float(peak_target_heat_flux(100.0, 6.2, 2e-3))
        np.testing.assert_allclose(q1 / q2, 2.0, rtol=1e-6)


class TestEPED:
    def test_iter_like_pedestal(self):
        """ITER-like pedestal: T_ped of a few keV, width 2-10% psi_N."""
        res = eped_pedestal(n_ped_1e19=8.0, r0=6.2, a=2.0, b0=5.3, ip_ma=15.0)
        t = float(res.t_ped_kev)
        assert 0.5 < t < 10.0, t
        assert 0.01 <= float(res.delta_ped) <= 0.15
        assert float(res.p_ped_kpa) > 10.0

    def test_density_degrades_temperature(self):
        lo = eped_pedestal(n_ped_1e19=5.0, r0=6.2, a=2.0, b0=5.3, ip_ma=15.0)
        hi = eped_pedestal(n_ped_1e19=12.0, r0=6.2, a=2.0, b0=5.3, ip_ma=15.0)
        assert float(hi.t_ped_kev) < float(lo.t_ped_kev)


class TestOrbits:
    @staticmethod
    def _tokamak_field(r, z, b0=5.3, r0=6.2):
        b_phi = b0 * r0 / r
        # Simple poloidal component from a parabolic psi.
        b_r = -0.1 * z
        b_z = 0.1 * (r - r0)
        return b_r, b_z, b_phi

    def test_guiding_center_conserves_energy(self):
        field = lambda r, z: self._tokamak_field(r, z)  # noqa: E731
        s0 = init_guiding_center(field, m_amu=2.0, charge_z=1, e_kev=80.0,
                                 pitch_angle=0.4, r0=6.8, z0=0.0)
        final, trace = run_guiding_center(
            s0, field, m_amu=2.0, charge_z=1, dt=1e-8, n_steps=20000)
        r = np.asarray(trace["r"])
        assert np.all(np.isfinite(r))
        assert np.all((r > 4.0) & (r < 9.0)), "orbit escaped the device"
        # Energy audit: E = m v_par^2/2 + mu B conserved to ~1%.
        m = 2.0 * 1.66053906660e-27
        br, bz, bphi = field(float(final.r), float(final.z))
        b_mag = np.sqrt(br**2 + bz**2 + bphi**2)
        e_final = 0.5 * m * float(final.v_par) ** 2 + float(final.mu) * b_mag
        e0 = 80.0e3 * 1.602176634e-19
        np.testing.assert_allclose(e_final, e0, rtol=0.02)

    def test_boris_gyration_conserves_energy_exactly(self):
        b = jnp.asarray([0.0, 0.0, 5.0])
        e = jnp.zeros(3)
        field = lambda x: (e, b)  # noqa: E731
        q_over_m = 1.602176634e-19 / (2.0 * 1.66053906660e-27)
        s0 = BorisState(jnp.zeros(3), jnp.asarray([1e6, 0.0, 0.0]))
        final, trace = run_boris(s0, field, q_over_m=q_over_m, dt=1e-9,
                                 n_steps=5000)
        en = np.asarray(trace["energy"])
        np.testing.assert_allclose(en, en[0], rtol=1e-6)
        # Gyroradius: r_L = v / (q/m B)
        x = np.asarray(trace["x"])
        r_l = 1e6 / (q_over_m * 5.0)
        np.testing.assert_allclose(
            0.5 * (x[:, 0].max() - x[:, 0].min()), r_l, rtol=0.01)

    def test_boris_exb_drift(self):
        b = jnp.asarray([0.0, 0.0, 2.0])
        e = jnp.asarray([0.0, 1e4, 0.0])
        field = lambda x: (e, b)  # noqa: E731
        q_over_m = 1.602176634e-19 / (2.0 * 1.66053906660e-27)
        s0 = BorisState(jnp.zeros(3), jnp.asarray([0.0, 0.0, 0.0]))
        final, trace = run_boris(s0, field, q_over_m=q_over_m, dt=5e-9,
                                 n_steps=40000)
        # E x B / B^2 = (E_y B_z, ...) / B^2 -> x-drift at 5 km/s.
        t_total = 5e-9 * 40000
        v_drift = float(final.x[0]) / t_total
        np.testing.assert_allclose(v_drift, 1e4 / 2.0, rtol=0.05)


class TestFRC:
    def test_force_balance_exact(self):
        eq = solve_rigid_rotor(b_external_t=0.5, separatrix_radius_m=0.3)
        assert float(eq.force_balance_residual) < 1e-8

    def test_field_null_location(self):
        eq = solve_rigid_rotor(b_external_t=0.5, separatrix_radius_m=0.3)
        rho = np.asarray(eq.rho)
        bz = np.asarray(eq.b_z)
        # Sign change of B_z at r_null = r_s/sqrt(2).
        null_idx = np.argmin(np.abs(bz[: len(bz) // 2 + 40]))
        np.testing.assert_allclose(rho[null_idx], 0.3 / np.sqrt(2), atol=0.01)
        # Reversed core: B_z(0) opposite to external field ... B_z(0)=+B_e tanh(K)
        assert bz[0] > 0 and bz[-1] < 0

    def test_feeds_hall_mhd_carrier(self):
        from scpn_fusion_tpu.models.physics import (
            HallMHDPulsedParams, run_hall_mhd_pulsed)
        eq = solve_rigid_rotor(b_external_t=0.5, separatrix_radius_m=0.3)
        params = HallMHDPulsedParams(tau_psi_s=1e-3,
                                     electron_temperature_ev=50.0,
                                     r_null_m=float(eq.r_null))
        bramp = lambda t: 0.5 + 10.0 * t  # noqa: E731
        # Skip rho=0 (the carrier grid must be positive).
        final, b_z, diags = run_hall_mhd_pulsed(
            params, eq.psi[1:], eq.rho[1:], eq.j_theta[1:], bramp,
            1e-6, n_steps=100)
        assert np.all(np.isfinite(np.asarray(final.psi)))


class TestSawtooth:
    def _profiles(self, q0=0.8):
        rho = jnp.linspace(0.0, 1.0, 100)
        q = q0 + 2.5 * rho**2
        t = 10.0 * (1 - rho**2) + 0.1
        n = 8.0 * (1 - rho**2) ** 0.5 + 0.5
        return rho, q, t, n

    def test_q1_radius(self):
        rho, q, *_ = self._profiles(q0=0.8)
        r1 = float(find_q1_radius(rho, q))
        np.testing.assert_allclose(r1, np.sqrt(0.2 / 2.5), atol=0.02)

    def test_no_crash_when_q_above_one(self):
        rho, q, t, n = self._profiles(q0=1.1)
        out = kadomtsev_crash(rho, t, n, q)
        assert not bool(out.triggered)
        np.testing.assert_array_equal(np.asarray(out.t_new), np.asarray(t))

    def test_crash_flattens_and_conserves(self):
        rho, q, t, n = self._profiles(q0=0.8)
        out = kadomtsev_crash(rho, t, n, q)
        assert bool(out.triggered)
        t_new = np.asarray(out.t_new)
        n_new = np.asarray(out.n_new)
        q_new = np.asarray(out.q_new)
        # Core flattened and q reset above 1.
        assert t_new[0] < float(t[0])
        assert q_new[0] == pytest.approx(1.01)
        # Particle conservation inside the mixing radius (cylindrical measure).
        r = np.asarray(rho)
        mix = r < float(out.rho_mix)
        before = np.trapezoid(np.asarray(n)[mix] * r[mix], r[mix])
        after = np.trapezoid(n_new[mix] * r[mix], r[mix])
        np.testing.assert_allclose(after, before, rtol=0.02)
        # Energy conservation: 1.5 n T integrated.
        e_before = np.trapezoid((np.asarray(n) * np.asarray(t))[mix] * r[mix], r[mix])
        e_after = np.trapezoid((n_new * t_new)[mix] * r[mix], r[mix])
        np.testing.assert_allclose(e_after, e_before, rtol=0.02)

    def test_sawtooth_step_trigger_gate(self):
        rho, q, t, n = self._profiles(q0=0.8)
        drho = float(rho[1] - rho[0])
        shear = (jnp.gradient(q) / drho) * rho / jnp.maximum(q, 1e-6)
        out = sawtooth_step(rho, t, n, q, shear)
        assert bool(out.triggered)


class TestSCPNSafety:
    def test_interlock_denies_on_violation(self):
        from scpn_fusion_tpu.scpn.safety_interlocks import SafetyInterlockRuntime
        rt = SafetyInterlockRuntime()
        ok = rt.update_from_state({"T_e": 10.0, "n_e": 5.0, "beta_N": 2.0,
                                   "I_p": 10.0, "dZ_dt": 0.1})
        assert all(ok.values()), ok
        bad = rt.update_from_state({"T_e": 30.0, "n_e": 5.0, "beta_N": 2.0,
                                    "I_p": 10.0, "dZ_dt": 0.1})
        assert not bad["heat_ramp"]
        assert bad["density_ramp"]  # other channels unaffected
        assert rt.last_violations == []

    def test_replay_invariance(self):
        """Lean-proved property: identical tokens -> identical enablement."""
        from scpn_fusion_tpu.scpn.safety_interlocks import SafetyInterlockRuntime
        rng = np.random.default_rng(0)
        rt1, rt2 = SafetyInterlockRuntime(), SafetyInterlockRuntime()
        for _ in range(50):
            state = {"T_e": rng.uniform(0, 40), "n_e": rng.uniform(0, 20),
                     "beta_N": rng.uniform(0, 5), "I_p": rng.uniform(0, 20),
                     "dZ_dt": rng.uniform(-2, 2)}
            assert rt1.update_from_state(state) == rt2.update_from_state(state)

    def test_nan_state_fails_safe(self):
        from scpn_fusion_tpu.scpn.safety_interlocks import (
            SafetyInterlockRuntime, safety_tokens_from_state)
        tokens = safety_tokens_from_state({"T_e": float("nan")})
        assert tokens["thermal_limit"] == 0.0  # NaN -> default, no spurious trip
        rt = SafetyInterlockRuntime()
        ok = rt.update_from_state({"T_e": float("nan")})
        assert isinstance(ok["heat_ramp"], bool)


class TestSCPNArtifact:
    def test_roundtrip(self, tmp_path):
        from scpn_fusion_tpu.scpn import ControllerConfig
        from scpn_fusion_tpu.scpn.artifact import export_controller, import_controller
        from tests.test_neuro_closed_loop import build_rz_controller
        ctrl = build_rz_controller(dtype=jnp.float32)
        cfg = ControllerConfig(firing_mode="fractional", firing_margin=0.5,
                               dt=1e-3)
        p = export_controller(ctrl, cfg, tmp_path / "c.scpnctl.json",
                              meta={"case": "rz-demo"})
        ctrl2, cfg2, payload = import_controller(p)
        assert cfg2 == cfg
        np.testing.assert_allclose(np.asarray(ctrl2.w_in),
                                   np.asarray(ctrl.w_in), rtol=1e-6)
        assert payload["meta"]["case"] == "rz-demo"

    def test_tamper_detection(self, tmp_path):
        import json
        from scpn_fusion_tpu.scpn import ControllerConfig
        from scpn_fusion_tpu.scpn.artifact import (
            ArtifactError, export_controller, import_controller)
        from tests.test_neuro_closed_loop import build_rz_controller
        ctrl = build_rz_controller(dtype=jnp.float32)
        p = export_controller(ctrl, ControllerConfig(), tmp_path / "c.json")
        payload = json.loads(p.read_text())
        payload["weights"]["thresholds"]["data"][0] = 99.0
        p.write_text(json.dumps(payload))
        with pytest.raises(ArtifactError, match="checksum"):
            import_controller(p)
