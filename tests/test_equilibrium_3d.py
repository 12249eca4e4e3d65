"""3D equilibrium: Fourier geometry map, force balance, stellarator lane.

Parity anchors: reference core/equilibrium_3d.py (VMECStyleEquilibrium3D
+ ForceBalance3D), core/stellarator_geometry.py (Boozer surfaces,
effective ripple, ISS04, 1/nu chi), control/stellarator_control_contracts.py.
Baseline to match: force-residual reduction >= 3.5x in 20 iterations
(BASELINE.md '3D force-balance residual reduction').
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.control.stellarator_contracts import (
    ActuatorChannel,
    ActuatorSet,
    ControlObjective,
    DiagnosticChannel,
    DiagnosticFrame,
    MagneticConfiguration,
    ReplayScenario,
)
from scpn_fusion_tpu.models.equilibrium.force_balance_3d import (
    ForceBalanceConfig,
    Geometry3D,
    flux_to_cartesian,
    flux_to_cylindrical,
    force_residual,
    solve_force_balance_3d,
)
from scpn_fusion_tpu.models.physics.stellarator import (
    StellaratorConfig,
    effective_ripple,
    iota_profile,
    iss04_tau_e,
    stellarator_flux_surface,
    stellarator_neoclassical_chi,
    w7x_config,
)


class TestGeometry3D:
    def test_axisymmetric_circular_map(self):
        g = Geometry3D(r_axis=6.0, z_axis=0.0, a_minor=2.0, kappa=1.0,
                       triangularity=0.0)
        amps = g.zero_amplitudes()
        th = jnp.asarray([0.0, jnp.pi / 2, jnp.pi])
        r, z, _ = flux_to_cylindrical(g, amps, jnp.ones(3), th,
                                      jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(r), [8.0, 6.0, 4.0],
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(z), [0.0, 2.0, 0.0],
                                   atol=1e-6)

    def test_elongation_and_triangularity(self):
        g = Geometry3D(r_axis=6.0, a_minor=2.0, kappa=1.8,
                       triangularity=0.4)
        amps = g.zero_amplitudes()
        _, z_top, _ = flux_to_cylindrical(
            g, amps, jnp.asarray(1.0), jnp.asarray(jnp.pi / 2),
            jnp.asarray(0.0))
        assert float(z_top) == pytest.approx(3.6, abs=1e-6)  # kappa * a

    def test_nonaxisymmetric_mode_varies_with_phi(self):
        g = Geometry3D(nfp=5, modes_m=(1,), modes_n=(1,))
        amps = jnp.asarray([[0.05, 0.0, 0.0, 0.0]])
        rho = jnp.asarray(1.0)
        th = jnp.asarray(0.3)
        r0, _, _ = flux_to_cylindrical(g, amps, rho, th, jnp.asarray(0.0))
        r1, _, _ = flux_to_cylindrical(g, amps, rho, th,
                                       jnp.asarray(jnp.pi / 5))
        assert abs(float(r0) - float(r1)) > 1e-4

    def test_cartesian_consistency(self):
        g = Geometry3D()
        amps = g.zero_amplitudes()
        x, y, z = flux_to_cartesian(g, amps, jnp.asarray(0.7),
                                    jnp.asarray(1.0), jnp.asarray(0.9))
        r, zz, ph = flux_to_cylindrical(g, amps, jnp.asarray(0.7),
                                        jnp.asarray(1.0), jnp.asarray(0.9))
        assert float(jnp.hypot(x, y)) == pytest.approx(float(r), rel=1e-6)
        assert float(z) == pytest.approx(float(zz))

    def test_validation(self):
        with pytest.raises(ValueError, match="a_minor"):
            Geometry3D(a_minor=-1.0)
        with pytest.raises(ValueError, match="equal length"):
            Geometry3D(modes_m=(0, 1), modes_n=(0,))


class TestForceBalance3D:
    def test_residual_positive_and_finite(self):
        g = Geometry3D()
        res = force_residual(g.zero_amplitudes(), g, ForceBalanceConfig())
        assert np.isfinite(float(res)) and float(res) > 0.0

    def test_reference_baseline_3p5x_in_20_iters(self):
        """BASELINE.md: residual reduction 3.5x in 20 iterations."""
        g = Geometry3D(r_axis=6.2, a_minor=2.0, kappa=1.6,
                       triangularity=0.3)
        cfg = ForceBalanceConfig(max_iterations=20)
        out = solve_force_balance_3d(g, cfg)
        reduction = float(out.initial_residual) / max(float(out.residual),
                                                      1e-30)
        assert reduction >= 3.5
        assert int(out.iterations) <= 20

    def test_history_monotone_nonincreasing(self):
        g = Geometry3D()
        cfg = ForceBalanceConfig(max_iterations=10)
        out = solve_force_balance_3d(g, cfg)
        hist = np.asarray(out.history)
        hist = hist[np.isfinite(hist)]
        assert np.all(np.diff(hist) <= 1e-9)   # Armijo guarantees descent

    def test_gradient_is_exact_autodiff(self):
        """The analytic gradient must match central differences."""
        g = Geometry3D(modes_m=(1,), modes_n=(0,))
        cfg = ForceBalanceConfig()
        amps = jnp.asarray([[0.02, 0.0, 0.01, 0.0]], jnp.float64) \
            if jax.config.jax_enable_x64 else \
            jnp.asarray([[0.02, 0.0, 0.01, 0.0]])
        grad = jax.grad(lambda a: force_residual(a, g, cfg))(amps)
        eps = 1e-3
        plus = force_residual(amps.at[0, 0].add(eps), g, cfg)
        minus = force_residual(amps.at[0, 0].add(-eps), g, cfg)
        fd = (float(plus) - float(minus)) / (2 * eps)
        assert float(grad[0, 0]) == pytest.approx(fd, rel=5e-2)


class TestStellarator:
    def test_iota_linear(self):
        cfg = w7x_config()
        assert float(iota_profile(cfg, 0.0)) == pytest.approx(0.85)
        assert float(iota_profile(cfg, 1.0)) == pytest.approx(0.97)

    def test_flux_surface_shapes_and_field(self):
        cfg = w7x_config()
        r, z, b = stellarator_flux_surface(cfg, 0.5, n_theta=32, n_phi=40)
        assert r.shape == (32, 40)
        assert bool(jnp.all(b > 0.0))
        # Helical modulation: |B| varies toroidally at fixed theta.
        assert float(jnp.std(b[0, :])) > 1e-4

    def test_effective_ripple_properties(self):
        cfg = w7x_config()
        eps_mid = float(effective_ripple(cfg, 0.5))
        eps_edge = float(effective_ripple(cfg, 1.0))
        assert 0.0 < eps_mid < 1.0
        assert eps_edge > eps_mid          # ripple grows outward
        axi = StellaratorConfig(mirror_ratio=0.0, helical_excursion=0.0)
        assert float(effective_ripple(axi, 0.5)) == 0.0

    def test_iss04_power_degradation(self):
        cfg = w7x_config()
        t1 = float(iss04_tau_e(cfg, 5.0, 2.0))
        t2 = float(iss04_tau_e(cfg, 5.0, 4.0))
        assert t2 < t1
        assert t2 / t1 == pytest.approx(2.0**-0.61, rel=1e-6)

    def test_neoclassical_chi_positive_and_t_scaling(self):
        cfg = w7x_config()
        chi_lo = float(stellarator_neoclassical_chi(cfg, 0.5, 1.0, 5.0))
        chi_hi = float(stellarator_neoclassical_chi(cfg, 0.5, 4.0, 5.0))
        assert chi_lo > 0.0
        # 1/nu regime: chi ~ T^3.5 (v^2 / nu with nu ~ v^-3).
        assert chi_hi > chi_lo


class TestControlContracts:
    def test_actuator_clamp_and_slew(self):
        ch = ActuatorChannel(name="trim_coil_1", unit="A",
                             min_value=-100.0, max_value=100.0,
                             max_slew_per_s=50.0)
        assert float(ch.clamp(250.0)) == 100.0
        out = ch.apply_slew(jnp.asarray(0.0), jnp.asarray(80.0), dt_s=0.1)
        assert float(out) == pytest.approx(5.0)   # 50 A/s * 0.1 s

    def test_actuator_set_unique_names(self):
        ch = ActuatorChannel("a", "A", -1.0, 1.0, 1.0)
        with pytest.raises(ValueError, match="unique"):
            ActuatorSet(channels=(ch, ch))

    def test_diagnostic_frame_validation(self):
        ch = DiagnosticChannel("iota_edge", "", 0.5, 1.5)
        frame = DiagnosticFrame(time_s=0.1,
                                values=(("iota_edge", 2.0),))
        assert frame.validate_against((ch,)) == ["iota_edge"]

    def test_replay_scenario_round_trip(self):
        scenario = ReplayScenario(
            name="w7x-iota-hold",
            configuration=MagneticConfiguration("w7x-std", 5, 0.97, 0.05),
            actuators=ActuatorSet(channels=(
                ActuatorChannel("trim_coil_1", "A", -100, 100, 50),)),
            diagnostics=(DiagnosticChannel("iota_edge", "", 0.5, 1.5),),
            objectives=(ControlObjective("iota_edge", 0.97, 0.02),))
        d = scenario.to_dict()
        assert d["configuration"]["n_fp"] == 5
        obj = scenario.objectives[0]
        assert float(obj.normalised_error(jnp.asarray(0.99))) == \
            pytest.approx(1.0)

    def test_objective_validation(self):
        with pytest.raises(ValueError, match="band"):
            ControlObjective("x", 1.0, 0.0)
