"""ELM cycle + charge-state impurity transport tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.elm import (
    ballooning_limit,
    elm_crash,
    elm_power_balance_frequency,
    pb_unstable,
    run_elm_cycle,
)
from scpn_fusion_tpu.models.transport.impurity import (
    ImpuritySpecies,
    ImpurityState,
    coronal_equilibrium,
    impurity_step,
    line_radiation_w_m3,
    run_impurity,
)


class TestELM:
    def test_boundary_monotone_in_alpha(self):
        assert not bool(pb_unstable(0.05, 0.1, 1.5, 3.5, 1.7, 0.33))
        assert bool(pb_unstable(5.0, 0.1, 1.5, 3.5, 1.7, 0.33))

    def test_crash_energy_accounting(self):
        crash = elm_crash(4.0, 8.0, 10.0, loss_fraction=0.3)
        np.testing.assert_allclose(float(crash.delta_w_mj), 3.0)
        assert float(crash.t_ped_after_kev) < 4.0
        assert float(crash.n_ped_after_1e19) < 8.0

    def test_power_balance_frequency(self):
        f = float(elm_power_balance_frequency(100.0, 10.0, 0.3))
        np.testing.assert_allclose(f, 100.0 / 3.0, rtol=1e-6)
        assert float(elm_power_balance_frequency(100.0, 0.0, 0.3)) == 0.0

    def test_limit_cycle(self):
        """Heating drives repeated crashes: a sawtooth-like pedestal cycle."""
        trace = run_elm_cycle(
            t_ped0_kev=1.0, n_ped_1e19=8.0, w_ped_mj=10.0,
            heat_rate_kev_s=50.0, alpha_per_kev=1.0,
            s_edge=1.5, j_edge_norm=0.1, dt=1e-3, n_steps=3000)
        n_crashes = int(trace.n_crashes)
        assert n_crashes >= 3, f"expected a limit cycle, got {n_crashes} crashes"
        t = np.asarray(trace.t_ped)
        assert np.all(np.isfinite(t))
        assert t.max() < 10.0  # crashes bound the pedestal


class TestImpurity:
    def _setup(self, nr=40):
        rho = jnp.linspace(0.0, 1.0, nr)
        t_e = 2000.0 * (1 - np.asarray(rho) ** 2) + 20.0   # eV
        n_e = 5.0 * (1 - np.asarray(rho) ** 2) ** 0.5 + 0.5
        return rho, jnp.asarray(t_e), jnp.asarray(n_e)

    def test_coronal_distribution_shifts_with_temperature(self):
        sp = ImpuritySpecies(z_max=6)
        cold = np.asarray(coronal_equilibrium(sp, 5.0))
        hot = np.asarray(coronal_equilibrium(sp, 2000.0))
        np.testing.assert_allclose(cold.sum(), 1.0, rtol=1e-9)
        np.testing.assert_allclose(hot.sum(), 1.0, rtol=1e-9)
        # Hotter plasma -> higher mean charge.
        z = np.arange(7)
        assert (hot * z).sum() > (cold * z).sum() + 1.0

    def test_rate_step_conserves_particles(self):
        """Atomic ladder exchanges between states but conserves the total
        (no transport, no source)."""
        sp = ImpuritySpecies(z_max=5)
        rho, t_e, n_e = self._setup()
        n0 = jnp.zeros((6, 40)).at[0].set(0.1)
        state = ImpurityState(n0)
        out = impurity_step(sp, state, t_e, n_e, jnp.zeros(40), rho, 1e-5)
        before = float(jnp.sum(n0))
        after = float(jnp.sum(out.n_z))
        np.testing.assert_allclose(after, before, rtol=0.05)

    def test_evolution_ionises_core(self):
        sp = ImpuritySpecies(z_max=5)
        rho, t_e, n_e = self._setup()
        n0 = jnp.zeros((6, 40)).at[0].set(0.1)
        state, trace = run_impurity(
            sp, ImpurityState(n0), t_e, n_e, 0.5 * jnp.ones(40), rho,
            1e-4, n_steps=200)
        nz = np.asarray(state.n_z)
        # Hot core: population has left the neutral stage.
        assert nz[0, 0] < 0.01 * 0.1
        assert nz[3:, 0].sum() > nz[0, 0]
        assert np.all(np.isfinite(np.asarray(trace["p_rad_total"])))

    def test_edge_source_feeds_inventory(self):
        sp = ImpuritySpecies(z_max=4)
        rho, t_e, n_e = self._setup()
        n0 = jnp.zeros((5, 40))
        state, trace = run_impurity(
            sp, ImpurityState(n0), t_e, n_e, 1.0 * jnp.ones(40), rho,
            1e-4, n_steps=100, edge_source_1e19=0.05)
        totals = np.asarray(trace["n_total"])
        assert totals[-1] > totals[0]
        assert float(jnp.sum(state.n_z)) > 0.0

    def test_radiation_positive_and_core_weighted(self):
        sp = ImpuritySpecies(z_max=5)
        rho, t_e, n_e = self._setup()
        n_z = 0.01 * jnp.ones((6, 40))
        p = np.asarray(line_radiation_w_m3(sp, ImpurityState(n_z), t_e, n_e))
        assert np.all(p >= 0.0)
        assert np.all(np.isfinite(p))
