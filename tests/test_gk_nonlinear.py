"""Nonlinear 5D gyrokinetics: operators, invariants, run, sharding parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.gyrokinetics.nonlinear import (
    GKState,
    NonlinearGKConfig,
    build_grids,
    collide_conservative,
    exb_bracket,
    field_solve,
    gk_rhs,
    init_state,
    parallel_streaming,
    rk4_step,
    run_nonlinear_gk,
    velocity_moment,
)
from scpn_fusion_tpu.parallel.gk_shard import (
    run_nonlinear_gk_sharded,
    velocity_mesh,
)

TINY = NonlinearGKConfig(
    n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=8, n_species=2,
    n_steps=20, save_interval=5, dt=0.02, dtype="complex128",
)


@pytest.fixture(scope="module")
def grids():
    return build_grids(TINY)


class TestOperators:
    def test_field_solve_zeroes_mean_mode(self, grids):
        st = init_state(TINY, grids, amplitude=1e-3, seed=0)
        phi = field_solve(TINY, grids, st.f)
        assert phi.shape == (8, 8, 8)
        np.testing.assert_allclose(np.asarray(phi[0, 0, :]), 0.0)

    def test_field_solve_screening_reduces_high_k(self, grids):
        # A single high-k density mode must produce less phi than a low-k
        # mode of the same amplitude (Padé Gamma0 screening).
        f = jnp.zeros((2, 8, 8, 8, 8, 8), dtype=jnp.complex128)
        fm = grids.maxwellian[None, :, :]
        f_lo = f.at[0, 1, 1, :, :, :].set(fm)
        f_hi = f.at[0, 3, 3, :, :, :].set(fm)
        phi_lo = jnp.abs(field_solve(TINY, grids, f_lo)[1, 1, 0])
        phi_hi = jnp.abs(field_solve(TINY, grids, f_hi)[3, 3, 0])
        assert float(phi_hi) < float(phi_lo)

    def test_exb_bracket_antisymmetry_zero_self(self, grids):
        # {phi, phi} = 0 (projected to 5D): bracket of a field with itself
        # must vanish to round-off.
        rng = np.random.default_rng(0)
        phi = jnp.asarray(rng.standard_normal((8, 8, 8))
                          + 1j * rng.standard_normal((8, 8, 8)))
        f_s = jnp.broadcast_to(phi[:, :, :, None, None], (8, 8, 8, 8, 8))
        out = exb_bracket(grids, phi, f_s)
        assert float(jnp.max(jnp.abs(out))) < 1e-10

    def test_exb_bracket_dealias_mask(self, grids):
        rng = np.random.default_rng(1)
        phi = jnp.asarray(rng.standard_normal((8, 8, 8)) + 0j)
        f_s = jnp.asarray(rng.standard_normal((8, 8, 8, 8, 8)) + 0j)
        out = exb_bracket(grids, phi, f_s)
        mask = np.asarray(grids.dealias_mask)
        dead = np.asarray(out)[mask < 0.5]
        np.testing.assert_allclose(np.abs(dead), 0.0, atol=1e-12)

    def test_parallel_streaming_kills_theta_constant(self, grids):
        # With no theta variation and s_hat phases only acting on wrapped
        # planes, a theta-constant f has zero streaming derivative ONLY if
        # the ballooning shift is identity (s_hat=0).
        cfg0 = NonlinearGKConfig(**{**TINY.__dict__, "s_hat": 0.0})
        g0 = build_grids(cfg0)
        f_s = jnp.ones((8, 8, 8, 8, 8), dtype=jnp.complex128)
        out = parallel_streaming(g0, f_s)
        assert float(jnp.max(jnp.abs(out))) < 1e-12

    def test_conservative_collisions_conserve_moments(self, grids):
        rng = np.random.default_rng(2)
        f_s = jnp.asarray(
            rng.standard_normal((8, 8, 8, 8, 8))
            + 1j * rng.standard_normal((8, 8, 8, 8, 8)))
        cf = collide_conservative(TINY, grids, f_s)
        for w in (jnp.ones_like(grids.energy), grids.vpar[:, None],
                  grids.energy):
            m = velocity_moment(cf, w, grids)
            scale = float(jnp.max(jnp.abs(velocity_moment(f_s, w, grids)))) \
                + 1e-30
            assert float(jnp.max(jnp.abs(m))) < 1e-8 * max(scale, 1.0)


class TestTimeStepping:
    def test_rhs_finite_and_shaped(self, grids):
        st = init_state(TINY, grids, seed=1)
        rhs = gk_rhs(TINY, grids, st.f)
        assert rhs.shape == st.f.shape
        assert bool(jnp.all(jnp.isfinite(rhs.real)))

    def test_rk4_advances_time(self, grids):
        st = init_state(TINY, grids, seed=2)
        st1 = rk4_step(TINY, grids, st)
        assert float(st1.time) > 0.0
        assert bool(jnp.all(jnp.isfinite(st1.f.real)))

    def test_run_produces_trace_and_growth(self):
        cfg = NonlinearGKConfig(
            n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=4,
            n_steps=60, save_interval=10, dt=0.05, dtype="complex128",
            nonlinear=False, collisions=False, hyper_coeff=0.0,
            r_l_ti=9.0, cfl_adapt=False)
        final, trace = run_nonlinear_gk(cfg, amplitude=1e-6, seed=3)
        assert trace.phi_rms.shape == (6,)
        assert bool(jnp.all(jnp.isfinite(trace.phi_rms)))
        # ITG-like drive on a linear run: potential amplitude must grow.
        assert float(trace.phi_rms[-1]) > float(trace.phi_rms[0])

    def test_electromagnetic_mode_runs(self):
        cfg = NonlinearGKConfig(
            n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=4, n_steps=10,
            save_interval=5, dtype="complex128", electromagnetic=True,
            kinetic_electrons=True)
        final, trace = run_nonlinear_gk(cfg, seed=4)
        assert bool(jnp.all(jnp.isfinite(trace.q_ion)))

    def test_zonal_damping_reduces_zonal_rms(self):
        base = dict(n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=4,
                    n_steps=40, save_interval=40, dt=0.02,
                    dtype="complex128", nonlinear=False, cfl_adapt=False)
        _, t0 = run_nonlinear_gk(NonlinearGKConfig(**base), seed=5)
        _, t1 = run_nonlinear_gk(
            NonlinearGKConfig(**base, zonal_damping_rate=5.0), seed=5)
        assert float(t1.zonal_rms[-1]) < float(t0.zonal_rms[-1])


class TestSharding:
    def test_sharded_matches_single_device(self):
        cfg = NonlinearGKConfig(
            n_kx=8, n_ky=8, n_theta=8, n_vpar=8, n_mu=8, n_steps=10,
            save_interval=5, dtype="complex128")
        final_ref, trace_ref = run_nonlinear_gk(cfg, seed=7)
        mesh = velocity_mesh(len(jax.devices()))
        final_sh, trace_sh = run_nonlinear_gk_sharded(cfg, mesh, seed=7)
        np.testing.assert_allclose(
            np.asarray(trace_sh.phi_rms), np.asarray(trace_ref.phi_rms),
            rtol=1e-10)
        np.testing.assert_allclose(
            np.asarray(final_sh.f), np.asarray(final_ref.f),
            rtol=1e-9, atol=1e-14)

    def test_indivisible_mesh_rejected(self):
        cfg = NonlinearGKConfig(n_mu=6)
        mesh = velocity_mesh(len(jax.devices()))
        if mesh.devices.size > 1:
            with pytest.raises(ValueError, match="not divisible"):
                run_nonlinear_gk_sharded(cfg, mesh)
