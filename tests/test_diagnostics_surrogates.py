"""Diagnostics forward models + neural surrogates tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.diagnostics import (
    bolometer_power_density,
    cxrs_ion_diagnostics,
    ece_radiometer_temperature,
    generate_forward_channels,
    interferometer_phase_shift,
    line_integral_nearest,
    neutron_count_rate,
    soft_xray_brightness,
    synthetic_magnetic_probes,
    thomson_scattering_voltage,
)
from scpn_fusion_tpu.models.surrogates import (
    fno_apply,
    init_fno,
    init_mlp,
    mlp_apply,
    train_equilibrium_surrogate,
    train_fno,
    train_mlp,
)


@pytest.fixture
def plasma():
    grid = Grid.from_bounds(65, 65, 4.0, 8.4, -2.2, 2.2, dtype=np.float64)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    rho2 = ((rr - 6.2) / 2.0) ** 2 + (zz / 2.0) ** 2
    ne = 8e19 * np.maximum(1 - rho2, 0.0)
    te = 15.0 * np.maximum(1 - rho2, 0.0) + 0.1
    return grid, jnp.asarray(ne), jnp.asarray(te)


class TestForwardModels:
    def test_line_integral_constant_field(self, plasma):
        grid, *_ = plasma
        field = jnp.ones(grid.shape)
        chords = jnp.asarray([[[4.0, 0.0], [8.4, 0.0]]])
        out = float(line_integral_nearest(field, grid, chords)[0])
        np.testing.assert_allclose(out, 4.4, rtol=0.02)  # chord length

    def test_interferometer_scales_with_density(self, plasma):
        grid, ne, _ = plasma
        chords = jnp.asarray([[[4.0, 0.0], [8.4, 0.0]],
                              [[4.0, 1.8], [8.4, 1.8]]])
        ph = np.asarray(interferometer_phase_shift(ne, grid, chords))
        assert ph[0] > ph[1] > 0.0  # midplane chord sees more plasma
        ph2 = np.asarray(interferometer_phase_shift(2.0 * ne, grid, chords))
        np.testing.assert_allclose(ph2, 2.0 * ph, rtol=1e-12)

    def test_neutron_rate_positive_and_linear(self):
        src = jnp.full((16, 16), 1e14)
        r1 = float(neutron_count_rate(src, volume_element_m3=0.01))
        r2 = float(neutron_count_rate(2 * src, volume_element_m3=0.01))
        assert r1 > 0 and np.isclose(r2, 2 * r1)

    def test_thomson_and_ece_sample_profiles(self, plasma):
        grid, ne, te = plasma
        pts = jnp.asarray([[6.2, 0.0], [7.8, 0.0]])
        v = np.asarray(thomson_scattering_voltage(ne, te, grid, pts))
        assert v[0] > v[1]  # core sees higher density
        ece = np.asarray(ece_radiometer_temperature(
            te, grid, jnp.asarray([6.2, 7.8])))
        assert ece[0] > ece[1]
        np.testing.assert_allclose(ece[0], 15.1, rtol=0.05)

    def test_sxr_bolometer_finite(self, plasma):
        grid, ne, te = plasma
        chords = jnp.asarray([[[4.0, 0.0], [8.4, 0.0]]])
        sxr = float(soft_xray_brightness(ne, te, grid, chords)[0])
        bol = float(bolometer_power_density(ne, te, grid, chords)[0])
        assert np.isfinite(sxr) and sxr > 0
        assert np.isfinite(bol) and bol > 0

    def test_cxrs_beam_weighting(self, plasma):
        grid, _, te = plasma
        rot = 100.0 * jnp.ones(grid.shape)
        chords = jnp.asarray([[[4.0, 0.0], [8.4, 0.0]]])
        ti, vr = cxrs_ion_diagnostics(te, rot, grid, chords,
                                      beam_r_center=6.2, beam_width=0.1)
        np.testing.assert_allclose(float(vr[0]), 100.0, rtol=1e-6)
        np.testing.assert_allclose(float(ti[0]), 15.1, rtol=0.05)

    def test_magnetics_probe_gradient_consistency(self, plasma):
        grid, *_ = plasma
        rr, zz = grid.RR, grid.ZZ
        psi = 0.5 * zz**2  # B_R = -(1/R) dpsi/dZ = -Z/R
        pts = jnp.asarray([[6.0, 1.0], [6.0, -1.0]])
        psi_p, b_r, b_z = synthetic_magnetic_probes(psi, grid, pts)
        # bilinear interp of z^2 between nodes has O(dz^2) bias
        np.testing.assert_allclose(np.asarray(psi_p), 0.5, atol=2e-3)
        np.testing.assert_allclose(np.asarray(b_r), [-1.0 / 6.0, 1.0 / 6.0],
                                   rtol=1e-3)

    def test_bundle_runs_jitted(self, plasma):
        grid, ne, te = plasma
        chords = jnp.asarray([[[4.0, 0.0], [8.4, 0.0]]])
        out = jax.jit(lambda: generate_forward_channels(
            ne_m3=ne, te_kev=te, neutron_source=ne * 0.0 + 1e10,
            grid=grid, chords=chords,
            thomson_points=jnp.asarray([[6.2, 0.0]]),
            ece_channels=jnp.asarray([6.2]),
            volume_element_m3=grid.dR * grid.dZ * 2 * np.pi * 6.2))()
        for field in out:
            assert np.all(np.isfinite(np.asarray(field)))


class TestMLP:
    def test_fits_smooth_function(self):
        key = jax.random.PRNGKey(0)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(-1, 1, (2000, 2)), jnp.float32)
        y = jnp.sin(3 * x[:, :1]) * jnp.cos(2 * x[:, 1:])
        params = init_mlp(key, (2, 64, 64, 1))
        res = train_mlp(params, x, y, jax.random.PRNGKey(1),
                        n_steps=2000, lr=2e-3)
        pred = mlp_apply(res.params, x)
        rel = float(jnp.linalg.norm(pred - y) / jnp.linalg.norm(y))
        assert rel < 0.1, f"MLP rel err {rel}"
        assert float(res.loss_history[-1]) < float(res.loss_history[0])


class TestFNO:
    def test_fno_learns_smoothing_operator(self):
        """FNO must learn a simple translation-invariant operator
        (spectral low-pass) far better than the identity baseline."""
        key = jax.random.PRNGKey(0)
        rng = np.random.default_rng(0)
        n, h, w = 64, 32, 32
        x = rng.standard_normal((n, h, w, 1)).astype(np.float32)
        # Target: spectral low-pass filter of the input.
        xf = np.fft.rfft2(x[..., 0], axes=(1, 2))
        mask = np.zeros_like(xf)
        mask[:, :6, :6] = 1.0
        mask[:, -6:, :6] = 1.0
        y = np.fft.irfft2(xf * mask, s=(h, w), axes=(1, 2))[..., None].astype(np.float32)

        params = init_fno(key, width=16, modes=8, n_layers=2)
        res = train_fno(params, jnp.asarray(x), jnp.asarray(y),
                        jax.random.PRNGKey(1), n_steps=400, batch_size=16,
                        lr=3e-3)
        pred = np.asarray(fno_apply(res.params, jnp.asarray(x[0])))
        rel = np.linalg.norm(pred - y[0]) / np.linalg.norm(y[0])
        assert rel < 0.3, f"FNO rel err {rel}"
        assert float(res.loss_history[-1]) < 0.5 * float(res.loss_history[0])


class TestEquilibriumSurrogate:
    def test_pca_mlp_roundtrip(self):
        """Surrogate must reproduce a parametric psi family to ~1% span."""
        rng = np.random.default_rng(0)
        n = 200
        nz = nr = 33
        z, r = np.meshgrid(np.linspace(-1, 1, nz), np.linspace(-1, 1, nr),
                           indexing="ij")
        inputs = rng.uniform(0.5, 1.5, (n, 3)).astype(np.float32)
        maps = np.stack([
            a * np.exp(-(r**2 + z**2) / w) + c * r
            for a, w, c in inputs
        ]).astype(np.float32)
        sur = train_equilibrium_surrogate(
            jnp.asarray(inputs), jnp.asarray(maps), jax.random.PRNGKey(0),
            n_modes=8, n_steps=3000)
        pred = np.asarray(sur.predict(jnp.asarray(inputs[0])))
        span = maps[0].max() - maps[0].min()
        err = np.max(np.abs(pred - maps[0])) / span
        assert err < 0.05, f"surrogate span-rel err {err}"
