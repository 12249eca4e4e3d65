"""Elliptic integrals + Green's function vs scipy reference."""

import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from scpn_fusion_tpu.core.special import ellipe, ellipk, green_coil_psi

MU0 = 4e-7 * np.pi


def test_ellipk_vs_scipy():
    m = np.linspace(1e-6, 1.0 - 1e-6, 2001)
    ours = np.asarray(ellipk(jnp.asarray(m)))
    ref = sps.ellipk(m)
    np.testing.assert_allclose(ours, ref, atol=3e-8, rtol=1e-7)


def test_ellipe_vs_scipy():
    m = np.linspace(1e-6, 1.0 - 1e-6, 2001)
    ours = np.asarray(ellipe(jnp.asarray(m)))
    ref = sps.ellipe(m)
    np.testing.assert_allclose(ours, ref, atol=3e-8, rtol=1e-7)


def test_green_function_vs_reference_formula():
    """Match the reference's scipy-based Green's function
    (fusion_kernel_free_boundary.py:31-55) pointwise."""
    rng = np.random.default_rng(0)
    r_src, z_src = 6.2, -3.1
    r_obs = rng.uniform(2.0, 10.0, 256)
    z_obs = rng.uniform(-5.0, 5.0, 256)

    k2 = 4.0 * r_obs * r_src / ((r_obs + r_src) ** 2 + (z_obs - z_src) ** 2)
    k2 = np.clip(k2, 1e-12, 1 - 1e-12)
    ref = (MU0 / (2 * np.pi) * np.sqrt(r_obs * r_src)
           * ((2 - k2) * sps.ellipk(k2) - 2 * sps.ellipe(k2)) / np.sqrt(k2))

    ours = np.asarray(green_coil_psi(r_src, z_src, jnp.asarray(r_obs),
                                     jnp.asarray(z_obs), MU0))
    np.testing.assert_allclose(ours, ref, rtol=5e-6, atol=1e-12)


def test_green_function_self_point_regularised():
    val = green_coil_psi(3.0, 0.0, jnp.asarray(3.0), jnp.asarray(0.0), MU0)
    assert float(val) == 0.0


def test_green_function_differentiable():
    import jax

    def flux(rc):
        return green_coil_psi(rc, 0.0, 6.0, 1.0, MU0)

    g = jax.grad(flux)(jnp.asarray(5.0, jnp.float64))
    assert np.isfinite(float(g))
    # finite-difference check
    eps = 1e-6
    fd = (float(flux(5.0 + eps)) - float(flux(5.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-4)
