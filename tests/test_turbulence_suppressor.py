"""Spectral turbulence suppression closed loop.

Reference parity anchors: ``core/fno_turbulence_suppressor.py``
(SpectralTurbulenceGenerator :69-121, _compat_suppression :58-66,
run_fno_simulation :208-298).
"""

import jax
import jax.numpy as jnp
import numpy as np

from scpn_fusion_tpu.models.surrogates.turbulence_suppressor import (
    compat_suppression,
    init_turbulence,
    postprocess_suppressed_field,
    run_suppression_loop,
    turbulence_step,
)


def test_free_turbulence_saturates_via_zonal_flow():
    """Without external damping the predator-prey zonal flow bounds the
    turbulence: energy stays finite and the zonal flow activates."""
    state = init_turbulence(jax.random.PRNGKey(0))

    def step(s, _):
        s = turbulence_step(s, 0.0)
        return s, jnp.mean(jnp.fft.ifft2(s.field_k).real ** 2)

    final, energy = jax.lax.scan(step, state, None, length=150)
    e = np.asarray(energy)
    assert np.all(np.isfinite(e))
    assert float(final.zonal_flow) > 0.0
    assert e[-1] < 10.0 * np.median(e[50:])   # bounded, not exploding


def test_suppression_command_bounded_and_monotone():
    f_small = 0.01 * jnp.ones((64, 64))
    f_big = 2.0 * jnp.ones((64, 64))
    s_small = float(compat_suppression(f_small))
    s_big = float(compat_suppression(f_big))
    assert 0.0 <= s_small < s_big <= 0.98


def test_postprocess_removes_dc_mode():
    field = jnp.ones((64, 64)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(1), (64, 64))
    out = postprocess_suppressed_field(field, 0.5)
    assert abs(float(jnp.mean(out))) < 1e-10
    assert np.all(np.isfinite(np.asarray(out)))


def test_closed_loop_suppresses_turbulence():
    """The controlled run's late-time energy must sit well below the
    uncontrolled run's (the reference's suppression-performance plot,
    quantified)."""
    controlled = run_suppression_loop(seed=42, n_steps=200,
                                      control_on_step=50)
    free = run_suppression_loop(seed=42, n_steps=200,
                                control_on_step=10_000)   # never engages
    e_ctrl = float(controlled.mean_energy_last20)
    e_free = float(free.mean_energy_last20)
    assert e_ctrl < 0.5 * e_free, (e_ctrl, e_free)
    assert float(jnp.max(controlled.suppression)) > 0.1
    # Deterministic: same seed, same result.
    again = run_suppression_loop(seed=42, n_steps=200, control_on_step=50)
    np.testing.assert_allclose(float(again.mean_energy_last20), e_ctrl,
                               rtol=1e-12)


def test_gain_is_differentiable():
    def late_energy(gain):
        run = run_suppression_loop(seed=3, n_steps=80, control_on_step=20,
                                   gain=gain)
        return run.mean_energy_last20

    g = float(jax.grad(late_energy)(jnp.asarray(1.6)))
    assert np.isfinite(g)
    assert g < 0.0    # more gain -> less late-time energy
