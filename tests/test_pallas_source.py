"""Fused topology+source kernel: parity vs the unfused XLA pair.

``ops/pallas_source.fused_topology_source`` must reproduce
``analyze_topology`` -> ``plasma_current_density`` -> ``-mu0 R J``
(interpret mode here; compiled on TPU).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.profiles import (
    ProfileCoeffs,
    plasma_current_density,
)
from scpn_fusion_tpu.models.equilibrium.topology import analyze_topology
from scpn_fusion_tpu.ops.pallas_source import fused_topology_source

MU0 = 1.0


def _problem(n=65, seed=0):
    rng = np.random.default_rng(seed)
    r = jnp.linspace(2.0, 10.0, n, dtype=jnp.float32)
    z = jnp.linspace(-4.0, 4.0, n, dtype=jnp.float32)
    dr = float(r[1] - r[0])
    dz = float(z[1] - z[0])
    rr, zz = jnp.meshgrid(r, z)
    # Smooth plasma-like field: peaked blob + noise (a pure-noise field has
    # a degenerate topology that exercises the guard separately below).
    blob = jnp.exp(-(((rr - 6.0) / 2.0) ** 2 + (zz / 2.0) ** 2))
    psi = 3.0 * blob + 0.01 * jnp.asarray(
        rng.standard_normal((n, n)), jnp.float32)
    return psi, r, z, rr, zz, dr, dz


def _coeffs(seed=1):
    rng = np.random.default_rng(seed)
    vals = 0.3 + rng.random(8).astype(np.float32)
    p = ProfileCoeffs(*[jnp.asarray(v) for v in vals[:4]])
    ff = ProfileCoeffs(*[jnp.asarray(v) for v in vals[4:]])
    return p, ff


def _unfused(psi, r, zz, rr, dr, dz, z_min, p_c, ff_c, i_t, h_mode):
    topo = analyze_topology(psi, zz, dr, dz, z_min)
    j = plasma_current_density(
        psi, topo.psi_axis, topo.psi_boundary, rr,
        h_mode=h_mode, p_coeffs=p_c, ff_coeffs=ff_c,
        mu0=MU0, i_target=i_t, d_r=dr, d_z=dz)
    return -MU0 * rr * j


@pytest.mark.parametrize("h_mode", [False, True])
def test_fused_source_matches_unfused(h_mode):
    psi, r, z, rr, zz, dr, dz = _problem()
    z_min = float(z[0])
    p_c, ff_c = _coeffs()
    i_t = jnp.asarray(12.5, jnp.float32)

    ref = _unfused(psi, r, zz, rr, dr, dz, z_min, p_c, ff_c, i_t, h_mode)
    mask = (zz < z_min * 0.5).astype(jnp.float32)
    fus = fused_topology_source(
        psi, r, mask, p_c, ff_c, i_t,
        d_r=dr, d_z=dz, mu0=MU0, h_mode=h_mode, interpret=True)

    span = float(ref.max() - ref.min()) or 1.0
    dev = float(jnp.max(jnp.abs(ref - fus))) / span
    assert dev < 1e-6, f"span-rel dev {dev:.3e}"


def test_fused_source_degenerate_field_guard():
    """Flat psi triggers the |axis-boundary| < 0.1 snap in both paths."""
    n = 33
    psi = jnp.full((n, n), 0.05, jnp.float32)
    r = jnp.linspace(2.0, 10.0, n, dtype=jnp.float32)
    z = jnp.linspace(-4.0, 4.0, n, dtype=jnp.float32)
    rr, zz = jnp.meshgrid(r, z)
    dr = float(r[1] - r[0])
    dz = float(z[1] - z[0])
    p_c, ff_c = _coeffs(seed=3)
    i_t = jnp.asarray(5.0, jnp.float32)

    ref = _unfused(psi, r, zz, rr, dr, dz, float(z[0]), p_c, ff_c, i_t, False)
    mask = (zz < float(z[0]) * 0.5).astype(jnp.float32)
    fus = fused_topology_source(
        psi, r, mask, p_c, ff_c, i_t,
        d_r=dr, d_z=dz, mu0=MU0, h_mode=False, interpret=True)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref),
                               rtol=1e-5, atol=1e-7)


def test_fused_source_degenerate_tie_picks_argmin_site():
    """Exactly-tied |grad psi| minima at sites with very different flux:
    the kernel must pick the FIRST row-major site, like argmin — the old
    min-psi-over-ties rule picked the other one, giving the free-boundary
    Picard loop two competing psi_b fixed points (129^2 f32 flap)."""
    n = 65
    r = jnp.linspace(2.0, 10.0, n, dtype=jnp.float32)
    z = jnp.linspace(-4.0, 4.0, n, dtype=jnp.float32)
    rr, zz = jnp.meshgrid(r, z)
    dr = float(r[1] - r[0])
    dz = float(z[1] - z[0])
    # Two locally-flat plateaus in the divertor region (zz < -2): a 3x3
    # patch of constant psi has |grad| == 0 at its centre.  Different
    # plateau values => the tie-break choice changes psi_b.
    base = jnp.asarray(np.linspace(1.0, 2.0, n, dtype=np.float32))[None, :]
    psi = 3.0 * jnp.exp(-(((rr - 6.0) / 2.0) ** 2 + (zz / 2.0) ** 2)) + base
    psi = psi.at[5:8, 10:13].set(2.5)    # first (row-major) flat: psi 2.5
    psi = psi.at[9:12, 40:43].set(0.3)   # second flat: psi 0.3
    p_c, ff_c = _coeffs(seed=11)
    i_t = jnp.asarray(10.0, jnp.float32)

    ref = _unfused(psi, r, zz, rr, dr, dz, float(z[0]), p_c, ff_c, i_t, False)
    mask = (zz < float(z[0]) * 0.5).astype(jnp.float32)
    fus = fused_topology_source(
        psi, r, mask, p_c, ff_c, i_t,
        d_r=dr, d_z=dz, mu0=MU0, h_mode=False, interpret=True)
    span = float(ref.max() - ref.min()) or 1.0
    dev = float(jnp.max(jnp.abs(ref - fus))) / span
    assert dev < 1e-6, f"span-rel dev {dev:.3e} (tie-break mismatch)"


def test_fused_source_empty_divertor_fallback():
    """All-false mask falls back to the global psi minimum, like argmin."""
    psi, r, z, rr, zz, dr, dz = _problem(seed=7)
    p_c, ff_c = _coeffs(seed=5)
    i_t = jnp.asarray(8.0, jnp.float32)

    # Unfused with an impossible z_min shift => mask empty
    topo = analyze_topology(psi, zz + 100.0, dr, dz, float(z[0]))
    j = plasma_current_density(
        psi, topo.psi_axis, topo.psi_boundary, rr,
        h_mode=False, p_coeffs=p_c, ff_coeffs=ff_c,
        mu0=MU0, i_target=i_t, d_r=dr, d_z=dz)
    ref = -MU0 * rr * j

    mask = jnp.zeros_like(psi)
    fus = fused_topology_source(
        psi, r, mask, p_c, ff_c, i_t,
        d_r=dr, d_z=dz, mu0=MU0, h_mode=False, interpret=True)
    span = float(ref.max() - ref.min()) or 1.0
    assert float(jnp.max(jnp.abs(ref - fus))) / span < 1e-6
