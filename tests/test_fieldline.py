"""3D field-line tracing: closed surfaces, q, islands, connection length."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.equilibrium.fieldline import (
    FieldModel,
    b_field_at,
    connection_length,
    poincare_section,
    safety_factor_from_trace,
    trace_field_lines,
)


def _model(pert_eps=0.0, nr=65, nz=65):
    """Analytic nested-circle equilibrium: psi = -((R-R0)^2 + Z^2)/2."""
    r = np.linspace(4.2, 8.2, nr)
    z = np.linspace(-2.0, 2.0, nz)
    rr, zz = np.meshgrid(r, z)
    psi = -0.5 * ((rr - 6.2) ** 2 + zz ** 2)
    return FieldModel(r_1d=tuple(r), z_1d=tuple(z),
                      psi=tuple(psi.ravel()), f_tor=12.4,
                      axis_r=6.2, axis_z=0.0, pert_eps=pert_eps)


class TestTracing:
    def test_field_components_analytic(self):
        m = _model()
        b_r, b_phi, b_z = b_field_at(m, jnp.asarray(6.8), jnp.asarray(0.0),
                                     0.0)
        # psi = -((R-R0)^2+Z^2)/2: dpsi/dR = -(R-R0) -> B_Z = -(R-R0)/R
        # bilinear-patch finite difference vs analytic slope: O(h) gap
        assert float(b_z) == pytest.approx(-0.6 / 6.8, rel=0.03)
        assert float(b_r) == pytest.approx(0.0, abs=1e-6)
        assert float(b_phi) == pytest.approx(12.4 / 6.8, rel=1e-9)

    def test_closed_surfaces_stay_on_flux_surface(self):
        m = _model()
        tr = trace_field_lines(m, jnp.asarray([6.8]), jnp.asarray([0.0]),
                               n_turns=20.0, steps_per_turn=256)
        rad = np.sqrt((np.asarray(tr.r) - 6.2) ** 2 + np.asarray(tr.z) ** 2)
        assert rad.std() < 0.01 * rad.mean()   # conserved radius

    def test_safety_factor_matches_analytic(self):
        # For this field: q = r_minor B_phi / (R B_theta) with
        # B_theta = r/R -> q ~ f_tor / R ... evaluate numerically instead:
        m = _model()
        tr = trace_field_lines(m, jnp.asarray([6.7]), jnp.asarray([0.0]),
                               n_turns=40.0, steps_per_turn=256)
        q = float(safety_factor_from_trace(tr, 6.2, 0.0, 256)[0])
        # analytic: dtheta/dphi = (R B_theta)/(r B_phi); B_theta = r/R
        # -> |q| = f_tor / R ~ 12.4/6.2 = 2.0 near the axis (sign follows
        # the poloidal rotation sense of this psi convention)
        assert abs(q) == pytest.approx(2.0, rel=0.05)

    def test_batched_seeds_one_program(self):
        m = _model()
        seeds_r = jnp.asarray([6.5, 6.8, 7.1])
        tr = trace_field_lines(m, seeds_r, jnp.zeros(3), n_turns=5.0)
        assert tr.r.shape[1] == 3
        assert bool(jnp.all(jnp.isfinite(tr.r)))

    def test_poincare_islands_from_resonant_perturbation(self):
        m0 = _model(pert_eps=0.0)
        m1 = _model(pert_eps=0.02)
        # seed near the q=2 surface (q=2 everywhere here, fully resonant)
        tr0 = trace_field_lines(m0, jnp.asarray([6.9]), jnp.asarray([0.0]),
                                n_turns=100.0, steps_per_turn=128)
        tr1 = trace_field_lines(m1, jnp.asarray([6.9]), jnp.asarray([0.0]),
                                n_turns=100.0, steps_per_turn=128)
        r0, z0 = poincare_section(tr0, 128)
        r1, z1 = poincare_section(tr1, 128)
        rad0 = np.sqrt((np.asarray(r0) - 6.2) ** 2 + np.asarray(z0) ** 2)
        rad1 = np.sqrt((np.asarray(r1) - 6.2) ** 2 + np.asarray(z1) ** 2)
        # perturbed line wanders in radius (island/stochastic layer)
        assert rad1.std() > 5.0 * max(rad0.std(), 1e-9)

    def test_connection_length_core_vs_edge(self):
        m = _model()
        # wall at psi < -0.9 (r_minor > ~1.34)
        l_core = float(connection_length(m, 6.5, 0.0, wall_psi=-0.9,
                                         n_turns=30.0)[0])
        l_edge = float(connection_length(m, 7.5, 0.0, wall_psi=-0.8,
                                         n_turns=30.0)[0])
        # core line never crosses: capped at full length; edge line starts
        # outside the wall surface -> immediate strike
        assert l_edge < l_core
