"""Cross-module physics/numerics property invariants (hypothesis-based).

Role-parity with the reference's property-based lane (hypothesis dev-dep,
SURVEY.md §4 "property-based via hypothesis") widened into a dedicated
invariant pack: mathematical identities the kernels must satisfy for ALL
inputs, not just fixtures — operator symmetry, transfer-operator
adjointness, stencil row-sum consistency, energy conservation, Green's
function reciprocity, constrained-solver feasibility.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

SETTINGS = settings(max_examples=25, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])

finite32 = st.floats(min_value=-10.0, max_value=10.0,
                     allow_nan=False, allow_infinity=False, width=32)


def _interior_field(data, n=17):
    arr = data.draw(hnp.arrays(np.float64, (n, n),
                               elements=st.floats(-5, 5, width=32)))
    out = np.zeros((n, n))
    out[1:-1, 1:-1] = arr[1:-1, 1:-1]
    return out


class TestGSOperator:
    @SETTINGS
    @given(r_min=st.floats(1.0, 4.0), span=st.floats(1.0, 6.0),
           d_z=st.floats(0.05, 0.8))
    def test_exact_polynomial_identities(self, r_min, span, d_z):
        """Delta* psi = d2psi/dR2 - (1/R) dpsi/dR + d2psi/dZ2 has exact
        polynomial kernels the second-order stencil must reproduce at
        machine precision on ANY grid: Delta*(R^2) = 2 - 2 = 0 and
        Delta*(Z^2) = 2 (central differences are exact on quadratics,
        including through the 1/R factor)."""
        from scpn_fusion_tpu.ops.stencil import gs_operator

        n = 17
        r_1d = jnp.linspace(r_min, r_min + span, n)
        d_r = float(r_1d[1] - r_1d[0])
        z_1d = d_z * jnp.arange(n)
        rr = jnp.broadcast_to(r_1d[None, :], (n, n))
        zz = jnp.broadcast_to(z_1d[:, None], (n, n))

        out_r2 = gs_operator(rr**2, r_1d, d_r, d_z)
        assert float(jnp.max(jnp.abs(out_r2))) < 1e-9 * float(r_min**2)

        out_z2 = gs_operator(zz**2, r_1d, d_r, d_z)
        interior = np.asarray(out_z2)[1:-1, 1:-1]
        np.testing.assert_allclose(interior, 2.0, rtol=1e-8)

    def test_stencil_row_sum_consistency(self):
        """a_C == a_E + a_W + 2 a_NS: the operator annihilates constants
        (zero row sum), the discrete analogue of Delta* c = 0 interiorly
        ... for the homogeneous-part coefficients."""
        from scpn_fusion_tpu.ops.stencil import stencil_coeffs

        r_1d = jnp.linspace(2.0, 10.0, 31)
        a_e, a_w, a_ns, a_c = stencil_coeffs(r_1d[1:-1], 0.25, 0.4)
        np.testing.assert_allclose(np.asarray(a_e + a_w + 2.0 * a_ns),
                                   np.asarray(a_c), rtol=1e-12)

    @SETTINGS
    @given(data=st.data())
    def test_operator_annihilates_constants(self, data):
        from scpn_fusion_tpu.ops.stencil import gs_operator

        c = data.draw(st.floats(-5, 5, width=32))
        n = 17
        r_1d = jnp.linspace(2.0, 6.0, n)
        out = gs_operator(jnp.full((n, n), float(c)), r_1d,
                          float(r_1d[1] - r_1d[0]), 0.3)
        assert float(jnp.max(jnp.abs(out))) < 1e-8 * max(abs(c), 1.0)


class TestMultigridTransfer:
    @SETTINGS
    @given(data=st.data())
    def test_restriction_prolongation_adjoint(self, data):
        """Full-weighting restriction is (1/4) x the bilinear
        prolongation transpose on interior points — the Galerkin pair:
        <R u, v>_coarse == (1/4) <u, P v>_fine."""
        from scpn_fusion_tpu.ops.multigrid import (
            prolongate_bilinear,
            restrict_full_weight,
        )

        nf = 17
        nc = (nf + 1) // 2
        u = jnp.asarray(_interior_field(data, nf))
        v_np = np.zeros((nc, nc))
        v_np[1:-1, 1:-1] = data.draw(hnp.arrays(
            np.float64, (nc - 2, nc - 2),
            elements=st.floats(-5, 5, width=32)))
        v = jnp.asarray(v_np)
        lhs = float(jnp.sum(restrict_full_weight(u) * v))
        rhs = 0.25 * float(jnp.sum(u * prolongate_bilinear(v, nf, nf)))
        scale = max(abs(lhs), abs(rhs), 1e-30)
        assert abs(lhs - rhs) / scale < 1e-10

    def test_prolongation_preserves_constants(self):
        from scpn_fusion_tpu.ops.multigrid import prolongate_bilinear

        coarse = jnp.full((9, 9), 3.5)
        fine = prolongate_bilinear(coarse, 17, 17)
        np.testing.assert_allclose(np.asarray(fine), 3.5, rtol=1e-12)


class TestTridiagonal:
    @SETTINGS
    @given(data=st.data())
    def test_thomas_matches_dense_solve(self, data):
        from scpn_fusion_tpu.ops.tridiag import thomas_solve

        n = data.draw(st.integers(3, 24))
        rng_seed = data.draw(st.integers(0, 2**31 - 1))
        rng = np.random.default_rng(rng_seed)
        a = rng.uniform(-1, 1, n - 1)          # sub
        c = rng.uniform(-1, 1, n - 1)          # super
        b = 3.0 + rng.uniform(0, 1, n)         # diagonally dominant
        d = rng.uniform(-5, 5, n)
        x = np.asarray(thomas_solve(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(c), jnp.asarray(d)))
        m = np.diag(b) + np.diag(a, -1) + np.diag(c, 1)
        np.testing.assert_allclose(x, np.linalg.solve(m, d),
                                   rtol=1e-8, atol=1e-10)


class TestGreensFunction:
    @SETTINGS
    @given(r1=st.floats(1.0, 9.0), z1=st.floats(-3.0, 3.0),
           r2=st.floats(1.0, 9.0), z2=st.floats(-3.0, 3.0))
    def test_mutual_inductance_reciprocity(self, r1, z1, r2, z2):
        """psi Green's function is symmetric: the flux at (2) from a unit
        filament at (1) equals the flux at (1) from a unit filament at
        (2) — Neumann's mutual-inductance reciprocity."""
        from scpn_fusion_tpu.core.special import green_coil_psi

        if abs(r1 - r2) + abs(z1 - z2) < 0.05:
            return     # coincident filaments: self-inductance regime
        g12 = float(green_coil_psi(r1, z1, jnp.asarray(r2),
                                   jnp.asarray(z2), 1.0))
        g21 = float(green_coil_psi(r2, z2, jnp.asarray(r1),
                                   jnp.asarray(z1), 1.0))
        assert g12 == pytest.approx(g21, rel=1e-5)

    @SETTINGS
    @given(r=st.floats(2.0, 8.0), z=st.floats(-2.0, 2.0))
    def test_flux_positive_and_decaying(self, r, z):
        from scpn_fusion_tpu.core.special import green_coil_psi

        near = float(green_coil_psi(r, z, jnp.asarray(r + 0.5),
                                    jnp.asarray(z), 1.0))
        far = float(green_coil_psi(r, z, jnp.asarray(r + 4.0),
                                   jnp.asarray(z), 1.0))
        assert near > far > 0.0


class TestOrbits:
    @SETTINGS
    @given(seed=st.integers(0, 2**31 - 1))
    def test_boris_conserves_speed_in_pure_b(self, seed):
        """|v| is exactly invariant under the Boris rotation with E = 0."""
        from scpn_fusion_tpu.models.physics.orbits import (
            BorisState,
            boris_step,
        )

        rng = np.random.default_rng(seed)
        state = BorisState(
            x=jnp.asarray(rng.uniform(-1, 1, 3)),
            v=jnp.asarray(rng.uniform(-1e5, 1e5, 3)))
        b = jnp.asarray(rng.uniform(-5, 5, 3))
        e = jnp.zeros(3)
        v0 = float(jnp.linalg.norm(state.v))
        for _ in range(20):
            state = boris_step(state, e, b,
                               q_over_m=1.6e-19 / 3.3e-27, dt=1e-8)
        v1 = float(jnp.linalg.norm(state.v))
        assert v1 == pytest.approx(v0, rel=1e-6)


class TestBoundedLstsq:
    @SETTINGS
    @given(seed=st.integers(0, 2**31 - 1))
    def test_solution_feasible_and_optimal_interior(self, seed):
        from scpn_fusion_tpu.ops.lstsq import bounded_lstsq

        rng = np.random.default_rng(seed)
        a = jnp.asarray(rng.standard_normal((8, 4)))
        x_true = jnp.asarray(rng.uniform(-0.5, 0.5, 4))
        b = a @ x_true
        lb = jnp.full(4, -1.0)
        ub = jnp.full(4, 1.0)
        x = bounded_lstsq(a, b, lb, ub, n_iter=300)
        assert bool(jnp.all((x >= lb - 1e-6) & (x <= ub + 1e-6)))
        # Interior optimum: recovers the generator.
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true),
                                   atol=1e-4)


class TestPhaseOrderParameter:
    @SETTINGS
    @given(data=st.data())
    def test_order_parameter_bounds_and_sync_limit(self, data):
        from scpn_fusion_tpu.models.phase.kuramoto import order_parameter

        n = data.draw(st.integers(2, 64))
        theta = jnp.asarray(data.draw(hnp.arrays(
            np.float64, (n,), elements=st.floats(-np.pi, np.pi))))
        r, _ = order_parameter(theta)
        assert -1e-9 <= float(r) <= 1.0 + 1e-9
        r_sync, _ = order_parameter(jnp.full((n,), 0.7))
        assert float(r_sync) == pytest.approx(1.0, abs=1e-9)
