"""s-alpha ballooning eigenvalue solver + second-stability access.

Property gates (VERDICT r2 #8): traversal along increasing alpha at fixed
shear crosses first-stable -> unstable -> second-stable; the first boundary
is non-decreasing in shear (the reference artifact's own self-check,
``pyrokinetics_alpha_crit.json: alpha_crit_non_decreasing_in_shear``); and
the bisected marginal alpha agrees with the closed-form Connor-Hastie-Taylor
estimate at moderate shear.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.physics.ballooning import (
    ballooning_stable,
    marginal_alpha,
    second_stability_scan,
)
from scpn_fusion_tpu.models.physics.stability_mhd import (
    QProfile,
    ballooning_stability_eigen,
)


def test_traversal_first_unstable_second():
    """At s = 0.5, increasing alpha traverses stable -> unstable -> stable
    (second-stability access) — the defining property of the s-alpha
    diagram that the closed-form first boundary cannot represent."""
    alphas = jnp.asarray([0.1, 0.8, 3.5])
    stab = np.asarray(ballooning_stable(0.5, alphas))
    assert stab.tolist() == [True, False, True]


def test_scan_band_structure_consistent():
    s_vals = jnp.linspace(0.1, 2.0, 8)
    res = second_stability_scan(s_vals, alpha_max=5.0, n_alpha=48)
    a1 = np.asarray(res.alpha_crit_first)
    a2 = np.asarray(res.alpha_crit_second)
    access = np.asarray(res.second_access)
    # Every scanned shear in this range has second-stability access below
    # the ceiling, with an ordered band: 0 < a1 < a2 <= alpha_max.
    assert access.all()
    assert (a1 > 0.0).all()
    assert (a2 > a1).all()
    assert (a2 <= 5.0).all()


def test_first_boundary_non_decreasing_in_shear():
    """Reference artifact self-check: alpha_crit non-decreasing in shear."""
    s_vals = jnp.linspace(0.25, 2.0, 8)
    res = second_stability_scan(s_vals, alpha_max=5.0, n_alpha=48)
    a1 = np.asarray(res.alpha_crit_first)
    assert (np.diff(a1) >= -1e-12).all(), a1


def test_marginal_alpha_matches_connor_hastie_estimate():
    """Bisected eigenvalue boundary vs the reduced closed-form
    s(1 - s/2) at s = 1 (0.5): same model family, agreement within the
    reduced model's accuracy band.  The reference's shaped pyrokinetics
    artifact puts s=1 at 0.552 (circular self-check row)."""
    a_crit = float(marginal_alpha(1.0, alpha_hi=2.0))
    assert 0.45 < a_crit < 0.75, a_crit


def test_marginal_matches_scan_boundary():
    """The bisection and the grid scan are the same physics: the bisected
    boundary lands inside one grid cell of the scanned first boundary."""
    s = 0.8
    res = second_stability_scan(jnp.asarray([s]), alpha_max=5.0, n_alpha=96)
    cell = 5.0 / 95
    a_scan = float(res.alpha_crit_first[0])
    a_bis = float(marginal_alpha(s, alpha_hi=2.0))
    assert abs(a_scan - a_bis) <= 2.0 * cell, (a_scan, a_bis)


def test_interp_and_classification_helpers():
    s_vals = jnp.linspace(0.2, 2.0, 10)
    res = second_stability_scan(s_vals, alpha_max=5.0, n_alpha=48)
    mid = float(res.alpha_crit_at(1.1))
    lo = float(res.alpha_crit_at(0.2))
    hi = float(res.alpha_crit_at(2.0))
    assert lo <= mid <= hi
    assert bool(res.has_second_stability_at(0.5))


def test_eigen_lane_in_stability_suite():
    """ballooning_stability_eigen marks a high-alpha low-shear point stable
    (second-stable) where the closed-form lane calls it unstable."""
    n = 7
    rho = jnp.linspace(0.1, 1.0, n)
    qp = QProfile(
        rho=rho,
        q=jnp.linspace(1.0, 4.0, n),
        shear=jnp.full((n,), 0.4),
        alpha_mhd=jnp.full((n,), 3.5),
        q_min=jnp.asarray(1.0),
        q_min_rho=jnp.asarray(0.1),
        q_edge=jnp.asarray(4.0),
    )
    res = ballooning_stability_eigen(qp)
    assert np.asarray(res.stable).all()
    from scpn_fusion_tpu.models.physics.stability_mhd import ballooning_stability
    closed = ballooning_stability(qp)
    assert not np.asarray(closed.stable).any()


class TestMillerBallooning:
    def test_thin_tube_recovers_s_alpha_exactly(self):
        from scpn_fusion_tpu.models.physics.ballooning import (
            ballooning_stable, miller_ballooning_stable)
        s = jnp.asarray([0.5, 1.0, 2.0])[:, None]
        alphas = jnp.linspace(0.0, 3.0, 25)[None, :]
        circ = ballooning_stable(s, alphas)
        thin = miller_ballooning_stable(s, alphas, rho=1e-4, kappa=1.0,
                                        delta=0.0)
        assert bool(jnp.all(circ == thin))

    def test_elongation_stabilises_first_boundary(self):
        from scpn_fusion_tpu.models.physics.ballooning import (
            miller_marginal_alpha)
        acs = [float(miller_marginal_alpha(1.0, r0=3.0, a=1.0, rho=0.9,
                                           kappa=k, delta=0.0, q=3.0))
               for k in (1.0, 1.4, 1.8)]
        assert acs[0] < acs[1] < acs[2]

    def test_positive_triangularity_opens_second_stability(self):
        """delta=+0.4 at low shear closes the unstable band entirely;
        delta=-0.4 widens it (the NT reduced-access mechanism)."""
        from scpn_fusion_tpu.models.physics.ballooning import (
            miller_ballooning_stable)
        alphas = jnp.linspace(0.0, 8.0, 81)

        def band(delta, s):
            st = np.asarray(miller_ballooning_stable(
                jnp.asarray(s), alphas, rho=0.9, kappa=1.8, delta=delta,
                q=3.0))
            un = ~st
            if not un.any():
                return None
            i_last = len(un) - 1 - int(np.argmax(un[::-1]))
            return float(alphas[np.argmax(un)]), float(alphas[i_last])

        assert band(0.4, 0.5) is None          # PT: full access
        b_nt = band(-0.4, 1.0)
        b_circ = band(0.0, 1.0)
        assert b_nt is not None and b_circ is not None
        assert b_nt[1] > b_circ[1]             # NT: band extends higher


class TestBootstrapPath:
    """Bootstrap-consistent shear path (VERDICT r3 stretch #10)."""

    DIIID = dict(r0=1.67, a=0.67, rho=0.95, kappa=1.74, delta=0.3, q=5.7)

    def test_strong_bootstrap_dodges_band(self):
        from scpn_fusion_tpu.models.physics.ballooning import (
            bootstrap_path_alpha_crit)
        res = bootstrap_path_alpha_crit(2.04, 3.0, alpha_hi=16.0,
                                        n_steps=2000, **self.DIIID)
        assert bool(res.second_access)
        assert float(res.alpha_crit) == 16.0

    def test_weak_bootstrap_hits_band_nose(self):
        from scpn_fusion_tpu.models.physics.ballooning import (
            bootstrap_path_alpha_crit)
        res = bootstrap_path_alpha_crit(2.04, 1.5, alpha_hi=16.0,
                                        n_steps=2000, **self.DIIID)
        assert not bool(res.second_access)
        assert 0.0 < float(res.alpha_crit) < 2.0

    def test_zero_bootstrap_matches_fixed_shear_boundary(self):
        from scpn_fusion_tpu.models.physics.ballooning import (
            bootstrap_path_alpha_crit, miller_marginal_alpha)
        res = bootstrap_path_alpha_crit(2.04, 0.0, alpha_hi=8.0, n_grid=65,
                                        n_steps=2000, **self.DIIID)
        fixed = float(miller_marginal_alpha(2.04, alpha_hi=8.0, n_grid=65,
                                            n_steps=2000, **self.DIIID))
        # Path boundary is one grid point BELOW the first unstable alpha.
        assert abs(float(res.alpha_crit) - (fixed - 8.0 / 64.0)) < 1e-9


def test_eped_shaped_tier_lifts_diiid_floor():
    """The shaped+bootstrap tier must NOT sit at the 0.1 keV floor where
    the s-alpha tier collapses (DIII-D slide inputs, ip=1.0 MA)."""
    from scpn_fusion_tpu.models.physics.edge import (
        eped_pedestal, eped_pedestal_shaped)
    salpha = eped_pedestal(n_ped_1e19=6.0, r0=1.67, a=0.67, b0=2.1,
                           ip_ma=1.0, kappa=1.74)
    assert float(salpha.t_ped_kev) <= 0.1 + 1e-9      # the documented collapse
    shaped = eped_pedestal_shaped(n_ped_1e19=6.0, r0=1.67, a=0.67, b0=2.1,
                                  ip_ma=1.0, kappa=1.74)
    assert bool(shaped.second_access)
    assert float(shaped.pedestal.t_ped_kev) > 0.3      # well off the floor
    # Within the documented band of the EPED1 13.0 kPa point (lane 4 of
    # run_eped_tiers.py gates all three Ip cases at [1/3, 3]).
    assert 13.0 / 3.0 < float(shaped.pedestal.p_ped_kpa) < 13.0 * 3.0
