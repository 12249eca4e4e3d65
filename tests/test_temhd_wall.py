"""TEMHD liquid-metal layer + neutron wall loading tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from scpn_fusion_tpu.models.nuclear.temhd import (
    TEMHDParams,
    init_temhd,
    run_temhd,
    temhd_flux_scan,
    temhd_step,
)
from scpn_fusion_tpu.models.nuclear.wall_loading import (
    MaterialReport,
    WallGeometry,
    analyze_material,
    ash_poisoning_dilution,
    compute_wall_loading,
    neutron_source_density,
)


class TestTEMHD:
    def test_surface_heats_and_saturates(self):
        p = TEMHDParams()
        tr = run_temhd(p, 10.0, dt=0.05, n_steps=600)
        t = np.asarray(tr.surface_t_k)
        # heated above the coolant wall, and settled to a steady state
        # (the first implicit step overshoots before TE convection builds
        # up k_eff, then relaxes — only the steady state is contractual)
        assert t[-1] > p.t_wall_k + 5.0
        assert abs(t[-1] - t[-10]) < 1e-3
        assert np.all(np.isfinite(t))

    def test_te_convection_enhances_conductivity(self):
        p = TEMHDParams(b_field_t=10.0)
        p0 = TEMHDParams(b_field_t=0.0)
        tr = run_temhd(p, 20.0, n_steps=400)
        tr0 = run_temhd(p0, 20.0, n_steps=400)
        # with field: TE convection boosts k_eff above molecular value
        assert float(tr.k_eff_max[-1]) > p.k_thermal_w_m_k * 1.05
        assert float(tr0.k_eff_max[-1]) == pytest.approx(
            p0.k_thermal_w_m_k, rel=1e-6)
        # and the stabilised surface runs cooler
        assert float(tr.surface_t_k[-1]) < float(tr0.surface_t_k[-1])

    def test_flux_scan_monotone(self):
        p = TEMHDParams()
        t_surf, k_enh = temhd_flux_scan(p, jnp.asarray([1.0, 5.0, 20.0]),
                                        n_steps=200)
        t = np.asarray(t_surf)
        assert t[0] < t[1] < t[2]
        assert np.all(np.asarray(k_enh) >= 1.0)


@pytest.fixture(scope="module")
def loading():
    n = 65
    r = np.linspace(3.5, 9.0, n)
    z = np.linspace(-4.5, 4.5, n)
    rr, zz = np.meshgrid(r, z)
    src = neutron_source_density(jnp.asarray(rr), jnp.asarray(zz),
                                 p_fusion_mw=500.0)
    return compute_wall_loading(src, jnp.asarray(rr), jnp.asarray(zz))


class TestWallLoading:
    def test_iter_scale_nwl(self, loading):
        nwl = np.asarray(loading.nwl_mw_m2)
        assert np.all(nwl >= 0.0)
        # ITER 500 MW: average NWL ~ 0.5-0.6 MW/m^2; allow a broad band
        assert 0.1 < nwl.mean() < 1.5
        assert 1.0 < float(loading.peaking_factor) < 4.0

    def test_outboard_midplane_peaks(self, loading):
        nwl = np.asarray(loading.nwl_mw_m2)
        r_w = np.asarray(loading.r_wall)
        z_w = np.asarray(loading.z_wall)
        i_peak = int(np.argmax(nwl))
        # peak near the outboard midplane (largest R, small |Z|)
        assert r_w[i_peak] > np.median(r_w)
        assert abs(z_w[i_peak]) < 2.0

    def test_material_analysis_and_lifetime(self, loading):
        rep_w = analyze_material(loading, "tungsten")
        rep_fe = analyze_material(loading, "eurofer")
        assert isinstance(rep_w, MaterialReport)
        # steel damages faster than tungsten -> shorter life
        assert float(rep_fe.lifetime_fpy) < float(rep_w.lifetime_fpy)
        assert np.all(np.asarray(rep_w.he_appm_per_fpy) >= 0.0)
        with pytest.raises(ValueError, match="unknown material"):
            analyze_material(loading, "unobtainium")

    def test_ash_dilution(self):
        assert float(ash_poisoning_dilution(0.0)) == 1.0
        assert float(ash_poisoning_dilution(0.1)) == pytest.approx(0.64)
        assert float(ash_poisoning_dilution(0.6)) == 0.0
