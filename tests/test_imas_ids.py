"""Per-IDS IMAS adapters: equilibrium/core_profiles/core_transport/summary.

Parity anchors: reference io/imas_connector_equilibrium.py (bounded
schema validation + GEQDSK round trip), imas_connector_transport.py
(state <-> core_profiles/core_transport/summary), imas_connector_common.py
(finite/monotone coercions).
"""

import numpy as np
import pytest

from scpn_fusion_tpu.io.geqdsk import GEqdsk
from scpn_fusion_tpu.io.imas_ids import (
    ImasIdsError,
    core_profiles_to_transport_state,
    equilibrium_ids_to_geqdsk,
    geqdsk_to_equilibrium_ids,
    transport_state_to_core_profiles,
    transport_state_to_core_transport,
    transport_state_to_summary,
    validate_equilibrium_ids,
)
from scpn_fusion_tpu.models.transport.solver import (
    TransportParams,
    initial_state,
)


def _sample_geqdsk(nw=5, nh=4):
    rng = np.random.default_rng(2)
    return GEqdsk(
        description="case", nw=nw, nh=nh, rdim=4.0, zdim=3.0,
        rcentr=6.2, rleft=4.0, zmid=0.0, rmaxis=6.1, zmaxis=0.05,
        simag=-1.2, sibry=0.3, bcentr=5.3, current=1.5e7,
        fpol=rng.random(nw), pres=rng.random(nw),
        ffprime=rng.random(nw), pprime=rng.random(nw),
        qpsi=1.0 + rng.random(nw),
        psirz=rng.random((nh, nw)),
        rbdry=np.asarray([5.0, 7.0, 6.0]),
        zbdry=np.asarray([0.0, 0.5, 1.0]))


class TestEquilibriumIds:
    def test_round_trip(self):
        eq = _sample_geqdsk()
        ids = geqdsk_to_equilibrium_ids(eq, time_s=1.5, shot=99)
        back = equilibrium_ids_to_geqdsk(ids)
        np.testing.assert_allclose(back.psirz, eq.psirz)
        np.testing.assert_allclose(back.qpsi, eq.qpsi)
        np.testing.assert_allclose(back.pprime, eq.pprime)
        assert back.simag == eq.simag and back.sibry == eq.sibry
        assert back.current == eq.current
        assert back.rmaxis == eq.rmaxis
        np.testing.assert_allclose(back.rbdry, eq.rbdry)
        assert back.rdim == pytest.approx(eq.rdim)

    def test_validation_rejects_shape_mismatch(self):
        ids = geqdsk_to_equilibrium_ids(_sample_geqdsk())
        ids["time_slice"][0]["profiles_2d"][0]["psi"] = [[1.0, 2.0]]
        with pytest.raises(ImasIdsError, match="row count"):
            validate_equilibrium_ids(ids)

    def test_validation_rejects_nonmonotone_grid(self):
        ids = geqdsk_to_equilibrium_ids(_sample_geqdsk())
        grid = ids["time_slice"][0]["profiles_2d"][0]["grid"]
        grid["dim1"] = list(reversed(grid["dim1"]))
        with pytest.raises(ImasIdsError, match="increasing"):
            validate_equilibrium_ids(ids)

    def test_validation_rejects_missing_keys(self):
        with pytest.raises(ImasIdsError, match="missing keys"):
            validate_equilibrium_ids({"time": [0.0]})

    def test_slice_count_bound(self):
        ids = geqdsk_to_equilibrium_ids(_sample_geqdsk())
        ids["time_slice"] = ids["time_slice"] * 1025
        with pytest.raises(ImasIdsError, match="1024"):
            validate_equilibrium_ids(ids)


class TestCoreProfilesIds:
    def test_state_round_trip(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_core_profiles(state, params, time_s=2.0)
        back = core_profiles_to_transport_state(ids, params)
        np.testing.assert_allclose(np.asarray(back.te),
                                   np.asarray(state.te), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.ne),
                                   np.asarray(state.ne), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.n_d),
                                   np.asarray(state.n_d), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.q),
                                   np.asarray(state.q), rtol=1e-6)

    def test_grid_size_mismatch_rejected(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_core_profiles(state, params)
        with pytest.raises(ImasIdsError, match="params.nr"):
            core_profiles_to_transport_state(
                ids, TransportParams(nr=40))

    def test_missing_ions_rejected(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_core_profiles(state, params)
        ids["profiles_1d"][0]["ion"] = ids["profiles_1d"][0]["ion"][:1]
        with pytest.raises(ImasIdsError, match="D and T"):
            core_profiles_to_transport_state(ids, params)

    def test_si_units_in_payload(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_core_profiles(state, params)
        te_si = ids["profiles_1d"][0]["electrons"]["temperature"]
        # 1 keV core -> 1000 eV in the IDS.
        assert max(te_si) == pytest.approx(
            float(np.max(np.asarray(state.te))) * 1e3, rel=1e-6)


class TestTransportAndSummaryIds:
    def test_core_transport_channels(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_core_transport(state, params)
        prof = ids["model"][0]["profiles_1d"][0]
        assert len(prof["electrons"]["energy"]["d"]) == 30
        assert len(prof["particles"]["d"]) == 30

    def test_summary_volume_averages(self):
        params = TransportParams(nr=30)
        state = initial_state(params)
        ids = transport_state_to_summary(state, params, p_aux_mw=50.0)
        gq = ids["global_quantities"]
        assert gq["ip"]["value"][0] == pytest.approx(15e6)
        assert gq["power_loss"]["value"][0] == pytest.approx(50e6)
        # Volume average weighted toward the cooler edge: below core T.
        t_e_avg = gq["volume_average"]["t_e"]["value"][0]
        assert 0.0 < t_e_avg < 1000.0
