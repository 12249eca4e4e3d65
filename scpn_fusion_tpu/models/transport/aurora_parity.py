"""Aurora/STRAHL-parity charge-state impurity transport solver.

Covers the reference's ``core/impurity_transport_aurora_parity.py``
(``AuroraParityImpuritySolver:44``): a conservative finite-volume
radial transport step with per-charge-state diffusion D and pinch
(convection) velocity V on Aurora's upwind face flux
``F = -D_face grad(n) + V_face n_upwind`` with zero-flux boundaries
(``_radial_transport_step:89``), availability-limited neighbouring
collisional-radiative transfer (``_advance_transport_and_cr:128``),
the finite-volume inventory conservation diagnostic
(``radial_transport_budget_diagnostic:176``), the same-case effective
source closure (``derive_effective_source_closure:149``), and the
STRAHL-style artifact builder (``build_aurora_strahl_charge_state_artifact:320``).

This is *not* an Aurora wrapper — like the reference it is a native
solver held to the same-case contract.  TPU-native design:

* the transport step treats all charge states at once (faces on axis 0,
  states on axis 1) — the reference's double Python loop over states
  and faces is one fused gather/where/segment expression;
* the sequential CR neighbour transfer (each pair sees the previous
  pair's update) is a ``lax.scan`` over the charge-state ladder;
* the time march of the effective-source closure is one ``lax.scan``
  over steps, so deriving the closure for a whole trajectory compiles
  once.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class AuroraParityCase:
    """Same-case contract (subset of the reference's
    ``impurity_transport_contracts.AuroraParityCase``)."""

    element: str
    charge_states: np.ndarray          # (Z+1,)
    radius_m: np.ndarray               # (nr,) strictly increasing
    time_s: np.ndarray                 # (nt,) strictly increasing
    major_radius_m: float
    ne_t_r: np.ndarray                 # (nt, nr) electron density [m^-3]
    diffusion_m2_s_r_z: np.ndarray     # (nr, Z+1)
    convection_m_s_r_z: np.ndarray     # (nr, Z+1) pinch velocity
    ionisation_m3_s_t_r_z: np.ndarray  # (nt, nr, Z+1) rate coefficients
    recombination_m3_s_t_r_z: np.ndarray

    def __post_init__(self) -> None:
        if np.any(np.diff(self.radius_m) <= 0.0):
            raise ValueError("radius_m must be strictly increasing")
        if np.any(np.diff(self.time_s) <= 0.0):
            raise ValueError("time_s must be strictly increasing")
        if self.major_radius_m <= 0.0:
            raise ValueError("major_radius_m must be positive")


def radial_edges(radius_m: jnp.ndarray) -> jnp.ndarray:
    """Cell-face radii (reference ``_radial_edges:113``)."""
    inner = jnp.maximum(0.0, radius_m[0] - 0.5 * (radius_m[1] - radius_m[0]))
    outer = radius_m[-1] + 0.5 * (radius_m[-1] - radius_m[-2])
    mid = 0.5 * (radius_m[:-1] + radius_m[1:])
    return jnp.concatenate([inner[None], mid, outer[None]])


@jax.jit
def radial_transport_step(density: jnp.ndarray, d_r_z: jnp.ndarray,
                          v_r_z: jnp.ndarray, radius_m: jnp.ndarray,
                          dt_s) -> jnp.ndarray:
    """Conservative finite-volume D+V step, all charge states fused
    (reference ``_radial_transport_step:89-111``).  Zero-flux BCs."""
    edges = radial_edges(radius_m)
    annulus = 0.5 * (edges[1:] ** 2 - edges[:-1] ** 2)       # (nr,)
    dr = (radius_m[1:] - radius_m[:-1])[:, None]             # (nr-1, 1)
    grad = (density[1:, :] - density[:-1, :]) / dr
    d_face = 0.5 * (d_r_z[1:, :] + d_r_z[:-1, :])
    v_face = 0.5 * (v_r_z[1:, :] + v_r_z[:-1, :])
    upwind = jnp.where(v_face >= 0.0, density[:-1, :], density[1:, :])
    flux_interior = -d_face * grad + v_face * upwind         # (nr-1, Z+1)
    zeros = jnp.zeros((1, density.shape[1]), density.dtype)
    flux = jnp.concatenate([zeros, flux_interior, zeros], axis=0)
    div = (edges[1:, None] * flux[1:, :]
           - edges[:-1, None] * flux[:-1, :]) / annulus[:, None]
    return jnp.maximum(density - dt_s * div, 0.0)


@jax.jit
def cr_transfer_step(density: jnp.ndarray, ionisation: jnp.ndarray,
                     recombination: jnp.ndarray, dt_s) -> jnp.ndarray:
    """Availability-limited neighbouring CR transfer; sequential over the
    charge ladder exactly like the reference (``:134-146``), expressed as
    a ``lax.scan`` over charge pairs."""
    zp1 = density.shape[1]

    def pair(carry, z):
        n = carry
        ion_flux = jnp.minimum(ionisation[:, z], n[:, z] / dt_s)
        rec_flux = jnp.minimum(recombination[:, z + 1], n[:, z + 1] / dt_s)
        n = n.at[:, z].add(dt_s * (rec_flux - ion_flux))
        n = n.at[:, z + 1].add(dt_s * (ion_flux - rec_flux))
        return n, None

    out, _ = jax.lax.scan(pair, density, jnp.arange(zp1 - 1))
    return jnp.maximum(out, 0.0)


def _rate_tables(case: AuroraParityCase, time_idx, density: jnp.ndarray):
    """Volumetric CR rates ``n_e n_z <sigma v>`` with ladder-end zeroing
    (reference ``_rate_tables:61-74``)."""
    ne = jnp.asarray(case.ne_t_r)[time_idx][:, None]
    ion = ne * density * jnp.asarray(case.ionisation_m3_s_t_r_z)[time_idx]
    rec = ne * density * jnp.asarray(case.recombination_m3_s_t_r_z)[time_idx]
    ion = ion.at[:, -1].set(0.0)
    rec = rec.at[:, 0].set(0.0)
    return ion, rec


def advance_transport_and_cr(case: AuroraParityCase, density: jnp.ndarray,
                             step: int, dt_s) -> jnp.ndarray:
    """One predictor step: radial transport then CR transfer
    (reference ``_advance_transport_and_cr:128-147``)."""
    advanced = radial_transport_step(
        density, jnp.asarray(case.diffusion_m2_s_r_z),
        jnp.asarray(case.convection_m_s_r_z),
        jnp.asarray(case.radius_m), dt_s)
    ion, rec = _rate_tables(case, step, advanced)
    return cr_transfer_step(advanced, ion, rec, dt_s)


def finite_volume_inventory(total_density_r: jnp.ndarray,
                            radius_m: jnp.ndarray,
                            major_radius_m: float) -> jnp.ndarray:
    """Toroidal particle inventory (reference ``_finite_volume_inventory:121``)."""
    edges = radial_edges(radius_m)
    annulus = jnp.pi * (edges[1:] ** 2 - edges[:-1] ** 2)
    volume = 2.0 * jnp.pi * major_radius_m * annulus
    return jnp.sum(total_density_r * volume)


def radial_transport_budget_diagnostic(case: AuroraParityCase,
                                       density_r_z: np.ndarray,
                                       dt_s: float) -> dict[str, Any]:
    """Zero-flux conservation audit (reference ``:176-215``)."""
    density = jnp.asarray(density_r_z)
    if not bool(jnp.all(jnp.isfinite(density))) or bool(jnp.any(density < 0)):
        raise ValueError("density_r_z must be finite and non-negative")
    if not np.isfinite(dt_s) or dt_s <= 0.0:
        raise ValueError("dt_s must be finite and positive")
    radius = jnp.asarray(case.radius_m)
    before = finite_volume_inventory(jnp.sum(density, axis=1), radius,
                                     case.major_radius_m)
    after_density = radial_transport_step(
        density, jnp.asarray(case.diffusion_m2_s_r_z),
        jnp.asarray(case.convection_m_s_r_z), radius, dt_s)
    after = finite_volume_inventory(jnp.sum(after_density, axis=1), radius,
                                    case.major_radius_m)
    rel = abs(float(after) - float(before)) / max(abs(float(before)), 1.0)
    # The FV update is exactly conservative in exact arithmetic; the
    # representable floor scales with the working dtype (f32 on the TPU
    # path carries ~1e-7 rounding in the update itself, x64 ~1e-12).
    eps = float(jnp.finfo(after_density.dtype).eps)
    tol = max(1.0e-12, 2.0e3 * eps)
    return {
        "inventory_before": float(before),
        "inventory_after": float(after),
        "relative_inventory_error": rel,
        "tolerance": tol,
        "dtype": str(after_density.dtype),
        "passed": bool(rel <= tol),
    }


def derive_effective_source_closure(
    case: AuroraParityCase,
    reference_density_t_r_z: np.ndarray,
) -> jnp.ndarray:
    """Per-step density-rate residual needed to reproduce a supplied
    Aurora trajectory after the native predictor — a diagnostic closure,
    not a mechanistic source model (reference ``:149-174``).  The whole
    trajectory is one ``lax.scan``."""
    reference = jnp.asarray(reference_density_t_r_z)
    expected = (case.time_s.size, case.radius_m.size,
                case.charge_states.size)
    if reference.shape != expected:
        raise ValueError(
            f"reference_density_t_r_z must have shape {expected}")
    if not bool(jnp.all(jnp.isfinite(reference))) or bool(
            jnp.any(reference < 0)):
        raise ValueError(
            "reference_density_t_r_z must be finite and non-negative")
    dt = jnp.asarray(np.diff(case.time_s))
    d = jnp.asarray(case.diffusion_m2_s_r_z)
    v = jnp.asarray(case.convection_m_s_r_z)
    radius = jnp.asarray(case.radius_m)
    ne = jnp.asarray(case.ne_t_r)
    ion_c = jnp.asarray(case.ionisation_m3_s_t_r_z)
    rec_c = jnp.asarray(case.recombination_m3_s_t_r_z)

    def step(density, inputs):
        ref_next, dt_s, ne_t, ion_t, rec_t = inputs
        advanced = radial_transport_step(density, d, v, radius, dt_s)
        ion = (ne_t[:, None] * advanced * ion_t).at[:, -1].set(0.0)
        rec = (ne_t[:, None] * advanced * rec_t).at[:, 0].set(0.0)
        predicted = cr_transfer_step(advanced, ion, rec, dt_s)
        return ref_next, (ref_next - predicted) / dt_s

    _, closure_tail = jax.lax.scan(
        step, reference[0],
        (reference[1:], dt, ne[1:], ion_c[1:], rec_c[1:]))
    zero = jnp.zeros_like(reference[0])[None]
    return jnp.concatenate([zero, closure_tail], axis=0)


def build_aurora_strahl_artifact(
    case: AuroraParityCase,
    density_t_r_z: np.ndarray,
    *,
    closure: np.ndarray | None = None,
) -> dict[str, Any]:
    """Checksummed charge-state artifact (reference
    ``build_aurora_strahl_charge_state_artifact:320``)."""
    density = np.asarray(density_t_r_z, np.float64)
    inv = [float(finite_volume_inventory(
        jnp.asarray(density[t].sum(axis=1)), jnp.asarray(case.radius_m),
        case.major_radius_m)) for t in range(density.shape[0])]
    payload: dict[str, Any] = {
        "schema": "scpn-fusion-tpu.aurora-strahl-charge-state.v1",
        "element": case.element,
        "charge_states": [int(z) for z in case.charge_states],
        "n_radius": int(case.radius_m.size),
        "n_time": int(case.time_s.size),
        "major_radius_m": float(case.major_radius_m),
        "inventory_per_step": inv,
        "final_mean_charge": float(
            (density[-1] * case.charge_states[None, :]).sum()
            / max(density[-1].sum(), 1e-300)),
        "closure_linf": (None if closure is None
                         else float(np.max(np.abs(closure)))),
        "claim": ("native finite-volume same-case parity solver; "
                  "not an Aurora/STRAHL wrapper"),
    }
    blob = json.dumps(payload, sort_keys=True).encode()
    payload["payload_sha256"] = hashlib.sha256(blob).hexdigest()
    return payload
