"""Charged-particle orbits: guiding-centre RK4 and full-orbit Boris pusher.

JAX ports of the reference's orbit machinery (``core/orbit_following.py:
64-200`` guiding centre; Rust full-orbit ``fusion-core/src/particles.rs``):

* Guiding centre (R, Z, phi, v_par): parallel streaming + combined
  grad-B/curvature drift with drift coefficient
  ``(v_par^2 + mu B / m) / (omega_c B^2)``, mirror force
  ``m dv_par/dt = -mu (b . grad)B``; RK4 under ``lax.scan``.
* Boris pusher (x, v in Cartesian): the standard energy-conserving
  half-acceleration / rotation / half-acceleration scheme.

Both are vmappable over particle ensembles — a whole fast-ion population
integrates as one device program (the reference loops per particle on the
host or in Rust).  The magnetic field arrives as a traced callable
``b_field(r, z) -> (B_R, B_Z, B_phi)``; grad|B| uses ``jax.grad`` (exact)
instead of the reference's finite differences.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

ATOMIC_MASS_KG = 1.66053906660e-27
E_CHARGE = 1.602176634e-19


class GuidingCenterState(NamedTuple):
    r: jnp.ndarray
    z: jnp.ndarray
    phi: jnp.ndarray
    v_par: jnp.ndarray
    mu: jnp.ndarray      # magnetic moment (fixed adiabatic invariant)


def init_guiding_center(
    b_field: Callable,
    *,
    m_amu,
    charge_z,
    e_kev,
    pitch_angle,
    r0,
    z0,
):
    """Initialise the guiding-centre state; mu from the local |B|."""
    m = m_amu * ATOMIC_MASS_KG
    e_j = e_kev * 1e3 * E_CHARGE
    v_tot = jnp.sqrt(2.0 * e_j / m)
    v_par = v_tot * jnp.cos(pitch_angle)
    v_perp = v_tot * jnp.sin(pitch_angle)
    b_r, b_z, b_phi = b_field(r0, z0)
    b_mag = jnp.sqrt(b_r**2 + b_z**2 + b_phi**2)
    mu = m * v_perp**2 / (2.0 * b_mag)
    return GuidingCenterState(jnp.asarray(r0), jnp.asarray(z0),
                              jnp.asarray(0.0), v_par, mu)


def _gc_eom(state, b_field, m, q):
    r, z, phi, v_par, mu = state

    def b_mag_at(rz):
        br, bz, bp = b_field(rz[0], rz[1])
        return jnp.sqrt(br**2 + bz**2 + bp**2)

    b_r, b_z, b_phi = b_field(r, z)
    b_mag = jnp.sqrt(b_r**2 + b_z**2 + b_phi**2)
    grad_b = jax.grad(b_mag_at)(jnp.stack([r, z]))
    db_dr, db_dz = grad_b[0], grad_b[1]
    omega_c = q * b_mag / m

    # B x grad|B| with B = (B_R, B_phi, B_Z), grad|B| = (dB_dR, 0, dB_dZ).
    bxg_r = b_phi * db_dz
    bxg_phi = b_z * db_dr - b_r * db_dz
    bxg_z = -b_phi * db_dr

    drift = (v_par**2 + mu * b_mag / m) / (omega_c * b_mag**2)
    dr = v_par * b_r / b_mag + drift * bxg_r
    dz = v_par * b_z / b_mag + drift * bxg_z
    dphi = v_par * b_phi / (r * b_mag) + drift * bxg_phi / r
    b_dot_grad_b = b_r * db_dr + b_z * db_dz
    dv = -(mu / m) * b_dot_grad_b / b_mag
    return jnp.stack([dr, dz, dphi, dv])


@partial(jax.jit, static_argnames=("b_field", "n_steps"))
def run_guiding_center(
    state: GuidingCenterState,
    b_field: Callable,
    *,
    m_amu,
    charge_z,
    dt,
    n_steps: int,
):
    """Integrate the guiding-centre orbit; returns (final, trace(R,Z))."""
    m = m_amu * ATOMIC_MASS_KG
    q = charge_z * E_CHARGE
    mu = state.mu

    def rk4(y, _):
        def f(yy):
            return _gc_eom((yy[0], yy[1], yy[2], yy[3], mu), b_field, m, q)
        k1 = f(y)
        k2 = f(y + 0.5 * dt * k1)
        k3 = f(y + 0.5 * dt * k2)
        k4 = f(y + dt * k3)
        y_new = y + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        return y_new, {"r": y_new[0], "z": y_new[1]}

    y0 = jnp.stack([state.r, state.z, state.phi, state.v_par])
    y_f, trace = jax.lax.scan(rk4, y0, None, length=n_steps)
    final = GuidingCenterState(y_f[0], y_f[1], y_f[2], y_f[3], mu)
    return final, trace


class BorisState(NamedTuple):
    x: jnp.ndarray   # (3,) Cartesian position [m]
    v: jnp.ndarray   # (3,) velocity [m/s]


def boris_step(state: BorisState, e_field: jnp.ndarray, b_field: jnp.ndarray,
               *, q_over_m, dt) -> BorisState:
    """One Boris push (half-E, B-rotation, half-E) — energy-conserving."""
    qmdt2 = q_over_m * dt / 2.0
    v_minus = state.v + qmdt2 * e_field
    t = qmdt2 * b_field
    t2 = jnp.sum(t * t)
    s = 2.0 * t / (1.0 + t2)
    v_prime = v_minus + jnp.cross(v_minus, t)
    v_plus = v_minus + jnp.cross(v_prime, s)
    v_new = v_plus + qmdt2 * e_field
    return BorisState(state.x + dt * v_new, v_new)


@partial(jax.jit, static_argnames=("field_fn", "n_steps"))
def run_boris(
    state: BorisState,
    field_fn: Callable,   # x -> (E(3,), B(3,))
    *,
    q_over_m,
    dt,
    n_steps: int,
):
    """Full-orbit Boris integration under ``lax.scan``."""
    def step(s, _):
        e, b = field_fn(s.x)
        s_new = boris_step(s, e, b, q_over_m=q_over_m, dt=dt)
        return s_new, {"x": s_new.x, "energy": 0.5 * jnp.sum(s_new.v**2)}

    return jax.lax.scan(step, state, None, length=n_steps)


def run_boris_ensemble(states: BorisState, field_fn: Callable, *,
                       q_over_m, dt, n_steps: int):
    """vmapped Boris integration over a particle ensemble (leading axis)."""
    def one(x, v):
        return run_boris(BorisState(x, v), field_fn,
                         q_over_m=q_over_m, dt=dt, n_steps=n_steps)
    return jax.vmap(one)(states.x, states.v)
