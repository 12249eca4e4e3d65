"""Closed-loop free-boundary shape tracking with the full GS plant in-loop.

TPU-native redesign of the reference's free-boundary tracking family
(``control/free_boundary_tracking.py:46`` + the 8 ``_free_boundary_*``
mixins and ``_free_boundary_safety_supervisor.py:28``):

* **local response identification** — the coil-to-objective Jacobian is
  re-identified from perturbed full free-boundary solves; here the
  ``n_coils`` perturbed solves run as ONE ``vmap``-batched compiled solve
  instead of a host loop (reference ``identify_response_matrix``);
* **bounded least-squares corrections** with gain, per-step delta clamp,
  slew limits, and Tikhonov regularisation;
* **objective-space disturbance observer** — persistent residuals
  accumulate into a bias estimate without a reduced-order plant model;
* **sensor bias/drift injection + fixed-step measurement latency** with an
  extrapolating estimator compensating the latency (reference runtime
  mixin semantics);
* **safety supervisor** — alert ladder (nominal/warning/guarded/severe)
  with hysteresis hold, action filtering (delta + total-L1 + absolute
  current limits), and fallback-current ramp on severe;
* **magnetics in the loop** — every tick forward-models synthetic flux
  loops + B probes from the plant psi and re-reconstructs the coil
  currents from those magnetics (``shape_control.reconstruct_coil_currents``),
  so the controller acts on estimated, not oracle, currents.

``run_tracking_shot`` compiles the ENTIRE shot — plant solves,
identification, magnetics, estimation, supervision — as one
``jax.lax.scan`` program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.core.config import ReactorConfig
from scpn_fusion_tpu.core.grid import Grid
from scpn_fusion_tpu.models.equilibrium.free_boundary import (
    CoilSet,
    _run_free_boundary,
)
from scpn_fusion_tpu.models.equilibrium.shape_control import (
    probe_response_matrix,
    reconstruct_coil_currents,
    synthetic_magnetics,
)
from scpn_fusion_tpu.ops.lstsq import bounded_lstsq

N_OBJECTIVES = 4  # [axis_R, axis_Z, x_R, x_Z]


# ── Differentiable objective extraction ─────────────────────────────────


def soft_objectives(psi: jnp.ndarray, grid: Grid,
                    temperature: float = 60.0) -> jnp.ndarray:
    """[axis_R, axis_Z, xpt_R, xpt_Z] via softmax/softmin position weights
    (smooth twin of the reference's ``evaluate_objectives`` axis/X-point
    metrics; differentiable so the same code serves gradient lanes)."""
    rr, zz = grid.RR, grid.ZZ
    w_ax = jax.nn.softmax(
        (temperature * (psi - jnp.max(psi)) / (jnp.ptp(psi) + 1e-30)).reshape(-1))
    axis_r = w_ax @ rr.reshape(-1)
    axis_z = w_ax @ zz.reshape(-1)

    dpsi_dz = jnp.gradient(psi, grid.dZ, axis=0)
    dpsi_dr = jnp.gradient(psi, grid.dR, axis=1)
    b_mag = jnp.hypot(dpsi_dr, dpsi_dz)
    mask = zz < (grid.Z_min * 0.5)
    scale = jnp.max(jnp.where(mask, b_mag, 0.0)) + 1e-30
    logits = jnp.where(mask, -temperature * b_mag / scale, -jnp.inf)
    w_x = jax.nn.softmax(logits.reshape(-1))
    x_r = w_x @ rr.reshape(-1)
    x_z = w_x @ zz.reshape(-1)
    return jnp.stack([axis_r, axis_z, x_r, x_z])


# ── Safety supervisor ────────────────────────────────────────────────────

NOMINAL, WARNING, GUARDED, SEVERE = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class SupervisorConfig:
    """Constraint/alert thresholds (reference
    ``_free_boundary_safety_supervisor.py:31-108`` semantics, condensed)."""

    coil_current_limit: float = 40.0       # |I| absolute cap
    coil_delta_limit: float = 2.0          # per-coil per-tick |dI| cap
    total_action_l1_limit: float = 4.0     # sum |dI| cap
    warning_axis_error_m: float = 0.04
    guarded_axis_error_m: float = 0.07
    severe_axis_error_m: float = 0.10
    severe_xpoint_error_m: float = 0.12
    severe_bias_norm_m: float = 0.08
    alert_hold_steps: int = 6              # hysteresis: level decays slowly
    fallback_action_scale: float = 0.45    # action scale while GUARDED
    fallback_ramp_rate: float = 0.25       # SEVERE: fraction/tick toward safe


class SupervisorState(NamedTuple):
    level: jnp.ndarray      # int32 alert level
    hold: jnp.ndarray       # int32 ticks remaining at >= current level


def supervisor_init(dtype=jnp.float32) -> SupervisorState:
    del dtype
    return SupervisorState(level=jnp.int32(NOMINAL), hold=jnp.int32(0))


def _classify_level(cfg: SupervisorConfig, axis_err: jnp.ndarray,
                    x_err: jnp.ndarray, bias_norm: jnp.ndarray) -> jnp.ndarray:
    sev = ((axis_err > cfg.severe_axis_error_m)
           | (x_err > cfg.severe_xpoint_error_m)
           | (bias_norm > cfg.severe_bias_norm_m))
    grd = axis_err > cfg.guarded_axis_error_m
    wrn = axis_err > cfg.warning_axis_error_m
    return jnp.where(sev, SEVERE, jnp.where(grd, GUARDED,
                     jnp.where(wrn, WARNING, NOMINAL))).astype(jnp.int32)


def supervisor_step(
    cfg: SupervisorConfig,
    state: SupervisorState,
    delta: jnp.ndarray,          # proposed coil correction
    currents: jnp.ndarray,       # present coil currents
    fallback_currents: jnp.ndarray,
    axis_err: jnp.ndarray,
    x_err: jnp.ndarray,
    bias_norm: jnp.ndarray,
) -> tuple[SupervisorState, jnp.ndarray]:
    """Advance the alert ladder and filter the proposed action.

    Returns (new_state, filtered_delta).  SEVERE overrides the correction
    with a bounded ramp toward the fallback currents (reference
    ``_recover_to_safe_state``); GUARDED scales the action down; all levels
    enforce delta, L1, and absolute-current limits.
    """
    req = _classify_level(cfg, axis_err, x_err, bias_norm)
    # Hysteresis: escalate immediately, de-escalate only when hold expires.
    escalate = req > state.level
    hold = jnp.where(escalate, jnp.int32(cfg.alert_hold_steps),
                     jnp.maximum(state.hold - 1, 0))
    level = jnp.where(escalate, req,
                      jnp.where(hold > 0, jnp.maximum(state.level, req), req))

    scale = jnp.where(level == GUARDED, cfg.fallback_action_scale,
                      jnp.where(level == SEVERE, 0.0, 1.0))
    d = delta * scale
    # SEVERE: ramp toward fallback currents instead of freezing.
    ramp = cfg.fallback_ramp_rate * (fallback_currents - currents)
    d = jnp.where(level == SEVERE, ramp, d)

    # Hard action filters (all levels).
    d = jnp.clip(d, -cfg.coil_delta_limit, cfg.coil_delta_limit)
    l1 = jnp.sum(jnp.abs(d))
    d = d * jnp.minimum(1.0, cfg.total_action_l1_limit / jnp.maximum(l1, 1e-30))
    d = jnp.clip(currents + d, -cfg.coil_current_limit,
                 cfg.coil_current_limit) - currents
    return SupervisorState(level=level, hold=hold), d


# ── Tracking controller ──────────────────────────────────────────────────


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Controller knobs (reference ``FreeBoundaryTrackingController.__init__``
    :70-115 + runtime-mixin fault-injection parameters)."""

    gain: float = 0.8
    identification_perturbation: float = 0.25
    correction_limit: float = 2.0
    response_regularization: float = 1e-3
    latency_steps: int = 0                 # measurement delay in ticks
    # Latency compensation (reference ``latency_compensation_gain`` /
    # ``latency_rate_max_abs`` semantics): a Smith-predictor correction —
    # the identified response matrix maps the coil-current change applied
    # since the delayed measurement was taken into objective space, which
    # is far more stable than output extrapolation (no noise x latency
    # amplification).  The per-component correction is clamped so a bad
    # local model cannot inject unbounded compensation.
    latency_compensation_gain: float = 1.0
    latency_rate_max_abs: float = 0.5
    observer_gain: float = 0.3             # disturbance-observer update rate
    sensor_bias: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    # Known calibration subtracted from the measurement (reference
    # ``measurement_correction_bias``): the corrected acceptance lane sets
    # this equal to the injected bias — the contract is that a calibrated
    # fault returns tracking to nominal, not that an objective-space
    # observer can identify an offset it has no independent reference for.
    measurement_correction_bias: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    sensor_drift_per_tick: tuple[float, ...] = (0.0, 0.0, 0.0, 0.0)
    probe_noise_sigma: float = 0.0         # synthetic-magnetics noise
    # Prior-anchored reconstruction: the filament basis cannot represent the
    # distributed plasma exactly, so the fit is regularised around the
    # commanded currents and corrects only observable deviations (the
    # reference validates its magnetics reconstruction vacuum-only;
    # plasma-in-the-loop is a beyond-reference lane, limits disclosed).
    # Coil columns are anchored much harder than filament columns: coil
    # leads are directly instrumented in practice, while the filaments must
    # stay free to absorb the distributed-plasma pickup — otherwise the
    # plasma model error leaks into the coil estimates.
    reconstruction_alpha: float = 1e-2
    reconstruction_alpha_coils: float = 25.0
    # Plasma-surrogate filament offsets (dR, dZ) from the target axis: the
    # distributed plasma current is fitted as this small filament basis.
    filament_offsets: tuple[tuple[float, float], ...] = (
        (0.0, 0.0), (-0.8, 0.0), (0.8, 0.0), (0.0, -0.8), (0.0, 0.8))
    supervisor: SupervisorConfig = SupervisorConfig()


class TrackingState(NamedTuple):
    currents: jnp.ndarray          # commanded coil currents
    bias_estimate: jnp.ndarray     # (N_OBJECTIVES,) disturbance observer
    obj_history: jnp.ndarray       # (latency+2, N_OBJ) delayed measurements
    current_history: jnp.ndarray   # (latency+1, n_coils) command history
    predicted_obj: jnp.ndarray     # model prediction for the next estimate
    supervisor: SupervisorState
    tick: jnp.ndarray


class TrackingTrace(NamedTuple):
    objectives: jnp.ndarray        # true per-tick objectives
    currents: jnp.ndarray
    reconstructed_currents: jnp.ndarray
    reconstruction_rms: jnp.ndarray
    alert_level: jnp.ndarray
    axis_error: jnp.ndarray


def _plant_solve(coils: CoilSet, cfg: ReactorConfig, grid: Grid,
                 use_pallas: bool):
    res = _run_free_boundary(
        coils, cfg=cfg, grid=grid, max_outer_iter=5, tol=1e-4,
        optimize_shape=False, tikhonov_alpha=1e-4,
        mu0_green=float(cfg.physics.vacuum_permeability),
        use_pallas=use_pallas)
    return res.psi


def identify_response(
    coils: CoilSet,
    cfg: ReactorConfig,
    grid: Grid,
    base_obj: jnp.ndarray,
    perturbation: float,
    use_pallas: bool,
) -> jnp.ndarray:
    """Coil-to-objective Jacobian J[obj, coil] from vmap-batched perturbed
    free-boundary solves (reference ``identify_response_matrix``, but all
    perturbations solve concurrently on-device)."""
    n_coils = coils.currents.shape[0]
    eye = jnp.eye(n_coils, dtype=coils.currents.dtype)

    def perturbed(col):
        c = coils._replace(currents=coils.currents + perturbation * col)
        psi = _plant_solve(c, cfg, grid, use_pallas)
        return soft_objectives(psi, grid)

    objs = jax.vmap(perturbed)(eye)            # (n_coils, N_OBJ)
    return (objs - base_obj[None, :]).T / perturbation


@partial(jax.jit, static_argnames=("cfg", "grid", "tcfg", "n_steps",
                                   "use_pallas"))
def _run_tracking_shot(
    coils: CoilSet,
    targets: jnp.ndarray,              # (N_OBJECTIVES,)
    fallback_currents: jnp.ndarray,
    flux_points: jnp.ndarray,
    b_probe_points: jnp.ndarray,
    b_probe_dirs: jnp.ndarray,
    noise_key: jnp.ndarray,
    *,
    cfg: ReactorConfig,
    grid: Grid,
    tcfg: TrackingConfig,
    n_steps: int,
    use_pallas: bool,
) -> TrackingTrace:
    dtype = coils.currents.dtype
    sup_cfg = tcfg.supervisor
    mu0 = float(cfg.physics.vacuum_permeability)
    # Response matrix over n_coils + n_filaments columns: the extra columns
    # are a plasma-surrogate filament basis around the target axis, so the
    # inverse fit explains the TOTAL measurements (coil + plasma pickup)
    # without an oracle plasma subtraction — the classic filament-model rt
    # reconstruction (reference realtime_efit precomputed-response design).
    offs = jnp.asarray(tcfg.filament_offsets, dtype)   # (n_fil, 2)
    n_fil = offs.shape[0]
    fil_r = targets[0] + offs[:, 0]
    fil_z = targets[1] + offs[:, 1]
    plasma_filament = CoilSet(
        r=jnp.concatenate([coils.r, fil_r]),
        z=jnp.concatenate([coils.z, fil_z]),
        currents=jnp.concatenate([coils.currents,
                                  jnp.zeros((n_fil,), dtype)]),
        turns=jnp.concatenate([coils.turns, jnp.ones((n_fil,), dtype)]),
    )
    probe_resp = probe_response_matrix(
        plasma_filament, flux_points=flux_points,
        b_probe_points=b_probe_points, b_probe_dirs=b_probe_dirs, mu0=mu0)

    # One-time local response identification around the initial currents.
    psi0 = _plant_solve(coils, cfg, grid, use_pallas)
    obj0 = soft_objectives(psi0, grid)
    jac = identify_response(coils, cfg, grid, obj0,
                            tcfg.identification_perturbation, use_pallas)

    bias0 = jnp.zeros((N_OBJECTIVES,), dtype)
    hist_len = tcfg.latency_steps + 2
    hist0 = jnp.tile(obj0[None, :], (hist_len, 1))
    chist0 = jnp.tile(coils.currents[None, :], (tcfg.latency_steps + 1, 1))
    state0 = TrackingState(
        currents=coils.currents, bias_estimate=bias0, obj_history=hist0,
        current_history=chist0, predicted_obj=obj0,
        supervisor=supervisor_init(), tick=jnp.int32(0))

    sensor_bias = jnp.asarray(tcfg.sensor_bias, dtype)
    correction_bias = jnp.asarray(tcfg.measurement_correction_bias, dtype)
    sensor_drift = jnp.asarray(tcfg.sensor_drift_per_tick, dtype)

    def step(state: TrackingState, key):
        c = coils._replace(currents=state.currents)
        psi = _plant_solve(c, cfg, grid, use_pallas)
        obj_true = soft_objectives(psi, grid)

        # Synthetic magnetics -> coil-current reconstruction (estimator in
        # the loop: the controller never reads the oracle currents).
        meas = synthetic_magnetics(
            psi, grid, flux_points=flux_points,
            b_probe_points=b_probe_points, b_probe_dirs=b_probe_dirs)
        meas = meas + tcfg.probe_noise_sigma * jax.random.normal(
            key, meas.shape, dtype)
        # Fit coil currents + a plasma filament current against the TOTAL
        # measurements; prior = previous command + Ip target for the
        # filament column.
        ip_prior = jnp.asarray(cfg.physics.plasma_current_target, dtype)
        prior = jnp.concatenate([
            state.currents, jnp.full((n_fil,), ip_prior / n_fil, dtype)])
        limit_vec = jnp.concatenate([
            jnp.full_like(state.currents, sup_cfg.coil_current_limit),
            jnp.full((n_fil,), 10.0 * jnp.abs(ip_prior) + 1.0, dtype)])
        alpha_vec = jnp.concatenate([
            jnp.full_like(state.currents, tcfg.reconstruction_alpha_coils),
            jnp.full((n_fil,), tcfg.reconstruction_alpha, dtype)])
        recon_full = reconstruct_coil_currents(
            probe_resp, meas, prior,
            tikhonov_alpha=alpha_vec,
            current_limits=limit_vec, n_iter=120)
        recon = recon_full._replace(
            coil_currents=recon_full.coil_currents[:-n_fil])

        # Sensor model: bias + drift, then fixed-step latency with an
        # extrapolating estimator compensating the delay.
        obj_meas = (obj_true + sensor_bias + sensor_drift * state.tick
                    - correction_bias)
        hist = jnp.concatenate([state.obj_history[1:], obj_meas[None, :]])
        delayed = hist[-(tcfg.latency_steps + 1)]
        # Smith-predictor compensation: the delayed measurement was taken
        # with the currents commanded ``latency_steps`` ticks ago; map the
        # commands applied since then through the identified response.
        comp = jac @ (state.currents - state.current_history[0])
        comp = jnp.clip(comp, -tcfg.latency_rate_max_abs,
                        tcfg.latency_rate_max_abs)
        obj_est = delayed + tcfg.latency_compensation_gain * comp

        # Disturbance observer in objective space: low-pass the innovation
        # between the sensing-path estimate and last tick's model
        # prediction — persistent unmodeled response accumulates into the
        # bias WITHOUT any oracle access (reference observer semantics).
        innovation = obj_est - state.predicted_obj
        new_bias = (1.0 - tcfg.observer_gain) * state.bias_estimate \
            + tcfg.observer_gain * innovation
        err = targets - (obj_est + new_bias)
        delta = bounded_lstsq(
            jnp.concatenate([
                jac,
                jnp.sqrt(jnp.asarray(tcfg.response_regularization, dtype))
                * jnp.eye(jac.shape[1], dtype=dtype)]),
            jnp.concatenate([err, jnp.zeros((jac.shape[1],), dtype)]),
            -jnp.full((jac.shape[1],), tcfg.correction_limit, dtype),
            jnp.full((jac.shape[1],), tcfg.correction_limit, dtype),
            n_iter=120) * tcfg.gain

        axis_err = jnp.hypot(obj_true[0] - targets[0], obj_true[1] - targets[1])
        x_err = jnp.hypot(obj_true[2] - targets[2], obj_true[3] - targets[3])
        bias_norm = jnp.linalg.norm(state.bias_estimate[:2])
        sup_state, delta_f = supervisor_step(
            sup_cfg, state.supervisor, delta, state.currents,
            fallback_currents, axis_err, x_err, bias_norm)

        new_currents = state.currents + delta_f
        new_state = TrackingState(
            currents=new_currents,
            bias_estimate=new_bias,
            obj_history=hist,
            current_history=jnp.concatenate(
                [state.current_history[1:], new_currents[None, :]]),
            predicted_obj=obj_est + jac @ delta_f,
            supervisor=sup_state,
            tick=state.tick + 1)
        out = TrackingTrace(
            objectives=obj_true,
            currents=state.currents,
            reconstructed_currents=recon.coil_currents,
            reconstruction_rms=recon.residual_rms,
            alert_level=sup_state.level,
            axis_error=axis_err)
        return new_state, out

    keys = jax.random.split(noise_key, n_steps)
    _, trace = jax.lax.scan(step, state0, keys)
    return trace


def run_tracking_shot(
    cfg: ReactorConfig,
    coils: CoilSet,
    targets: jnp.ndarray,
    *,
    grid: Grid | None = None,
    tcfg: TrackingConfig = TrackingConfig(),
    n_steps: int = 10,
    flux_points: jnp.ndarray | None = None,
    b_probe_points: jnp.ndarray | None = None,
    b_probe_dirs: jnp.ndarray | None = None,
    fallback_currents: jnp.ndarray | None = None,
    seed: int = 0,
    dtype=jnp.float32,
) -> TrackingTrace:
    """Closed-loop shape-tracking shot, one compiled program.

    Each tick: full free-boundary plant solve -> synthetic magnetics ->
    coil-current reconstruction -> latency/bias-compensated objective
    estimate -> bounded LSQ correction -> safety-supervisor filter.
    """
    if grid is None:
        grid = Grid.from_config(cfg, dtype=dtype)
    if flux_points is None:
        # Default diagnostic set: 16 flux loops on an ellipse that ENCLOSES
        # the plasma but excludes the coils — the virtual-casing condition
        # for interior (plasma) / exterior (coil) source separation in the
        # filament fit.  Plasma current outside the sensor contour leaks
        # into the coil estimates.
        th = jnp.linspace(0.0, 2.0 * jnp.pi, 17, dtype=dtype)[:-1]
        r_mid = 0.5 * (grid.R_min + grid.R_max)
        r_amp = 0.47 * (grid.R_max - grid.R_min)
        z_amp = 0.42 * (grid.Z_max - grid.Z_min)
        flux_points = jnp.stack(
            [r_mid + r_amp * jnp.cos(th), z_amp * jnp.sin(th)], axis=1)
    if b_probe_points is None:
        b_probe_points = flux_points
        b_probe_dirs = jnp.tile(jnp.asarray([0, 1], jnp.int32),
                                flux_points.shape[0] // 2)
    if fallback_currents is None:
        fallback_currents = coils.currents
    return _run_tracking_shot(
        coils, jnp.asarray(targets, dtype), fallback_currents,
        flux_points, b_probe_points, b_probe_dirs,
        jax.random.PRNGKey(seed),
        cfg=cfg, grid=grid, tcfg=tcfg, n_steps=int(n_steps),
        use_pallas=False,
    )
