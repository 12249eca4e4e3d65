"""Shot replay pipeline: sensor preprocessing + actuator lag + predictor.

Role-parity with the reference's replay lane
(``control/replay_pipeline.py:51-132`` — archived-shot signals are
resampled/filtered/clipped, pushed through the disruption-risk model and
alarm, while actuator commands are lagged by the first-order actuator
model — and ``control/disruption_replay_contracts.py``'s fail-closed
verdict shape).  Everything is array-in/array-out and jittable so a whole
shot replays in one compiled call and a shot library replays under
``vmap``.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from scpn_fusion_tpu.control.disruption import (
    AlarmConfig,
    DisruptionPredictor,
    run_alarm,
)


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    control_dt_s: float = 1e-3
    median_window: int = 5          # odd; median prefilter length
    # Outlier clip in robust-sigma (MAD) units.  This must catch hardware
    # spikes, NOT physics excursions: a disruption precursor IS a
    # many-sigma excursion of the raw channel, so the default is wide.
    clip_sigma: float = 30.0
    actuator_tau_s: float = 20e-3   # first-order actuator lag
    alarm: AlarmConfig = AlarmConfig()

    def __post_init__(self):
        if self.median_window % 2 == 0 or self.median_window < 1:
            raise ValueError("median_window must be odd and >= 1")


def resample_to_control_grid(t_s: jnp.ndarray, signal: jnp.ndarray,
                             dt_s: float, n_out: int) -> jnp.ndarray:
    """Linear resample onto the uniform control grid."""
    t_out = jnp.arange(n_out) * dt_s + t_s[0]
    return jnp.interp(t_out, t_s, signal)


def median_prefilter(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Running-median despike (edge-padded, static window)."""
    if window <= 1:
        return x
    half = window // 2
    padded = jnp.pad(x, (half, half), mode="edge")
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(window)[None, :]
    return jnp.median(padded[idx], axis=1)


def robust_clip(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Clip at median +- sigma * (1.4826 MAD); NaNs -> median."""
    med = jnp.nanmedian(x)
    mad = jnp.nanmedian(jnp.abs(x - med)) * 1.4826
    lo, hi = med - sigma * mad, med + sigma * mad
    x = jnp.where(jnp.isfinite(x), x, med)
    return jnp.clip(x, lo, hi)


def preprocess_channel(t_s: jnp.ndarray, raw: jnp.ndarray,
                       cfg: ReplayConfig, n_out: int) -> jnp.ndarray:
    x = resample_to_control_grid(t_s, raw, cfg.control_dt_s, n_out)
    x = median_prefilter(x, cfg.median_window)
    return robust_clip(x, cfg.clip_sigma)


def actuator_lag(command: jnp.ndarray, dt_s: float,
                 tau_s: float) -> jnp.ndarray:
    """First-order lag y' = (u - y)/tau over the command trace
    (reference ``FirstOrderActuator`` applied in replay)."""
    alpha = dt_s / (tau_s + dt_s)

    def step(y, u):
        y1 = y + alpha * (u - y)
        return y1, y1

    _, out = jax.lax.scan(step, command[0], command)
    return out


class ReplayResult(NamedTuple):
    risk: jnp.ndarray            # (n,) per-tick disruption risk
    alarm_latched: jnp.ndarray   # (n,) bool
    warning_time_s: jnp.ndarray  # time between first alarm and shot end
    actuated: jnp.ndarray        # (n, n_act) lagged mitigation commands
    tripped: jnp.ndarray         # scalar bool


def replay_shot(predictor: DisruptionPredictor, cfg: ReplayConfig,
                t_s: jnp.ndarray, signals: jnp.ndarray,
                mitigation_command: jnp.ndarray | None = None
                ) -> ReplayResult:
    """Replay one archived shot.

    signals: (n_channels, n_raw) raw diagnostics on the archive time base;
    they are preprocessed per channel, stacked to the predictor's feature
    layout, scored, alarmed, and (optionally) a mitigation command is
    passed through the actuator-lag model from the first alarm tick.
    """
    duration = float(t_s[-1] - t_s[0])
    n_out = max(int(duration / cfg.control_dt_s),
                cfg.median_window + predictor.window + 1)
    clean = jnp.stack([
        preprocess_channel(t_s, signals[i], cfg, n_out)
        for i in range(signals.shape[0])])
    risk = predictor.risk(clean.T)          # (n_out - window + 1,)
    alarm = run_alarm(risk, cfg.alarm)
    latched = alarm.alarm
    tripped = jnp.any(latched)
    t_first = jnp.where(tripped,
                        jnp.argmax(latched) * cfg.control_dt_s, jnp.inf)
    warning = jnp.maximum(duration - t_first, 0.0)

    if mitigation_command is None:
        mitigation_command = jnp.ones((risk.shape[0], 1))
    cmd = mitigation_command * latched[:, None]
    actuated = jax.vmap(
        lambda col: actuator_lag(col, cfg.control_dt_s, cfg.actuator_tau_s),
        in_axes=1, out_axes=1)(cmd)
    return ReplayResult(risk=risk, alarm_latched=latched,
                        warning_time_s=warning, actuated=actuated,
                        tripped=tripped)
