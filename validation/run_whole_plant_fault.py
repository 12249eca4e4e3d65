#!/usr/bin/env python
"""Whole-plant fault-tolerant scenario campaign.

Counterpart of the reference's
``validation/whole_plant_fault_tolerant_scenario.py`` +
``subsystem_fault_hardening_campaign.py``: one consolidated evidence
surface over the plant's fault lanes — reconfigurable magnetic control,
HTS magnet quench protection, direct-energy-conversion load rejection,
disruption structural screening, and coolant-loop pumping — with the
reference's claim boundary (measured reduced-order software evidence,
NOT plant hardware / HIL / certification claims).  Lanes (fail-closed;
each lane also proves its gate CAN fail by running a degraded case that
must flag):

1. actuator_fault_reconfiguration — losing 2 of 6 coils mid-shot, the
   Tikhonov reallocation recovers tracking to <= 1e-6; losing 4 coils
   trips the controllability veto and the shutdown command is all-zero.
2. hts_quench_protection — the default REBCO screen passes; a slow-NZPV
   short-zone quench (the canonical HTS detection hazard) must fail it.
3. dec_load_rejection — nominal DEC fault handling passes; a
   slow-isolation degradation (100 ms sensor latency) must flag
   unisolated energy or bus overvoltage.
4. disruption_structural_screen — SPI must suppress the runaway
   avalanche (the mitigation criterion) and the vessel force screen
   must discriminate around the measured halo force.
5. coolant_loop_pumping — pumping power is a sane fraction of thermal
   power and strictly monotone in thermal power.

Writes checksummed JSON+MD evidence into validation/reports/.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

CLAIM = ("reduced-order software evidence only; no plant-hardware, HIL, "
         "or certification claim (same boundary as the reference "
         "whole-plant campaign)")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    from scpn_fusion_tpu.control.fault_tolerant import (
        ACTUATOR_LOSS,
        apply_actuator_fault,
        controllability_ok,
        graceful_shutdown,
        init_fault_state,
        run_fault_tolerant_shot,
    )
    from scpn_fusion_tpu.models.engineering.balance_of_plant import (
        PlantParams,
        pumping_power,
    )
    from scpn_fusion_tpu.models.engineering.direct_energy import (
        DECFault,
        evaluate_direct_energy_conversion,
    )
    from scpn_fusion_tpu.models.engineering.hts_quench import (
        QuenchScenario,
        evaluate_rebco_quench,
    )
    from scpn_fusion_tpu.models.physics.disruption_sequence import (
        DisruptionParams,
        run_disruption_sequence,
        structural_response_screen,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    # ── Lane 1: actuator-fault reconfiguration ──
    rng = np.random.default_rng(11)
    jac = jnp.asarray(rng.standard_normal((4, 6)))
    target = jnp.asarray([1.0, -0.5, 0.3, 0.8])
    trace = run_fault_tolerant_shot(
        jac, target,
        fault_times=jnp.asarray([50, 80, -1]),
        fault_kinds=jnp.asarray([ACTUATOR_LOSS, ACTUATOR_LOSS, 0]),
        fault_indices=jnp.asarray([0, 3, -1]),
        n_steps=200)
    final_err = float(trace.error_norm[-1])
    still_ok = bool(trace.controllable[-1])

    state = init_fault_state(6, 4)
    for c in (0, 1, 2, 3):
        state = apply_actuator_fault(state, c, ACTUATOR_LOSS)
    vetoed = not bool(controllability_ok(jac.astype(jnp.float32), state))
    shutdown_zero = bool(np.all(np.asarray(graceful_shutdown(6)) == 0.0))
    ok1 = final_err <= 1e-6 and still_ok and vetoed and shutdown_zero
    lanes.append(LaneResult(
        name="actuator_fault_reconfiguration",
        status="pass" if ok1 else "fail",
        metrics={"final_tracking_error": final_err,
                 "controllable_after_2_losses": still_ok,
                 "veto_after_4_losses": vetoed,
                 "shutdown_command_zero": shutdown_zero},
        thresholds={"final_tracking_error": 1e-6},
        notes="one-scan faulted shot; Tikhonov reallocation in-loop. "
              + CLAIM,
    ))

    # ── Lane 2: HTS quench protection screen ──
    nominal = evaluate_rebco_quench()
    # The canonical HTS hazard: a slow-NZPV quench whose normal zone is
    # too short to develop the detection voltage — the screen must flag
    # detection_voltage_below_threshold.
    degraded = evaluate_rebco_quench(
        s=QuenchScenario(initial_normal_zone_m=1e-3,
                         normal_zone_velocity_m_s=1e-3))
    ok2 = bool(nominal.passed) and not bool(degraded.passed)
    lanes.append(LaneResult(
        name="hts_quench_protection",
        status="pass" if ok2 else "fail",
        metrics={"nominal_passed": bool(nominal.passed),
                 "nominal_peak_hotspot_k": nominal.peak_hotspot_k,
                 "nominal_peak_terminal_v": nominal.peak_terminal_voltage_v,
                 "degraded_passed": bool(degraded.passed),
                 "degraded_failures": list(degraded.failures)},
        thresholds={},
        notes="slow-NZPV short-zone case must fail detection (gate "
              "falsifiability). " + CLAIM,
    ))

    # ── Lane 3: DEC load rejection ──
    dec_nom = evaluate_direct_energy_conversion()
    dec_bad = evaluate_direct_energy_conversion(
        fault=DECFault(sensor_detection_latency_ms=100.0))
    ok3 = bool(dec_nom.passed) and not bool(dec_bad.passed)
    lanes.append(LaneResult(
        name="dec_load_rejection",
        status="pass" if ok3 else "fail",
        metrics={"nominal_passed": bool(dec_nom.passed),
                 "nominal_isolated_energy_mj": dec_nom.isolated_energy_mj,
                 "nominal_overvoltage": dec_nom.bus_overvoltage_fraction,
                 "degraded_passed": bool(dec_bad.passed),
                 "degraded_failures": list(dec_bad.failures)},
        thresholds={},
        notes="100 ms sensor latency must flag the energy/overvoltage "
              "screen. " + CLAIM,
    ))

    # ── Lane 4: disruption mitigation + structural screen ──
    p = DisruptionParams()
    _, spi = run_disruption_sequence(p, spi_ne20_injected=200.0,
                                     spi_time_ms=0.2)
    _, bare = run_disruption_sequence(p)
    # Physics gate: SPI suppresses the runaway avalanche, the bare
    # sequence does not.  (SPI's denser, slower current quench carries a
    # LARGER halo force — recorded, not hidden.)
    re_gate = bool(spi.mitigated) and float(spi.i_re_final_ma) < 0.01 * p.ip0_ma
    forces = [float(spi.halo_force_mn), float(bare.halo_force_mn)]
    loose = structural_response_screen(bare,
                                       force_limit_mn=1.1 * max(forces))
    tight = structural_response_screen(bare, force_limit_mn=0.9 * float(
        bare.halo_force_mn))
    screen_gate = bool(loose["passed"]) and not bool(tight["passed"])
    ok4 = re_gate and screen_gate
    lanes.append(LaneResult(
        name="disruption_structural_screen",
        status="pass" if ok4 else "fail",
        metrics={"spi_mitigated": bool(spi.mitigated),
                 "spi_i_re_final_ma": float(spi.i_re_final_ma),
                 "bare_i_re_final_ma": float(bare.i_re_final_ma),
                 "spi_halo_force_mn": forces[0],
                 "bare_halo_force_mn": forces[1],
                 "spi_tau_cq_ms": float(spi.tau_cq_ms),
                 "bare_tau_cq_ms": float(bare.tau_cq_ms),
                 "screen_flags_tightened_limit": tight["failures"]},
        thresholds={"spi_re_fraction": 0.01},
        notes=("SPI must suppress the RE avalanche; the vessel screen "
               "must discriminate (pass above the measured force, flag "
               "below it).  The SPI sequence carries a HIGHER halo force "
               "than the bare one (see metrics) — a known mitigation "
               "trade-off, recorded honestly rather than gated away. "
               + CLAIM),
    ))

    # ── Lane 5: coolant-loop pumping sanity ──
    params = PlantParams()
    powers = [500.0, 1000.0, 2000.0]
    pumps = [float(pumping_power(pw, params)) for pw in powers]
    frac_ok = all(0.0 < pp < 0.2 * pw for pp, pw in zip(pumps, powers))
    mono = all(p2 > p1 for p1, p2 in zip(pumps, pumps[1:]))
    ok5 = frac_ok and mono
    lanes.append(LaneResult(
        name="coolant_loop_pumping",
        status="pass" if ok5 else "fail",
        metrics={"thermal_power_mw": powers, "pumping_power_mw": pumps,
                 "fraction_ok": frac_ok, "monotone": mono},
        thresholds={"max_pump_fraction": 0.2},
        notes="Churchill-friction pumping power, monotone in load. "
              + CLAIM,
    ))

    write_report("whole_plant_fault", lanes)
    return 0 if all(ln.status == "pass" for ln in lanes
                    if ln.status != "blocked") else 1


if __name__ == "__main__":
    sys.exit(main())
