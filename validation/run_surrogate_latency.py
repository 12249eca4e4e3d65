#!/usr/bin/env python
"""Neural-equilibrium surrogate inference-latency campaign.

Closes the last unevidenced BASELINE.md row in the "Equilibrium solvers"
table: the reference's neural equilibrium surrogate runs 129² inference at
1.05 ms mean / 2.69 ms P95 on CPU (reference RESULTS.md "Equilibrium &
Transport"; `neural_equilibrium.py:135-258` SimpleMLP+MinimalPCA).

Lanes (fail-closed):
1. artifact_accuracy_129 — the committed artifact IS a 129² surrogate
   (grid pinned) trained on real free-boundary solver outputs, with the
   held-out rel-L2 gate < 0.02 (reference-class accuracy; their QLKNN
   gate is 0.25).
2. inference_latency_cpu — same hardware class as the reference row:
   mean / P95 over 200 single-call predictions on the host CPU backend,
   gated to beat 1.05 ms mean and 2.69 ms P95.
3. inference_latency_tpu — per-call device time on the real chip by
   solve-count slope (K chained predictions inside one jit; cancels the
   shared-tunnel RTT constant, PERFORMANCE_METRIC_TAXONOMY.md), gated
   under the reference's CPU mean.

Runs on the default interpreter (TPU visible); the CPU lane pins arrays
to the host backend via jax.default_device.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

REF_MEAN_MS = 1.05    # BASELINE.md "Neural equilibrium surrogate inference"
REF_P95_MS = 2.69


def _single_call_stats(predict, x, n_calls: int = 200):
    """Mean/P95 wall per single synchronous call (includes dispatch)."""
    predict(x).block_until_ready()          # warm
    times = []
    for _ in range(n_calls):
        t0 = time.perf_counter()
        predict(x).block_until_ready()
        times.append((time.perf_counter() - t0) * 1e3)
    arr = np.asarray(times)
    return float(arr.mean()), float(np.percentile(arr, 95))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from scpn_fusion_tpu.models.surrogates.pretrained import (
        load_equilibrium_artifact,
    )
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []
    sur, metrics = load_equilibrium_artifact()
    grid_n = int(metrics["grid"])
    rel_l2 = float(metrics["test_rel_l2"])

    # ── Lane 1: the committed artifact is the 129² reference row ──
    ok1 = grid_n == 129 and rel_l2 < 0.02
    lanes.append(LaneResult(
        name="artifact_accuracy_129",
        status="pass" if ok1 else "fail",
        metrics={"grid": grid_n, "test_rel_l2": rel_l2,
                 "n_modes": int(metrics["n_modes"]),
                 "n_train": int(metrics["n_train"])},
        thresholds={"grid": 129, "test_rel_l2": 0.02},
        notes="PCA+MLP surrogate trained on real 129^2 free-boundary "
              "solver outputs (6 coil currents -> psi map); held-out "
              "rel-L2 gate (reference row: 1.05 ms CPU inference at "
              "129^2, RESULTS.md 'Equilibrium & Transport')"))

    x_host = np.asarray(sur.x_mean, np.float32) * 1.07

    # ── Lane 2: CPU latency (reference hardware class) ──
    # the surrogate is closed over (weights embedded as constants) rather
    # than passed as an argument: its static ``shape`` field is a tuple of
    # python ints, which jit would otherwise trace as leaves
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        sur_cpu = jax.device_put(sur, cpu)
        predict_cpu = jax.jit(lambda xx: sur_cpu.predict(xx))
        x_cpu = jax.device_put(jnp.asarray(x_host), cpu)
        mean_ms, p95_ms = _single_call_stats(predict_cpu, x_cpu)
    ok2 = mean_ms < REF_MEAN_MS and p95_ms < REF_P95_MS
    lanes.append(LaneResult(
        name="inference_latency_cpu",
        status="pass" if ok2 else "fail",
        metrics={"mean_ms": round(mean_ms, 4), "p95_ms": round(p95_ms, 4),
                 "reference_mean_ms": REF_MEAN_MS,
                 "reference_p95_ms": REF_P95_MS,
                 "speedup_mean": round(REF_MEAN_MS / max(mean_ms, 1e-9), 1)},
        thresholds={"mean_ms": REF_MEAN_MS, "p95_ms": REF_P95_MS},
        notes="200 single synchronous predict() calls on the host CPU "
              "backend (same hardware class as the reference row)"))

    # ── Lane 3: TPU per-call device time by chained-call slope ──
    tpu_devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not tpu_devs:
        lanes.append(LaneResult(
            name="inference_latency_tpu", status="blocked",
            notes="no accelerator device visible in this interpreter"))
    else:
        dev = tpu_devs[0]
        sur_tpu = jax.device_put(sur, dev)
        x_tpu = jax.device_put(jnp.asarray(x_host), dev)

        def chained(xx, k):
            def body(c, _):
                psi = sur_tpu.predict(c)
                # data dependency so XLA cannot collapse the chain
                return xx * (1.0 + 1e-6 * jnp.mean(psi)), None
            out, _ = jax.lax.scan(body, xx, None, length=k)
            return out

        run = jax.jit(chained, static_argnums=1)
        # At ~3 us/call a K=64 chain (~0.2 ms device) is below tunnel-RTT
        # jitter and the slope can come out negative (measured 2026-08-20:
        # -0.021 ms).  K=1024 puts ~3 ms of device work in the long
        # program so the slope denominator dominates the jitter, and the
        # median of 3 independent slopes rejects residual outliers
        # (ADVICE r4 #4 methodology).
        k_lo, k_hi = 1, 1024
        for k in (k_lo, k_hi):
            run(x_tpu, k).block_until_ready()   # warm both programs

        def best_of(k, n=5):
            best = np.inf
            for _ in range(n):
                t0 = time.perf_counter()
                run(x_tpu, k).block_until_ready()
                best = min(best, time.perf_counter() - t0)
            return best

        slopes = sorted((best_of(k_hi) - best_of(k_lo)) / (k_hi - k_lo)
                        * 1e3 for _ in range(3))
        slope_ms = slopes[1]
        ok3 = 0.0 <= slope_ms < REF_MEAN_MS
        lanes.append(LaneResult(
            name="inference_latency_tpu",
            status="pass" if ok3 else "fail",
            metrics={"per_call_device_ms": round(slope_ms, 5),
                     "reference_cpu_mean_ms": REF_MEAN_MS},
            thresholds={"per_call_device_ms": REF_MEAN_MS},
            notes="slope of K=64 vs K=1 chained predictions in one jit "
                  "(cancels the shared-tunnel RTT constant); compared "
                  "against the reference's CPU mean for scale"))

    path = write_report("surrogate_latency", lanes)
    print(f"wrote {path}")
    return 0 if all(l.status == "pass" for l in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
