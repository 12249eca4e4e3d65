#!/usr/bin/env python
"""Pallas-on-hardware evidence lane with DEVICE-SIDE timing (VERDICT r2 #2).

Round 2 timed one 50-sweep call per measurement, forcing a ~1 MB psi fetch
over the remote TPU tunnel per call — the measured "0.81-0.83 ms/sweep" was
tunnel RTT / 50 on both paths (verified: total wall is FLAT from 50 to 200
sweeps/call), so the Pallas-vs-XLA comparison was pure noise and the
implied bandwidth was two orders of magnitude under roofline.

This lane cancels the constant (RTT + fetch + dispatch) with a sweep-count
SLOPE: time k=10 and k=100 outer iterations of a 50-sweep program and take
(T(5000 sweeps) - T(500 sweeps)) / 4500.  Lanes (fail-closed):

1. pallas_compiled_identity   — compiled-kernel numerics vs the XLA path
   (span-rel gate, as in round 2).
2. pallas_vs_xla_device_slope — on-device us/sweep for both paths at the
   headline 512x513 f32 size + achieved-bandwidth roofline accounting.
   Gate: the VMEM-resident Pallas kernel must BEAT the XLA path
   (measured 3.38 vs 18.44 us/sweep — 5.5x, driver-grade run with a
   20,000-sweep span).  The XLA path moves O(arrays) of HBM per sweep
   (~228 GB/s, 28% of the 819 GB/s roofline under the stated traffic
   estimate); the Pallas kernel holds psi/source/coefficients in VMEM
   across all 50 sweeps (HBM amortised to 0.084 MB/sweep), so its speed
   is VMEM/VPU-bound (~3.1 TB/s effective) — the designed win, visible
   once the tunnel constant is cancelled.

Blocked (not pass) without a TPU.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

HBM_ROOFLINE_GB_S = 819.0   # TPU v5-lite nominal HBM bandwidth


def main() -> int:
    import jax
    import jax.numpy as jnp

    from scpn_fusion_tpu.core.grid import Grid
    from scpn_fusion_tpu.ops.pallas_stencil import sor_sweeps_pallas
    from scpn_fusion_tpu.ops.stencil import gs_operator, sor_sweeps
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []
    backend = jax.default_backend()
    if backend != "tpu":
        lanes.append(LaneResult(
            name="pallas_compiled_identity", status="blocked",
            notes=f"needs the real TPU chip; backend is {backend!r}. "
                  "blocked != pass"))
        write_report("pallas_tpu", lanes)
        print("blocked: no TPU")
        return 1

    n, nz = 513, 512
    grid = Grid.from_bounds(n, nz, 2.0, 10.0, -4.0, 4.0, dtype=np.float32)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0),
                            jnp.float32)
    src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
    psi0 = jnp.zeros_like(psi_exact)
    span = float(jnp.max(psi_exact) - jnp.min(psi_exact))
    omega = jnp.float32(1.6)
    sweeps_per_call = 50   # a >400-sweep single-kernel unroll faults the
    # TPU worker (round-2 finding); the slope harness loops 50-sweep calls.

    # ── Lane 1: numerical identity (compiled, non-interpret) ──
    out_p = sor_sweeps_pallas(psi0, src, grid.R, grid.dR, grid.dZ,
                              omega, n_sweeps=sweeps_per_call,
                              interpret=False)
    out_x = sor_sweeps(psi0, src, grid.R, grid.dR, grid.dZ, 1.6,
                       sweeps_per_call)
    dev = float(jnp.max(jnp.abs(out_p - out_x))) / span
    gate = 1e-5
    lanes.append(LaneResult(
        name="pallas_compiled_identity",
        status="pass" if dev < gate else "fail",
        metrics={"span_rel_deviation_vs_xla": dev,
                 "grid": f"{nz}x{n}", "n_sweeps": sweeps_per_call},
        thresholds={"span_rel_deviation_vs_xla": gate},
        notes="COMPILED (non-interpret) Pallas red-black SOR vs the XLA "
              "sweep path on the physical chip"))

    # ── Lane 2: device-side slope timing + roofline ──
    @partial(jax.jit, static_argnames=("k",))
    def pallas_k(psi, k):
        def body(_, p):
            return sor_sweeps_pallas(p, src, grid.R, grid.dR, grid.dZ,
                                     omega, n_sweeps=sweeps_per_call,
                                     interpret=False)
        return jax.lax.fori_loop(0, k, body, psi)

    @partial(jax.jit, static_argnames=("k",))
    def xla_k(psi, k):
        def body(_, p):
            return sor_sweeps(p, src, grid.R, grid.dR, grid.dZ, 1.6,
                              sweeps_per_call)
        return jax.lax.fori_loop(0, k, body, psi)

    def wall(fn, reps=4):
        np.asarray(fn())            # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn())        # device->host fetch: same constant for
            ts.append(time.perf_counter() - t0)   # every measurement
        return min(ts) * 1e3

    # Span sizing: the tunnel constant jitters by +-tens of ms, so the
    # sweep-count difference must produce a wall difference well above
    # that: 20,000 sweeps at 5-20 us/sweep = 100-400 ms of signal.
    k_lo, k_hi = 20, 420
    d_sweeps = (k_hi - k_lo) * sweeps_per_call
    us = {}
    walls = {}
    for name, fn in (("pallas", pallas_k), ("xla", xla_k)):
        t_lo = wall(lambda: fn(psi0, k_lo), reps=6)
        t_hi = wall(lambda: fn(psi0, k_hi), reps=6)
        us[name] = (t_hi - t_lo) / d_sweeps * 1e3
        walls[name] = (t_lo, t_hi)

    # Effective-bandwidth accounting at the measured on-device rate.
    arr_mb = nz * n * 4 / 1e6
    # XLA: the half-sweep chain fuses to ~1 pass per half-sweep; best
    # case reads psi+source and writes psi once per half-sweep -> 2 x 2
    # arrays moved per sweep (ESTIMATE, stated as such; the exact count
    # depends on XLA's fusion decisions).
    xla_mb_per_sweep = 2 * 2 * arr_mb
    xla_gbs = xla_mb_per_sweep / 1e3 / (us["xla"] * 1e-6)
    # Pallas: HBM traffic only at kernel entry/exit (3 reads + 1 write per
    # 50-sweep call); per-sweep VMEM traffic ~ 8 rolled reads + 2 writes.
    pallas_hbm_mb_per_sweep = 4 * arr_mb / sweeps_per_call
    pallas_vmem_gbs = (10 * arr_mb) / 1e3 / (us["pallas"] * 1e-6)

    speedup = us["xla"] / max(us["pallas"], 1e-9)
    ok = us["pallas"] < us["xla"] and us["pallas"] > 0.0
    lanes.append(LaneResult(
        name="pallas_vs_xla_device_slope",
        status="pass" if ok else "fail",
        metrics={
            "us_per_sweep_pallas_device": round(us["pallas"], 3),
            "us_per_sweep_xla_device": round(us["xla"], 3),
            "pallas_speedup_vs_xla": round(speedup, 2),
            "wall_ms_pallas_lo_hi": [round(w, 1)
                                               for w in walls["pallas"]],
            "wall_ms_xla_lo_hi": [round(w, 1)
                                            for w in walls["xla"]],
            "xla_est_hbm_gb_s": round(xla_gbs, 1),
            "xla_hbm_roofline_fraction": round(
                xla_gbs / HBM_ROOFLINE_GB_S, 3),
            "pallas_hbm_mb_per_sweep_amortised": round(
                pallas_hbm_mb_per_sweep, 3),
            "pallas_est_vmem_gb_s": round(pallas_vmem_gbs, 1),
            "hbm_roofline_gb_s": HBM_ROOFLINE_GB_S,
        },
        thresholds={"pallas_faster_than_xla": 1.0},
        notes="slope timing cancels tunnel RTT/fetch/dispatch: "
              "(T(21000 sweeps) - T(1000)) / 20000, min of 6 reps each. "
              "Round 2's per-call timing measured ONLY the tunnel "
              "constant (wall flat in sweep count).  The VMEM-resident "
              "kernel amortises HBM traffic over 50 sweeps; the XLA "
              "chain moves O(arrays) of HBM per sweep"))

    path = write_report("pallas_tpu", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
