#!/usr/bin/env python
"""Pallas-on-hardware evidence lane (VERDICT r1 weak #8).

The CPU test suite can only exercise the Pallas SOR kernel in interpret
mode; this lane runs the COMPILED kernel on the real TPU chip and
records (a) numerical identity against the XLA sweep path and (b) the
per-sweep wall-clock of both at the 513^2 headline size.  Blocked (not
pass) without a TPU.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


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
            name="pallas_compiled_on_tpu", status="blocked",
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
    # 50 sweeps/call: the kernel unrolls sweeps inside one pallas_call,
    # and a 400-sweep unroll at 513^2 faults the TPU worker (measured);
    # 50 matches the multigrid smoother's usage envelope.
    n_sweeps = 50
    omega = jnp.float32(1.6)

    def pallas_fn():
        return sor_sweeps_pallas(psi0, src, grid.R, grid.dR, grid.dZ,
                                 omega, n_sweeps=n_sweeps,
                                 interpret=False)

    def xla_fn():
        return sor_sweeps(psi0, src, grid.R, grid.dR, grid.dZ, 1.6,
                          n_sweeps)

    out_p = pallas_fn()
    out_x = xla_fn()
    jax.block_until_ready((out_p, out_x))
    dev = float(jnp.max(jnp.abs(out_p - out_x))) / span

    # Timings force a device->host fetch (block_until_ready is not a
    # reliable completion barrier over the remote TPU tunnel, measured).
    times = {}
    for name, fn in (("pallas", pallas_fn), ("xla", xla_fn)):
        np.asarray(fn())
        t0 = time.perf_counter()
        for _ in range(5):
            np.asarray(fn())
        times[name] = (time.perf_counter() - t0) / 5 / n_sweeps * 1e3

    gate = 1e-5
    lanes.append(LaneResult(
        name="pallas_compiled_on_tpu",
        status="pass" if dev < gate else "fail",
        metrics={"span_rel_deviation_vs_xla": dev,
                 "ms_per_sweep_pallas": round(times["pallas"], 4),
                 "ms_per_sweep_xla": round(times["xla"], 4),
                 "grid": f"{nz}x{n}", "n_sweeps_per_call": n_sweeps,
                 "interpret_mode": False},
        thresholds={"span_rel_deviation_vs_xla": gate},
        notes="COMPILED (non-interpret) Pallas red-black SOR vs the XLA "
              "sweep path on the physical chip: the CI suite only runs "
              "the interpreter, so this lane is the hardware evidence"))

    path = write_report("pallas_tpu", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
