#!/usr/bin/env python
"""Sharded-GS real-chip lane: the distributed program on the TPU.

One physical chip is available in this image, so this lane runs the
``shard_map`` program at n_shards=1 ON THE REAL TPU and checks (a)
numerical parity with the plain XLA sweep path and (b) the distributed
program's wall-clock overhead at the 513^2 headline size — the
single-chip end of the scaling story (VERDICT r1 weak #6: "no
sharded-GS wall-clock datapoint at all").  Multi-shard execution is
covered on the virtual CPU mesh by run_sharded_gs.py; on hardware with
more chips this same program scales by constructing a larger mesh.
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
    from scpn_fusion_tpu.ops.stencil import gs_operator, sor_sweeps
    from scpn_fusion_tpu.parallel.halo import make_z_mesh, sharded_sor_solve
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []
    backend = jax.default_backend()
    if backend != "tpu":
        lanes.append(LaneResult(
            name="sharded_program_on_tpu", status="blocked",
            notes=f"needs the real TPU chip; backend is {backend!r}. "
                  "blocked != pass"))
        write_report("sharded_gs_tpu", lanes)
        print("blocked: no TPU")
        return 1

    dtype = jnp.float32
    n = 513
    nz = 512          # shard-divisible Z extent at the headline scale
    grid = Grid.from_bounds(n, nz, 2.0, 10.0, -4.0, 4.0, dtype=np.float32)
    rr, zz = np.asarray(grid.RR), np.asarray(grid.ZZ)
    psi_exact = jnp.asarray(np.exp(-((rr - 6.0) ** 2 + zz**2) / 3.0), dtype)
    src = gs_operator(psi_exact, grid.R, grid.dR, grid.dZ)
    rng = np.random.default_rng(7)
    psi0 = jnp.asarray(np.asarray(psi_exact)
                       + 0.05 * rng.standard_normal(grid.shape), dtype)
    n_sweeps = 200
    span = float(jnp.max(psi_exact) - jnp.min(psi_exact))

    mesh = make_z_mesh(1)
    args = dict(mesh=mesh, axis="z", d_r=grid.dR, d_z=grid.dZ,
                n_sweeps=n_sweeps, nz_total=grid.NZ)
    omega = jnp.asarray(1.7, dtype)

    # Timings force a device->host fetch: block_until_ready is not a
    # reliable completion barrier over the remote TPU tunnel (measured).
    out, _ = sharded_sor_solve(psi0, src, grid.R, omega, **args)
    np.asarray(out)
    t0 = time.perf_counter()
    out, _ = sharded_sor_solve(psi0, src, grid.R, omega, **args)
    np.asarray(out)
    t_shard = (time.perf_counter() - t0) / n_sweeps * 1e3

    plain = sor_sweeps(psi0, src, grid.R, grid.dR, grid.dZ, 1.7, n_sweeps)
    np.asarray(plain)
    t0 = time.perf_counter()
    plain = sor_sweeps(psi0, src, grid.R, grid.dR, grid.dZ, 1.7, n_sweeps)
    np.asarray(plain)
    t_plain = (time.perf_counter() - t0) / n_sweeps * 1e3

    dev = float(jnp.max(jnp.abs(out - plain))) / span
    gate = 1e-5   # f32 on-chip reduction-order differences allowed
    lanes.append(LaneResult(
        name="sharded_program_on_tpu",
        status="pass" if dev < gate else "fail",
        metrics={"span_rel_deviation_vs_plain": dev,
                 "ms_per_sweep_shardmap": round(t_shard, 4),
                 "ms_per_sweep_plain": round(t_plain, 4),
                 "overhead_ratio": round(t_shard / max(t_plain, 1e-9), 3),
                 "grid": f"{nz}x{n}", "n_sweeps": n_sweeps},
        thresholds={"span_rel_deviation_vs_plain": gate},
        notes="shard_map distributed program at n_shards=1 on the real "
              "chip: numerical parity + dispatch overhead at the 513^2 "
              "headline size; multi-shard correctness on the CPU mesh is "
              "run_sharded_gs.py"))

    path = write_report("sharded_gs_tpu", lanes)
    print(f"wrote {path}")
    return 0 if all(lane.status == "pass" for lane in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
