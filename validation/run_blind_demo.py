#!/usr/bin/env python
"""GDEP-03 blind validation on the EU-DEMO / K-DEMO synthetic holdout.

Counterpart of the reference's deterministic blind-validation dashboard
(``/root/reference/validation/gdep_03_blind_validation.py:8-220``): the
two committed synthetic blind holdout tables
(``reference_data/blind/{eu_demo,k_demo}_reference.json``, read-only)
are scored with IPB98(y,2) tau_E plus the reference's published
deterministic beta_N and core-edge-match proxy models, gated with the
REFERENCE'S OWN thresholds:

    tau RMSE <= 0.35 s, beta_N RMSE <= 0.15, core-edge RMSE <= 0.02,
    parity >= 95%   (per machine AND aggregate)

House deltas: the per-shot loop becomes one vectorised jnp evaluation
over the whole table; the report is a checksummed fail-closed evidence
lane (``utils/evidence.py``) instead of a standalone dashboard JSON.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BLIND_DIR = Path("/root/reference/validation/reference_data/blind")
BLIND_FILES = ("eu_demo_reference.json", "k_demo_reference.json")

THRESHOLDS = {
    "max_tau_rmse_s": 0.35,
    "max_beta_rmse": 0.15,
    "max_core_edge_rmse": 0.02,
    "min_parity_pct": 95.0,
}


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from scpn_fusion_tpu.models.physics.scaling_burn import ipb98y2_tau_e
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []

    if not all((BLIND_DIR / f).exists() for f in BLIND_FILES):
        lanes.append(LaneResult(
            name="blind_demo_holdout", status="blocked",
            notes="blind reference tables absent from the read-only "
                  "reference tree"))
        path = write_report("blind_demo", lanes)
        print(f"wrote {path}")
        return 1

    def evaluate(rows):
        """Vectorised tau/beta/core-edge scoring of one shot table."""
        col = lambda k: jnp.asarray([float(r[k]) for r in rows])  # noqa: E731
        ip, bt, ne = col("I_p_MA"), col("B_t_T"), col("n_e_1e19")
        pl, rm, am = col("P_loss_MW"), col("R_m"), col("a_m")
        kappa, aeff = col("kappa"), col("A_eff_amu")
        tau_meas, beta_meas = col("tau_E_s"), col("beta_N")
        core_meas = col("core_edge_match")

        tau = ipb98y2_tau_e(ip, bt, ne, pl, rm, kappa, am / rm, aeff)
        # Reference's deterministic blind-diagnostic proxies
        # (gdep_03_blind_validation.py:61-83).
        beta = (10.0 * 0.18 * ne * (tau / 5.0) * (pl / 100.0) ** 0.25
                / bt ** 1.35 * (rm / 6.0) ** 0.3 * (ip / 15.0) ** 0.2)
        core = jnp.clip(0.90 + 0.04 * jnp.tanh((tau - 3.5) / 2.0)
                        + 0.03 * jnp.tanh((beta - 1.6) / 0.8), 0.82, 0.995)

        def rmse(a, b):
            return float(jnp.sqrt(jnp.mean((a - b) ** 2)))

        def mae_rel_pct(t, p):
            return float(jnp.mean(jnp.abs(t - p)
                                  / jnp.maximum(jnp.abs(t), 1e-9)) * 100.0)

        tau_rmse = rmse(tau_meas, tau)
        beta_rmse = rmse(beta_meas, beta)
        core_rmse = rmse(core_meas, core)
        parity = max(0.0, 100.0 - float(np.mean([
            mae_rel_pct(tau_meas, tau), mae_rel_pct(beta_meas, beta),
            float(jnp.mean(jnp.abs(core_meas - core)) * 100.0)])))
        ok = (tau_rmse <= THRESHOLDS["max_tau_rmse_s"]
              and beta_rmse <= THRESHOLDS["max_beta_rmse"]
              and core_rmse <= THRESHOLDS["max_core_edge_rmse"]
              and parity >= THRESHOLDS["min_parity_pct"])
        return {"count": len(rows), "tau_rmse_s": tau_rmse,
                "beta_rmse": beta_rmse, "core_edge_rmse": core_rmse,
                "parity_pct": parity}, ok

    all_rows = []
    for fname in BLIND_FILES:
        payload = json.loads((BLIND_DIR / fname).read_text())
        machine = str(payload["machine"])
        rows = payload.get("shots", [])
        all_rows.extend(rows)
        metrics, ok = evaluate(rows)
        lanes.append(LaneResult(
            name=f"blind_{machine.lower().replace('-', '_')}",
            status="pass" if ok else "fail",
            metrics=metrics,
            thresholds=dict(THRESHOLDS),
            notes=f"{machine} synthetic blind holdout "
                  f"({payload.get('dataset', '?')}), scored with "
                  "IPB98(y,2) + the reference's deterministic beta_N and "
                  "core-edge proxies; gates are the reference's own "
                  "(gdep_03_blind_validation.py:183-188)"))

    metrics, ok = evaluate(all_rows)
    lanes.append(LaneResult(
        name="blind_aggregate", status="pass" if ok else "fail",
        metrics=metrics, thresholds=dict(THRESHOLDS),
        notes="EU-DEMO + K-DEMO pooled aggregate gate"))

    path = write_report("blind_demo", lanes)
    print(f"wrote {path}")
    for lane in lanes:
        print(f"  {lane.name}: {lane.status} {lane.metrics}")
    return 0 if all(l.status == "pass" for l in lanes) else 1


if __name__ == "__main__":
    raise SystemExit(main())
