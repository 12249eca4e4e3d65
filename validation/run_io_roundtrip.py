#!/usr/bin/env python
"""I/O round-trip interchange campaign (GEQDSK <-> IMAS <-> solver).

Mirrors the reference's interchange lanes (`validation/
torax_imas_interchange.py`, `benchmark_sparc_geqdsk_rmse.py` file
handling, `core/eqdsk.py` writer/tokenizer contracts):

1. geqdsk_write_read_roundtrip — a SOLVED equilibrium exported via
   `geqdsk_from_solution` -> `write_geqdsk` -> `read_geqdsk` reproduces
   every field at format precision (the 16-char Fortran fixed-width
   format carries ~10 significant digits).
2. external_reader_compat — every 16-char field of the written file
   parses with a plain `float()` (the round-2 advisor regression: bare-
   exponent forms must appear ONLY when the standard E form overflows
   16 columns); 3-digit-exponent values still round-trip through OUR
   tokenizer.
3. sparc_efit_reparse — the real SPARC EFIT files (read-only reference
   data) re-serialised by our writer and re-read land within format
   precision of the original parse (no information loss on real files).
4. imas_ids_roundtrip — GEqdsk -> equilibrium IDS -> GEqdsk is lossless
   at f64, and the IDS validates against the schema contract.
5. solve_from_roundtripped — the round-tripped file drives
   `eqdsk_solve` to the same converged psi as the original (span-rel).
"""

import json
import math
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

SPARC_DIR = Path("/root/reference/validation/reference_data/sparc")


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import dataclasses

    from scpn_fusion_tpu.io.geqdsk import (
        GEqdsk, geqdsk_from_solution, read_geqdsk, write_geqdsk)
    from scpn_fusion_tpu.io.imas_ids import (
        equilibrium_ids_to_geqdsk, geqdsk_to_equilibrium_ids,
        validate_equilibrium_ids)
    from scpn_fusion_tpu.core.config import (
        Coil, Dimensions, PhysicsParams, ReactorConfig, SolverParams)
    from scpn_fusion_tpu.models.equilibrium import solve_equilibrium
    from scpn_fusion_tpu.utils.evidence import LaneResult, write_report

    lanes = []
    tmp = Path(tempfile.mkdtemp(prefix="io_roundtrip_"))

    # Solve a real equilibrium to export.
    cfg = ReactorConfig(
        reactor_name="io-roundtrip",
        grid_resolution=(65, 65),
        dimensions=Dimensions(R_min=2.0, R_max=10.0, Z_min=-4.0, Z_max=4.0),
        coils=(Coil(r=3.5, z=4.8, current=-1.0), Coil(r=8.0, z=4.8, current=4.0),
               Coil(r=10.8, z=0.0, current=6.0), Coil(r=8.0, z=-4.8, current=4.0),
               Coil(r=3.5, z=-4.8, current=-1.0), Coil(r=10.8, z=2.5, current=3.0)),
        physics=PhysicsParams(plasma_current_target=150.0,
                              vacuum_permeability=1.0),
        solver=SolverParams(max_iterations=200, convergence_threshold=1e-5,
                            relaxation_factor=0.1, solver_method="multigrid"))
    res = solve_equilibrium(cfg)
    assert bool(res.converged)
    eq0 = geqdsk_from_solution(cfg, res)

    # ── Lane 1: write -> read field-level round-trip ──
    p = tmp / "solved.geqdsk"
    write_geqdsk(eq0, p)
    eq1 = read_geqdsk(p)
    worst = 0.0
    fields = {}
    for f in dataclasses.fields(GEqdsk):
        a = np.asarray(getattr(eq0, f.name))
        b = np.asarray(getattr(eq1, f.name))
        if a.dtype.kind not in "fc" or a.size == 0:
            ok = bool(np.array_equal(a, b))
            if not ok:
                fields[f.name] = "mismatch"
            continue
        scale = max(float(np.max(np.abs(a))), 1e-30)
        rel = float(np.max(np.abs(a - b))) / scale
        fields[f.name] = rel
        worst = max(worst, rel)
    gate = 1e-9      # 16-char E-format carries ~10 significant digits
    lanes.append(LaneResult(
        name="geqdsk_write_read_roundtrip",
        status="pass" if worst <= gate else "fail",
        metrics={"worst_field_rel": worst,
                 "psi_rel": fields.get("psirz", 0.0),
                 "n_fields": len(fields)},
        thresholds={"worst_field_rel": gate},
        notes="solved 65x65 equilibrium through geqdsk_from_solution"))

    # ── Lane 2: external fixed-width reader compatibility ──
    bad_fields = 0
    n_fields = 0
    for line in p.read_text().splitlines()[1:]:
        toks = line.split()
        if toks and all(t.lstrip("+-").isdigit() for t in toks):
            continue  # the 2i5 nbbbs/limitr counts line is integer-formatted
        for i in range(0, len(line), 16):
            tok = line[i:i + 16].strip()
            if not tok:
                continue
            n_fields += 1
            try:
                v = float(tok)
                if not math.isfinite(v):
                    bad_fields += 1
            except ValueError:
                bad_fields += 1
    # 3-digit-exponent bare form must still round-trip through our reader
    eq_tiny = dataclasses.replace(
        eq0, sibry=float(eq0.sibry), simag=-1.5e-101)
    p_tiny = tmp / "tiny.geqdsk"
    try:
        write_geqdsk(eq_tiny, p_tiny)
        tiny_ok = abs(read_geqdsk(p_tiny).simag - (-1.5e-101)) <= 1e-110
    except Exception:
        tiny_ok = False
    lanes.append(LaneResult(
        name="external_reader_compat",
        status="pass" if (bad_fields == 0 and tiny_ok) else "fail",
        metrics={"n_fields": n_fields, "float_unparseable": bad_fields,
                 "bare_exponent_roundtrip": tiny_ok},
        thresholds={"float_unparseable": 0},
        notes="every 16-char field float()s (round-2 advisor regression "
              "gate); 3-digit exponents still round-trip via our tokenizer"))

    # ── Lane 3: real SPARC EFIT files re-serialise losslessly ──
    if SPARC_DIR.exists():
        files = sorted(SPARC_DIR.glob("*.geqdsk")) or sorted(
            SPARC_DIR.glob("g*.*"))
        worst_sparc, n_ok = 0.0, 0
        for src in files[:5]:
            try:
                eq_a = read_geqdsk(src)
            except Exception:
                continue
            q = tmp / f"re_{src.name}"
            write_geqdsk(eq_a, q)
            eq_b = read_geqdsk(q)
            span = float(np.ptp(np.asarray(eq_a.psirz))) or 1.0
            rel = float(np.max(np.abs(np.asarray(eq_a.psirz)
                                      - np.asarray(eq_b.psirz)))) / span
            worst_sparc = max(worst_sparc, rel)
            n_ok += 1
        status = "pass" if (n_ok >= 3 and worst_sparc <= 1e-9) else (
            "blocked" if n_ok == 0 else "fail")
        lanes.append(LaneResult(
            name="sparc_efit_reparse",
            status=status,
            metrics={"n_files": n_ok, "worst_psi_span_rel": worst_sparc},
            thresholds={"worst_psi_span_rel": 1e-9, "min_files": 3},
            notes="real SPARC EFIT equilibria re-serialised by our writer"))
    else:
        lanes.append(LaneResult(name="sparc_efit_reparse", status="blocked",
                                notes="SPARC reference data absent"))

    # ── Lane 4: IMAS equilibrium IDS round-trip ──
    ids = geqdsk_to_equilibrium_ids(eq0)
    validate_equilibrium_ids(ids)
    eq2 = equilibrium_ids_to_geqdsk(ids)
    worst_ids = 0.0
    for f in dataclasses.fields(GEqdsk):
        a = np.asarray(getattr(eq0, f.name))
        b = np.asarray(getattr(eq2, f.name))
        if a.dtype.kind not in "fc" or a.size == 0:
            continue
        scale = max(float(np.max(np.abs(a))), 1e-30)
        worst_ids = max(worst_ids, float(np.max(np.abs(a - b))) / scale)
    lanes.append(LaneResult(
        name="imas_ids_roundtrip",
        status="pass" if worst_ids <= 1e-12 else "fail",
        metrics={"worst_field_rel": worst_ids},
        thresholds={"worst_field_rel": 1e-12},
        notes="GEqdsk -> equilibrium IDS -> GEqdsk lossless at f64; IDS "
              "schema-validated"))

    # ── Lane 5: round-tripped file drives the solver to the same psi ──
    from scpn_fusion_tpu.models.equilibrium.eqdsk_solve import solve_from_geqdsk
    r_a = solve_from_geqdsk(eq0)
    r_b = solve_from_geqdsk(eq1)
    span = float(np.ptp(np.asarray(r_a.psi))) or 1.0
    dev = float(np.max(np.abs(np.asarray(r_a.psi)
                              - np.asarray(r_b.psi)))) / span
    ok = bool(r_a.converged) and bool(r_b.converged) and dev <= 1e-6
    lanes.append(LaneResult(
        name="solve_from_roundtripped",
        status="pass" if ok else "fail",
        metrics={"span_rel_dev": dev,
                 "converged_a": bool(r_a.converged),
                 "converged_b": bool(r_b.converged)},
        thresholds={"span_rel_dev": 1e-6},
        notes="format-precision file perturbation does not move the "
              "converged fixed point beyond solver tolerance"))

    path = write_report("io_roundtrip", lanes)
    overall = json.loads(path.read_text())["overall_status"]
    print(json.dumps({"overall": overall,
                      "lanes": {l.name: l.status for l in lanes}}))
    return 0 if overall == "pass" else 1


if __name__ == "__main__":
    raise SystemExit(main())
