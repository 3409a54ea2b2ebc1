"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row-count + order-insensitive value hash (columns sorted by name).

Driver-faithful comparison (round-5 fix): the driver canonicalizes BOTH
sides through pandas (`toPandas()` vs duckdb `.df()`) and string-renders
cells before hashing, so an int64-vs-float64 dtype skew renders `5` vs
`5.0` and fails the hash even when the values are numerically identical
(the round-4 HUGEINT class). This tool therefore (a) compares through
pandas too, (b) renders floats at full precision, and (c) separately
flags any int-vs-float / numeric-vs-object dtype-kind skew per column.

Usage: python tools/check_oracle.py [--json OUT.json] [sf_dir] [query ...]

With --json, per-query verdicts are written in the driver's
CORRECTNESS_r*.json shape ({name: {rows_match, schema_match, hash_match,
spark_rows, oracle_rows, err}}) so a full-registry run produces a
machine-readable artifact (FULLREG_r*.json — VERDICT r7 #2) instead of
prose evidence; rows-only queries carry hash_match=null and
"err": "no_oracle" exactly as the driver records them.
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

from gohangout_spark import get_spark
from gohangout_spark.io import TABLES


def norm_cell(v):
    """Render one pandas cell the way a pandas string canonicalization
    would: dtype-visible (int 5 -> "5", float 5.0 -> "5.0"), NULL/NaN
    uniform, full float precision."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if v != v:
            return "NULL"  # pandas renders missing ints as NaN too
        return repr(float(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def pdf_hash(pdf: pd.DataFrame) -> str:
    cols = sorted(pdf.columns)
    lines = sorted(
        "|".join(norm_cell(row[c]) for c in cols)
        for row in pdf.to_dict("records")
    )
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind that matters for the driver's
    string canonicalization: i (int), f (float), b (bool), O (object/str),
    M (datetime)."""
    k = np.dtype(dt).kind if not isinstance(dt, pd.api.types.CategoricalDtype) else "O"
    return {"u": "i"}.get(k, k)


def dtype_skew(pdf_s: pd.DataFrame, pdf_d: pd.DataFrame) -> list[str]:
    """Columns whose dtype *kind* differs between the Spark and oracle
    frames — the exact class of failure the driver's hash surfaces as a
    mismatch (int-vs-float, numeric-vs-object)."""
    skew = []
    for c in pdf_s.columns:
        if c not in pdf_d.columns:
            continue
        ks, kd = dtype_kind(pdf_s[c].dtype), dtype_kind(pdf_d[c].dtype)
        if ks != kd:
            # A column that is ALL-null on both sides renders NULL either
            # way; anything else is a real skew.
            if pdf_s[c].isna().all() and pdf_d[c].isna().all():
                continue
            skew.append(f"{c}: spark={pdf_s[c].dtype} oracle={pdf_d[c].dtype}")
    return skew


def main():
    argv = sys.argv[1:]
    json_out = None
    resume = False
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--resume":
        # skip queries already recorded in the --json artifact: a sweep
        # interrupted on a long oracle restarts where it left off
        resume = True
        argv = argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}
    if resume and json_out:
        import os

        if os.path.exists(json_out):
            with open(json_out) as f:
                report = json.load(f)
            print(f"resuming past {len(report)} recorded queries")

    def checkpoint():
        if json_out:
            with open(json_out, "w") as f:
                json.dump(report, f, indent=2)

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if resume and name in report:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                # The driver canonicalizes with pandas: list/dict cells are
                # unhashable there.
                nonscalar = [
                    f"{f.name}:{f.dataType.simpleString()}"
                    for f in sdf.schema.fields
                    if any(
                        k in f.dataType.simpleString()
                        for k in ("array", "map", "struct")
                    )
                ]
                if nonscalar:
                    print(f"FAIL {name}: non-scalar oracle-checked columns {nonscalar}")
                    failures.append(name)
                    report[name] = {
                        "rows_match": False, "schema_match": False,
                        "hash_match": False, "spark_rows": None,
                        "oracle_rows": None,
                        "err": f"non-scalar columns {nonscalar}",
                    }
                    checkpoint()
                    continue
                pdf_s = sdf.toPandas()
            else:
                n_rows = sdf.count()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {e}"[:500],
            }
            checkpoint()
            continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only rows={n_rows} ({took:.1f}s)")
            report[name] = {
                "rows_match": True, "schema_match": True,
                "hash_match": None, "spark_rows": n_rows,
                "oracle_rows": None, "err": "no_oracle",
            }
            checkpoint()
            continue
        try:
            pdf_d = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(pdf_s),
                "oracle_rows": None, "err": f"duckdb: {e}"[:500],
            }
            checkpoint()
            continue
        ok_rows = len(pdf_s) == len(pdf_d)
        ok_cols = sorted(pdf_s.columns) == sorted(pdf_d.columns)
        skew = dtype_skew(pdf_s, pdf_d) if ok_cols else []
        sh, dh = pdf_hash(pdf_s), pdf_hash(pdf_d)
        ok_hash = sh == dh and not skew
        report[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(pdf_s),
            "oracle_rows": len(pdf_d), "err": None,
        }
        checkpoint()
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(pdf_s)}/{len(pdf_d)} cols_match={ok_cols} "
            f"hash_match={sh == dh} dtype_skew={len(skew)} ({took:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(
                    f"      spark cols: {sorted(pdf_s.columns)}\n"
                    f"      duck cols:  {sorted(pdf_d.columns)}"
                )
            for s in skew:
                print(f"      dtype skew — {s}")
            if ok_cols and sh != dh:
                cols = sorted(pdf_s.columns)
                sl = sorted(
                    "|".join(norm_cell(r[c]) for c in cols)
                    for r in pdf_s.to_dict("records")
                )
                dl = sorted(
                    "|".join(norm_cell(r[c]) for c in cols)
                    for r in pdf_d.to_dict("records")
                )
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"      spark: {a}\n      duck:  {b}")
                        break
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
