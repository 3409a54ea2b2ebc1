"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf, compare
row-count + order-insensitive value hash (columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from gohangout_spark import get_spark
from gohangout_spark.io import TABLES


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

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
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name in oracles:
            # The driver canonicalizes with a pandas sort: list/dict cells are
            # unhashable there even though our local hash handles them.
            nonscalar = [
                f"{f.name}:{f.dataType.simpleString()}"
                for f in sdf.schema.fields
                if any(k in f.dataType.simpleString() for k in ("array", "map", "struct"))
            ]
            if nonscalar:
                print(f"FAIL {name}: non-scalar oracle-checked columns {nonscalar}")
                failures.append(name)
                continue
        took = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only rows={len(srows)} ({took:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = table_hash(srows, scols)
        dh = table_hash(drows, dcols)
        ok_hash = sh == dh
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols_match={ok_cols} "
            f"hash_match={ok_hash} ({took:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}\n      duck cols:  {sorted(dcols)}")
            if ok_cols and not ok_hash:
                # show first differing normalized line
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sl = sorted("|".join(norm(r[i]) for i in order) for r in srows)
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                dl = sorted("|".join(norm(r[i]) for i in dorder) for r in drows)
                for a, b in zip(sl, dl):
                    if a != b:
                        print(f"      spark: {a}\n      duck:  {b}")
                        break
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
