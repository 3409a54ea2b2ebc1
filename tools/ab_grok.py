"""A/B: Grok per-field regexp_extract chain vs one-shot replace+split.

Current Grok shape (per row, one pattern, N fields): 1 rlike + N
regexp_extract = N+1 full regex evaluations of the same pattern.
Candidate (guide §4.1-class per-row CPU): evaluate the regex ONCE via
regexp_replace over a whole-string-wrapped pattern emitting every group
joined by a \\x01 sentinel, split once, read N array elements; rows
containing the sentinel fall back to the per-field extract so the
result is identical on any input. The split column must be its own
projection (CollapseProject keeps it: non-cheap, referenced N times) —
inside the per-field whens, codegen CSE would NOT share it (conditional
branch position), which is the same trap the r9 bind-once work
documented.

Usage: python tools/ab_grok.py [rounds]
"""

from __future__ import annotations

import sys

from ab_bench import run_ab

from pyspark.sql import functions as F

PAT = r"^(\w+) uid=(\d+)$"
ETL_PAT = r"^(\w+) (\d+) (\S+)$"
SEP = "\x01"


def _line2(spark, sf_dir):
    from gohangout_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "line",
        F.concat("event_type", F.lit(" uid="), F.col("user_id").cast("string")),
    )


def _line3(spark, sf_dir):
    from gohangout_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn(
        "line",
        F.concat(
            "event_type",
            F.lit(" "),
            (F.col("user_id") % 500 + 100).cast("string"),
            F.lit(" "),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'"),
        ),
    )


def _blank(e):
    return F.transform(F.array(e), lambda x: F.when(x != "", x))[0]


def cur(df, pat, nfields):
    col = F.col("line").cast("string")
    m = col.rlike(pat)
    outs = [
        F.when(m, _blank(F.regexp_extract(col, pat, i + 1))).alias(f"f{i}")
        for i in range(nfields)
    ]
    return df.select("event_id", *outs, F.coalesce(m, F.lit(False)).alias("ok"))


def fast(df, pat, nfields):
    col = F.col("line").cast("string")
    m = col.rlike(pat)
    wrapped = r"\A(?s:.*?)(?:" + pat + r")(?s:.*)\z"
    repl = SEP.join(f"${i + 1}" for i in range(nfields))
    arr = F.when(
        m & ~col.contains(SEP), F.split(F.regexp_replace(col, wrapped, repl), SEP, -1)
    )
    pre = df.withColumns({"__m": m, "__arr": arr})
    mm = F.col("__m")
    aa = F.col("__arr")
    outs = [
        F.when(
            mm,
            _blank(
                F.when(aa.isNotNull(), F.element_at(aa, i + 1)).otherwise(
                    F.regexp_extract(col, pat, i + 1)
                )
            ),
        ).alias(f"f{i}")
        for i in range(nfields)
    ]
    return pre.select("event_id", *outs, F.coalesce(mm, F.lit(False)).alias("ok"))


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    run_ab(
        {
            "grok2_cur": lambda s, d: cur(_line2(s, d), PAT, 2),
            "grok2_fast": lambda s, d: fast(_line2(s, d), PAT, 2),
            "grok3_cur": lambda s, d: cur(_line3(s, d), ETL_PAT, 3),
            "grok3_fast": lambda s, d: fast(_line3(s, d), ETL_PAT, 3),
        },
        rounds=rounds,
    )
