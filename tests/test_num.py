"""Cross-engine guarantee of functions.num.round_half_up: the Spark floor
form and the DuckDB floor form must produce BIT-IDENTICAL doubles for the
ratio class the oracles round — including values exactly on the .5
boundary where engine round() modes disagree."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gohangout_spark.functions.num import round_half_up


@pytest.fixture(scope="module")
def ratio_cases():
    cases = []
    # exhaustive small rationals incl. every power-of-two denominator that
    # lands exactly on the 4-digit half boundary (1/32 -> 312.5 etc.)
    for b in [1, 2, 3, 7, 16, 20, 32, 64, 128, 20000]:
        for a in range(0, min(b, 50) + 1):
            cases.append((a, b))
    # negatives (zscore-class)
    cases += [(-a, b) for a, b in cases[:60] if a]
    return cases


def test_spark_matches_duckdb_floor_form(spark, ratio_cases):
    df = spark.createDataFrame(ratio_cases, "a long, b long")
    got = {
        (r["a"], r["b"]): r["r"]
        for r in df.select(
            "a", "b",
            round_half_up(F.col("a").cast("double") / F.col("b"), 4).alias("r"),
        ).collect()
    }
    con = duckdb.connect()
    for a, b in ratio_cases:
        (want,) = con.execute(
            f"SELECT floor(CAST({a} AS DOUBLE) / {b} * 1e4 + 0.5) / 1e4"
        ).fetchone()
        assert got[(a, b)] == want, (a, b, got[(a, b)], want)


def test_boundary_is_engine_mode_independent(spark):
    """The motivating case: 1/32 * 1e4 = 312.5 exactly. round() half-even
    gives 0.0312, half-away gives 0.0313 — the floor form gives 0.0313 on
    both engines regardless of their round() build."""
    df = spark.createDataFrame([(1, 32)], "a long, b long")
    r = df.select(
        round_half_up(F.col("a").cast("double") / F.col("b"), 4).alias("r")
    ).first()["r"]
    assert r == 0.0313
    (d,) = duckdb.sql("SELECT floor(1.0 / 32 * 1e4 + 0.5) / 1e4").fetchone()
    assert d == r


def test_null_propagates(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(round_half_up(F.col("x"), 4).alias("r")).first()["r"] is None
