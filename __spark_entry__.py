"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (TPC-H q3-style join+agg through the engine).
queries()     — one callable per implemented operator (SURVEY.md §2 + the
                LLM-data-pipeline extensions); see gohangout_spark.workload.
oracle_sql()  — DuckDB-equivalent SQL per query (None → rows-only check for
                genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gohangout_spark.workload import QUERIES

    return QUERIES["tpch_q3"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gohangout_spark.workload import QUERIES

    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from gohangout_spark.workload import QUERIES

    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
