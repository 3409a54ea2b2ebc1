"""Strict-parity cumulative LinkMetric as a custom stateful streaming op.

The reference's ``accumulateMode: cumulative`` re-emits the RUNNING total for
a (window, fields...) group every emission tick while keeping state for
``reserveWindow`` seconds (/root/reference/filter/link_metric.go:169-179,
214-219). Spark's built-in windowed aggregation in ``update`` output mode is
the 95% answer (gohangout_spark.operators.metrics); what it cannot reproduce
is state lifetime decoupled from the aggregation window. This module closes
that gap with ``applyInPandasWithState``:

- group key: (window_start, *fields) where window_start = event-time bucket
  ``ts - ts % batchWindow`` (link_metric.go:219)
- per micro-batch: add the batch's rows into the group's running stats and
  emit the updated totals (cumulative re-emission)
- state expiry: event-time timeout at window_end + reserveWindow — the exact
  ``reserveWindow`` retention rule, enforced by the state store.

Scale: state is O(live groups × a few longs), partitioned by group hash
across executors; RocksDB state store handles beyond-memory cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from gohangout_spark.expr.paths import field_col


def cumulative_link_metric_stream(
    df: DataFrame,
    fields_link: str,
    batch_window: int,
    reserve_window: int | None = None,
    ts_field: str = "@timestamp",
    stats_field: str | None = None,
) -> DataFrame:
    """Streaming DataFrame → cumulative metric stream.

    Without ``stats_field``: emits (window_start, *fields, count).
    With ``stats_field`` (LinkStatsMetric shape): adds min/max/sum/mean.
    ``fields_link`` is the GROUP chain (a->b); the aggregated numeric field
    goes in ``stats_field``.
    """
    group_fields = [f.strip() for f in fields_link.split("->") if f.strip()]
    if not group_fields:
        raise ValueError(
            "cumulative_link_metric_stream: empty group chain — for the stats "
            "variant fieldsLink must be 'group...->value' with the numeric "
            "value field last"
        )
    reserve = int(reserve_window or batch_window)
    n_fields = len(group_fields)
    has_stats = stats_field is not None

    ts = field_col(ts_field, df)
    bucket = F.timestamp_seconds(
        (F.unix_timestamp(ts) - F.unix_timestamp(ts) % batch_window)
    ).alias("window_start")

    cols = [bucket] + [
        field_col(f, df).cast("string").alias(f"__k{i}")
        for i, f in enumerate(group_fields)
    ]
    if has_stats:
        cols.append(field_col(stats_field, df).cast("double").alias("__v"))
    src = df.select(*cols).withWatermark("window_start", f"{reserve} seconds")

    key_ddl = ", ".join(f"__k{i} string" for i in range(n_fields))
    if has_stats:
        out_schema = (
            f"window_start timestamp, {key_ddl}, count long, "
            "min double, max double, sum double, mean double"
        )
        state_schema = "count long, min double, max double, sum double"
        out_cols = ["window_start", *[f"__k{i}" for i in range(n_fields)],
                    "count", "min", "max", "sum", "mean"]
    else:
        out_schema = f"window_start timestamp, {key_ddl}, count long"
        state_schema = "count long"
        out_cols = ["window_start", *[f"__k{i}" for i in range(n_fields)], "count"]

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # reserveWindow elapsed: drop state (link_metric.go expiry —
            # totals were already emitted cumulatively)
            state.remove()
            return
        window_start = key[0]
        if has_stats:
            cnt, mn, mx, sm = state.get if state.exists else (0, None, None, 0.0)
            for pdf in pdfs:
                v = pdf["__v"].dropna()
                if len(v):
                    cnt += int(len(v))
                    bmin, bmax = float(v.min()), float(v.max())
                    mn = bmin if mn is None else min(mn, bmin)
                    mx = bmax if mx is None else max(mx, bmax)
                    sm += float(v.sum())
            state.update((cnt, mn, mx, sm))
            row = (window_start, *key[1:], cnt, mn, mx, sm, (sm / cnt) if cnt else None)
        else:
            (cnt,) = state.get if state.exists else (0,)
            for pdf in pdfs:
                cnt += int(len(pdf))
            state.update((cnt,))
            row = (window_start, *key[1:], cnt)
        # event-time timeout at window_end + reserveWindow; the key arrives
        # as a tz-naive datetime in the SESSION timezone (pinned UTC by the
        # engine) — timegm treats it as UTC regardless of the worker's OS tz
        # (naive .timestamp() would re-interpret it in the OS zone)
        import calendar

        epoch = calendar.timegm(window_start.timetuple())
        expiry_ms = int((epoch + batch_window + reserve) * 1000)
        try:
            state.setTimeoutTimestamp(expiry_ms)
        except Exception:
            # expiry already behind the watermark: without a registered
            # timeout the group would never be re-invoked and its state
            # would leak — anchor the timeout just past the watermark
            try:
                state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
            except Exception:
                state.remove()
        yield pd.DataFrame([row], columns=out_cols)

    out = src.groupBy(
        "window_start", *[f"__k{i}" for i in range(n_fields)]
    ).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    for i, f in enumerate(group_fields):
        out = out.withColumnRenamed(f"__k{i}", f)
    return out
