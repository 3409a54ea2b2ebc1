"""Ticker-parity tests for streaming/refresher.py (VERDICT r7 #8).

`_ReferenceTicker` below is an INDEPENDENT re-model of the reference's
in-process ticker (filter/link_metric.go: updateMetric :182-247,
swap_Metric_MetricToEmit :153-180, emitMetrics :247-264) — a dict of
bucket -> group -> count driven by (event_time, group) updates and
wall-clock ticks. The refresher, fed only the CHANGED-group running
totals our streaming operator emits (update output mode), must produce
the identical per-tick emission multiset on the itest-6 scenario
configurations (6-2: separate bw=1 rw=1; 6-3: cumulative bw=1 rw=1;
6-4: cumulative bw=1 rw=10 — the long re-emission case) plus a
windowOffset variant.
"""

from gohangout_spark.streaming.refresher import (
    LinkMetricTickRefresher,
    refreshing_foreach_batch,
)


class _ReferenceTicker:
    """Faithful model of link_metric.go's metric map + ticker."""

    def __init__(self, batch_window, reserve_window, window_offset, mode):
        self.bw, self.rw, self.off, self.mode = (
            batch_window, reserve_window, window_offset, mode,
        )
        self.metric = {}  # bucket -> {group: count}

    def update(self, ts, group, count=1):
        k = ts - ts % self.bw
        self.metric.setdefault(k, {})
        self.metric[k][group] = self.metric[k].get(group, 0) + count

    def tick(self, now):
        t = now - now % self.bw
        emit = {
            k: dict(groups)
            for k, groups in self.metric.items()
            if k <= t - self.bw * self.off
        }
        if self.mode == "separate":
            self.metric = {}
        else:
            self.metric = {
                k: v for k, v in self.metric.items() if k >= t - self.rw
            }
        return sorted(
            (k, g, c) for k, groups in emit.items() for g, c in groups.items()
        )


def _drive(cfg, script):
    """Run a (time, action) script through BOTH sides; return the two
    emission logs. Actions: ('ev', ts, group) event; ('tick', now).

    The refresher side receives what the streaming OPERATOR would emit
    per micro-batch — the updated running totals of groups that changed
    since the previous tick — so the source model must carry the
    operator's state semantics too: cumulative state expires at the
    reserve-window horizon (stateful.py's event-time timeout; a late
    event after expiry restarts the count, exactly like the reference's
    pruned map), and separate mode's counts reset every tick (the
    reference clears its whole map, link_metric.go:169)."""
    ref = _ReferenceTicker(*cfg)
    bw, rw, off, mode = cfg
    refr = LinkMetricTickRefresher(
        bw, ["g"], reserve_window=rw, window_offset=off, accumulate_mode=mode
    )
    running, changed = {}, set()
    ref_log, new_log = [], []
    for action in script:
        if action[0] == "ev":
            _, ts, group = action
            ref.update(ts, group)
            k = ts - ts % bw
            running[(k, group)] = running.get((k, group), 0) + 1
            changed.add((k, group))
        else:
            _, now = action
            ref_log.append(ref.tick(now))
            refr.observe(
                {"window_start": k, "g": g, "count": running[(k, g)]}
                for (k, g) in sorted(changed)
            )
            changed.clear()
            new_log.append(
                sorted((r["window_start"], r["g"], r["count"]) for r in refr.tick(now))
            )
            t = now - now % bw
            if mode == "separate":
                running = {}
            else:
                running = {
                    (k, g): c for (k, g), c in running.items() if k >= t - rw
                }
    return ref_log, new_log


class TestTickerParity:
    def test_itest_6_3_cumulative_short_reserve(self):
        # bw=1 rw=1 off=0 cumulative: a bucket re-emits while inside the
        # 1 s reserve, then expires
        cfg = (1, 1, 0, "cumulative")
        script = [
            ("ev", 100, "a"), ("ev", 100, "a"), ("ev", 100, "b"),
            ("tick", 101),
            ("tick", 102),            # idle: bucket 100 still in reserve? 102-1=101 > 100 -> pruned after tick 101's emission at... 101-1=100 -> kept; tick 102 line: 100 <= 102, emitted again? pruned first? see model
            ("ev", 102, "a"),
            ("tick", 103),
            ("tick", 104),
        ]
        ref_log, new_log = _drive(cfg, script)
        assert new_log == ref_log

    def test_itest_6_4_cumulative_long_reserve_idle_reemission(self):
        """The crux delta: rw=10 means an UNCHANGED bucket re-emits on
        every idle tick for 10 s — the behavior micro-batch update mode
        alone cannot produce."""
        cfg = (1, 10, 0, "cumulative")
        script = [("ev", 200, "x"), ("ev", 200, "y")]
        script += [("tick", 201 + i) for i in range(12)]
        ref_log, new_log = _drive(cfg, script)
        assert new_log == ref_log
        # bucket 200 appears on ticks while 200 >= t-10, then vanishes
        nonempty = [i for i, e in enumerate(new_log) if e]
        assert nonempty and len(nonempty) >= 10
        assert new_log[nonempty[-1] + 1 :] == [[]] * (12 - nonempty[-1] - 1)

    def test_itest_6_2_separate_emits_once(self):
        cfg = (1, 1, 0, "separate")
        script = [
            ("ev", 300, "a"), ("ev", 300, "a"),
            ("tick", 301),
            ("tick", 302),  # nothing: map cleared
            ("ev", 302, "a"),
            ("tick", 303),
        ]
        ref_log, new_log = _drive(cfg, script)
        assert new_log == ref_log
        assert new_log[0] == [(300, "a", 2)] and new_log[1] == []
        # separate mode restarts the count per emission window
        assert new_log[2] == [(302, "a", 1)]

    def test_window_offset_holds_back_young_buckets(self):
        cfg = (10, 100, 1, "cumulative")
        script = [
            ("ev", 1000, "g"),
            ("tick", 1005),   # line = 1000-10: bucket 1000 held back
            ("tick", 1010),   # line = 1000: emitted now
        ]
        ref_log, new_log = _drive(cfg, script)
        assert new_log == ref_log
        assert new_log[0] == [] and new_log[1] == [(1000, "g", 1)]

    def test_totals_update_between_ticks(self):
        """Re-emission carries the LATEST running total, and both sides
        agree when a bucket changes mid-retention."""
        cfg = (1, 5, 0, "cumulative")
        script = [
            ("ev", 400, "a"),
            ("tick", 401),
            ("ev", 400, "a"),  # late arrival into the same bucket
            ("tick", 402),
            ("tick", 403),
        ]
        ref_log, new_log = _drive(cfg, script)
        assert new_log == ref_log
        assert new_log[0] == [(400, "a", 1)]
        assert new_log[1] == [(400, "a", 2)]
        assert new_log[2] == [(400, "a", 2)]  # idle re-emission, updated total

    def test_randomized_parity(self):
        import random

        rng = random.Random(8)
        for mode in ("cumulative", "separate"):
            for off in (0, 1):
                cfg = (5, 15, off, mode)
                t = 10_000
                script = []
                for _ in range(200):
                    if rng.random() < 0.6:
                        script.append(
                            ("ev", t - rng.randrange(0, 20), rng.choice("abcd"))
                        )
                    else:
                        t += rng.randrange(1, 8)
                        script.append(("tick", t))
                ref_log, new_log = _drive(cfg, script)
                assert new_log == ref_log, (mode, off)


class TestNoneSafeGroupOrdering:
    def test_tick_with_null_group_field(self):
        """ADVICE r8: update-mode emissions can carry NULL group fields;
        ticking must not raise TypeError on None-vs-str comparison, and
        None groups sort after real values (deterministic order)."""
        refr = LinkMetricTickRefresher(
            60, ["g"], reserve_window=600, accumulate_mode="cumulative"
        )
        refr.observe([
            {"window_start": 960, "g": None, "count": 1},
            {"window_start": 960, "g": "a", "count": 2},
            {"window_start": 960, "g": "b", "count": 3},
        ])
        rows = refr.tick(1060)
        assert [r["g"] for r in rows] == ["a", "b", None]


class TestForeachBatchWiring:
    def test_refreshing_foreach_batch(self, spark):
        """Driver-side wiring over real DataFrames: two micro-batches,
        fixed clock; the sink sees the full retained set each tick."""
        refr = LinkMetricTickRefresher(
            60, ["g"], reserve_window=600, accumulate_mode="cumulative"
        )
        seen = []
        clock_vals = iter([1060, 1120])
        fb = refreshing_foreach_batch(
            lambda rows, bid: seen.append((bid, sorted(
                (r["window_start"], r["g"], r["count"]) for r in rows
            ))),
            refr,
            clock=lambda: next(clock_vals),
        )
        b0 = spark.createDataFrame(
            [(960, "a", 3)], "window_start long, g string, count long"
        )
        b1 = spark.createDataFrame([], "window_start long, g string, count long")
        fb(b0, 0)
        fb(b1, 1)  # idle batch: bucket re-emitted anyway
        assert seen == [
            (0, [(960, "a", 3)]),
            (1, [(960, "a", 3)]),
        ]


def test_max_groups_bound_evicts_oldest_windows_first():
    """VERDICT r8 watch item (b): the optional cardinality bound. Past
    max_groups retained rows, whole OLDEST windows drop first — the same
    order reserve-window expiry would retire them — and the newest
    window always survives (the bound never starves fresh state)."""
    from gohangout_spark.streaming.refresher import LinkMetricTickRefresher

    r = LinkMetricTickRefresher(
        batch_window=10, group_fields=["host"], reserve_window=10_000,
        max_groups=5,
    )
    for w in (100, 110, 120):
        r.observe(
            {"window_start": w, "host": f"h{i}", "count": 1} for i in range(3)
        )
    # 9 rows folded against a bound of 5: windows drop oldest-first
    # until within bound — 100 goes (6 left, still >5), then 110 (3
    # left, ok); the newest window survives intact
    assert sorted(r.retained) == [120]
    assert sum(len(v) for v in r.retained.values()) == 3
    # a single window is never evicted even when over the bound
    r2 = LinkMetricTickRefresher(
        batch_window=10, group_fields=["host"], max_groups=2,
    )
    r2.observe({"window_start": 100, "host": f"h{i}"} for i in range(4))
    assert sorted(r2.retained) == [100]
    assert len(r2.retained[100]) == 4


def test_max_groups_default_is_reference_parity():
    from gohangout_spark.streaming.refresher import LinkMetricTickRefresher

    r = LinkMetricTickRefresher(batch_window=10, group_fields=["host"])
    r.observe(
        {"window_start": w, "host": f"h{i}"}
        for w in range(0, 1000, 10) for i in range(5)
    )
    assert sum(len(v) for v in r.retained.values()) == 500  # unbounded
