"""As-of join (union-tag + forward-fill window) and multi-resolution
rollup on hand-built fixtures with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.operators import temporal


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).withColumn("ts", F.col("ts"))


def _t(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


class TestAsofJoin:
    def test_backward_match_tie_and_miss(self, spark):
        lefts = spark.createDataFrame(
            [
                (10, 1, _t("2024-01-01 00:00:05")),  # after r1, before r2
                (11, 1, _t("2024-01-01 00:00:10")),  # ties r2 exactly
                (12, 2, _t("2024-01-01 00:00:01")),  # user 2 has no right
                (13, 3, _t("2024-01-01 00:00:02")),  # right exists but later
            ],
            "event_id long, user_id long, ts timestamp",
        )
        rights = spark.createDataFrame(
            [
                (1, 1, _t("2024-01-01 00:00:03")),
                (2, 1, _t("2024-01-01 00:00:10")),
                (3, 3, _t("2024-01-01 00:00:09")),
            ],
            "event_id long, user_id long, ts timestamp",
        )
        out = {
            r["event_id"]: r
            for r in temporal.asof_join(lefts, rights).collect()
        }
        assert out[10]["asof_event_id"] == 1
        assert out[11]["asof_event_id"] == 2  # ts tie -> right visible
        assert out[12]["asof_event_id"] is None
        assert out[13]["asof_event_id"] is None
        assert out[10]["asof_ts"] == _t("2024-01-01 00:00:03")

    def test_equal_ts_rights_pick_max_event_id(self, spark):
        lefts = spark.createDataFrame(
            [(10, 1, _t("2024-01-01 00:00:05"))],
            "event_id long, user_id long, ts timestamp",
        )
        rights = spark.createDataFrame(
            [
                (7, 1, _t("2024-01-01 00:00:02")),
                (9, 1, _t("2024-01-01 00:00:02")),
                (8, 1, _t("2024-01-01 00:00:02")),
            ],
            "event_id long, user_id long, ts timestamp",
        )
        out = temporal.asof_join(lefts, rights).collect()[0]
        assert out["asof_event_id"] == 9

    def test_plan_is_window_not_nested_loop(self, spark):
        lefts = spark.createDataFrame(
            [(1, 1, _t("2024-01-01 00:00:01"))],
            "event_id long, user_id long, ts timestamp",
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            temporal.asof_join(lefts, lefts).explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" in plan


class TestMultiresRollup:
    def test_ladder_levels_are_consistent(self, spark):
        ev = _ev(spark, [
            (1, 1, _t("2024-01-01 00:10:00"), 1.0),
            (2, 1, _t("2024-01-01 00:50:00"), 2.0),
            (3, 1, _t("2024-01-01 01:10:00"), 4.0),
            (4, 1, _t("2024-01-02 05:00:00"), 8.0),
        ])
        rows = temporal.multires_rollup(ev).collect()
        by_grp = {}
        for r in rows:
            by_grp.setdefault(r["grp"], []).append(r)
        # fine level: 3 hours; day level: 2 days; grand total: 1
        assert len(by_grp[0]) == 3
        assert len(by_grp[1]) == 2
        assert len(by_grp[3]) == 1
        total = by_grp[3][0]
        assert total["n_events"] == 4 and total["sum_value"] == 15.0
        day1 = [r for r in by_grp[1] if str(r["day"]).startswith("2024-01-01")][0]
        assert day1["n_events"] == 3 and day1["sum_value"] == 7.0
        # every ladder level sums to the same total (the rollup invariant)
        assert sum(r["n_events"] for r in by_grp[0]) == 4
        assert sum(r["sum_value"] for r in by_grp[1]) == 15.0


class TestRangeJoin:
    def test_containment_and_multi_interval(self, spark):
        facts = spark.createDataFrame(
            [
                (1, _t("2024-01-01 00:30:00")),
                (2, _t("2024-01-01 02:30:00")),   # no interval
                (3, _t("2024-01-01 01:00:00")),   # boundary: in both
            ],
            "event_id long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                ("a", _t("2024-01-01 00:00:00"), _t("2024-01-01 01:00:00")),
                ("b", _t("2024-01-01 01:00:00"), _t("2024-01-01 02:00:00")),
            ],
            "iid string, start_ts timestamp, end_ts timestamp",
        )
        out = {
            (r["event_id"], r["iid"])
            for r in temporal.range_join(facts, intervals).collect()
        }
        assert out == {(1, "a"), (3, "a"), (3, "b")}

    def test_long_interval_spanning_many_buckets(self, spark):
        facts = spark.createDataFrame(
            [(1, _t("2024-01-03 12:00:00")), (2, _t("2024-01-09 00:00:00"))],
            "event_id long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [("wk", _t("2024-01-01 00:00:00"), _t("2024-01-08 00:00:00"))],
            "iid string, start_ts timestamp, end_ts timestamp",
        )
        out = temporal.range_join(facts, intervals).collect()
        assert [(r["event_id"], r["iid"]) for r in out] == [(1, "wk")]

    def test_plan_is_bucket_equi_join(self, spark):
        import contextlib
        import io

        facts = spark.createDataFrame(
            [(1, _t("2024-01-01 00:30:00"))], "event_id long, ts timestamp"
        )
        intervals = spark.createDataFrame(
            [("a", _t("2024-01-01 00:00:00"), _t("2024-01-01 01:00:00"))],
            "iid string, start_ts timestamp, end_ts timestamp",
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            temporal.range_join(facts, intervals).explain("formatted")
        plan = buf.getvalue()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestScd2History:
    def test_collapses_runs_and_closes_intervals(self, spark):
        import datetime as dt

        from workspace_qdrant_mcp_spark.operators import temporal

        t = lambda s: dt.datetime.fromisoformat(f"2026-01-01T{s}")
        ev = spark.createDataFrame(
            [
                (1, t("00:00"), 7, "view"),
                (2, t("00:01"), 7, "view"),     # same value → collapses
                (3, t("00:02"), 7, "click"),    # change
                (4, t("00:03"), 7, "view"),     # change back (new interval)
                (5, t("00:00"), 8, "signup"),   # other user: single current
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        rows = sorted(
            temporal.scd2_history(ev).collect(),
            key=lambda r: (r["user_id"], r["valid_from"]),
        )
        u7 = [r for r in rows if r["user_id"] == 7]
        assert [r["event_type"] for r in u7] == ["view", "click", "view"]
        assert [r["is_current"] for r in u7] == [False, False, True]
        # intervals chain: valid_to = next valid_from
        assert u7[0]["valid_to"] == u7[1]["valid_from"]
        assert u7[1]["valid_to"] == u7[2]["valid_from"]
        u8 = [r for r in rows if r["user_id"] == 8]
        assert len(u8) == 1 and u8[0]["is_current"]


class TestHourlyAnomalies:
    def test_flags_only_outlier_hours(self, spark):
        import datetime as dt

        from workspace_qdrant_mcp_spark.operators import temporal

        rows = []
        eid = 0
        # type 'a': 9 quiet hours of 2 events, 1 spike hour of 30
        for h in range(9):
            for i in range(2):
                eid += 1
                rows.append((eid, dt.datetime(2026, 1, 1, h, i), 1, "a"))
        for i in range(30):
            eid += 1
            rows.append((eid, dt.datetime(2026, 1, 1, 9, i % 60), 1, "a"))
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        out = temporal.hourly_anomalies(ev, z_thresh=2.0).collect()
        assert len(out) == 1
        assert out[0]["hour"].hour == 9 and out[0]["n_events"] == 30
        assert out[0]["zscore"] > 2.0


class TestValueQuantiles:
    def test_exact_type7_interpolation(self, spark):
        import datetime as dt

        from workspace_qdrant_mcp_spark.operators import temporal

        ev = spark.createDataFrame(
            [
                (i, dt.datetime(2026, 1, 1), 1, "x", float(v))
                for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
            ],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        row = temporal.value_quantiles(ev).collect()[0]
        # type-7: q(p) at rank p*(n-1): median of 1..10 = 5.5,
        # q90 = 1 + 0.9*9 = rank 8.1 → 9.1, q99 → 9.91
        assert row["q5"] == 5.5
        assert row["q9"] == 9.1
        assert row["q99"] == 9.91


class TestDecayedPopularity:
    def test_merge_and_rescale_laws(self, spark):
        """Shard partials (same reference T) add; a snapshot rescales to
        a later T' by one multiply — the two properties that let a
        maintained store never re-read history."""
        from pyspark.sql import functions as F
        from workspace_qdrant_mcp_spark.operators.temporal import (
            decayed_popularity,
        )
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_CORRECT

        ev = load_table(spark, SF_CORRECT, "events")
        whole = {
            r.event_type: r.decayed_count
            for r in decayed_popularity(ev).collect()
        }
        # half-life halves the contribution of a one-half-life-old event
        import datetime, math

        mx = ev.agg(F.max("ts")).collect()[0][0]
        one = spark.createDataFrame(
            [(1, mx, "x"), (2, mx - datetime.timedelta(hours=24), "x")],
            "event_id long, ts timestamp, event_type string",
        )
        got = decayed_popularity(one).collect()[0]
        assert abs(got.decayed_count - 1.5) < 1e-6
        assert got.raw_count == 2
        # fresher events dominate: decayed <= raw everywhere on real data
        for k, v in whole.items():
            assert 0 < v < 10_000

    def test_recent_beats_stale_at_equal_raw_count(self, spark):
        import datetime
        from workspace_qdrant_mcp_spark.operators.temporal import (
            decayed_popularity,
        )

        t0 = datetime.datetime(2026, 1, 10)
        rows = [(i, t0, "fresh") for i in range(50)] + [
            (100 + i, t0 - datetime.timedelta(hours=240), "stale")
            for i in range(50)
        ]
        out = {
            r.event_type: r
            for r in decayed_popularity(
                spark.createDataFrame(
                    rows, "event_id long, ts timestamp, event_type string"
                )
            ).collect()
        }
        assert out["fresh"].raw_count == out["stale"].raw_count == 50
        assert out["fresh"].decayed_count > 40
        assert out["stale"].decayed_count < 0.1


class TestLastTouchAttribution:
    def test_attributes_to_most_recent_prior_touch(self, spark):
        import datetime
        from workspace_qdrant_mcp_spark.operators.temporal import (
            last_touch_attribution,
        )

        t = lambda h: datetime.datetime(2026, 1, 1) + datetime.timedelta(hours=h)
        ev = spark.createDataFrame(
            [
                (1, t(0), 7, "view"),
                (2, t(1), 7, "click"),
                (3, t(2), 7, "purchase"),   # -> click (id 2)
                (4, t(3), 7, "purchase"),   # -> click still (3 is purchase)
                (5, t(0), 8, "purchase"),   # cold start -> NULLs
                (6, t(2), 9, "view"),
                (7, t(2), 9, "purchase"),   # tie on ts -> touch visible
            ],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        out = {r.event_id: r for r in last_touch_attribution(ev).collect()}
        assert out[3].touch_event_id == 2 and out[3].touch_event_type == "click"
        assert out[4].touch_event_id == 2
        assert out[5].touch_event_id is None and out[5].touch_ts is None
        assert out[7].touch_event_id == 6  # equal-ts touch counts
