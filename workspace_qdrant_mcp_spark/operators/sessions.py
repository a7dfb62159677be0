"""Gap-based sessionization over the events table — the classic
event-time analytics operator: per user, order events by time, start a
new session whenever the inter-event gap exceeds a threshold, then
aggregate per session.

Pure window algebra (lag → gap flag → running sum = session index →
groupBy), microsecond-exact in both engines (unix_micros / epoch_us), so
the DuckDB oracle is bit-identical. Scale shape: ONE shuffle on user_id;
both windows and the final aggregate reuse that partitioning (Catalyst
collapses them into a single exchange), and sessions never span
partitions because the key is the user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..io import fan_out

SESSION_GAP_MINUTES = 360


def sessionize(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """(user_id, session_idx, n_events, start_ts, end_ts, duration_sec,
    total_value) — 1-based session index per user; a session breaks when
    the gap to the previous event exceeds gap_minutes. Ordering is
    (ts, event_id): unique, so the RANGE-vs-ROWS window frame distinction
    cannot matter."""
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    new_s = F.when(
        prev_us.isNull() | (F.unix_micros("ts") - prev_us > gap_us), 1
    ).otherwise(0)
    tagged = fan_out(events).select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(new_s).over(w).cast("int").alias("session_idx"),
    )
    return tagged.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.round(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
            / F.lit(1_000_000.0),
            6,
        ).alias("duration_sec"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage_index, stage, n_users) — ordered conversion funnel: a user
    converts through stage k iff an event of stage k exists STRICTLY
    after their earliest qualifying stage k-1 event (the classic
    first-touch funnel; each stage's frontier timestamp is the earliest
    qualifying event, so conversion order is enforced, not mere
    co-occurrence).

    Plan: one aggregate per stage, each an equi-join on the user key
    against the per-user frontier of the previous stage — len(stages)
    word-count-shaped passes, never a per-user event self-join. At
    100 TB each pass shuffles once on the user key; the frontier is one
    row per surviving user."""
    from functools import reduce

    frontier = None
    counts = []
    for idx, st in enumerate(stages):
        ev_s = events.filter(F.col(type_col) == st).select(
            user_col, ts_col
        )
        if frontier is None:
            cur = ev_s.groupBy(user_col).agg(F.min(ts_col).alias("t"))
        else:
            cur = (
                ev_s.join(frontier, user_col)
                .filter(F.col(ts_col) > F.col("t"))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t"))
            )
        frontier = cur
        counts.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(idx + 1).alias("stage_index"),
                F.lit(st).alias("stage"),
                "n_users",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), counts)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, n_users) — the classic day-cohort
    retention triangle: cohort = the day of a user's FIRST event; for
    every later day with activity, the count of that cohort's users
    active on it (offset 0 row = cohort size). Two aggregates: first-day
    per user, then distinct (user, day) joined back — both word-count
    shapes keyed on the user."""
    first = events.groupBy(user_col).agg(
        F.date_trunc("day", F.min(ts_col)).alias("cohort_day")
    )
    act = events.select(
        user_col, F.date_trunc("day", F.col(ts_col)).alias("d")
    ).distinct()
    return (
        act.join(first, user_col)
        .select(
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
            user_col,
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
