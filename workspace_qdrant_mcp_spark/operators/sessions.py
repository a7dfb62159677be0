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
