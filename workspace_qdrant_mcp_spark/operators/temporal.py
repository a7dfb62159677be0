"""Temporal join & multi-resolution rollup operators.

Spark has no native as-of join (the canonical missing operator the
DataFrame API makes you build); the scalable implementation here is the
union-tag trick, NOT pandas merge_asof (which needs one partition per
key) and NOT an inequality join (which plans as a nested loop):

  tag right rows side=0 and left rows side=1, union, then ONE window per
  key ordered by (ts, side) carries the last non-null right payload
  forward — every left row sees exactly the most recent right row with
  right.ts <= left.ts. O(n log n) per key, one shuffle on the key,
  fully distributed, skew behaves like any window (salt the key if one
  user owns the stream).

multires_rollup is the hypertable / continuous-aggregate analog:
one pass producing every resolution level via ROLLUP grouping sets —
(day, hour) fine rows plus (day) subtotals plus the grand total — the
way a time-series store maintains downsampled views, except Catalyst
expands the sets in a single aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("event_id",),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of LEFT join: every left row + the payload of the most
    recent right row with right.ts <= left.ts on the same key (NULLs when
    no right row precedes it). Ties on ts resolve to the right row being
    visible (side 0 sorts before side 1), matching ASOF JOIN's >=
    semantics; among equal-ts right rows the LAST by the right's own
    (ts, *right_cols) order wins deterministically."""
    rv = right.select(
        F.col(on),
        F.col(ts_col),
        F.struct(
            F.col(ts_col).alias(f"{prefix}{ts_col}"),
            *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        ).alias("__rv"),
        F.lit(0).alias("__side"),
    )
    left_cols = left.columns
    lt = left.select(
        *left_cols,
        F.lit(None).cast(rv.schema["__rv"].dataType).alias("__rv"),
        F.lit(1).alias("__side"),
    )
    rt = rv.select(
        *[
            F.col(c) if c in (on, ts_col)
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        "__rv",
        "__side",
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.asc(ts_col), F.asc("__side"), F.asc_nulls_first("__rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        lt.unionByName(rt)
        .withColumn("__last", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .select(*left_cols, F.col("__last.*"))
    )


def multires_rollup(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """(day, hour, grp, n_events, sum_value) — day-resolution and
    hour-resolution aggregates PLUS the grand total in one pass via
    ROLLUP grouping sets (grp = grouping_id: 0 fine, 1 day subtotal,
    3 grand total). The continuous-aggregate ladder of a time-series
    store, computed as a single Catalyst aggregate with map-side partial
    aggregation per grouping set."""
    ev = events.select(
        F.date_trunc("day", F.col(ts_col)).alias("day"),
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        "value",
    )
    return (
        ev.rollup("day", "hour")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select("day", "hour", "grp", "n_events", "sum_value")
    )


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Interval (range) join without an equi key: every fact row paired
    with every interval containing its timestamp (inclusive bounds).
    Spark plans a bare BETWEEN join as a nested loop; the scalable form
    is BINNING: explode each interval into the time buckets it covers,
    bucket the facts, equi-join on the bucket, keep the BETWEEN as a
    residual, and the bucket key turns the cross product into
    per-bucket work. bucket_secs trades explode fan-out (long intervals
    → more bucket rows) against join selectivity — size it near the
    median interval length; at 100 TB both sides shuffle once on the
    bucket and skew is a hot WINDOW of time, salted like any hot key.

    Output: all fact columns + all interval columns (callers project)."""
    fb = facts.withColumn(
        "__bucket", (F.unix_timestamp(F.col(ts_col)) / bucket_secs).cast("long")
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / bucket_secs).cast("long"),
                (F.unix_timestamp(F.col(end_col)) / bucket_secs).cast("long"),
            )
        ),
    )
    return (
        fb.join(ib, "__bucket")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
