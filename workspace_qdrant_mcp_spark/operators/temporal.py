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


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, attr, valid_from, valid_to, is_current) — Slowly-Changing-
    Dimension Type 2 history: each key's attribute timeline collapsed to
    change intervals (consecutive equal values merge; valid_to = next
    change's valid_from, NULL while current) — the standard temporal
    upsert/CDC shape a warehouse keeps for point-in-time joins (the
    asof_join above reads exactly this layout).

    Two windows over the SAME (key) partitioning ordered by
    (ts, id) — deterministic under timestamp ties, one shuffle total
    (the second window reuses the first's exchange). At 100 TB this is
    the one-pass MERGE-free formulation: no self-join, no per-key
    collect, skew bounded by the busiest key's event count."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    changes = events.withColumn(
        "__prev", F.lag(attr_col).over(w)
    ).filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            key_col,
            attr_col,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def hourly_anomalies(
    events: DataFrame,
    z_thresh: float = 2.0,
    ts_col: str = "ts",
    group_col: str = "event_type",
) -> DataFrame:
    """(event_type, hour, n_events, zscore) — hours whose event count
    deviates ≥ z_thresh population-stddevs from that type's hourly mean
    (volume anomaly detection over the rollup). Two aggregations over
    the same grouping key: hourly counts, then a per-type window for
    mean/stddev — both map-side-combinable; the per-type stats window
    is bounded by hours-per-type, never by events."""
    hourly = events.groupBy(
        F.date_trunc("hour", F.col(ts_col)).alias("hour"),
        group_col,
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy(group_col)
    stats = hourly.withColumn(
        "__mu", F.avg("n_events").over(w)
    ).withColumn("__sd", F.stddev_pop("n_events").over(w))
    z = (F.col("n_events") - F.col("__mu")) / F.col("__sd")
    return (
        stats.filter((F.col("__sd") > 0) & (F.abs(z) >= z_thresh))
        .select(
            group_col,
            "hour",
            "n_events",
            F.round(z, 6).alias("zscore"),
        )
    )


def value_quantiles(
    events: DataFrame,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    value_col: str = "value",
    group_col: str = "event_type",
) -> DataFrame:
    """(event_type, q50, q90, q99, ...) — EXACT per-group percentiles
    (type-7 linear interpolation, the Spark `percentile` / DuckDB
    `quantile_cont` shared convention), the latency/size distribution
    report every pipeline publishes. Exact sort-based aggregation here
    because the oracle needs value-comparable numbers; at 100 TB the
    same call site swaps to approx_percentile (t-digest sketch,
    mergeable, bounded memory) — the plan shape is identical."""
    pct = F.expr(
        f"percentile({value_col}, array({', '.join(str(p) for p in probs)}))"
    )
    agg = events.groupBy(group_col).agg(pct.alias("__q"))
    cols = [
        F.round(F.col("__q").getItem(i), 6).alias(
            f"q{str(p).replace('0.', '')}"
        )
        for i, p in enumerate(probs)
    ]
    return agg.select(group_col, *cols)


def decayed_popularity(
    events: DataFrame,
    half_life_hours: float = 24.0,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(key, decayed_count, raw_count) — exponentially time-decayed
    popularity: each event contributes 0.5^(age_hours / half_life),
    aged against the corpus max timestamp (a lazy 1-row broadcast — no
    driver action, no wall-clock dependence, so the result is
    deterministic and oracle-replayable).

    The scale property that makes decayed counters the standard
    freshness signal: they are MERGEABLE — partial sums from any shard
    add up (same reference time T), and a snapshot taken at T rescales
    to T' by one multiply (0.5^((T'-T)/h)), so a maintained store never
    re-reads history. The same curve drives the search-side relevance
    decay (operators/fusion.relevance_decay); this is its corpus-
    analytics face."""
    mx = events.agg(F.max(ts_col).alias("__T"))
    # cast-to-double epoch keeps the fractional seconds (unix_timestamp
    # truncates to whole seconds; DuckDB's epoch() does not)
    age_h = (
        F.col("__T").cast("double") - F.col(ts_col).cast("double")
    ) / F.lit(3600.0)
    return (
        events.crossJoin(F.broadcast(mx))
        .groupBy(key_col)
        .agg(
            F.round(
                F.sum(F.pow(F.lit(0.5), age_h / F.lit(half_life_hours))), 6
            ).alias("decayed_count"),
            F.count(F.lit(1)).alias("raw_count"),
        )
    )


def last_touch_attribution(events: DataFrame) -> DataFrame:
    """(event_id, user_id, ts, touch_ts, touch_event_id,
    touch_event_type) — every purchase attributed to the user's most
    recent PRIOR non-purchase event (last-touch attribution), NULLs for
    cold-start purchases.

    Pure composition: this is asof_join with the right side filtered to
    non-purchase touches — the backward as-of union-tag machinery (one
    window per user, no inequality join, no merge_asof) already proven
    by the asof oracle, reused verbatim. Ties on ts resolve to the
    touch being visible, then max (ts, event_id) among equals — pinned
    identically in the LATERAL oracle."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    touches = events.filter(F.col("event_type") != "purchase")
    return asof_join(
        purchases,
        touches,
        on="user_id",
        ts_col="ts",
        right_cols=("event_id", "event_type"),
        prefix="touch_",
    )
