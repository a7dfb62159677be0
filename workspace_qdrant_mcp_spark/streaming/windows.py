"""Event-time windowed aggregation with watermarks (SURVEY §2.8 W9 slot —
upgraded from n/a: the reference daemon has no event-time rollup, but a
watcher-event stream at scale needs one, and it is the canonical
Structured Streaming operator the engine should expose).

Batch/stream unification: `windowed_rollup` is ONE function applied to
either a streaming or a batch DataFrame — Catalyst compiles the same
logical expression both ways, which is Structured Streaming's
incremental-execution contract. The driver query `events_hourly_rollup`
runs it in batch mode over events.parquet (DuckDB-oracle-backed); the
streaming tests run the same expression over a file-source stream with
`withWatermark` + append mode and assert (a) a window emits exactly once
after the watermark passes its end, and (b) an event arriving later than
the watermark is DROPPED — it never re-opens a closed window.

Scale shape: a streaming shuffle keyed on (window, event_type) with
map-side partial aggregation; state-store size is bounded by
watermark-horizon × distinct keys. The watermark IS the 100 TB design
point — without it, windowed state grows without bound; with it, state
eviction is deterministic and append-mode emission is exactly-once per
window (checkpointed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    events: DataFrame,
    window_len: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """(w struct<start,end>, event_type, n_events, u_lo, u_hi, sum_value)
    — tumbling event-time windows. Pass `watermark` (e.g. '30 minutes')
    on a streaming DataFrame to bound state and enable append-mode
    emission; leave None in batch mode (a batch watermark is a no-op
    anyway). Only streaming-safe aggregates (count/min/max/sum), so the
    exact same expression runs incrementally and in batch."""
    ev = events
    if watermark is not None:
        ev = ev.withWatermark(ts_col, watermark)
    return (
        ev.groupBy(
            F.window(ts_col, window_len).alias("w"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("u_lo"),
            F.max("user_id").alias("u_hi"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def flat_rollup(roll: DataFrame) -> DataFrame:
    """Flatten the window struct for sinks/oracles that need scalar
    columns (parquet sink in the tests, the DuckDB value-hash gate)."""
    return roll.select(
        F.col("w").getField("start").alias("window_start"),
        "event_type",
        "n_events",
        "u_lo",
        "u_hi",
        "sum_value",
    )


def sliding_rollup(
    events: DataFrame,
    window_len: str = "2 hours",
    slide: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """(w struct<start,end>, event_type, n_events, sum_value) —
    HOPPING event-time windows (length > slide, epoch-aligned starts
    every `slide`): each event lands in len/slide overlapping windows,
    the shape trend/rate dashboards read ("events in the trailing 2 h,
    refreshed hourly"). Completes the window family next to the tumbling
    and session rollups; same streaming-safe aggregates, same
    batch/stream unification, and under a watermark the state bound is
    (horizon/slide + len/slide) windows per key — the overlap factor is
    a constant, not a scale risk.

    The built-in F.window(ts, len, slide) EXPLODES each row into its
    len/slide windows before the shuffle; map-side partial aggregation
    collapses the blowup to |keys|·overlap partial rows per task, so
    the exchanged volume matches the tumbling rollup times the constant
    overlap — no per-event fanout crosses the wire."""
    ev = events
    if watermark is not None:
        ev = ev.withWatermark(ts_col, watermark)
    return ev.groupBy(
        F.window(ts_col, window_len, slide).alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def flat_sliding_rollup(roll: DataFrame) -> DataFrame:
    return roll.select(
        F.col("w").getField("start").alias("window_start"),
        F.col("w").getField("end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


def session_rollup(
    events: DataFrame,
    gap: str = "6 hours",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """(w struct<start,end>, user_id, n_events, sum_value) — event-time
    SESSION windows (dynamic-length, gap-closed): the built-in
    `session_window` twin of the batch sessions.sessionize operator.
    Merge rule (probed and pinned for the oracle): an event extends the
    session iff ts - prev_ts <= gap — the SAME strict-greater split as
    sessionize's running-sum flag — and the emitted window is
    [min ts, max ts + gap). In streaming mode the watermark closes a
    session once event time passes its end, so state per user is one
    open session, not unbounded history — the canonical streaming
    sessionization the reference's work-queue design never needed but a
    watcher-event stream at scale does."""
    ev = events
    if watermark is not None:
        ev = ev.withWatermark(ts_col, watermark)
    return ev.groupBy(
        F.session_window(ts_col, gap).alias("w"), "user_id"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )


def flat_session_rollup(roll: DataFrame) -> DataFrame:
    return roll.select(
        F.col("w").getField("start").alias("session_start"),
        F.col("w").getField("end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str],
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup via the built-in
    dropDuplicatesWithinWatermark: the first row per key value is
    emitted, later duplicates arriving within the watermark horizon are
    dropped, and state per key is evicted once the watermark passes —
    the canonical bounded-state streaming dedup, complementing the
    ingest pipeline's content-hash anti-join (which dedups against the
    PERSISTED store, unbounded history, at batch cost) with an
    in-stream short-horizon guard (duplicate watcher events, at-least-
    once replays). On a batch frame Spark's dropDuplicates gives the
    same key set — batch≡stream asserted on the KEY PROJECTION only,
    because which duplicate survives is explicitly unspecified in both
    modes (callers must not read non-key columns off the survivors)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
