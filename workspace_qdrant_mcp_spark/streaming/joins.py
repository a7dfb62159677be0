"""Event-time INTERVAL JOIN — the stream-stream join, batch/stream
unified (the last of Structured Streaming's canonical stateful
operators the engine exposes, next to windowed/session aggregation,
applyInPandasWithState, and dropDuplicates-style dedup).

Semantics: left ⋈ right on an equi-key AND right.ts ∈ [left.ts - lookback,
left.ts + lookahead] — "for each error, the clicks by the same user in
the preceding N hours". In batch this is an ordinary range join. In
streaming, BOTH sides carry watermarks and the time bound is part of
the join condition — that bound is what lets Spark evict buffered rows:
state per side is (watermark horizon + interval) of input, not the
whole stream. Inner joins emit eagerly on match (no watermark wait);
the watermark only drives state cleanup and late-row drop.

Scale shape: a single exchange on the equi-key for both sides; the
range predicate evaluates inside the joined partition. Skewed keys are
ordinary join skew (AQE/salting applies). The 100 TB design point is
the same as the batch as-of join's: never a nested-loop inequality
join — the equi-key is mandatory, and the time bound is a filter within
the key group, which is also exactly the streaming state-eviction
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lookback: str = "24 hours",
    lookahead: str = "0 seconds",
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
) -> DataFrame:
    """Rows (l.*, r.* suffixed _r) for every pair with equal `key` and
    r.ts within [l.ts - lookback, l.ts + lookahead]. Pass watermarks on
    BOTH sides to run the same expression as a stream-stream join with
    bounded state; leave None in batch (watermarks are no-ops there
    anyway, but Spark requires them present for streaming joins, so the
    caller decides)."""
    l = left
    r = right
    if left_watermark is not None:
        l = l.withWatermark(left_ts, left_watermark)
    if right_watermark is not None:
        r = r.withWatermark(right_ts, right_watermark)
    r2 = r.select(
        F.col(key).alias(f"{key}_r"),
        F.col(right_ts).alias(f"{right_ts}_r"),
        *[
            F.col(c).alias(f"{c}_r")
            for c in r.columns
            if c not in (key, right_ts)
        ],
    )
    cond = (
        (F.col(key) == F.col(f"{key}_r"))
        & (
            F.col(f"{right_ts}_r")
            >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}")
        )
        & (
            F.col(f"{right_ts}_r")
            <= F.col(left_ts) + F.expr(f"INTERVAL {lookahead}")
        )
    )
    return l.join(r2, cond, "inner")
