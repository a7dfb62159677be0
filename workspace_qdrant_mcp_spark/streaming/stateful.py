"""Custom stateful streaming operator: CROSS-BATCH debounce via
applyInPandasWithState (the reference watcher's actual semantics —
watcher.rs holds a per-path timer and emits only the LAST event once the
path goes quiet; ingest.debounce_batch is the within-batch approximation
used by the foreachBatch pipeline).

Per path, the newest event (event-time, event_id tiebreak) is held in the
state store; an event-time timeout at held_ts + gap flushes it once the
WATERMARK passes that point. Later events for the same path reset the
timer (classic trailing-edge debounce). Exactly-once per quiet period via
the checkpointed state store.

Scale shape: state is keyed by path — one small tuple per in-flight path,
partitioned by the groupBy hash, evicted on every flush; the Arrow batch
transfer makes the per-group Python work vectorized, and the watermark
bounds both state size and result lateness. This is the one operator in
the engine where per-key imperative logic is genuinely required (hold /
reset / flush decisions across micro-batches) — exactly the
applyInPandasWithState niche.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

DEBOUNCE_OUT_SCHEMA = (
    "path string, ts_ms long, event_type string, event_id long"
)
_STATE_SCHEMA = "ts_ms long, event_type string, event_id long"


def stateful_debounce(
    events: DataFrame,
    gap_secs: int = 5,
    watermark: str = "10 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming (path, ts_ms, event_type, event_id): the last event of
    each per-path burst, emitted once no newer event arrived within
    gap_secs (event time). `events` must be a streaming DataFrame with
    an event-time `ts` timestamp; emission requires the watermark to
    pass held_ts + gap, so a quiet stream flushes on the next batch that
    advances event time (same discipline as windowed_rollup)."""
    import pandas as pd  # noqa: F401  (executor-side dependency)

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_secs * 1000

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            ts_ms, event_type, event_id = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "path": [key[0]],
                    "ts_ms": [ts_ms],
                    "event_type": [event_type],
                    "event_id": [event_id],
                }
            )
            return
        best = None  # (ts_ms, event_id, event_type)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values([ts_col, "event_id"]).iloc[-1]
            cand = (
                int(top[ts_col].value // 1_000_000),
                int(top["event_id"]),
                str(top["event_type"]),
            )
            if best is None or cand[:2] > best[:2]:
                best = cand
        if best is None:
            return
        if state.exists:
            ts_ms, event_type, event_id = state.get
            held = (ts_ms, event_id, event_type)
            if held[:2] > best[:2]:
                best = held
        state.update((best[0], best[2], best[1]))
        state.setTimeoutTimestamp(best[0] + gap_ms)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("path")
        .applyInPandasWithState(
            fn,
            DEBOUNCE_OUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
