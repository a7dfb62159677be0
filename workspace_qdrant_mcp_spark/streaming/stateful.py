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


# ---------------------------------------------------------------------------
# Cross-batch streaming HLL: per-key distinct-count registers maintained
# in the state store (the sketch family's merge discipline meeting the
# stateful-streaming niche — registers max-merge, so state is a constant
# 2^p ints per key regardless of stream length, and the running estimate
# is exact-HLL-equal to a batch build over everything seen so far).
# ---------------------------------------------------------------------------

HLL_STATE_P = 8
HLL_OUT_SCHEMA = "key string, n_seen long, estimate double"
_HLL_STATE_SCHEMA = "regs array<int>, n_seen long"


def _hll_py(value: str, p: int = HLL_STATE_P) -> tuple[int, int]:
    """(bucket, rho) — EXACTLY operators/sketches.hll_registers's
    arithmetic (md5 first 15 hex chars = 60-bit hash; bucket = low p
    bits; rho = leading zeros of the remaining 60-p bit word + 1), so
    the streaming state is bit-identical to the batch registers."""
    import hashlib

    h = int(hashlib.md5(value.encode()).hexdigest()[:15], 16)
    m = 1 << p
    word_bits = 60 - p
    bucket = h % m
    w = h // m
    rho = word_bits + 1 if w == 0 else word_bits + 1 - w.bit_length()
    return bucket, rho


def streaming_hll(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    p: int = HLL_STATE_P,
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming (key, n_seen, estimate): per-key HyperLogLog distinct
    count of value_col maintained ACROSS micro-batches. Every batch
    max-merges its values into the key's register array and emits the
    updated estimate (update semantics — one row per key per batch that
    touched it). The registers after any prefix of the stream equal a
    batch hll_registers build over that prefix (asserted in tests) —
    the merge law is what makes the sketch streamable at all."""
    import math

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            regs_raw, n_seen = state.get
            regs = list(regs_raw)
        else:
            regs, n_seen = [0] * m, 0
        touched = False
        for pdf in pdfs:
            for v in pdf[value_col]:
                b, r = _hll_py(str(int(v)) if not isinstance(v, str) else v, p)
                if r > regs[b]:
                    regs[b] = r
                touched = True
                n_seen += 1
        if not touched:
            return
        state.update((regs, n_seen))
        s = sum(2.0 ** -r for r in regs)
        raw = alpha * m * m / s
        zeros = regs.count(0)
        est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
        yield pd.DataFrame(
            {"key": [key[0]], "n_seen": [n_seen], "estimate": [round(est, 6)]}
        )

    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    return src.groupBy(key_col).applyInPandasWithState(
        fn,
        HLL_OUT_SCHEMA,
        _HLL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
