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
    the merge law is what makes the sketch streamable at all.

    Execution shape: the per-row (bucket, rho) pair is computed
    JVM-side BEFORE the stateful operator, with EXACTLY the batch
    hll_registers arithmetic (operators/sketches.py:40 — md5 of
    CAST(value AS STRING), low-p-bit bucket, leading-zero rank), so
    floats/decimals/strings coerce identically in batch and stream and
    no Python code ever hashes an element. The state function is then a
    vectorized numpy max-scatter of the Arrow batch into the carried
    2^p registers — O(batch) columnar, O(2^p) state. (A per-batch
    groupBy(bucket) BEFORE the state op would be a second stateful
    aggregation in the same stream — chaining restriction — so the
    scatter happens inside the state function instead.)"""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import md5_hash64

    m = 1 << p
    word_bits = 60 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)

    src = events
    if watermark is not None:
        src = src.withWatermark(ts_col, watermark)
    v = md5_hash64(F.col(value_col).cast("string"))
    rho = F.when(F.col("__hll_w") == 0, F.lit(word_bits + 1)).otherwise(
        F.lit(word_bits + 1) - F.length(F.conv(F.col("__hll_w"), 10, 2))
    )
    keep = [ts_col] if watermark is not None else []
    hashed = (
        src.select(F.col(key_col), v.alias("__hll_v"), *keep)
        .select(
            key_col,
            (F.col("__hll_v") % m).alias("bucket"),
            F.expr(f"__hll_v div {m}").alias("__hll_w"),
            *keep,
        )
        .withColumn("rho", rho)
        .drop("__hll_w")
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            regs_raw, n_seen = state.get
            regs = np.asarray(regs_raw, dtype=np.int64)
        else:
            regs, n_seen = np.zeros(m, dtype=np.int64), 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            np.maximum.at(
                regs,
                pdf["bucket"].to_numpy(dtype=np.int64),
                pdf["rho"].to_numpy(dtype=np.int64),
            )
            n_seen += len(pdf)
            touched = True
        if not touched:
            return
        state.update(([int(r) for r in regs], int(n_seen)))
        # estimate over the bounded 2^p registers, summed sequentially in
        # bucket order — bit-identical to the batch ordered-window sum
        s = sum(2.0 ** -int(r) for r in regs)
        raw = alpha * m * m / s
        zeros = int((regs == 0).sum())
        est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
        yield pd.DataFrame(
            {"key": [key[0]], "n_seen": [n_seen], "estimate": [round(est, 6)]}
        )

    return hashed.groupBy(key_col).applyInPandasWithState(
        fn,
        HLL_OUT_SCHEMA,
        _HLL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Cross-batch streaming Misra-Gries: per-hash-group heavy-hitter summaries
# maintained in the state store — the streaming twin of
# operators/sketches.heavy_hitters' candidate phase, same mergeable-summary
# discipline as the streaming HLL above.
# ---------------------------------------------------------------------------

MG_STATE_CAPACITY = 16
MG_OUT_SCHEMA = "grp int, key string, est long, n_group long"
_MG_STATE_SCHEMA = "keys array<string>, ests array<long>, n_group long"


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = MG_STATE_CAPACITY,
    n_groups: int = 8,
) -> DataFrame:
    """Streaming (grp, key, est, n_group): Misra-Gries frequency
    summaries maintained ACROSS micro-batches, one summary per hash
    group of the key space (grp = md5-hash of the key mod n_groups, a
    JVM-side column — the partitioning IS by key content, so every
    occurrence of a key lands in the same group's state).

    Guarantee carried by the grouping: a key with global count
    > n_group/(capacity+1) of ITS OWN group survives in that group's
    summary — and since the key's occurrences all live in one group,
    n_group ≤ n makes this bound TIGHTER than a global MG's n/(cap+1).
    Union the groups' latest emissions for the candidate set; exact-count
    candidates downstream exactly like sketches.heavy_hitters phase 2.

    State per group: ≤ capacity (key, est) pairs + a count — constant
    regardless of stream length. Per batch the counting is pandas
    value_counts (columnar); the MG decrement loop touches ≤ capacity
    tracked keys, never rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import md5_hash64

    grp = F.pmod(
        md5_hash64(F.col(key_col).cast("string"), salt="mg|"), n_groups
    ).cast("int")
    # NULL keys dropped BEFORE grouping: pandas value_counts silently
    # drops NaN from the counters, so keeping null rows would inflate
    # n_group without any counter ever matching — the same null
    # inconsistency fixed in sketches.heavy_hitters (ADVICE r7 #4).
    src = events.filter(F.col(key_col).isNotNull()).select(
        grp.alias("grp"), F.col(key_col).cast("string").alias("key")
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            keys_raw, ests_raw, n_group = state.get
            counters = dict(zip(list(keys_raw), [int(v) for v in ests_raw]))
        else:
            counters, n_group = {}, 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_group += len(pdf)
            vc = pdf["key"].value_counts()
            for k, cnt in vc.items():
                if k in counters:
                    counters[k] += int(cnt)
                elif len(counters) < capacity:
                    counters[k] = int(cnt)
                else:
                    rem = int(cnt)
                    while rem > 0 and len(counters) >= capacity:
                        m = min(counters.values())
                        dec = min(rem, m)
                        rem -= dec
                        counters = {
                            c: v - dec for c, v in counters.items() if v > dec
                        }
                    if rem > 0:
                        counters[k] = rem
        if not touched:
            return
        state.update(
            (list(counters), [int(v) for v in counters.values()], int(n_group))
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(counters),
                "key": list(counters),
                "est": [int(v) for v in counters.values()],
                "n_group": [int(n_group)] * len(counters),
            }
        )

    return src.groupBy("grp").applyInPandasWithState(
        fn,
        MG_OUT_SCHEMA,
        _MG_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Cross-batch streaming decayed counters: the third mergeable-summary
# stream operator next to the HLL (max-merge) and Misra-Gries (bounded
# summary) — decayed counts merge by ADD at a shared reference time and
# rescale to a later reference by one multiply, so the carried state is
# two numbers per key regardless of stream length.
# ---------------------------------------------------------------------------

DECAY_OUT_SCHEMA = (
    "key string, ref_epoch double, decayed_count double, raw_count long"
)
_DECAY_STATE_SCHEMA = "ref_epoch double, decayed double, raw long"


def streaming_decayed_counts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    half_life_hours: float = 24.0,
) -> DataFrame:
    """Streaming (key, ref_epoch, decayed_count, raw_count): the
    exponentially time-decayed popularity of temporal.decayed_popularity
    maintained ACROSS micro-batches.

    The rescale law IS the state update: with carried (T, D) and a batch
    whose max event time is T_b, the new reference is T' = max(T, T_b)
    and
        D' = D * 0.5^((T'-T)/h) + Σ_batch 0.5^((T'-t_i)/h)
    — the snapshot rescales by ONE multiply and the batch contributes a
    columnar numpy power-sum; no history is ever re-read. After draining
    any prefix of the stream, (ref_epoch, decayed_count) equals the
    batch operator run over that prefix (up to float associativity;
    asserted to 1e-6 in tests). Epochs are double (fractional seconds
    kept), matching the batch/oracle discipline."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("double").alias("epoch"),
    )
    denom = 3600.0 * half_life_hours

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            ref, dec, raw = state.get
        else:
            ref, dec, raw = float("-inf"), 0.0, 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            t = pdf["epoch"].to_numpy(dtype=np.float64)
            new_ref = max(ref, float(t.max()))
            if ref != new_ref and raw:
                dec *= 0.5 ** ((new_ref - ref) / denom)
            ref = new_ref
            dec += float((0.5 ** ((ref - t) / denom)).sum())
            raw += len(pdf)
        if not touched:
            return
        state.update((float(ref), float(dec), int(raw)))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "ref_epoch": [float(ref)],
                "decayed_count": [float(dec)],
                "raw_count": [int(raw)],
            }
        )

    return src.groupBy("key").applyInPandasWithState(
        fn,
        DECAY_OUT_SCHEMA,
        _DECAY_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


SAMPLE_OUT_SCHEMA = "key string, rnk int, value string, n_seen long"
_SAMPLE_STATE_SCHEMA = "hs array<long>, vals array<string>, n_seen long"


def streaming_bottomk_sample(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    k: int = 8,
) -> DataFrame:
    """Streaming (key, rnk, value, n_seen): the consistent bottom-k
    hash sample (operators/sketches.bottomk_sample) maintained ACROSS
    micro-batches — per key, the k distinct values with smallest salted
    md5 hash seen so far, re-emitted whenever a batch touches the key.

    The merge law is the whole operator: bottom-k of (state ∪ batch) =
    bottom-k of (state ∪ bottom-k(batch)), so the carried state is k
    (hash, value) pairs and nothing else; after draining any prefix of
    the stream the emitted sample equals the batch operator over that
    prefix (asserted in tests). Hashes are computed JVM-side BEFORE the
    stateful operator with EXACTLY the batch arithmetic (same
    'sample|' salt, same CAST to string), so batch and stream coerce
    values identically — the state function only sorts ≤ k + |batch
    distinct| pairs per key per batch, numpy-columnar."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import md5_hash64

    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
        md5_hash64(F.col(value_col).cast("string"), salt="sample|").alias(
            "h"
        ),
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            hs, vals, n_seen = state.get
            frames = [pd.DataFrame({"value": vals, "h": hs})]
        else:
            frames, n_seen = [], 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_seen += len(pdf)
            frames.append(pdf[["value", "h"]])
        if not touched:
            return
        # h is a pure function of value, so dedup on value alone; sort
        # (h, value) and keep k — all pandas-columnar, no element loop
        merged = (
            pd.concat(frames, ignore_index=True)
            .drop_duplicates("value")
            .sort_values(["h", "value"], kind="mergesort")
            .head(k)
        )
        top = list(zip(merged["value"], (int(x) for x in merged["h"])))
        state.update(
            ([h for _v, h in top], [v for v, _h in top], int(n_seen))
        )
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(top),
                "rnk": list(range(1, len(top) + 1)),
                "value": [v for v, _h in top],
                "n_seen": [int(n_seen)] * len(top),
            }
        )

    return src.groupBy("key").applyInPandasWithState(
        fn,
        SAMPLE_OUT_SCHEMA,
        _SAMPLE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


KMV_OVERLAP_OUT_SCHEMA = (
    "k int, union_kth_hash long, union_estimate double,"
    " jaccard_estimate double, intersection_estimate double, n_seen long"
)
_KMV_OVERLAP_STATE_SCHEMA = (
    "ha array<long>, hb array<long>, n_seen long"
)


def streaming_kmv_overlap(
    events: DataFrame,
    group_col: str = "event_type",
    key_col: str = "user_id",
    group_a: str = "click",
    group_b: str = "view",
    k: int = 64,
) -> DataFrame:
    """Streaming twin of sketches.kmv_set_estimates: the two per-group
    bottom-k KMV sketches maintained ACROSS micro-batches (the same
    bottom-k-of-union merge law as streaming_bottomk_sample — state is
    2·k hashes and nothing else), re-emitting the union / Jaccard /
    intersection estimates whenever a batch touches either side. The
    live cross-corpus-overlap monitor: at 100 TB/day the two sides
    never meet except as k-row sketches inside one state row.

    Parity contract: hashes are computed JVM-side BEFORE the stateful
    operator with EXACTLY the batch arithmetic (same unsalted md5 of
    CAST(key AS STRING)), and the estimate float ops replay the batch
    order ((k-1)/(h/2^60); K∩/k; their product — Python doubles ARE
    IEEE doubles), so after draining any stream prefix the latest
    emission equals kmv_set_estimates' estimate columns over that
    prefix (asserted in test_streaming). Emits nothing until the union
    sketch is full (the estimator's validity regime, same as the batch
    operator's empty frame). Exact-twin columns are batch-only by
    design: they need the full key sets, which is the point of the
    sketch."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import md5_hash64

    src = (
        events.filter(F.col(group_col).isin(group_a, group_b))
        .select(
            F.lit("all").alias("gk"),
            (F.col(group_col) == group_a).alias("is_a"),
            md5_hash64(F.col(key_col).cast("string")).alias("h"),
        )
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            ha, hb, n_seen = state.get
            ha, hb = list(ha), list(hb)
        else:
            ha, hb, n_seen = [], [], 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_seen += len(pdf)
            ha.extend(int(x) for x in pdf.loc[pdf["is_a"], "h"])
            hb.extend(int(x) for x in pdf.loc[~pdf["is_a"], "h"])
        if not touched:
            return
        ha = sorted(set(ha))[:k]
        hb = sorted(set(hb))[:k]
        state.update((ha, hb, int(n_seen)))
        union = sorted(set(ha) | set(hb))[:k]
        if len(union) < k:
            return
        kth = union[-1]
        sa, sb = set(ha), set(hb)
        k_cap = sum(1 for h in union if h in sa and h in sb)
        ue = float(k - 1) / (float(kth) / float(1 << 60))
        rho = float(k_cap) / float(k)
        yield pd.DataFrame(
            {
                "k": [k],
                "union_kth_hash": [int(kth)],
                "union_estimate": [round(ue, 6)],
                "jaccard_estimate": [round(rho, 6)],
                "intersection_estimate": [round(rho * ue, 6)],
                "n_seen": [int(n_seen)],
            }
        )

    return src.groupBy("gk").applyInPandasWithState(
        fn,
        KMV_OVERLAP_OUT_SCHEMA,
        _KMV_OVERLAP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


WSAMPLE_OUT_SCHEMA = "rnk int, id string, sample_key double, n_seen long"
_WSAMPLE_STATE_SCHEMA = "keys array<double>, ids array<string>, n_seen long"


def streaming_weighted_sample(
    rows: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    weight_col: str = "weight",
    salt: str = "ws|",
) -> DataFrame:
    """Streaming twin of curation.weighted_sample: the Efraimidis-
    Spirakis weighted reservoir maintained ACROSS micro-batches. The
    E-S key ln(u_id)/w is a pure function of (id, weight) computed
    JVM-side with EXACTLY the batch arithmetic, so the reservoir obeys
    the same merge law as every other sketch twin here: top-k of
    (state ∪ batch) = top-k of (state ∪ top-k(batch)) — the carried
    state is k (key, id) pairs and nothing else. Re-emits the current
    sample whenever a batch arrives; after draining any stream prefix
    the emission equals the batch operator over that prefix (asserted
    in test_streaming). Duplicate ids re-derive the identical key, so
    replays/dedup are free by construction."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions.hashing import md5_hash64

    u = (
        (md5_hash64(F.col(id_col).cast("string"), salt=salt) % 1_000_000)
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    src = rows.select(
        F.lit("all").alias("gk"),
        F.col(id_col).cast("string").alias("id"),
        (F.log(u) / F.col(weight_col)).alias("key"),
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            keys, ids, n_seen = state.get
            frames = [pd.DataFrame({"id": ids, "key": keys})]
        else:
            frames, n_seen = [], 0
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            n_seen += len(pdf)
            frames.append(pdf[["id", "key"]])
        if not touched:
            return
        merged = (
            pd.concat(frames, ignore_index=True)
            .drop_duplicates("id")
            .sort_values(["key", "id"], ascending=[False, True],
                         kind="mergesort")
            .head(k)
        )
        state.update(
            (
                [float(x) for x in merged["key"]],
                list(merged["id"]),
                int(n_seen),
            )
        )
        yield pd.DataFrame(
            {
                "rnk": list(range(1, len(merged) + 1)),
                "id": list(merged["id"]),
                "sample_key": [round(float(x), 6) for x in merged["key"]],
                "n_seen": [int(n_seen)] * len(merged),
            }
        )

    return src.groupBy("gk").applyInPandasWithState(
        fn,
        WSAMPLE_OUT_SCHEMA,
        _WSAMPLE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


DRIFT_OUT_SCHEMA = (
    "grp string, n_ref long, n_cur long, psi double, drifted boolean"
)
_DRIFT_STATE_SCHEMA = "buckets array<long>, counts array<long>"


def streaming_drift_psi(
    events: DataFrame,
    ref: "DataFrame",
    group_col: str = "event_type",
    value_col: str = "value",
    width: float = 5.0,
    eps: float = 1e-4,
) -> DataFrame:
    """Streaming (grp, n_ref, n_cur, psi, drifted): the live twin of
    quality.psi_vs_reference — per-group CURRENT-window bucket counters
    maintained ACROSS micro-batches, re-scoring the Population Stability
    Index against the FROZEN reference profile (a drift_reference
    DataFrame, collected once at assembly: it is a bounded
    groups × buckets dimension, the blessed-corpus profile a deployment
    computes offline) every time a batch touches the group.

    State is the bucket counter map and nothing else — counts add, so
    the state after any stream prefix equals the batch counters over
    that prefix, and the PSI emission equals psi_vs_reference over the
    drained prefix (asserted to 1e-6 in test_streaming; the smoothing
    formula is replayed with the same add-eps shares over the union of
    reference and seen buckets). Bucketing is computed JVM-side BEFORE
    the stateful operator with the batch expression (floor(value/width)),
    so batch and stream coerce identically."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ref_map: dict[str, dict[int, int]] = {}
    for r in ref.collect():
        ref_map.setdefault(str(r["grp"]), {})[int(r["bucket"])] = int(
            r["c_ref"]
        )

    src = events.select(
        F.col(group_col).cast("string").alias("grp"),
        F.floor(F.col(value_col) / F.lit(float(width)))
        .cast("long")
        .alias("bucket"),
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import math

        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            bks, cts = state.get
            counters = dict(zip([int(b) for b in bks], [int(c) for c in cts]))
        else:
            counters = {}
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            vc = pdf["bucket"].value_counts()
            for b, c in vc.items():
                counters[int(b)] = counters.get(int(b), 0) + int(c)
        if not touched:
            return
        state.update((list(counters), [counters[b] for b in counters]))
        grp = key[0]
        rcounts = ref_map.get(str(grp), {})
        union = sorted(set(rcounts) | set(counters))
        n_ref = sum(rcounts.values())
        n_cur = sum(counters.values())
        nb = len(union)
        psi = 0.0
        for b in union:
            p_ref = (rcounts.get(b, 0) + eps) / (n_ref + eps * nb)
            p_cur = (counters.get(b, 0) + eps) / (n_cur + eps * nb)
            psi += (p_cur - p_ref) * math.log(p_cur / p_ref)
        psi = round(psi, 6)
        yield pd.DataFrame(
            {
                "grp": [grp],
                "n_ref": [int(n_ref)],
                "n_cur": [int(n_cur)],
                "psi": [float(psi)],
                "drifted": [bool(psi > 0.2)],
            }
        )

    return src.groupBy("grp").applyInPandasWithState(
        fn,
        DRIFT_OUT_SCHEMA,
        _DRIFT_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


MIX_OUT_SCHEMA = (
    "source string, n_docs long, n_tokens long, observed_share double, "
    "sampled_share double, boost double"
)
_MIX_STATE_SCHEMA = "sources array<string>, docs array<long>, toks array<long>"


def streaming_mixture(
    docs: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Streaming mixture monitor: curation.temperature_mixture maintained
    ACROSS micro-batches — the live view of what mixture the ingest
    stream has actually accumulated, and what alpha-tempered sampling
    weights it implies right now. Every batch that delivers documents
    re-emits the FULL per-source table (all rows share one aggregate
    state key, the streaming_kmv_overlap single-row discipline — state is
    #sources (docs, tokens) counter pairs, a config-sized map, because
    sampled_share normalizes across ALL sources and a per-source state
    key could not see its siblings).

    Counters add, so state after any stream prefix equals the batch
    per-source aggregate over that prefix; the emission replays the
    temperature arithmetic on those exact integers and equals
    temperature_mixture over the drained prefix to 1e-6 (float
    associativity of the share sums; asserted in test_streaming).
    Token counts are computed JVM-side BEFORE the stateful operator with
    EXACTLY the batch expression (textstats token_counts' whitespace
    split), so batch and stream tokenize identically."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..operators.textstats import _ws_tokens

    src = docs.select(
        F.lit(0).alias("__k"),
        F.col(strata_col).cast("string").alias("src"),
        F.size(_ws_tokens(F.col(text_col))).cast("long").alias("t"),
    )

    def fn(
        key: tuple,
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            return
        if state.exists:
            srcs, dcs, tks = state.get
            acc = {
                s: [int(d), int(t)] for s, d, t in zip(srcs, dcs, tks)
            }
        else:
            acc = {}
        touched = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            touched = True
            g = pdf.groupby("src")["t"].agg(["count", "sum"])
            for s, row in g.iterrows():
                ent = acc.setdefault(str(s), [0, 0])
                ent[0] += int(row["count"])
                ent[1] += int(row["sum"])
        if not touched:
            return
        state.update(
            (
                list(acc),
                [acc[s][0] for s in acc],
                [acc[s][1] for s in acc],
            )
        )
        order = sorted(acc)
        total = float(sum(acc[s][1] for s in order))
        if total == 0:
            # no observable token distribution yet: skip emission (the
            # batch twin temperature_mixture returns zero rows on a
            # zero-token corpus — r8 ADVICE: this raised
            # ZeroDivisionError). State is already updated, so the doc
            # counts carry into the next batch.
            return
        shares = {s: acc[s][1] / total for s in order}
        pa = {s: shares[s] ** alpha for s in order}
        pa_sum = sum(pa[s] for s in order)
        yield pd.DataFrame(
            {
                "source": order,
                "n_docs": [acc[s][0] for s in order],
                "n_tokens": [acc[s][1] for s in order],
                "observed_share": [round(shares[s], 6) for s in order],
                "sampled_share": [round(pa[s] / pa_sum, 6) for s in order],
                "boost": [
                    round((pa[s] / pa_sum) / shares[s], 6) for s in order
                ],
            }
        )

    return src.groupBy("__k").applyInPandasWithState(
        fn,
        MIX_OUT_SCHEMA,
        _MIX_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
