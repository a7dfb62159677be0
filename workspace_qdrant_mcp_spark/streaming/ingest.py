"""Structured Streaming ingestion — the reference's watcher → queue →
process pipeline re-expressed as a checkpointed stream.

Reference semantics preserved (SURVEY §2.8):
  W1 debounce      : per-path last-event-wins inside each micro-batch
                     (file_watcher_ops.rs:44-80, 500 ms flush tick — the
                     micro-batch IS the debounce window)
  W2 at-least-once + idempotency: checkpointed foreachBatch + idempotent
                     upsert keyed on (path) with content hash — replays
                     converge (unified_queue_schema/sql.rs:28-30
                     idempotency_key UNIQUE)
  W3 DLQ           : rows that fail processing append to a dead-letter
                     table with the error (sql.rs:32-45)
  W5 content dedup : anti-join on (path, file_hash) against the store —
                     unchanged content skips the (expensive) embed stage
                     (dedup.rs via ingest.rs:86-106)
  W6 reconciliation: snapshot full-outer-join diff
                     (startup/reconciliation/mod.rs)

Storage here is plain parquet with read-union-overwrite upsert (the test
container has no Delta); on a real deployment every MERGE below maps 1:1
onto a Delta/Iceberg `MERGE INTO` keyed the same way — the plan shapes are
identical, only the sink API changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.embedder import embed_unique, mock_embed
from ..sources.documents import chunk_text

EVENT_SCHEMA = (
    "path STRING, event_type STRING, content STRING, ts TIMESTAMP"
)


def filter_watched_paths(
    batch: DataFrame,
    ignore_globs: list[str] | None = None,
    allow_globs: list[str] | None = None,
) -> DataFrame:
    """S1 watcher filtering: drop ignored paths (gitignore analog), keep
    only allowlisted ones when an allowlist is set
    (file_watcher_ops.rs:44-80 pattern filters)."""
    from ..functions.filters import glob_to_regex

    out = batch
    for g in ignore_globs or []:
        out = out.filter(~F.col("path").rlike(glob_to_regex(g)))
    if allow_globs:
        cond = F.lit(False)
        for g in allow_globs:
            cond = cond | F.col("path").rlike(glob_to_regex(g))
        out = out.filter(cond)
    return out


def debounce_batch(batch: DataFrame) -> DataFrame:
    """Per-path last-event-wins (max ts, deterministic tiebreak on
    event_type so reruns are stable)."""
    from pyspark.sql import Window

    w = Window.partitionBy("path").orderBy(
        F.desc("ts"), F.desc("event_type")
    )
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _read_store(spark: SparkSession, path: str, schema: str) -> DataFrame:
    if os.path.exists(path):
        try:
            return spark.read.parquet(path)
        except Exception:
            pass
    return spark.createDataFrame([], schema)


def upsert_chunks(
    spark: SparkSession, store_path: str, new_chunks: DataFrame
) -> None:
    """Idempotent MERGE emulation: delete-then-insert keyed on path.
    (Delta: MERGE INTO chunks USING new ON path MATCHED DELETE+INSERT.)"""
    schema = (
        "path STRING, file_hash STRING, chunk_index INT, content STRING, "
        "embedding ARRAY<DOUBLE>"
    )
    existing = _read_store(spark, store_path, schema)
    keys = new_chunks.select("path").distinct()
    kept = existing.join(keys, "path", "left_anti")
    out = kept.unionByName(new_chunks).localCheckpoint()
    out.write.mode("overwrite").parquet(store_path)


def delete_paths(spark: SparkSession, store_path: str, paths: DataFrame) -> None:
    schema = (
        "path STRING, file_hash STRING, chunk_index INT, content STRING, "
        "embedding ARRAY<DOUBLE>"
    )
    existing = _read_store(spark, store_path, schema)
    out = existing.join(paths, "path", "left_anti").localCheckpoint()
    out.write.mode("overwrite").parquet(store_path)


# W8 provider watchdog (embedding/watchdog.rs): escalating re-init
# schedule capped at the 600 s backstop, availability flag read by the
# batch processor to park embedding work, one-shot diagnostic after
# max_attempts. A provider outage DEGRADES the pipeline (embeds park,
# deletes/search keep serving) — it never kills it.
DEFAULT_RETRY_INTERVALS_SECS = (30, 60, 120, 300, 600)
DEFAULT_MAX_ATTEMPTS = 10


class EmbeddingWatchdog:
    """Deterministic state machine mirroring watchdog.rs:31-40 semantics:
    consecutive failures step through `retry_intervals` and hold at the
    last value (also the healthy backstop); `max_attempts` consecutive
    failures emit a one-shot diagnostic dict; any success resets."""

    def __init__(
        self,
        retry_intervals: tuple[int, ...] = DEFAULT_RETRY_INTERVALS_SECS,
        max_attempts: int = DEFAULT_MAX_ATTEMPTS,
    ):
        self.retry_intervals = retry_intervals or (600,)
        self.max_attempts = max_attempts
        self.consecutive_failures = 0
        self.available = True
        self._diagnostic_written = False

    def next_retry_delay(self) -> int:
        if self.consecutive_failures == 0:
            return self.retry_intervals[-1]  # healthy backstop
        idx = min(self.consecutive_failures - 1, len(self.retry_intervals) - 1)
        return self.retry_intervals[idx]

    def record_success(self) -> None:
        self.consecutive_failures = 0
        self.available = True
        self._diagnostic_written = False

    def record_failure(self) -> int:
        self.consecutive_failures += 1
        self.available = False
        return self.next_retry_delay()

    def take_diagnostic(self) -> dict | None:
        """One-shot: non-None exactly once per outage, after max_attempts
        consecutive failures (watchdog.rs DEFAULT_MAX_ATTEMPTS)."""
        if (
            self.consecutive_failures >= self.max_attempts
            and not self._diagnostic_written
        ):
            self._diagnostic_written = True
            return {
                "consecutive_failures": self.consecutive_failures,
                "retry_delay_secs": self.next_retry_delay(),
                "available": self.available,
            }
        return None


def park_events(batch: DataFrame, park_path: str) -> None:
    """Re-lease analog: embedding work waits in the park table while the
    provider is down; deletes and reads are unaffected."""
    batch.write.mode("append").parquet(park_path)


def read_parked(spark: SparkSession, park_path: str) -> DataFrame:
    return _read_store(spark, park_path, EVENT_SCHEMA)


def process_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_path: str,
    dlq_path: str,
    ignore_globs: list[str] | None = None,
    allow_globs: list[str] | None = None,
    watchdog: EmbeddingWatchdog | None = None,
    park_path: str | None = None,
    embed_fn=None,
    quality_gate: bool = False,
    postings_path: str | None = None,
    graph_store_dir: str | None = None,
    signature_store_path: str | None = None,
    feature_store_path: str | None = None,
    gram_index_path: str | None = None,
    ppl_store_path: str | None = None,
    lm_model=None,
    ppl_gate: float | None = None,
    lm_order: int = 2,
    qc_weights=None,
    qc_gate: float | None = None,
) -> None:
    """One micro-batch: path filters → debounce → split deletes/upserts →
    content-hash dedup → [optional quality gate] → chunk+embed →
    idempotent upsert; failures → DLQ.
    With a watchdog: while the provider is unavailable, embedding work
    parks (W8 re-lease) and deletes still apply; an embed failure flips
    the flag and parks the current upserts instead of dead-lettering.
    quality_gate=True applies the shuffle-free Gopher gates
    (textstats.gopher_gate_expr) to changed content AFTER the hash dedup
    (unchanged files are never re-judged) and routes rejects to the DLQ
    with reason 'quality_gate' — curation at ingest time, off by default
    so existing stores are unaffected.

    Checkpoint hygiene: every per-batch localCheckpoint (the debounced
    batch, the pinned `changed` delta, the store overwrite staging blocks
    and the graph/signature-store deltas) is fully consumed by the time
    this function returns, so the finally block releases every block
    CREATED DURING THIS CALL that was not ckpt.pin()ned — a long-running
    stream holds constant checkpoint storage instead of leaking ~6+
    blocks per micro-batch (the exact accumulation ckpt.py's docstring
    warns kills long sessions). Scoped to this call's blocks (entry-set
    diff) rather than a global clear_unpinned so a caller's own
    checkpoints are never destroyed."""
    from .. import ckpt

    if lm_order not in (2, 3):
        raise ValueError(f"lm_order must be 2 or 3, got {lm_order}")
    if qc_gate is not None and qc_weights is None:
        # same loud-entry discipline as the ppl gate below
        raise ValueError(
            "qc_gate requires qc_weights (a frozen "
            "quality_classifier.train_quality_classifier table)"
        )
    if (ppl_gate is not None or ppl_store_path is not None) and lm_model is None:
        # fail LOUDLY at entry: a None model would raise deep inside the
        # scoring plan — for the ppl_store_path sink that error surfaces
        # inside the watchdog try, where it would be misread as a
        # provider outage and park every batch forever; for the gate it
        # would dead-letter whole batches with an opaque NoneType error
        raise ValueError(
            "ppl_gate / ppl_store_path require lm_model (a frozen "
            "textstats.kn_bigram_model or kn_trigram_model table "
            "matching lm_order)"
        )
    processable: DataFrame | None = None
    ids_at_entry = ckpt.persistent_ids(spark)
    try:
        batch = filter_watched_paths(batch, ignore_globs, allow_globs)
        b = debounce_batch(batch).localCheckpoint()
        # W3 row-level DLQ: poison rows (un-chunkable upserts) dead-letter
        # individually instead of failing the whole batch; the catch-all
        # below remains the backstop for infrastructure errors.
        poison, b = dead_letter_split(b)
        if len(poison.take(1)) > 0:
            (
                poison.withColumn("error", F.col("reason"))
                .drop("reason")
                .write.mode("append")
                .parquet(dlq_path)
            )
        # only once the poison rows are safely in the DLQ does the
        # catch-all narrow to the processable set — a failure during the
        # poison write itself still dead-letters the whole batch
        processable = b
        deletes = b.filter(F.col("event_type") == "remove").select("path")
        upserts = b.filter(F.col("event_type") != "remove").withColumn(
            "file_hash", F.md5(F.col("content").cast("binary"))
        )
        if watchdog is not None and park_path is not None and not watchdog.available:
            park_events(
                upserts.select("path", "event_type", "content", "ts"), park_path
            )
            if len(deletes.take(1)) > 0:
                delete_paths(spark, store_path, deletes)
            return
        # W5: skip paths whose (path, file_hash) already in the store
        schema = (
            "path STRING, file_hash STRING, chunk_index INT, content STRING, "
            "embedding ARRAY<DOUBLE>"
        )
        existing = _read_store(spark, store_path, schema).select(
            "path", "file_hash"
        ).distinct()
        changed = upserts.join(existing, ["path", "file_hash"], "left_anti")
        if quality_gate:
            from ..operators.textstats import gopher_gate_expr

            passes = gopher_gate_expr(F.col("content"))
            rejected = changed.filter(~passes)
            if len(rejected.take(1)) > 0:
                (
                    rejected.drop("file_hash")
                    .withColumn("error", F.lit("quality_gate"))
                    .write.mode("append")
                    .parquet(dlq_path)
                )
            changed = changed.filter(passes)
        if ppl_gate is not None and len(changed.take(1)) > 0:
            # CCNet-style perplexity gate at ingest: score the DELTA
            # under the FROZEN kn_bigram_model and dead-letter docs
            # whose logppl exceeds the threshold (the low-perplexity
            # head is what CCNet keeps). Docs too short to score
            # (< 2 tokens -> absent from the scorer) pass through:
            # no evidence, no rejection. The model is never retrained
            # here; the scoring join is delta-sized. The emptiness
            # probe mirrors the maintained-sink guards below: a
            # delete-only or no-op micro-batch skips the scoring plan,
            # the localCheckpoint and the rejected probe entirely
            # (when skipped, `changed` lacks the score columns — safe,
            # because the ppl sink's pre_scored reuse below only runs
            # under has_changed, which is False for the same reason).
            from ..operators.textstats import (
                _ppl_count_col, kn3_score_with, kn_score_with,
            )

            scorer = kn_score_with if lm_order == 2 else kn3_score_with
            ppl = scorer(
                changed.select(
                    F.col("path").alias("doc_id"),
                    F.col("content").alias("text"),
                ),
                lm_model,
            ).select(
                F.col("doc_id").alias("path"),
                _ppl_count_col(lm_order),
                "n_backoff",
                "n_oov",
                "logppl",
            )
            # pin the scored delta: rejected.take, the DLQ write and
            # every downstream sink would otherwise re-evaluate the
            # explode+3-join scoring plan
            judged = changed.join(ppl, "path", "left").localCheckpoint()
            bad = F.col("logppl").isNotNull() & (
                F.col("logppl") > F.lit(float(ppl_gate))
            )
            rejected = judged.filter(bad)
            if len(rejected.take(1)) > 0:
                (
                    rejected.drop(
                        "file_hash", _ppl_count_col(lm_order),
                        "n_backoff", "n_oov", "logppl",
                    )
                    .withColumn("error", F.lit("ppl_gate"))
                    .write.mode("append")
                    .parquet(dlq_path)
                )
            # keep the score columns: the ppl sink below reuses them
            # instead of scoring the same delta a second time
            changed = judged.filter(~bad)
        if qc_gate is not None and len(changed.take(1)) > 0:
            # GPT-3-style TRAINED-filter gate at ingest (Brown et al.
            # 2020 appendix A; the learned twin of the CCNet ppl gate
            # above): score the surviving delta under the FROZEN
            # classifier head — one margin join against the broadcast
            # (dim+1)-row weight table — and dead-letter docs whose
            # sigmoid score falls below the threshold (low score = low
            # quality). The head is never retrained here; every doc
            # gets a score (empty docs carry the intercept), so no
            # pass-through-on-no-evidence branch is needed.
            from ..operators.quality_classifier import (
                _margins, qc_features,
            )

            p = _margins(
                qc_features(
                    changed.select(
                        F.col("path").alias("doc_id"),
                        F.col("content").alias("text"),
                    )
                ),
                qc_weights,
                "doc_id",
            ).select(
                F.col("doc_id").alias("path"),
                (F.col("p6").cast("double") / F.lit(1e6)).alias(
                    "qc_score"
                ),
            )
            judged = changed.join(p, "path", "left").localCheckpoint()
            bad = F.col("qc_score").isNotNull() & (
                F.col("qc_score") < F.lit(float(qc_gate))
            )
            rejected = judged.filter(bad)
            if len(rejected.take(1)) > 0:
                (
                    # drop every transient gate column (ppl's too, when
                    # both gates ran) so DLQ parquet appends keep ONE
                    # schema; Spark drop() ignores absent names
                    rejected.drop(
                        "file_hash", "qc_score", "n_bigrams",
                        "n_trigrams", "n_backoff", "n_oov", "logppl",
                    )
                    .withColumn("error", F.lit("qc_gate"))
                    .write.mode("append")
                    .parquet(dlq_path)
                )
            # unlike the ppl gate there is no score sink to feed — the
            # transient column drops so downstream sinks see the
            # standard shape
            changed = judged.filter(~bad).drop("qc_score")
        if (
            postings_path is not None
            or graph_store_dir is not None
            or signature_store_path is not None
            or feature_store_path is not None
            or gram_index_path is not None
            or ppl_store_path is not None
        ):
            # the postings/graph updates run AFTER upsert_chunks
            # overwrites the store, but `changed` is lazily derived from
            # the PRE-upsert store listing — pin it now or the re-read
            # sees the post-upsert hashes and the delta evaporates
            changed = changed.localCheckpoint()
        # dedup-before-embed (phrase-cache analog, generator.rs:176-302):
        # the embed provider sees each distinct chunk text once per batch
        try:
            chunks = embed_unique(
                chunk_text(changed, id_col="path", text_col="content").join(
                    changed.select("path", "file_hash"), "path"
                ),
                embed_fn=embed_fn or mock_embed,
            ).select("path", "file_hash", "chunk_index", "content", "embedding")
            if len(chunks.take(1)) > 0:
                upsert_chunks(spark, store_path, chunks)
            # one emptiness probe serves every sink below. It must ONLY
            # run when a sink is configured: that is exactly when
            # `changed` was checkpointed above — otherwise `changed` is
            # still lazily derived from the PRE-upsert store listing,
            # and evaluating it here (after upsert_chunks overwrote the
            # store) reads deleted parquet files
            any_sink = (
                postings_path is not None
                or graph_store_dir is not None
                or signature_store_path is not None
                or feature_store_path is not None
                or gram_index_path is not None
                or ppl_store_path is not None
            )
            has_changed = any_sink and len(changed.take(1)) > 0
            # S7 maintained FTS sink (opt-in): keep the sparse-postings
            # table in lockstep with the chunk store — only the rows that
            # actually upserted (post-gate `changed`) re-index
            if postings_path is not None and has_changed:
                from ..operators.bm25 import update_postings

                update_postings(
                    spark,
                    postings_path,
                    changed_docs=changed.select("path", "content"),
                    id_col="path",
                    text_col="content",
                    id_type="string",
                )
            # S8 maintained graph sink (opt-in): keep the symbol graph in
            # lockstep with the chunk store — extraction runs only on the
            # post-gate changed files, edge rewiring is delta-scoped
            # (operators/graph_store). Single-tenant ingest stream maps
            # path -> file_path under the 'default' tenant; multi-tenant
            # deployments partition the stream per watch folder first.
            if graph_store_dir is not None and has_changed:
                from ..operators.graph_store import update_graph_store

                update_graph_store(
                    spark,
                    graph_store_dir,
                    changed_docs=changed.select(
                        F.lit("default").alias("tenant_id"),
                        F.col("path").alias("file_path"),
                        "content",
                    ),
                )
            # maintained minhash signature store (opt-in): new batches
            # can near-dup against the corpus without re-signing it
            # (dedup.incremental_neardup); path is the doc key here
            if signature_store_path is not None and has_changed:
                from ..functions.hashing import md5_hash64
                from ..operators.dedup import update_signature_store

                update_signature_store(
                    spark,
                    signature_store_path,
                    changed_docs=changed.select(
                        md5_hash64(F.col("path")).alias("doc_id"),
                        F.col("content").alias("text"),
                    ),
                )
            # maintained per-doc feature store (opt-in): the corpus data
            # card stays current at ingest; reports read narrow feature
            # rows, never the corpus text (operators/feature_store)
            if feature_store_path is not None and has_changed:
                from ..functions.hashing import md5_hash64
                from ..operators.feature_store import update_feature_store

                update_feature_store(
                    spark,
                    feature_store_path,
                    changed_docs=changed.select(
                        md5_hash64(F.col("path")).alias("doc_id"),
                        F.col("content").alias("text"),
                    ),
                )
            # maintained trigram gram index (opt-in): T1/T3's grep
            # candidate index stays in lockstep with the chunk store —
            # grams over the changed FILE content (a superset of any
            # chunk/line's grams, so the line-level prefilter stays
            # lossless), delete+append keyed by path
            if gram_index_path is not None and has_changed:
                from ..operators.grep import update_gram_index

                update_gram_index(
                    spark,
                    gram_index_path,
                    changed_lines=changed.select("path", "content"),
                    id_col="path",
                    id_type="string",
                )
            # maintained LM perplexity-score sink (opt-in): per-doc
            # logppl under the FROZEN kn_bigram_model stays current at
            # ingest, so quality gates read scores, never re-score the
            # corpus (textstats.update_ppl_store; model is never
            # retrained here)
            if ppl_store_path is not None and has_changed:
                from ..operators.textstats import (
                    _ppl_count_col as _pcc, update_ppl_store,
                )

                pre_scored = None
                if ppl_gate is not None:
                    # the gate already scored this delta (pinned with
                    # `changed`) — pass the rows through instead of
                    # running the scoring join a second time; docs too
                    # short to score carry NULL and are filtered (they
                    # are absent from the scorer output by contract)
                    pre_scored = changed.filter(
                        F.col("logppl").isNotNull()
                    ).select(
                        F.col("path").alias("doc_id"),
                        _pcc(lm_order),
                        "n_backoff",
                        "n_oov",
                        "logppl",
                    )
                update_ppl_store(
                    spark,
                    ppl_store_path,
                    lm_model,
                    changed_docs=changed.select(
                        F.col("path").alias("doc_id"),
                        F.col("content").alias("text"),
                    ),
                    id_type="string",
                    fresh_scores=pre_scored,
                    order=lm_order,
                )
            if watchdog is not None:
                watchdog.record_success()
        except Exception:
            # provider outage ≠ poison batch: flip the flag and park the
            # embedding work for re-lease; do NOT dead-letter it
            if watchdog is not None and park_path is not None:
                watchdog.record_failure()
                park_events(
                    upserts.select("path", "event_type", "content", "ts"),
                    park_path,
                )
            else:
                raise
        if len(deletes.take(1)) > 0:
            delete_paths(spark, store_path, deletes)
            if postings_path is not None:
                from ..operators.bm25 import update_postings

                update_postings(
                    spark,
                    postings_path,
                    deleted_ids=deletes,
                    id_col="path",
                    id_type="string",
                )
            if graph_store_dir is not None:
                from ..operators.graph_store import update_graph_store

                update_graph_store(
                    spark,
                    graph_store_dir,
                    deleted_paths=deletes.select(
                        F.lit("default").alias("tenant_id"),
                        F.col("path").alias("file_path"),
                    ),
                )
            if signature_store_path is not None:
                from ..functions.hashing import md5_hash64
                from ..operators.dedup import update_signature_store

                update_signature_store(
                    spark,
                    signature_store_path,
                    deleted_ids=deletes.select(
                        md5_hash64(F.col("path")).alias("doc_id")
                    ),
                )
            if feature_store_path is not None:
                from ..functions.hashing import md5_hash64
                from ..operators.feature_store import update_feature_store

                update_feature_store(
                    spark,
                    feature_store_path,
                    deleted_ids=deletes.select(
                        md5_hash64(F.col("path")).alias("doc_id")
                    ),
                )
            if gram_index_path is not None:
                from ..operators.grep import update_gram_index

                update_gram_index(
                    spark,
                    gram_index_path,
                    deleted_ids=deletes,
                    id_col="path",
                    id_type="string",
                )
            if ppl_store_path is not None:
                from ..operators.textstats import update_ppl_store

                update_ppl_store(
                    spark,
                    ppl_store_path,
                    lm_model,
                    deleted_ids=deletes.select(
                        F.col("path").alias("doc_id")
                    ),
                    id_type="string",
                    order=lm_order,
                )
    except Exception as exc:  # W3: dead-letter the failed batch with the error
        # Poison rows already went to the DLQ with their row-level reason;
        # dead-lettering the raw batch again would write them twice. Once
        # the split has happened, only the post-split processable rows are
        # dead-lettered; before the split (filter/debounce failure) the
        # raw batch is the right unit.
        to_dlq = processable if processable is not None else batch
        (
            to_dlq.withColumn("error", F.lit(str(exc)[:500]))
            .write.mode("append")
            .parquet(dlq_path)
        )
    finally:
        created = ckpt.persistent_ids(spark) - ids_at_entry
        ckpt.release(spark, created - ckpt._PINNED)


def dead_letter_split(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """W3 row-level DLQ classification (unified_queue_schema/sql.rs:32-45):
    an upsert with NULL or empty content is poison — it cannot be chunked
    or embedded and would otherwise fail the whole batch. Returns
    (dead_lettered rows with a `reason` column, processable rows). Pure
    column predicates; at scale this is a single pass with no shuffle."""
    poison = (F.col("event_type") != "remove") & (
        F.col("content").isNull() | (F.length("content") == 0)
    )
    dlq = events.filter(poison).withColumn(
        "reason",
        F.when(F.col("content").isNull(), "null_content").otherwise(
            "empty_content"
        ),
    )
    return dlq, events.filter(~poison)


def apply_events(
    base: DataFrame, events: DataFrame, base_hashed: bool = False
) -> DataFrame:
    """S10/W1/W5 batch semantics of process_batch without the sink: debounce
    (last event per path wins), split remove/upsert, content-hash-gated
    merge. Returns the post-merge store state (path, file_hash, status)
    where status records the W5 decision: 'kept' (no event, a remove of an
    absent path, or an upsert whose content hash matches the store —
    the dedup skip of ingest.rs:86-106), 'updated', or 'inserted'.

    100 TB shape: equi-joins on path only, no broadcast assumptions, no
    Python UDFs; on Delta/Iceberg the final select is the MERGE INTO
    condition column for column.

    base:   (path, content), or (path, file_hash) with base_hashed=True —
            the store-state shape apply_events itself emits, so a second
            application (the W2 idempotency probe) composes directly.
    events: (path, event_type in {'upsert','remove'}, content, ts)
    """
    last = debounce_batch(events)
    removes = last.filter(F.col("event_type") == "remove").select("path")
    ups = last.filter(F.col("event_type") == "upsert").select(
        "path", F.md5(F.col("content").cast("binary")).alias("__new_hash")
    )
    if base_hashed:
        b = base.select("path", F.col("file_hash").alias("__old_hash"))
    else:
        b = base.select(
            "path", F.md5(F.col("content").cast("binary")).alias("__old_hash")
        )
    return (
        b.join(ups, "path", "full_outer")
        .join(removes, "path", "left_anti")
        .select(
            "path",
            F.coalesce("__new_hash", "__old_hash").alias("file_hash"),
            F.when(F.col("__old_hash").isNull(), F.lit("inserted"))
            .when(
                F.col("__new_hash").isNull()
                | (F.col("__new_hash") == F.col("__old_hash")),
                F.lit("kept"),
            )
            .otherwise(F.lit("updated"))
            .alias("status"),
        )
    )


def run_ingestion_stream(
    spark: SparkSession,
    events_dir: str,
    store_path: str,
    dlq_path: str,
    checkpoint_dir: str,
    ignore_globs: list[str] | None = None,
    allow_globs: list[str] | None = None,
    watchdog: EmbeddingWatchdog | None = None,
    park_path: str | None = None,
    postings_path: str | None = None,
    graph_store_dir: str | None = None,
    signature_store_path: str | None = None,
    feature_store_path: str | None = None,
    gram_index_path: str | None = None,
    ppl_store_path: str | None = None,
    lm_model=None,
    ppl_gate: float | None = None,
    lm_order: int = 2,
    qc_weights=None,
    qc_gate: float | None = None,
) -> None:
    """File-source stream of watcher events (json lines), processed with
    exactly-once effect via checkpoint + idempotent upsert. Uses
    availableNow so tests drain the backlog and stop. Pass a watchdog +
    park_path to get W8 degraded-mode behavior per micro-batch. All
    six maintained sinks (postings / symbol graph / minhash signatures
    / doc features / trigram gram index / frozen-LM perplexity scores)
    thread through to process_batch, so stream deletes prune every
    store; ppl_gate (with lm_model) applies the CCNet perplexity filter
    per micro-batch, and qc_gate (with qc_weights) the GPT-3-style
    trained-classifier filter — stacked after it, each with its own
    DLQ reason.

    lm_model materialization contract: process_batch references the
    model several times per micro-batch (three scoring joins + the
    store maintenance); if the caller passes the LAZY output of
    textstats.kn_bigram_model, the whole training chain would re-run
    on every reference. The stream therefore pins the model ONCE here
    (localCheckpoint, session-pinned so process_batch's per-call
    checkpoint hygiene never releases it) — callers may pass either a
    lazy or a materialized model."""
    from .. import ckpt

    lm_pins: set[int] = set()
    try:
        # pins INSIDE the try (ADVICE r11): an exception while building
        # or starting the stream must release them too, not leak the
        # localCheckpoint blocks for the session
        if lm_model is not None:
            lm_model, lm_pins = ckpt.pin_tracked(
                spark, lm_model.localCheckpoint
            )
        if qc_weights is not None:
            # same materialization contract as lm_model: (dim+1)-row
            # weight table pinned once per stream, never re-derived
            qc_weights, qc_pins = ckpt.pin_tracked(
                spark, qc_weights.localCheckpoint
            )
            lm_pins |= qc_pins
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            # W7 warmup throttling analog; per-tenant anti-starvation
            # alternation is run_fair_ingestion_stream below
            # (FairnessScheduler dequeue inside foreachBatch, mirroring
            # fairness_scheduler.rs)
            .option("maxFilesPerTrigger", 16)
            .json(events_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _id: process_batch(
                    spark, b, store_path, dlq_path, ignore_globs,
                    allow_globs,
                    watchdog=watchdog, park_path=park_path,
                    postings_path=postings_path,
                    gram_index_path=gram_index_path,
                    graph_store_dir=graph_store_dir,
                    signature_store_path=signature_store_path,
                    feature_store_path=feature_store_path,
                    ppl_store_path=ppl_store_path,
                    lm_model=lm_model,
                    ppl_gate=ppl_gate,
                    lm_order=lm_order,
                    qc_weights=qc_weights,
                    qc_gate=qc_gate,
                )
            )
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # the pinned model snapshot is stream-lifetime, not
        # session-lifetime: release it so repeated drains (tests, or a
        # service restarting availableNow passes) hold constant storage
        ckpt.release_pins(spark, lm_pins)


def queue_frame_from_events(
    batch: DataFrame, active_tenants: list[str] | None = None
) -> DataFrame:
    """Derive the FairnessScheduler queue shape from a watcher-event
    micro-batch (unified_queue_processor/mod.rs:49-101 maps watcher
    events into queue items the scheduler dequeues). Tenant = first path
    segment (the watch-folder model); op: remove→delete, else add;
    is_active from the caller's active-project set."""
    tenant = F.split(F.col("path"), "/").getItem(0)
    active = (
        F.lit(False)
        if not active_tenants
        else tenant.isin([str(t) for t in active_tenants])
    )
    return batch.select(
        F.concat_ws(
            "|", F.col("path"), F.col("ts").cast("long").cast("string")
        ).alias("queue_id"),
        tenant.alias("tenant_id"),
        F.lit("file").alias("item_type"),
        F.when(F.col("event_type") == "remove", "delete")
        .otherwise("add")
        .alias("op"),
        F.lit("projects").alias("collection"),
        active.cast("int").alias("is_active"),
        F.col("ts").cast("long").alias("created_ts"),
        "path",
        "event_type",
        "content",
        "ts",
    )


def run_fair_ingestion_stream(
    spark: SparkSession,
    events_dir: str,
    store_path: str,
    dlq_path: str,
    checkpoint_dir: str,
    active_tenants: list[str] | None = None,
    scheduler=None,
    processing_log_path: str | None = None,
    dequeue_batch_size: int = 10,
    **process_kwargs,
) -> None:
    """W7 end-to-end: the ingestion stream with the FairnessScheduler AS
    the per-micro-batch dequeue layer (unified_queue_processor/mod.rs:
    49-101 — the reference's processor loop asks the scheduler for the
    next batch and processes exactly that batch, in that order).

    foreachBatch: map the micro-batch to the queue shape, then drain it
    through the scheduler — each dequeued batch is processed via
    process_batch IN DEQUEUE ORDER, so an active tenant's burst cannot
    starve an inactive tenant's items within a trigger (the asymmetric
    10/3 alternation yields to the low-priority pass between high
    batches). The scheduler's alternation state carries ACROSS
    micro-batches, exactly like the reference's long-lived
    AlternationState. Each dequeued item appends (seq, batch_no,
    queue_id, tenant_id) to processing_log_path so tests and operators
    can audit the interleaving the stream actually executed."""
    from .fairness import FairnessScheduler, drain_fairly

    sched = scheduler or FairnessScheduler()
    seq_state = {"seq": 0}

    def _one_trigger(b: DataFrame, _id: int) -> None:
        from .. import ckpt

        before = ckpt.persistent_ids(spark)
        qf = queue_frame_from_events(b, active_tenants).localCheckpoint()
        try:
            now_ts = (
                qf.agg(F.max("created_ts")).first()[0] or 0
            ) + 1
            batches = drain_fairly(
                sched, qf, max_batch_size=dequeue_batch_size, now_ts=now_ts
            )
            for bno, rows in enumerate(batches):
                if processing_log_path is not None:
                    log = spark.createDataFrame(
                        [
                            (seq_state["seq"] + i, bno, r["queue_id"], r["tenant_id"])
                            for i, r in enumerate(rows)
                        ],
                        "seq long, batch_no int, queue_id string, tenant_id string",
                    )
                    log.write.mode("append").parquet(processing_log_path)
                seq_state["seq"] += len(rows)
                ids = {r["queue_id"] for r in rows}
                sub = qf.filter(F.col("queue_id").isin(list(ids))).select(
                    "path", "event_type", "content", "ts"
                )
                process_batch(
                    spark, sub, store_path, dlq_path, **process_kwargs
                )
        finally:
            # the trigger's queue checkpoint is consumed; same per-call
            # release discipline as process_batch
            created = ckpt.persistent_ids(spark) - before
            ckpt.release(spark, created - ckpt._PINNED)

    q = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .json(events_dir)
        .writeStream.foreachBatch(_one_trigger)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def reconcile_frames(fs_snapshot: DataFrame, store: DataFrame) -> DataFrame:
    """W6 core: (path, status) diff of a filesystem snapshot (path,
    content) against store hashes (path, store_hash) — 'missing_in_store'
    (needs ingest), 'stale_in_store' (needs delete), 'hash_mismatch'
    (needs re-ingest). One full-outer equi-join on path; no skew risk
    (paths are unique on both sides)."""
    fs = fs_snapshot.select(
        "path", F.md5(F.col("content").cast("binary")).alias("fs_hash")
    )
    j = fs.join(store, "path", "full_outer")
    return j.select(
        "path",
        F.when(F.col("store_hash").isNull(), "missing_in_store")
        .when(F.col("fs_hash").isNull(), "stale_in_store")
        .when(F.col("fs_hash") != F.col("store_hash"), "hash_mismatch")
        .otherwise("ok")
        .alias("status"),
    ).filter(F.col("status") != "ok")


def reconcile(
    spark: SparkSession, fs_snapshot: DataFrame, store_path: str
) -> DataFrame:
    """W6 over the parquet chunk store (startup/reconciliation/mod.rs)."""
    schema = (
        "path STRING, file_hash STRING, chunk_index INT, content STRING, "
        "embedding ARRAY<DOUBLE>"
    )
    store = (
        _read_store(spark, store_path, schema)
        .select("path", F.col("file_hash").alias("store_hash"))
        .distinct()
    )
    return reconcile_frames(fs_snapshot, store)


def repair(
    spark: SparkSession,
    fs_snapshot: DataFrame,
    store_path: str,
    dlq_path: str,
    embed_fn=None,
) -> DataFrame:
    """W6 closing the loop (startup/reconciliation/mod.rs enqueues the
    diff as watcher events; here the diff IS the event batch): paths
    missing from / mismatched in the store re-ingest through the normal
    micro-batch path — same chunking, dedup-before-embed, idempotent
    upsert and DLQ discipline — and stale store paths delete. Returns
    the applied diff; a reconcile() immediately after repair is empty
    (the convergence contract, asserted in test_streaming).

    Scale: the diff is the full-outer path join reconcile() already does;
    the repair batch is bounded by the DIFF size, not the corpus — a
    steady-state reconciliation touches only what drifted."""
    diff = reconcile(spark, fs_snapshot, store_path).localCheckpoint()
    upserts = (
        fs_snapshot.join(
            diff.filter(F.col("status") != "stale_in_store").select("path"),
            "path",
        ).select(
            "path",
            F.lit("modify").alias("event_type"),
            "content",
            F.lit(None).cast("timestamp").alias("ts"),
        )
    )
    deletes = diff.filter(F.col("status") == "stale_in_store").select(
        "path",
        F.lit("remove").alias("event_type"),
        F.lit(None).cast("string").alias("content"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    batch = upserts.unionByName(deletes)
    if len(batch.take(1)) > 0:
        process_batch(spark, batch, store_path, dlq_path, embed_fn=embed_fn)
    return diff


def compact_store(
    spark: SparkSession,
    store_path: str,
    target_rows_per_file: int = 100_000,
) -> dict:
    """Operational compaction for the incrementally-maintained parquet
    stores (chunk store, postings, DLQ are all append/overwrite-churned):
    rewrite into ceil(rows / target_rows_per_file) range-partitioned
    files ordered by path — the small-file problem is THE operational
    failure mode of incremental upsert at 100 TB (every micro-batch
    emits files; scan cost grows with file count, not data size), and
    range-by-path layout keeps per-tenant scans clustered so path-prefix
    predicates prune whole files via parquet min/max. Returns
    {files_before, files_after, rows} for the maintenance log.

    Content is bit-identical before/after (asserted in test_streaming);
    at production scale this is OPTIMIZE/rewrite_data_files — same plan:
    read, range-repartition on the layout key, atomic overwrite."""
    import glob as _glob

    def _n_files() -> int:
        return len(_glob.glob(os.path.join(store_path, "*.parquet")))

    before = _n_files()
    df = spark.read.parquet(store_path)
    rows = df.count()
    n_out = max(1, -(-rows // target_rows_per_file))
    (
        df.repartitionByRange(n_out, "path")
        .sortWithinPartitions("path")
        .localCheckpoint()
        .write.mode("overwrite")
        .parquet(store_path)
    )
    return {"files_before": before, "files_after": _n_files(), "rows": rows}
