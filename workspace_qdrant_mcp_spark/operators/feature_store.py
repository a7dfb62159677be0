"""Maintained per-document text-feature store: the corpus data card
kept in lockstep with ingestion instead of recomputed per report.

The fourth maintained store next to the BM25 postings (S7), the symbol
graph (S8) and the minhash signatures — same discipline throughout:
per-doc rows, delete = one anti-join on the doc key, upsert = delete +
append of freshly computed rows for the delta only, and the INVARIANT
that after any update sequence the store equals a fresh build over the
current corpus (incremental == rebuild, asserted in tests). The
reference keeps per-chunk metadata current in its collections at ingest
(daemon writes document metadata on every upsert) rather than scanning
the corpus per query — this is that discipline applied to the
analytics-facing features.

Why it matters at 100 TB: the corpus report (_q_corpus_report) is a
full-corpus projection pass — fine nightly, wrong per-delta. With the
store maintained at ingest, the report is a groupBy over |corpus|
NARROW feature rows (five scalars per doc, no text), and the per-batch
maintenance cost is delta-sized. Features are sums/counts under the
report's aggregations, so any rollup of the store is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_features
from ..io import fan_out
from .textstats import lang_pred_col, quality_col

FEATURE_SCHEMA = (
    "doc_id long, n_chars int, ws_tokens int, quality double, "
    "lang_pred string"
)


def doc_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chars, ws_tokens, quality, lang_pred) — the per-doc
    feature row, computed from the SAME single-definition column helpers
    the batch operators use (textstats.lang_pred_col / quality_col), so
    store contents and batch reports can never drift."""
    t = F.col(text_col)
    feats = quality_features(t)
    return fan_out(docs).select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(t).cast("int").alias("n_chars"),
        feats["n_tokens"].cast("int").alias("ws_tokens"),
        F.round(quality_col(t), 6).alias("quality"),
        lang_pred_col(t).alias("lang_pred"),
    )


def read_feature_store(spark, store_path: str) -> DataFrame:
    """The maintained feature table; empty-typed frame if the store does
    not exist yet. Like the postings/signature stores, only a MISSING
    store reads as empty — an unreadable one aborts the update loudly
    (update rewrites the store as kept ∪ delta, so treating a corrupt
    read as empty would truncate it)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    return spark.createDataFrame([], FEATURE_SCHEMA)


def update_feature_store(
    spark,
    store_path: str,
    changed_docs: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Incremental maintenance: drop the rows of changed/deleted docs
    (one anti-join on doc_id), append freshly computed features of the
    changed docs only. The touched set is delta-sized; at production
    scale this is a Delta MERGE keyed on doc_id."""
    from ..store_util import overwrite_store, union_keys

    overwrite_store(
        store_path,
        read_feature_store(spark, store_path),
        "doc_id",
        gone=union_keys(
            "doc_id",
            (
                changed_docs.select(
                    F.col(id_col).cast("long").alias("doc_id")
                )
                if changed_docs is not None
                else None
            ),
            (
                deleted_ids.select(F.col("doc_id").cast("long"))
                if deleted_ids is not None
                else None
            ),
        ),
        fresh=(
            doc_features(changed_docs, id_col, text_col)
            if changed_docs is not None
            else None
        ),
    )


def corpus_card(features: DataFrame) -> DataFrame:
    """(lang_pred, n_docs, total_chars, mean_quality, mean_tokens) — the
    data-card rollup read OFF THE STORE: a groupBy over narrow feature
    rows, never touching document text. Grouped by predicted language
    (the store has no source column — ingest-keyed docs carry a path,
    not a source; callers with a source dim join it on doc_id first)."""
    return features.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("quality"), 6).alias("mean_quality"),
        F.round(F.avg("ws_tokens"), 6).alias("mean_tokens"),
    )
