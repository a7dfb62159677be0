"""Exact-mode search scoring (the reference's FTS exact mode, R17).

Parity target: client/src/search/exact.rs:62-106 — matches are returned in
index order and scored `1.0 - idx*0.001` (idx 0-based over the ordered
result list); default limit 100 (options.rs:15-19, DEFAULT_EXACT_LIMIT).

Spark-first: the "FTS index" disappears — a parallel scan with a pushed
substring predicate IS the fast path (SURVEY §2.4 T1: Spark's scan replaces
the trigram prefilter; the reference itself falls back to a file scan above
5,000 candidates, grep_search/mod.rs:20-26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_EXACT_LIMIT = 100


def exact_search(
    docs: DataFrame,
    pattern: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    case_insensitive: bool = True,
    limit: int = DEFAULT_EXACT_LIMIT,
) -> DataFrame:
    """Substring match ordered by id, scored 1.0 - idx*0.001.

    Scale shape: the match set is bounded FIRST with ``orderBy().limit()``
    (TakeOrderedAndProject — a per-partition top-``limit`` heap, no global
    sort); only then does the single-partition rank window assign ``idx``,
    over at most ``limit`` rows. Ranking before limiting would
    single-partition-sort the full unbounded match set (the shape that
    dies at 100x the corpus).
    """
    text = F.lower(F.col(text_col)) if case_insensitive else F.col(text_col)
    pat = pattern.lower() if case_insensitive else pattern
    matches = docs.filter(F.instr(text, pat) > 0).select(id_col)
    bounded = matches.orderBy(F.asc(id_col)).limit(limit)
    w = Window.orderBy(F.asc(id_col))
    return bounded.withColumn("idx", F.row_number().over(w) - 1).select(
        id_col, (F.lit(1.0) - F.col("idx") * F.lit(0.001)).alias("score")
    )


def count_matches(
    docs: DataFrame,
    pattern: str,
    text_col: str = "text",
    case_insensitive: bool = True,
) -> DataFrame:
    """Count-only variant (proto workspace_daemon.proto:647, T5)."""
    text = F.lower(F.col(text_col)) if case_insensitive else F.col(text_col)
    pat = pattern.lower() if case_insensitive else pattern
    return docs.filter(F.instr(text, pat) > 0).agg(
        F.count(F.lit(1)).alias("n_matches")
    )
