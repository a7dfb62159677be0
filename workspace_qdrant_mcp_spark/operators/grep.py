"""Line-level exact/regex grep over code_lines (the reference's grep tool).

Parity targets (SURVEY §2.4):
  T1 exact search — the reference does trigram MATCH prefilter + INSTR exact
     verify (text_search/exact_search/query_builder.rs:12-60). In Spark the
     parallel scan with a pushed `instr` predicate IS the fast path; the
     reference itself switches to a file scan above 5,000 candidates
     (grep_search/mod.rs:20-26), i.e. its scale path converges on ours.
  T2 regex search — literal-prefilter + regex verify → `rlike` (Catalyst
     keeps it in codegen); an optional `contains` prefilter mirrors the
     trigram-literal optimization for selective literals.
  T4 context lines — N lines before/after each match: a window over
     (doc, line_number), no self-join (always-emit contract,
     client/src/search/exact.rs:77-88).
  T6 scope filters + max_results (default 1000, definitions.rs:350-353).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_RESULTS = 1000


def grep_exact(
    lines: DataFrame,
    pattern: str,
    case_insensitive: bool = False,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact substring match over (doc_id, line_number, content)."""
    content = F.lower(F.col("content")) if case_insensitive else F.col("content")
    pat = pattern.lower() if case_insensitive else pattern
    return (
        lines.filter(F.instr(content, pat) > 0)
        .orderBy(F.asc(id_col), F.asc("line_number"))
        .limit(max_results)
    )


def grep_regex(
    lines: DataFrame,
    pattern: str,
    prefilter_literal: str | None = None,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
) -> DataFrame:
    """Regex match; an optional literal `contains` prefilter short-circuits
    the regex the way the reference's trigram-literal extraction does
    (text_search/mod.rs:15-21) — cheap contains first, regex verify after."""
    df = lines
    if prefilter_literal:
        df = df.filter(F.instr(F.col("content"), prefilter_literal) > 0)
    return (
        df.filter(F.col("content").rlike(pattern))
        .orderBy(F.asc(id_col), F.asc("line_number"))
        .limit(max_results)
    )


def with_context(
    lines: DataFrame,
    matches: DataFrame,
    n: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Attach context_before / context_after (joined with newline) to each
    match. Context is computed over the FULL line table with a window, then
    inner-joined to the matches — no per-match self-join storm. Context
    fields are always present (empty string at file edges), matching the
    always-emit contract (exact.rs:77-88)."""
    w = Window.partitionBy(id_col).orderBy("line_number")
    ctx = lines.select(
        id_col,
        "line_number",
        F.array_join(
            F.collect_list("content").over(w.rowsBetween(-n, -1)), "\n"
        ).alias("context_before"),
        F.array_join(
            F.collect_list("content").over(w.rowsBetween(1, n)), "\n"
        ).alias("context_after"),
    )
    return matches.join(ctx, [id_col, "line_number"])


def build_gram_index(
    lines: DataFrame, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, gram) — distinct char n-grams per document over line
    content: the candidate index of the reference's exact_search trigram
    MATCH prefilter (text_search/exact_search/query_builder.rs:12-60,
    FTS5 trigram tokenizer). Grams are LOWERCASED (char_shingles folds
    case, matching FTS5's case-folding tokenizer) — so candidate
    generation must fold the PATTERN's grams too (grep_exact_indexed
    does), making candidates a case-insensitive SUPERSET of the
    case-sensitive matches; the instr verify stage restores exactness.
    A prefilter may be coarser than its verifier, never finer. One
    explode + distinct; maintained incrementally at ingest via
    update_gram_index."""
    from ..functions.text import char_shingles

    return (
        lines.select(
            F.col(id_col),
            F.explode(char_shingles(F.col("content"), n)).alias("gram"),
        )
        .distinct()
    )


def read_gram_index(
    spark, store_path: str, id_col: str = "doc_id", id_type: str = "long"
) -> DataFrame:
    """The maintained (doc_id, gram) table; empty-typed frame only when
    MISSING — an unreadable store aborts loudly (the read_postings
    discipline)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    return spark.createDataFrame([], f"{id_col} {id_type}, gram string")


def update_gram_index(
    spark,
    store_path: str,
    changed_lines: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    n: int = 3,
    id_col: str = "doc_id",
    id_type: str = "long",
) -> None:
    """Incremental maintenance of the grep candidate index: drop the
    grams of changed/deleted documents (one anti-join on the doc key),
    append the recomputed grams of the changed documents only —
    the postings-store skeleton applied to T1/T3's trigram index.
    INVARIANT (asserted in tests): after any update sequence the store
    equals build_gram_index over the current corpus."""
    from ..store_util import overwrite_store, union_keys

    overwrite_store(
        store_path,
        read_gram_index(spark, store_path, id_col, id_type),
        id_col,
        gone=union_keys(id_col, changed_lines, deleted_ids),
        fresh=(
            build_gram_index(changed_lines, n, id_col)
            if changed_lines is not None
            else None
        ),
    )


def grep_exact_indexed(
    lines: DataFrame,
    gram_index: DataFrame,
    pattern: str,
    n: int = 3,
    case_insensitive: bool = False,
    max_results: int = DEFAULT_MAX_RESULTS,
    id_col: str = "doc_id",
    id_pushdown: int = 0,
) -> DataFrame:
    """T3 — the COST-BASED ENGINE SWITCH, previously scoped n/a: exact
    grep served off the maintained gram index when the query qualifies,
    full parallel scan otherwise (the reference's own architecture:
    trigram MATCH candidates + INSTR verify, falling back to the file
    scan engine when the index can't help, grep_search/mod.rs:2-26).

    Qualifies = case-sensitive literal of length >= n. Candidates = docs
    whose gram set contains ALL of the pattern's distinct LOWERCASED
    n-grams (the index is lowercase — char_shingles folds case, so raw
    mixed-case pattern grams could never match and would silently prune
    every hit; r8 ADVICE). Folding makes the candidate set a
    case-insensitive SUPERSET, and LOSSLESS by construction: a line
    containing the literal contributes every one of its lowercased
    n-grams to its document's gram set, so no matching document can be
    pruned (the fuzzy_term_pairs discipline: the driver oracle IS the
    full-scan query, so the hash match certifies losslessness); the
    unchanged case-sensitive instr verify restores exactness.
    Non-qualifying queries (short literal, case-folded search) take the
    scan path unchanged.

    Scale shape: the pattern's grams are a tiny broadcast list; the
    candidate aggregate runs over the index (docs × distinct-grams, far
    smaller than the line table), and the verify scan reads only
    candidate documents via one semi-join — the corpus-wide line scan
    happens exactly never for selective literals."""
    if case_insensitive or len(pattern) < n:
        # the switch's scan arm — the index cannot serve this query
        return grep_exact(
            lines, pattern, case_insensitive, max_results, id_col
        )
    folded = pattern.lower()
    grams = sorted({folded[i : i + n] for i in range(len(folded) - n + 1)})
    # isin, not a broadcast join: an IN literal reaches the parquet scan
    # as a pushed filter (row-group/dictionary pruning on the gram
    # column), so the cold-store read touches only matching pages; on
    # the pinned in-memory snapshot it is a plain predicate with no
    # join/exchange at all
    cand = (
        gram_index.filter(F.col("gram").isin(grams))
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("__k"))
        .filter(F.col("__k") == len(grams))
        .select(id_col)
    )
    if id_pushdown > 0:
        # point-lookup arm (the reference fetches candidate rows by
        # rowid, grep_search/mod.rs): collect the candidate doc ids —
        # BOUNDED by id_pushdown — and push them into the line scan as
        # an IN literal, which reaches a parquet source as a pushed
        # filter (row-group min/max pruning on a sorted id column). A
        # broad pattern whose candidates exceed the cap falls through to
        # the distributed semi-join — the cost-based switch's third arm:
        # scan / semi-join / id-pushdown by selectivity.
        ids = [r[0] for r in cand.limit(id_pushdown + 1).collect()]
        if len(ids) <= id_pushdown:
            pruned = (
                lines.filter(F.col(id_col).isin(ids))
                if ids
                else lines.filter(F.lit(False))
            )
            return grep_exact(pruned, pattern, False, max_results, id_col)
    pruned = lines.join(cand, id_col, "left_semi")
    return grep_exact(pruned, pattern, False, max_results, id_col)
