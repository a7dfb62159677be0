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
