"""Derivations over the documents corpus: code_lines and text chunks.

code_lines mirrors the reference's search.db line table
(code_lines(file_id, line_number, content) — code_lines_schema.rs:71-78).
The synthetic corpus has no newlines, so "lines" are fixed groups of
WORDS_PER_LINE whitespace tokens — a deterministic arithmetic derivation
that the DuckDB oracle reproduces exactly.

chunk_text mirrors the reference's character chunker: fixed-size chunks
with overlap (document_processor/chunking.rs:24-161; optimal 384 chars /
38 overlap per qdrant_ingestion_bench.rs:18-30).

Both are pure JVM expressions (sequence + slice/substring + explode) —
they scale as a narrow map over the scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORDS_PER_LINE = 10
CHUNK_CHARS = 384
CHUNK_OVERLAP = 38


def code_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, line_number, content) — line_number is 1-based (schema parity
    with code_lines_schema.rs; 1-based numbering per search_db contract)."""
    words = F.split(F.col(text_col), "\\s+")
    n_lines = F.ceil(F.size(words) / F.lit(WORDS_PER_LINE)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(
            F.slice(words, i * WORDS_PER_LINE + 1, WORDS_PER_LINE), " "
        ),
    )
    return docs.select(
        F.col(id_col), F.posexplode(lines).alias("pos", "content")
    ).select(id_col, (F.col("pos") + 1).alias("line_number"), "content")


def duckdb_code_lines_sql(doc_table: str = "documents") -> str:
    """Oracle CTE body producing the identical line table."""
    return f"""
words AS (SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM {doc_table}),
lines AS (
  SELECT doc_id, i AS line_number,
         array_to_string(
           list_slice(w, (i - 1) * {WORDS_PER_LINE} + 1, i * {WORDS_PER_LINE}),
           ' ') AS content
  FROM words,
       LATERAL unnest(generate_series(
         1, CAST(ceil(len(w) / {WORDS_PER_LINE}.0) AS INT))) AS t(i)
)
"""


def chunk_text(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_chars: int = CHUNK_CHARS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """(doc_id, chunk_index, content) — fixed-width character chunks with
    overlap; stride = chunk_chars - overlap. Last chunk may be short; a
    document shorter than one chunk yields exactly one chunk."""
    stride = chunk_chars - overlap
    t = F.col(text_col)
    n = F.length(t)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(t, i * stride + 1, chunk_chars),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_index", "content")
    )


def duckdb_chunk_text_sql(
    doc_table: str = "documents",
    chunk_chars: int = CHUNK_CHARS,
    overlap: int = CHUNK_OVERLAP,
) -> str:
    stride = chunk_chars - overlap
    return f"""
chunks AS (
  SELECT doc_id, i AS chunk_index,
         substr(text, i * {stride} + 1, {chunk_chars}) AS content
  FROM {doc_table},
       LATERAL unnest(generate_series(0,
         greatest(1, CAST(ceil((length(text) - {overlap}) / {stride}.0) AS INT)) - 1
       )) AS t(i)
)
"""
