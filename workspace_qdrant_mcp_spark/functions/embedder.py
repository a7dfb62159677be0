"""Deterministic mock embedder — seeded hash projection (SURVEY §7 M0).

Correctness tests must not depend on a real model (FIXTURES.md §2), so the
mock maps text → L2-normalized dim-D vector via md5-keyed per-dimension
hashes. Pure column expressions; bit-reproducible; oracle-expressible.

A real provider (the reference's pluggable DenseProvider,
embedding/generator.rs:22-33) slots in as a Pandas UDF with the same
(text → array<double>) signature; batching + dedup-before-embed (the phrase
cache analog) live in the caller, not the UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import duckdb_md5_hash64_sql, md5_hash64

MOCK_DIM = 16


def mock_embed(text: Column, dim: int = MOCK_DIM) -> Column:
    """text → array<double>[dim], components in [-0.5, 0.5), L2-normalized."""
    comps = F.array(
        *[
            (md5_hash64(text, salt=f"e{d}|") % 10000).cast("double") / 10000.0 - 0.5
            for d in range(dim)
        ]
    )
    nrm = F.sqrt(
        F.aggregate(comps, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return F.transform(comps, lambda x: x / nrm)


def embed_unique(df, embed_fn=mock_embed, text_col: str = "content", out_col: str = "embedding"):
    """Phrase-cache analog (generator.rs:176-302 + phrase_cache.rs:1-197):
    the provider is invoked once per DISTINCT text, results join back to
    every row. The reference partitions a batch into cache hits/misses and
    embeds only the misses; in a stateless Spark batch the equivalent
    discipline is dropDuplicates-before-embed — the provider (the slow,
    possibly remote path) never sees the same phrase twice per batch.

    `embed_fn` is any Column→Column embedding (the built-in mock or a real
    Pandas-UDF provider). Join-back is on the text itself; Spark hashes the
    key for the shuffle, so at 100 TB this is the standard repeated-phrase
    dedup join, not a driver-side cache."""
    from pyspark.sql import functions as _F

    uniq = df.select(text_col).distinct()
    emb = uniq.withColumn(out_col, embed_fn(_F.col(text_col)))
    return df.join(emb, text_col, "left")


def splade_sparse_stub(texts, vocab_size: int = 30522):
    """R6 SPLADE++ neural sparse encoder slot (generator.rs:337-388,
    BERT vocab 30522). The model is not available in this environment; a
    real deployment registers this as an Arrow-batched pandas UDF returning
    MapType(IntegerType, FloatType) term→weight activations with the same
    batching/dedup wrapper the mock embedder uses."""
    raise NotImplementedError(
        "SPLADE sparse encoding requires a neural model runtime; "
        "BM25 (operators/bm25.py) is the default sparse path"
    )


def duckdb_mock_embed_sql(text_expr: str, dim: int = MOCK_DIM) -> str:
    comps = ", ".join(
        f"(({duckdb_md5_hash64_sql(text_expr, salt=f'e{d}|')}) % 10000) / 10000.0 - 0.5"
        for d in range(dim)
    )
    arr = f"[{comps}]"
    nrm = (
        f"sqrt(list_sum(list_transform({arr}, x -> x * x)))"
    )
    return f"list_transform({arr}, x -> x / {nrm})"
