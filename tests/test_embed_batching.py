"""Dedup-before-embed wrapper (the phrase-cache analog,
generator.rs:176-302): the provider sees each distinct text once per
batch; results join back to every row.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
the UDF signature from real (non-stringified) type hints.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf

from workspace_qdrant_mcp_spark.functions.embedder import embed_unique, mock_embed


def test_embed_unique_invokes_provider_once_per_distinct_text(spark):
    calls = spark.sparkContext.accumulator(0)

    @pandas_udf("array<double>")
    def counting_embed(s: pd.Series) -> pd.Series:
        calls.add(len(s))
        return s.map(lambda t: [float(len(t))])

    df = spark.createDataFrame(
        [("dup text",), ("dup text",), ("other",), ("dup text",)], ["content"]
    )
    out = embed_unique(df, embed_fn=counting_embed).collect()
    assert len(out) == 4
    assert {tuple(r["embedding"]) for r in out} == {(8.0,), (5.0,)}
    assert calls.value == 2  # 2 distinct texts, not 4 rows


def test_embed_unique_matches_direct_mock_embedding(spark):
    df = spark.createDataFrame([("alpha", 1), ("alpha", 2), ("beta", 3)],
                               ["content", "k"])
    via_wrapper = {
        r["k"]: tuple(r["embedding"])
        for r in embed_unique(df, embed_fn=mock_embed).collect()
    }
    from pyspark.sql import functions as F

    direct = {
        r["k"]: tuple(r["embedding"])
        for r in df.withColumn("embedding", mock_embed(F.col("content"))).collect()
    }
    assert via_wrapper == direct


def test_hash_ngram_provider_is_a_real_vectorizer(spark):
    """The hash-ngram provider exercises the Arrow pandas-UDF slot with a
    genuine vectorizer: deterministic, unit-norm, and similarity-bearing
    (near-duplicate texts score higher cosine than unrelated ones) —
    properties the mock's salted projection does not give."""
    import math

    from workspace_qdrant_mcp_spark.functions import embedder

    docs = spark.createDataFrame(
        [
            ("the quick brown fox jumps over the lazy dog",),
            ("the quick brown fox jumped over the lazy dog",),
            ("completely unrelated text about spark shuffles",),
        ],
        ["content"],
    )
    fn = embedder.dense_provider("hash-ngram")
    rows = embedder.embed_unique(docs, embed_fn=fn).collect()
    by_text = {r["content"]: r["embedding"] for r in rows}
    vecs = list(by_text.values())
    for v in vecs:
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9

    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    a = by_text["the quick brown fox jumps over the lazy dog"]
    b = by_text["the quick brown fox jumped over the lazy dog"]
    c = by_text["completely unrelated text about spark shuffles"]
    assert cos(a, b) > 0.8 > cos(a, c)
    # determinism across invocations
    rows2 = embedder.embed_unique(docs, embed_fn=fn).collect()
    assert {r["content"]: r["embedding"] for r in rows2} == by_text


def test_real_model_probe_and_skip(spark):
    """R1 real-model slot: when a neural runtime is importable the provider
    must produce unit-norm deterministic embeddings through the same
    pandas-UDF contract; when none is (this container), the probe reports
    None, the constructor raises the declared error, and the test skips —
    the slot stays honest without a container dependency."""
    import pytest
    from pyspark.sql import functions as F

    from workspace_qdrant_mcp_spark.functions import embedder as em

    rt = em.probe_real_runtime()
    if rt != "sentence_transformers":
        with pytest.raises(NotImplementedError):
            em.real_model_embed_udf()
        pytest.skip(f"no neural embedding runtime in container (probe={rt!r})")

    udf = em.dense_provider("neural")
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unrelated text")],
        "id long, text string",
    )
    out = {r["id"]: r["emb"] for r in df.select("id", udf(F.col("text")).alias("emb")).collect()}
    import math

    for v in out.values():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
    assert out[1] == out[2]  # deterministic: same text, same vector
    assert out[1] != out[3]


def test_real_model_composes_with_embed_unique_and_store(spark, tmp_path):
    """VERDICT r7 stretch #9: when (and only when) a neural runtime ships
    in the container, the REAL provider must auto-promote through the
    full ingest composition — embed_unique's distinct-text discipline,
    then the chunk store's upsert schema (embedding ARRAY<DOUBLE>) —
    proving the probe-and-skip slot is a drop-in for the mock on the
    real pipeline, not just on a toy select. Skips on runtime absence
    only (the probe), never on wiring."""
    import pytest
    from pyspark.sql import functions as F

    from workspace_qdrant_mcp_spark.functions import embedder as em
    from workspace_qdrant_mcp_spark.streaming import ingest

    rt = em.probe_real_runtime()
    if rt != "sentence_transformers":
        pytest.skip(f"no neural embedding runtime in container (probe={rt!r})")

    udf = em.dense_provider("neural")
    docs = spark.createDataFrame(
        [("a.txt", "h1", 0, "hello world"),
         ("a.txt", "h1", 1, "hello world"),
         ("b.txt", "h2", 0, "unrelated text")],
        "path string, file_hash string, chunk_index int, content string",
    )
    chunks = em.embed_unique(docs, embed_fn=udf).select(
        "path", "file_hash", "chunk_index", "content",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    store = str(tmp_path / "real_store")
    ingest.upsert_chunks(spark, store, chunks)
    got = spark.read.parquet(store)
    assert got.count() == 3
    assert dict(got.dtypes)["embedding"] == "array<double>"
    vecs = {(r["path"], r["chunk_index"]): r["embedding"] for r in got.collect()}
    assert vecs[("a.txt", 0)] == vecs[("a.txt", 1)]  # distinct-text dedup
    assert vecs[("a.txt", 0)] != vecs[("b.txt", 0)]
    assert all(v is not None and len(v) > 0 for v in vecs.values())
