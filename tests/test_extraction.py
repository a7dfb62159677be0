"""S3 extraction plumbing: magic-number dispatch, digest-fake pdf/epub,
text passthrough, declared real-path stubs, provider registry."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.functions import embedder
from workspace_qdrant_mcp_spark.sources import extraction


def test_format_dispatch_and_extraction(spark):
    rows = [
        (0, b"%PDF-1.4\nhello"),
        (1, b"PK\x03\x04zipbody"),
        (2, b"plain old text"),
    ]
    files = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {r["doc_id"]: r for r in extraction.extract_text(files).collect()}
    assert out[0]["format"] == "pdf"
    assert out[0]["text"] == "pdf:" + hashlib.md5(rows[0][1]).hexdigest()
    assert out[1]["format"] == "epub"
    assert out[1]["text"] == "epub:" + hashlib.md5(rows[1][1]).hexdigest()
    assert out[2]["format"] == "text"
    assert out[2]["text"] == "plain old text"
    assert all(r["n_chars"] == len(r["text"]) for r in out.values())


def test_real_extractors_are_declared_stubs():
    with pytest.raises(NotImplementedError):
        extraction._extract_bytes(b"%PDF", "pdf", use_real=True)
    with pytest.raises(NotImplementedError):
        extraction.ocr_extract(b"img", use_real=True)
    # text path is real regardless
    assert extraction._extract_bytes(b"abc", "text", use_real=True) == "abc"


def test_dense_provider_registry(spark):
    assert embedder.dense_provider() is embedder.mock_embed
    embedder.register_dense_provider("unit-fake", lambda c: F.array(F.lit(1.0)))
    df = spark.createDataFrame([("x",)], ["content"])
    out = embedder.embed_unique(df, embed_fn=embedder.dense_provider("unit-fake"))
    assert out.collect()[0]["embedding"] == [1.0]
    with pytest.raises(KeyError):
        embedder.dense_provider("no-such-model")


def test_splade_postings_contract(spark):
    docs = spark.createDataFrame([(1, "alpha alpha beta")], ["doc_id", "text"])
    rows = embedder.splade_postings(docs).collect()
    # 2 surface terms x (1 + SPLADE_EXPANSIONS) activations, no collisions
    assert len(rows) == 2 * (1 + embedder.SPLADE_EXPANSIONS)
    assert all(0 <= r["term_id"] < embedder.SPLADE_VOCAB for r in rows)
    assert all(r["weight"] > 0 for r in rows)
    with pytest.raises(NotImplementedError):
        embedder.splade_encode(docs, use_real_model=True)
