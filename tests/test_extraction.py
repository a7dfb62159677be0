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


def _fixture_pdf(text: str, compress: bool) -> bytes:
    """A minimal valid one-page PDF whose content stream shows `text`
    via Tj (optionally FlateDecode-compressed), built from the public
    PDF spec — the real-extractor end-to-end fixture."""
    import zlib

    esc = text.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
    content = f"BT /F1 12 Tf 72 720 Td ({esc}) Tj ET".encode()
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"
    objs = [
        b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj",
        b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj",
        b"3 0 obj << /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R >> endobj",
        b"4 0 obj << /Length %d%s >> stream\n%s\nendstream endobj"
        % (len(content), filt, content),
    ]
    return b"%PDF-1.4\n" + b"\n".join(objs) + b"\ntrailer << /Root 1 0 R >>\n%%EOF"


def _fixture_epub(chapters: dict[str, str]) -> bytes:
    """A minimal EPUB (zip of XHTML chapters + mimetype), public OCF."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/epub+zip")
        for name, body in chapters.items():
            z.writestr(
                f"OEBPS/{name}",
                f"<html><head><style>p {{}}</style></head>"
                f"<body><p>{body}</p></body></html>",
            )
    return buf.getvalue()


def test_real_pdf_extraction_end_to_end(spark):
    """S3 real path: a genuine PDF (uncompressed and FlateDecode) flows
    through detect_format + extract_text(use_real=True) and yields the
    embedded text, not a digest."""
    plain = _fixture_pdf("Hello Spark PDF", compress=False)
    flate = _fixture_pdf("Compressed (nested) \\ text", compress=True)
    files = spark.createDataFrame(
        [(0, plain), (1, flate)], "doc_id long, media binary"
    )
    out = {
        r["doc_id"]: r
        for r in extraction.extract_text(files, use_real=True).collect()
    }
    assert out[0]["format"] == "pdf"
    assert out[0]["text"] == "Hello Spark PDF"
    assert out[1]["text"] == "Compressed (nested) \\ text"


def test_real_epub_extraction_end_to_end(spark):
    payload = _fixture_epub(
        {"ch1.xhtml": "First chapter text", "ch2.xhtml": "Second chapter"}
    )
    files = spark.createDataFrame([(0, payload)], "doc_id long, media binary")
    row = extraction.extract_text(files, use_real=True).collect()[0]
    assert row["format"] == "epub"
    assert row["text"] == "First chapter text\nSecond chapter"


def test_remaining_real_stub_is_ocr_only():
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
