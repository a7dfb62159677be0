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


def test_ocr_matrix_round_trip_and_noise_recovery():
    """r12: OCR is real for machine-rendered glyph grids — render ->
    recognize round-trips exactly, every single-pixel flip per glyph is
    recovered (guaranteed by pairwise font Hamming distance >= 3), junk
    cells come back as '?', and non-image payloads fail loud."""
    import itertools

    import numpy as np

    from workspace_qdrant_mcp_spark.sources import multimodal as mm
    from workspace_qdrant_mcp_spark.sources import ocr

    # the recovery guarantee's precondition: min pairwise distance >= 3
    dmin = min(
        (ocr._FONT_BITS[a] ^ ocr._FONT_BITS[b]).bit_count()
        for a, b in itertools.combinations(ocr._FONT_BITS, 2)
    )
    assert dmin >= 3
    text = "THE QUICK BROWN FOX 0123456789\nJUMPS OVER, LAZY DOG: A-Z."
    png = ocr.render_text_png(text)
    assert extraction.ocr_extract(png, use_real=True) == text
    # single-pixel noise inside a glyph: nearest-template still recovers
    h, w, c, px = mm._decode_png(png)
    img = (px.reshape(h, w) * 255).astype(np.uint8)
    img[2, 2] = 255 - img[2, 2]  # flip one pixel of the first glyph
    assert extraction.ocr_extract(mm.encode_png_gray(img), use_real=True) == text
    # a cell of dense junk ink maps to '?', not a confident wrong letter
    junk = np.full((8, 6), 255, dtype=np.uint8)
    junk[0:7:2, 0:5] = 0  # stripes: far from every glyph
    got = extraction.ocr_extract(mm.encode_png_gray(junk), use_real=True)
    assert got == "?"
    with pytest.raises(ValueError, match="image container"):
        extraction.ocr_extract(b"not an image", use_real=True)
    # charset is fail-loud at render time
    with pytest.raises(ValueError, match="unsupported characters"):
        ocr.render_text_png("emoji ☃")
    # text path is real regardless
    assert extraction._extract_bytes(b"abc", "text", use_real=True) == "abc"


def test_ocr_falls_back_when_tesseract_binary_missing(monkeypatch):
    """ADVICE r12: pytesseract installed but the tesseract BINARY absent
    raises TesseractNotFoundError (not ImportError) — ocr_extract must
    still fall back to the built-in matrix engine."""
    import sys
    import types

    from workspace_qdrant_mcp_spark.sources import ocr

    class _NotFound(Exception):
        pass

    fake_pt = types.ModuleType("pytesseract")
    fake_pt.TesseractNotFoundError = _NotFound

    def _boom(img):
        raise _NotFound("tesseract is not installed or it's not in PATH")

    fake_pt.image_to_string = _boom
    fake_pil = types.ModuleType("PIL")
    fake_img = types.ModuleType("PIL.Image")
    fake_img.open = lambda b: b
    fake_pil.Image = fake_img
    monkeypatch.setitem(sys.modules, "pytesseract", fake_pt)
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", fake_img)

    png = ocr.render_text_png("FALLBACK OK")
    assert extraction.ocr_extract(png, use_real=True) == "FALLBACK OK"


def test_png_routes_through_ocr_in_extract_text(spark):
    """End-to-end S3: a PNG payload is detected as 'image' by the
    column-level magic dispatch and extract_text(use_real=True) emits
    the recognized text through the same mapInPandas lane as pdf/epub."""
    from workspace_qdrant_mcp_spark.sources import ocr

    png = ocr.render_text_png("SCANNED PAGE 7")
    files = spark.createDataFrame(
        [(0, png), (1, b"plain body")], "doc_id long, media binary"
    )
    rows = {
        r["doc_id"]: r
        for r in extraction.extract_text(files, use_real=True).collect()
    }
    assert rows[0]["format"] == "image"
    assert rows[0]["text"] == "SCANNED PAGE 7"
    assert rows[0]["n_chars"] == len("SCANNED PAGE 7")
    assert rows[1]["format"] == "text" and rows[1]["text"] == "plain body"


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
