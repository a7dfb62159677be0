"""Document extraction breadth (S3): PDF / EPUB / OCR ingestion plumbing.

Parity target: the reference's document_processor extraction pipeline
(document_processor/extraction/, ocr.rs:1-119): bytes → format detection
(magic numbers) → per-format text extractor → chunking. Here the
format dispatch, schema, and Arrow batch shape are real; the PDF/EPUB
parsers and OCR engine are STUBBED with deterministic digest fakes (no
parser/OCR libraries in this container) behind a `use_real` flag whose
True branch is a declared NotImplementedError — swapping in pypdf /
ebooklib / tesseract means replacing one function body each.

Scale shape: detection is a pure column expression on the first bytes
(pushdown-friendly); extraction is `mapInPandas` over Arrow batches, so
document bytes stay columnar and never round-trip row-at-a-time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PDF_MAGIC = b"%PDF"
ZIP_MAGIC = b"PK\x03\x04"  # epub = zip container (mimetype application/epub+zip)

EXTRACT_SCHEMA = "doc_id BIGINT, format STRING, text STRING, n_chars INT"


def detect_format(media: Column) -> Column:
    """Magic-number dispatch (extraction/ router): '%PDF' → pdf,
    zip local-file header → epub, else plain text. A column expression —
    at scale this predicate prunes before any Python runs."""
    head = F.substring(media, 1, 4)
    return (
        F.when(head == F.lit(PDF_MAGIC), F.lit("pdf"))
        .when(head == F.lit(ZIP_MAGIC), F.lit("epub"))
        .otherwise(F.lit("text"))
    )


def _extract_bytes(payload: bytes, fmt: str, use_real: bool = False) -> str:
    """Per-format extractor. Plain text decodes for real; pdf/epub are
    deterministic digest fakes unless `use_real` (declared stub)."""
    if fmt == "text":
        return payload.decode("utf-8", errors="replace")
    if use_real:
        raise NotImplementedError(
            f"real {fmt} extraction requires a parser library "
            "(pypdf / ebooklib); deterministic fake is the default"
        )
    return f"{fmt}:{hashlib.md5(payload).hexdigest()}"


def ocr_extract(payload: bytes, use_real: bool = False) -> str:
    """OCR slot (ocr.rs:1-119). No OCR engine in this container."""
    if use_real:
        raise NotImplementedError("OCR requires tesseract or equivalent")
    return f"ocr:{hashlib.md5(payload).hexdigest()}"


def extract_text(
    files: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    use_real: bool = False,
) -> DataFrame:
    """(doc_id, format, text, n_chars) — format-dispatched extraction over
    Arrow batches (mapInPandas); bytes never leave the executors."""
    fmt_df = files.select(
        F.col(id_col).alias("doc_id"),
        F.col(media_col).alias("media"),
        detect_format(F.col(media_col)).alias("format"),
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = [
                _extract_bytes(bytes(m), f, use_real)
                for m, f in zip(pdf["media"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "text": texts,
                    "n_chars": [len(t) for t in texts],
                }
            )

    return fmt_df.mapInPandas(_batches, EXTRACT_SCHEMA)
