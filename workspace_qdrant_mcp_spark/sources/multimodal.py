"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference ingests images through a CLIP path (S5, image_ingestion/ +
the 512-dim `images` collection, multi_tenant.rs:104-126). At 100 TB the
pattern generalizes: media travels as a `binary` column with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched `mapInPandas` stages so bytes never round-trip through
Python row-at-a-time.

The decode step itself is STUBBED: this container ships no image/audio
libraries, so `_decode_media` produces a deterministic md5-derived feature
fake. The Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested; swapping in PIL/torchaudio/ffmpeg means
replacing ONE function body (see the NotImplementedError branch).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id BIGINT, modality STRING, media BINARY, "
    "mime STRING, width INT, height INT, duration_s DOUBLE"
)

FEATURE_DIM = 8

FEATURE_SCHEMA = (
    "asset_id BIGINT, modality STRING, n_bytes INT, "
    f"features ARRAY<DOUBLE>"
)


def build_assets(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal asset table from documents: the
    text bytes stand in for media payloads; modality cycles by doc_id."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.col("text").cast("binary").alias("media"),
        F.when(modality == "image", "image/png")
        .when(modality == "audio", "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        F.when(modality == "image", (F.col("n_chars") % 640) + 1)
        .cast("int")
        .alias("width"),
        F.when(modality == "image", (F.col("n_chars") % 480) + 1)
        .cast("int")
        .alias("height"),
        F.when(modality != "image", F.col("n_chars") / 10.0).alias("duration_s"),
    )


def _decode_media(media: bytes, modality: str, use_real_decoder: bool = False) -> list[float]:
    """STUB decode. Real implementation would be:
        image → PIL.Image.open(io.BytesIO(media)) → resize → pixel stats
        audio → torchaudio.load → mel-spectrogram pooling
        video → ffmpeg frame sample → per-frame image path
    None of those libraries exist in this container, so the deterministic
    fake below derives FEATURE_DIM pseudo-features from the byte digest."""
    if use_real_decoder:
        raise NotImplementedError(
            "real media decoding requires PIL/torchaudio/ffmpeg — not "
            "available in this environment; deterministic fake in use"
        )
    digest = hashlib.md5(modality.encode() + b"|" + media).digest()
    return [
        (int.from_bytes(digest[2 * i : 2 * i + 2], "big") % 10000) / 10000.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — Arrow batches in, Arrow batches out.
    Each batch is processed columnar-side; only the decode call itself is
    per-asset (unavoidable for codecs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_media(m, mod)
                for m, mod in zip(pdf["media"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(m) for m in pdf["media"]],
                    "features": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    (the decode of each frame is the stubbed step). Demonstrates the
    explode-by-duration shape that keeps sampling distributed."""
    vids = assets.filter(F.col("modality") == "video")
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("duration_s") / F.lit(every_s)).cast("int")
    )
    return vids.select(
        "asset_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"),
    ).select(
        "asset_id", "frame_idx", (F.col("frame_idx") * every_s).alias("t_offset_s")
    )
