"""Text-analysis operators for large-scale training-data pipelines:
language-ID (marker-word heuristic), quality scoring, token counting,
document fingerprinting. All JVM-side column expressions over the
documents table — a narrow map over the scan, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import LANG_MARKERS, quality_features
from ..io import fan_out


def _ws_tokens(text: Column) -> Column:
    toks = F.split(F.lower(text), "\\s+")
    return F.filter(toks, lambda t: F.length(t) > 0)


# GPT-2-ish pre-tokenizer classes: letter runs, single digits, single
# punctuation marks (whitespace is never a token). Same RE2/Java-regex
# semantics in both engines.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, ws_tokens, bpe_tokens) — whitespace split count plus the
    BPE-ish regex count (letter runs / digits / punctuation marks). Both
    are single regexp passes inside whole-stage codegen."""
    t = F.col(text_col)
    return fan_out(docs).select(
        F.col(id_col),
        F.size(_ws_tokens(t)).alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).cast("int").alias("bpe_tokens"),
    )


def duckdb_token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                            t -> length(t) > 0)) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS INT) AS bpe_tokens
FROM documents
"""


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit count per language (n-gram heuristic's word level)."""
    toks = _ws_tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred) — argmax of marker counts; ties broken by
    language code ascending (deterministic)."""
    scores = lang_scores(F.col(text_col))
    langs = sorted(scores)
    pred = F.lit(langs[0])
    best = scores[langs[0]]
    for lang in langs[1:]:
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    return fan_out(docs).select(F.col(id_col), pred.alias("lang_pred"))


def quality_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, punct_ratio, stopword_ratio, mean_word_len, quality)
    — quality = clamp01(0.5*stopword_ratio + 0.5*(1 - punct_ratio))
    shifted by a length prior (docs under 20 tokens get halved)."""
    feats = quality_features(F.col(text_col))
    base = 0.5 * feats["stopword_ratio"] + 0.5 * (1.0 - feats["punct_ratio"])
    quality = F.when(feats["n_tokens"] < 20, base * 0.5).otherwise(base)
    return fan_out(docs).select(
        F.col(id_col),
        feats["n_tokens"].alias("n_tokens"),
        F.round(feats["punct_ratio"], 6).alias("punct_ratio"),
        F.round(feats["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(feats["mean_word_len"], 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp) — 16-hex-char content fingerprint of the normalized text
    (lowercased, whitespace collapsed). The md5 prefix is the distributed
    analog of the reference's content-hash dedup key (file_hash,
    chunk_embed/payload.rs)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " ")
    return fan_out(docs).select(
        F.col(id_col),
        F.substring(F.md5(norm.cast("binary")), 1, 16).alias("fp"),
    )
