"""BM25 tokenization and text-analysis column expressions.

Single source of truth for tokenizer semantics: the Spark column expression
and the DuckDB oracle-SQL fragment are generated from the same regex
constants, so the correctness oracle exercises byte-identical token streams.

Tokenizer parity target: `tokenize_for_bm25` in the reference
(src/rust/daemon/core/src/embedding/bm25.rs:16-54):
  split on whitespace + punctuation "(){}[]<>;:,.\"'`~!@#$%^&*+=|\\",
  trim leading/trailing '-','_','/', keep len > 1, lowercase, then drop junk
  (hex hashes >=8, version strings, path-like, hex literals, pure digits).
All expressions here are JVM-side (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Split class: whitespace plus the reference's punctuation set.
# (bm25.rs:20 — note '.' IS a separator, so "v1.2" tokenizes to "v1","2".)
_SPLIT_RE_JAVA = "[\\s(){}\\[\\]<>;:,.\"'`~!@#$%^&*+=|\\\\]+"
_SPLIT_RE_DUCK = '[\\s(){}\\[\\]<>;:,."\'\'`~!@#$%^&*+=|\\\\]+'  # '' = escaped quote

_TRIM_RE = "^[-_/]+|[-_/]+$"

# Junk filters (bm25.rs:36-54): hex hash, version, path, hex literal, digits.
_JUNK_RES = [
    "^[a-f0-9]{8,}$",
    "^v?\\d+\\.\\d+",
    "[/\\\\]",
    "^0x[a-f0-9]+$",
    "^\\d+$",
]


def _is_junk(t: Column) -> Column:
    cond = F.lit(False)
    for rx in _JUNK_RES:
        cond = cond | t.rlike(rx)
    return cond


def tokenize_bm25(text: Column) -> Column:
    """text → array<string> of BM25 tokens (reference bm25.rs:16-25 order:
    split → trim -_/ → len>1 → lowercase → junk filter)."""
    toks = F.split(text, _SPLIT_RE_JAVA)
    toks = F.transform(toks, lambda t: F.regexp_replace(t, _TRIM_RE, ""))
    # BYTE length like the reference's Rust `s.len()` (bm25.rs:23) — a
    # single multibyte char (e.g. 'é') passes; char count would drop it.
    toks = F.filter(toks, lambda t: F.octet_length(t) > 1)
    toks = F.transform(toks, F.lower)
    return F.filter(toks, lambda t: ~_is_junk(t))


def duckdb_tokenize_sql(text_expr: str) -> str:
    """DuckDB fragment producing the same token list as :func:`tokenize_bm25`."""
    junk = " OR ".join(
        "regexp_matches(t, '" + rx.replace("\\\\", "\\\\") + "')" for rx in _JUNK_RES
    )
    return (
        "list_filter(list_transform(list_filter(list_transform("
        f"string_split_regex({text_expr}, '{_SPLIT_RE_DUCK}'), "
        f"t -> regexp_replace(t, '{_TRIM_RE}', '', 'g')), "
        "t -> strlen(t) > 1), t -> lower(t)), "  # strlen = bytes, like Rust s.len()
        f"t -> NOT ({junk}))"
    )


# ---------------------------------------------------------------------------
# Text-analysis primitives (training-data pipeline operators)
# ---------------------------------------------------------------------------

# Tiny per-language stopword marker sets for the n-gram language-ID heuristic.
# Public knowledge (most-frequent function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "los", "las", "una", "por", "con", "para"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour", "sur", "avec"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
}


def whitespace_token_count(text: Column) -> Column:
    """Token count by whitespace split (cheap path of the token counter)."""
    return F.size(F.filter(F.split(text, "\\s+"), lambda t: F.length(t) > 0))


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-scoring features: length, punctuation ratio, stopword ratio,
    mean word length. All JVM-side expressions."""
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    toks = F.split(F.lower(text), "\\s+")
    toks = F.filter(toks, lambda t: F.length(t) > 0)
    n_tokens = F.size(toks)
    stop = F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        "stopword_ratio": n_stop.cast("double") / F.greatest(n_tokens, F.lit(1)).cast("double"),
        "mean_word_len": (n_chars - n_tokens + 1).cast("double")
        / F.greatest(n_tokens, F.lit(1)).cast("double"),
    }


def char_shingles(text: Column, k: int = 5) -> Column:
    """k-char shingle array over lowercased text (MinHash/Jaccard input).

    JVM-side: sequence over start offsets + substring. Empty/short text →
    single shingle of the whole text (so every doc has >=1 shingle).
    """
    t = F.lower(text)
    n = F.length(t)
    starts = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(starts, lambda i: F.substring(t, i, k)))


def duckdb_char_shingles_sql(text_expr: str, k: int = 5) -> str:
    """DuckDB fragment mirroring :func:`char_shingles`."""
    return (
        f"list_distinct(list_transform(generate_series(1, "
        f"greatest(length(lower({text_expr})) - {k - 1}, 1)), "
        f"i -> substr(lower({text_expr}), i, {k})))"
    )
