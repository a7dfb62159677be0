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


# ---------------------------------------------------------------------------
# Dense provider registry (the reference's pluggable DenseProvider slot,
# generator.rs:22-33): any Column→Column expression or Arrow-batched
# pandas UDF with the (text → array<double>) contract. The mock is the
# default; a real model registers under its own name and every caller
# (embed_unique, streaming ingest, dense search) picks it up unchanged.
# ---------------------------------------------------------------------------

_DENSE_PROVIDERS: dict[str, object] = {"mock": mock_embed}

HASH_NGRAM_DIM = 256


def hash_ngram_embed_udf(dim: int = HASH_NGRAM_DIM):
    """A REAL (non-mock) dense provider through the pandas-UDF slot: the
    signed feature-hashing n-gram vectorizer (the public 'hashing trick',
    Weinberger et al. 2009; the HashingVectorizer family) over character
    3-grams + word unigrams, L2-normalized. Unlike the mock (a JVM column
    expression), this exercises the actual Arrow-batched provider path a
    neural model would use — same (text -> array<double>) contract, same
    batching, same dedup-before-embed caller discipline."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _embed(texts):
        import hashlib

        import numpy as np

        out = []
        for t in texts:
            s = (t or "").lower()
            vec = np.zeros(dim)
            feats = [s[i : i + 3] for i in range(max(0, len(s) - 2))]
            feats.extend(s.split())
            for f in feats:
                h = int.from_bytes(
                    hashlib.md5(f.encode("utf-8", "replace")).digest()[:8],
                    "little",
                )
                vec[h % dim] += 1.0 if h & (1 << 63) == 0 else -1.0
            n = float(np.linalg.norm(vec))
            out.append((vec / n).tolist() if n else vec.tolist())
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints, which pyspark's signature inference rejects
    _embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_embed, "array<double>")


REAL_MODEL_DEFAULT = "sentence-transformers/all-MiniLM-L6-v2"


def probe_real_runtime() -> str | None:
    """Probe-and-skip guard for the R1 real-model slot: return the name of
    the first importable neural-embedding runtime, or None when the
    environment has none (this container ships none — the slot then skips
    cleanly instead of hard-failing). Order matters: sentence_transformers
    is the only runtime real_model_embed_udf has a loader for; the others
    are reported so a caller can see WHAT is present."""
    for mod in ("sentence_transformers", "onnxruntime", "torch"):
        try:
            __import__(mod)
            return mod
        except Exception:
            continue
    return None


def real_model_embed_udf(model_name: str = REAL_MODEL_DEFAULT):
    """R1 real neural provider (embedding/generator.rs:22-33,176-302
    parity slot): an Arrow-batched pandas UDF that runs a
    sentence-transformers model with the same (text -> array<double>)
    contract as every other dense provider. The model loads lazily INSIDE
    the UDF — once per executor worker, never on the driver — and encodes
    whole Arrow batches (the 10-100x batching win over per-row encode).
    Raises NotImplementedError when no supported runtime is importable;
    callers use probe_real_runtime() to skip instead of failing."""
    runtime = probe_real_runtime()
    if runtime is None:
        raise NotImplementedError(
            "no neural embedding runtime importable (tried "
            "sentence_transformers, onnxruntime, torch); use "
            "probe_real_runtime() to probe-and-skip"
        )
    if runtime != "sentence_transformers":
        raise NotImplementedError(
            f"runtime {runtime!r} is importable but only a "
            "sentence_transformers loader is implemented; register a "
            "custom pandas UDF via register_dense_provider instead"
        )
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _embed(texts):
        # module-level cache, NOT a function attribute: the pickled UDF is
        # deserialized fresh per task, so an attribute on the closure would
        # reload the model every task; the worker's module dict persists
        # for the life of the python worker process
        import workspace_qdrant_mcp_spark.functions.embedder as _self

        cache = getattr(_self, "_REAL_MODEL_CACHE", None)
        if cache is None:
            cache = _self._REAL_MODEL_CACHE = {}
        model = cache.get(model_name)
        if model is None:
            from sentence_transformers import SentenceTransformer

            model = cache[model_name] = SentenceTransformer(model_name)
        vecs = model.encode(
            [t or "" for t in texts], normalize_embeddings=True
        )
        return pd.Series([[float(x) for x in v] for v in vecs])

    _embed.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_embed, "array<double>")


def register_dense_provider(name: str, fn) -> None:
    _DENSE_PROVIDERS[name] = fn


def dense_provider(name: str = "mock"):
    if name == "hash-ngram" and name not in _DENSE_PROVIDERS:
        _DENSE_PROVIDERS[name] = hash_ngram_embed_udf()
    if name == "neural" and name not in _DENSE_PROVIDERS:
        _DENSE_PROVIDERS[name] = real_model_embed_udf()
    if name not in _DENSE_PROVIDERS:
        raise KeyError(
            f"unknown dense provider {name!r}; registered: "
            f"{sorted(_DENSE_PROVIDERS)}"
        )
    return _DENSE_PROVIDERS[name]


SPLADE_VOCAB = 30522  # BERT vocab size (generator.rs:386)
SPLADE_EXPANSIONS = 2  # pseudo-expansion ids per surface term
SPLADE_DECAY = 0.3  # expansion weight decay per hop


def splade_postings(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = SPLADE_VOCAB,
    n_expansions: int = SPLADE_EXPANSIONS,
    decay: float = SPLADE_DECAY,
):
    """R6 sparse-expansion encoder (generator.rs:337-388 contract):
    (id_col, term_id, weight) posting rows with term_id ∈ [0, vocab) and
    positive saturated weights — the exact output shape of SPLADE++
    (indices into the BERT vocab + activation values), produced by a
    deterministic lexical approximation:

      surface term  → id = h(term) % vocab,  w = ln(1 + tf)
      expansion k   → id = h(term, salt k) % vocab, w = ln(1 + tf)·decay^k

    i.e. each term activates itself plus n_expansions hash-derived
    pseudo-related vocab slots, mirroring SPLADE's learned term expansion
    with an oracle-expressible stand-in. Colliding ids sum. A real
    SPLADE++ model drops in as an Arrow-batched pandas UDF with the same
    (text → postings) contract behind `use_real_model=True` in
    splade_encode; all downstream search plumbing is shared."""
    from .text import tokenize_bm25

    toks = df.select(F.col(id_col), F.explode(tokenize_bm25(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    w0 = F.log(F.lit(1.0) + F.col("tf"))
    # the n_expansions+1 activation rows are generated per tf row by ONE
    # inline explode instead of a legs-way union of projections over the
    # same tf subtree (r13, guide §2.3 — the PQ-subspace / LSH-band
    # discipline): identical (id, term_id, w) rows, 1/legs the post-
    # shuffle aggregate work, and the final sum is unchanged (weights
    # land in round(·, 6), which absorbs partial-agg order exactly as
    # in the union shape)
    entries = F.array(
        *[
            F.struct(
                (
                    md5_hash64(F.col("term"), salt=f"splade{k}|") % vocab_size
                ).alias("term_id"),
                (w0 * F.lit(decay**k)).alias("w"),
            )
            for k in range(n_expansions + 1)
        ]
    )
    out = tf.select(F.col(id_col), F.explode(entries).alias("__e")).select(
        F.col(id_col),
        F.col("__e.term_id").alias("term_id"),
        F.col("__e.w").alias("w"),
    )
    return out.groupBy(id_col, "term_id").agg(
        F.round(F.sum("w"), 6).alias("weight")
    )


def duckdb_splade_postings_sql(
    src_cte: str = "tf",
    prefix: str = "splade",
    vocab_size: int = SPLADE_VOCAB,
    n_expansions: int = SPLADE_EXPANSIONS,
    decay: float = SPLADE_DECAY,
) -> str:
    """Oracle fragment over a `{src_cte}(doc_id, term, tf)` CTE → CTE
    `{prefix}_post(doc_id, term_id, weight)` identical to
    :func:`splade_postings`."""
    legs = []
    for k in range(n_expansions + 1):
        h = duckdb_md5_hash64_sql("term", salt=f"splade{k}|")
        legs.append(
            f"SELECT doc_id, ({h}) % {vocab_size} AS term_id,"
            f" ln(1.0 + tf) * {decay**k!r} AS w FROM {src_cte}"
        )
    union = "\n  UNION ALL\n  ".join(legs)
    return f"""
{prefix}_legs AS (
  {union}
),
{prefix}_post AS (
  SELECT doc_id, term_id, round(sum(w), 6) AS weight
  FROM {prefix}_legs GROUP BY doc_id, term_id
)
"""


def splade_encode(df, text_col: str = "text", id_col: str = "doc_id",
                  use_real_model: bool = False):
    """R6 entry point: postings for the deterministic expansion encoder, or
    the real SPLADE++ pandas-UDF provider when explicitly requested.
    Like the dense slot, the real path is probe-and-skip: callers check
    probe_real_runtime() first; the error message reports what (if
    anything) is importable so the slot stays honest without a container
    dependency."""
    if use_real_model:
        runtime = probe_real_runtime()
        raise NotImplementedError(
            "SPLADE++ requires a neural model runtime (probe found "
            f"{runtime!r}); register an Arrow-batched pandas UDF with "
            "the splade_postings contract"
        )
    return splade_postings(df, text_col=text_col, id_col=id_col)


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
