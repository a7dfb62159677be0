"""Training-data curation: deterministic dataset splitting and benchmark
decontamination.

Extends the LLM-pipeline family (dedup / textstats / packing) with two
steps every large-scale training-data build runs that the reference (a
retrieval daemon) has no analog for; both follow the public data-pipeline
literature (GPT-3 appendix C's n-gram collision check; The Pile's
held-out decontamination):

  - split_assign: stable train/val/test assignment by keyed hash of the
    document id. Reproducible across runs and engines, no RNG state, and
    a pure column expression — the split is a property of the id alone,
    so late-arriving shards of the same corpus land in the same split and
    the assignment never shuffles.
  - decontaminate: flag training documents that share >= min_shared
    distinct word n-grams with an evaluation/benchmark set. Inverted-index
    join on the gram hash — never an eval x train all-pairs — with
    stop-grams (corpus df > df_cap) dropped first: both the shuffle-skew
    mitigation at 100 TB and standard practice (boilerplate that appears
    in hundreds of documents is not contamination signal).

100 TB shape: split_assign is scan-local (no exchange at all);
decontaminate shuffles on the 64-bit gram hash with df-capped postings,
so candidate work is bounded by sum(df^2) <= df_cap * sum(df), exactly
like the n-gram Jaccard join it shares machinery with (dedup.word_ngrams,
hashing.md5_hash64 — both with bit-identical DuckDB twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from ..io import fan_out
from .dedup import word_ngrams

SPLIT_BUCKETS = 1000
SPLIT_SALT = "split|"
DECONTAM_NGRAM = 5
DECONTAM_DF_CAP = 100


def split_assign(
    docs: DataFrame,
    train: float = 0.8,
    val: float = 0.1,
    salt: str = SPLIT_SALT,
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """docs + (bucket, split) — split in {'train','val','test'} by keyed
    hash of doc_id into `buckets` cells: [0, train) -> train,
    [train, train+val) -> val, rest -> test. Changing `salt` draws an
    independent assignment; everything else is deterministic."""
    tcut = int(round(train * buckets))
    vcut = int(round((train + val) * buckets))
    b = md5_hash64(F.col("doc_id").cast("string"), salt=salt) % buckets
    return docs.withColumn("bucket", b.cast("int")).withColumn(
        "split",
        F.when(F.col("bucket") < tcut, "train")
        .when(F.col("bucket") < vcut, "val")
        .otherwise("test"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    strata_col: str = "source",
    salt: str = "mix|",
    buckets: int = SPLIT_BUCKETS,
) -> DataFrame:
    """docs filtered to a deterministic per-stratum sample — the corpus
    mixing/upsampling-schedule step of a training build: each stratum
    (source, language, quality band, ...) keeps its configured fraction.

    Same keyed-hash discipline as split_assign: a doc is kept iff its
    bucket < rate * buckets, so the sample is reproducible, shard-
    invariant, monotone in the rate (raising a stratum's rate only ADDS
    documents — downstream caches stay valid), and independent of the
    split assignment (different salt). A pure column filter: no exchange,
    no RNG state, pushes down to the scan."""
    b = md5_hash64(F.col("doc_id").cast("string"), salt=salt) % buckets
    cut = F.lit(int(round(default_rate * buckets)))
    for stratum, rate in sorted(rates.items()):
        cut = F.when(
            F.col(strata_col) == stratum, int(round(rate * buckets))
        ).otherwise(cut)
    return docs.filter(b < cut)


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = DECONTAM_NGRAM,
    min_shared: int = 1,
    df_cap: int = DECONTAM_DF_CAP,
) -> DataFrame:
    """(doc_id, n_shared_grams, n_eval_docs) — training documents sharing
    >= min_shared distinct word n-grams with any eval document, with the
    count of shared grams and of distinct eval documents hit.

    df is counted over train ∪ eval (a gram frequent in either side is
    boilerplate); grams with df > df_cap never enter the join."""
    t_grams = fan_out(train).select(
        "doc_id",
        F.explode(
            F.transform(
                word_ngrams(F.col("text"), n), lambda g: md5_hash64(g)
            )
        ).alias("gram"),
    )
    e_grams = fan_out(eval_set).select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(
            F.transform(
                word_ngrams(F.col("text"), n), lambda g: md5_hash64(g)
            )
        ).alias("gram"),
    )
    df_tbl = (
        t_grams.select("gram")
        .unionByName(e_grams.select("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("gram")
    )
    hits = (
        t_grams.join(df_tbl, "gram")
        .join(e_grams, "gram")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("gram").alias("n_shared_grams"),
            F.count_distinct("eval_doc_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_shared_grams") >= min_shared)
    )
    return hits.select("doc_id", "n_shared_grams", "n_eval_docs")
