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
# GPT-3's published decontamination protocol checks 13-gram collisions
# between training data and benchmark text (Brown et al. 2020, appendix C);
# n stays configurable for corpora whose documents are shorter than 13
# words (the 5-gram setting used through round 5).
DECONTAM_NGRAM = 13
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


def quality_buckets(
    docs: DataFrame, n_buckets: int = 3, strata_col: str = "source"
) -> DataFrame:
    """(doc_id, source, quality, bucket) — CCNet-style per-stratum quality
    bucketing (Wenzek et al. 2020: order each language's documents by a
    quality score, cut into head/middle/tail). Here the strata are sources
    and the score is textstats.quality_score's composite; the cut is
    NTILE(n) over (quality DESC, doc_id ASC) — SQL-standard tile semantics,
    unique ordering, so the assignment is deterministic and engine-
    independent. One window per stratum; at 100 TB the per-source
    partitions are the natural parallel unit (use range partitioning on
    (source, quality) if a single source outgrows an executor)."""
    from pyspark.sql import Window

    from .textstats import quality_score

    q = quality_score(docs).select("doc_id", "quality")
    w = Window.partitionBy(strata_col).orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    tile = F.ntile(n_buckets).over(w)
    return (
        docs.select("doc_id", strata_col)
        .join(q, "doc_id")
        .select(
            "doc_id",
            strata_col,
            "quality",
            F.when(tile == 1, "head")
            .when(tile == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
        )
    )


def curation_funnel(docs: DataFrame, strata_col: str = "source") -> DataFrame:
    """(source, n_total, n_quality, n_repetition, n_pii_clean, n_kept) —
    the end-to-end keep/drop funnel a training-data build reports per
    source: documents surviving, cumulatively, (1) the Gopher quality
    gates (word count, mean word length, symbol ratio, alpha-word ratio —
    the stopword gate is excluded: the synthetic corpus has exactly one
    English stopword, so including it would zero the funnel), (2) the
    Gopher repetition thresholds, (3) zero PII hits (over the augmented
    fixture text), (4) exact-dedup canonicality (the minimum doc_id for
    its normalized-text fingerprint).

    Shape (r13, guide §2.3): the quality gates, the PII total and the
    dedup fingerprint are all PER-ROW expressions, so they ride ONE
    fused projection over the scan (they were formerly four separate
    scans equi-joined on doc_id); canonicality is a window over fp on
    the same frame. Only the repetition gate — a true aggregate (gram
    counts) — still joins back on doc_id. Values are identical: the
    fused flags evaluate the same rounded expressions the standalone
    operators project."""
    from pyspark.sql import Window

    from ..io import fan_out
    from . import pii as pii_mod
    from .textstats import (
        fingerprint_expr,
        gopher_quality_exprs,
        gopher_repetition,
    )

    gq = gopher_quality_exprs("text")
    q_pass = (
        gq["pass_word_count"]
        & gq["pass_mean_word_len"]
        & gq["pass_symbol_ratio"]
        & gq["pass_alpha_words"]
    )
    base = fan_out(pii_mod.augment_with_pii(docs)).select(
        "doc_id",
        strata_col,
        q_pass.alias("q_pass"),
        pii_mod.pii_total_expr("pii_text").alias("pii_total"),
        fingerprint_expr("text").alias("fp"),
    )
    base = base.withColumn(
        "is_canon",
        F.col("doc_id") == F.min("doc_id").over(Window.partitionBy("fp")),
    )
    rep = gopher_repetition(docs).select("doc_id", "repetition_pass")
    j = base.join(rep, "doc_id")
    s1 = F.col("q_pass")
    s2 = s1 & F.col("repetition_pass")
    s3 = s2 & (F.col("pii_total") == 0)
    s4 = s3 & F.col("is_canon")

    def _n(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(name)

    return j.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        _n(s1, "n_quality"),
        _n(s2, "n_repetition"),
        _n(s3, "n_pii_clean"),
        _n(s4, "n_kept"),
    )


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


def mixture_plan(
    docs: DataFrame,
    targets: dict[str, float],
    strata_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, observed_share, target_share, rate) —
    the data-mixture PLANNING step feeding stratified_sample: given target
    token shares per source, compute the downsampling-only rates that
    realize them. Closed form: the achievable corpus size is
    T = min_s(tokens_s / target_s) (the scarcest source binds), and
    rate_s = target_s * T / tokens_s — always in (0, 1], deterministic,
    no iteration.

    Scale shape: one map-side-combined per-source aggregate over the
    whitespace token counts; the closed form then runs over #sources rows
    (a bounded dimension), so the unpartitioned window is not a scale
    concern.

    Exactly mixture_plan_epochs with max_epochs=1: T = min(tokens·1/
    target) bounds every rate at 1 by construction, so the
    downsampling-only plan IS the epoch plan at cap 1 — one definition,
    the rate column is the epochs column renamed."""
    return mixture_plan_epochs(docs, targets, 1.0, strata_col).withColumnRenamed(
        "epochs", "rate"
    )


def mixture_plan_epochs(
    docs: DataFrame,
    targets: dict[str, float],
    max_epochs: float = 4.0,
    strata_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, observed_share, target_share, epochs)
    — the UPSAMPLING mixture plan: like mixture_plan but scarce sources
    may repeat up to max_epochs times (the published recipe for
    high-quality scarce corpora — e.g. Gopher/Chinchilla-style multiple
    epochs of books vs one of web). Closed form: the achievable corpus
    size is T = min_s(tokens_s * max_epochs / target_s) (the scarcest
    source at its epoch cap binds), and epochs_s = target_s * T /
    tokens_s ∈ (0, max_epochs] — values ≤ 1 are downsampling rates,
    values > 1 are repeat counts. Same bounded-dimension scale shape as
    mixture_plan: one token aggregate, then arithmetic over #sources
    rows."""
    from pyspark.sql import Window

    from .textstats import token_counts

    toks = token_counts(docs).select("doc_id", "ws_tokens")
    per_src = (
        docs.select("doc_id", strata_col)
        .join(toks, "doc_id")
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ws_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    tgt = F.lit(None).cast("double")
    for src, share in sorted(targets.items()):
        tgt = F.when(F.col(strata_col) == src, F.lit(float(share))).otherwise(
            tgt
        )
    w = Window.partitionBy()
    planned = per_src.withColumn("target_share", tgt).withColumn(
        "_t_final",
        F.min(
            F.col("n_tokens") * F.lit(float(max_epochs)) / F.col("target_share")
        ).over(w),
    )
    return planned.select(
        strata_col,
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.sum("n_tokens").over(w), 6
        ).alias("observed_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round(
            F.col("target_share") * F.col("_t_final") / F.col("n_tokens"), 6
        ).alias("epochs"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_col: str = "source",
    target_value: str = "src0",
    alpha: float = 1.0,
) -> DataFrame:
    """(doc_id, n_tokens, log_w) — DSIR data-selection importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling", arXiv:2302.03169) with a deterministic unigram feature
    space: per document, log_w = mean over tokens of
    ln(p_target(w) / p_raw(w)), both distributions add-alpha smoothed
    over the SHARED raw-corpus vocabulary. Positive log_w = the document
    looks more like the target domain than the raw pool; DSIR then
    samples with keep-probability proportional to exp(log_w) (Gumbel
    top-k in the paper) — the sampler here is composition with
    stratified_sample / split_assign, the operator is the weight.

    Differences from the paper, on purpose: hashed bigrams -> plain
    unigrams (bit-identical in the DuckDB oracle; the feature space is a
    pluggable tokenizer), and the sum over features is length-normalized
    to a mean so log_w is comparable across document lengths. Zero-token
    documents are absent (no weight is defined), same as unigram_logppl.

    Scale shape: one token explode feeding ONE shared count table with
    both the raw count and the target count (a conditional sum — the
    target pass is free, not a second scan), global totals via windows
    over the VOCABULARY table (bounded), ratio join back on the word key
    with map-side partial aggregation. No driver-side state, no UDFs."""
    from pyspark.sql import Window

    from .textstats import _ws_tokens

    is_tgt = (F.col(target_col) == target_value).cast("long")
    tok = fan_out(docs).select(
        "doc_id",
        is_tgt.alias("t"),
        F.explode(_ws_tokens(F.col("text"))).alias("w"),
    )
    uni = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_raw"), F.sum("t").alias("c_tgt")
    )
    w_all = Window.partitionBy()
    ratio = uni.select(
        "w",
        (
            F.log(
                (F.col("c_tgt") + F.lit(alpha))
                / (
                    F.sum("c_tgt").over(w_all)
                    + F.lit(alpha) * F.count(F.lit(1)).over(w_all)
                )
            )
            - F.log(
                (F.col("c_raw") + F.lit(alpha))
                / (
                    F.sum("c_raw").over(w_all)
                    + F.lit(alpha) * F.count(F.lit(1)).over(w_all)
                )
            )
        ).alias("lr"),
    )
    return (
        tok.join(ratio, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("log_w"),
        )
    )


SHARD_SALT = "shard|"


def shard_assignment(
    docs: DataFrame,
    n_shards: int = 8,
    salt: str = SHARD_SALT,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, pos_in_shard, n_tokens) — the training-shard
    layout step: every document gets a deterministic shard and a
    deterministic position within it, so N writers can each produce
    their shard file independently and any re-run (or late-arriving
    recomputation) lands identically.

    Scale shape: shard = keyed md5 hash % n_shards — a pure column
    expression, NO global ordering and no exchange for the assignment
    itself (a row_number over an unpartitioned window would funnel the
    corpus through one partition); pos_in_shard is a window partitioned
    BY SHARD ordered by the (collision-free-in-practice) hash then id —
    each shard's ordering is an independent partition-local sort. Token
    balance across shards is the law of large numbers (asserted within
    ±20% in tests), the same statistical-balance contract as
    dataset_split; exact token-balanced packing WITHIN a shard is
    sequence_packing's job downstream."""
    from pyspark.sql import Window

    h = md5_hash64(F.col(id_col).cast("string"), salt=salt)
    toks = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: F.length(t) > 0)
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        docs.select(
            id_col,
            h.alias("h"),
            (h % n_shards).cast("int").alias("shard"),
            toks.alias("n_tokens"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w) - 1)
        .select(id_col, "shard", "pos_in_shard", "n_tokens")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "ws|",
) -> DataFrame:
    """docs + sample_key, restricted to the k rows an Efraimidis-Spirakis
    (2006) weighted reservoir draw selects: key_i = ln(u_i) / w_i with
    u_i a deterministic (0,1) hash of the id, sample = the k LARGEST
    keys (equivalently u_i^(1/w_i) — heavier rows draw larger keys in
    expectation, inclusion probability proportional to weight, without
    replacement). The keyed-hash u makes the draw reproducible and
    shard-invariant (the split_assign discipline — no RNG state, no
    exchange for the keying); selection is one global top-k, exactly the
    TakeOrdered shape that never materializes a full sort at scale.
    Weights must be strictly positive — caller shifts/clamps.
    Deterministic total order: (sample_key desc, id asc)."""
    u = (
        (md5_hash64(F.col(id_col).cast("string"), salt=salt) % 1_000_000)
        + F.lit(0.5)
    ) / F.lit(1_000_000.0)
    key = F.log(u) / F.col(weight_col)
    return (
        docs.withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
        .withColumn("sample_key", F.round("sample_key", 6))
    )


def temperature_mixture(
    docs: DataFrame,
    alpha: float = 0.3,
    strata_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_tokens, observed_share, sampled_share, boost) —
    temperature / alpha-scaled mixture weights (the multilingual sampling
    recipe of XLM-R / mT5: Conneau et al. 2020 §3.1, Xue et al. 2021
    §3.2): sampled_share_s = p_s^alpha / Σ_t p_t^alpha over the observed
    TOKEN shares p. alpha < 1 flattens the distribution (up-weights
    scarce sources, tempering head-source dominance), alpha = 1 is
    proportional sampling, alpha = 0 uniform. boost = sampled/observed —
    the per-source epoch multiplier a sampler applies; pipe into
    stratified_sample/mixture_plan_epochs to realize it.

    A corpus whose documents all tokenize to zero tokens has no
    observable distribution: the result is EMPTY (no rows), mirrored in
    the oracle and the streaming twin — not a NaN/null-share report
    (r8 ADVICE: the stream raised ZeroDivisionError there).

    Scale shape: one map-side-combined per-source token aggregate, then
    closed-form arithmetic and two unpartitioned windows over the
    #sources rows — a bounded dimension, never the corpus."""
    from pyspark.sql import Window

    from .textstats import token_counts

    toks = token_counts(docs).select("doc_id", "ws_tokens")
    per_src = (
        docs.select("doc_id", strata_col)
        .join(toks, "doc_id")
        .groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ws_tokens").cast("bigint").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    shared = (
        per_src.withColumn("_tot", F.sum("n_tokens").over(w))
        .filter(F.col("_tot") > 0)
        .withColumn("observed_share", F.col("n_tokens") / F.col("_tot"))
        .withColumn("_pa", F.pow("observed_share", F.lit(float(alpha))))
    )
    return shared.select(
        strata_col,
        "n_docs",
        "n_tokens",
        F.round("observed_share", 6).alias("observed_share"),
        F.round(
            F.col("_pa") / F.sum("_pa").over(w), 6
        ).alias("sampled_share"),
        F.round(
            (F.col("_pa") / F.sum("_pa").over(w)) / F.col("observed_share"), 6
        ).alias("boost"),
    )


def doremi_weights(
    docs: DataFrame,
    eta: float = 1.0,
    eps: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """(source, n_docs, excess_logppl, doremi_weight) — DoReMi-style
    domain reweighting (Xie et al. 2023, "DoReMi: Optimizing Data
    Mixtures Speeds Up Language Model Pretraining"): domains where the
    weak PROXY model's loss exceeds the strong REFERENCE model's loss
    are upweighted by an exponentiated-gradient step, then smoothed
    toward uniform. Deterministic twin of the published loop, on
    purpose: proxy = the corpus-trained unigram LM, reference = the
    bigram LM (textstats' CCNet stand-ins — the bigram's extra context
    is exactly the signal a stronger model adds), ONE EG step from
    uniform instead of iterative proxy retraining (the production loop
    retrains a small proxy per round; this is its oracle-replayable
    skeleton, same output contract).

      excess(doc)   = max(logppl_unigram - logppl_bigram, 0)   [microunits]
      excess(src)   = mean over docs (exact integer sum / count)
      weight(src)  ∝ exp(eta · excess(src))                    [quantized]
      final(src)    = (1 - eps) · weight + eps / n_sources

    ENGINE-EXACT: per-doc excess is computed on the two queries'
    quantized microunit emissions (int64 subtract + clamp), the
    per-source mean divides an exact integer sum, and each exp() output
    is re-quantized to microunits before the normalization sum — so the
    only cross-engine exposure is the house-standard quantized-libm
    boundary. Docs lacking a bigram (or any token) carry no vote, same
    as the underlying queries.

    Scale shape: both LM scorings are word-count-shaped (their own
    docstrings); everything after runs on the bounded source dimension
    (two window aggregates over n_sources rows)."""
    from pyspark.sql import Window

    from ..functions.emit import micro6
    from .textstats import bigram_logppl, unigram_logppl

    u = unigram_logppl(docs, id_col, text_col).select(
        F.col(id_col),
        F.round(F.col("logppl") * F.lit(1e6)).cast("long").alias("u6"),
    )
    b = bigram_logppl(docs, id_col, text_col).select(
        F.col(id_col),
        F.round(F.col("logppl") * F.lit(1e6)).cast("long").alias("b6"),
    )
    per_doc = u.join(b, id_col).select(
        F.col(id_col),
        F.greatest(F.col("u6") - F.col("b6"), F.lit(0)).alias("e6"),
    )
    agg = (
        docs.select(F.col(id_col), F.col(group_col).alias("source"))
        .join(per_doc, id_col)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e6").alias("s6"),
        )
    )
    w_all = Window.partitionBy()
    scored = agg.select(
        "source",
        "n_docs",
        micro6(
            F.col("s6").cast("double")
            / (F.lit(1e6) * F.col("n_docs").cast("double"))
        ).alias("excess_logppl"),
    ).select(
        "source",
        "n_docs",
        "excess_logppl",
        F.round(F.exp(F.lit(eta) * F.col("excess_logppl")) * F.lit(1e6))
        .cast("long")
        .alias("x6"),
    )
    return (
        scored.select(
            "source",
            "n_docs",
            "excess_logppl",
            micro6(
                F.lit(1.0 - eps)
                * (
                    F.col("x6").cast("double")
                    / F.sum("x6").over(w_all).cast("double")
                )
                + F.lit(eps) / F.count(F.lit(1)).over(w_all).cast("double")
            ).alias("doremi_weight"),
        )
        .orderBy("source")
    )
