"""Retrieval-quality metrics (A16 / SURVEY §5 gold-set harness).

Metrics mirror docs/testing/semantic-search-benchmarking.md:33-46:
top1 / top3 / top10 hit rate, recall@10, precision@10, MRR, duplicateRate;
verdict gates top3 >= 80% and recall@10 >= 70% (:58-66, semantic mode).

Inputs are DataFrames so the evaluation itself distributes:
  results: (query_id, rank, file)   rank 1-based, <=10 rows per query
  gold:    (query_id, file)         expected files (globs pre-expanded)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.emit import micro6


def _psi_emit(joined: DataFrame, group_col: str) -> DataFrame:
    """Shared PSI tail for feature_drift_psi / psi_vs_reference: the psi
    sum emitted in exact integer microunits (functions/emit.py — ln is
    libm-dependent and round(x, 6) alone does not survive a driver whose
    DuckDB build rounds an ulp differently; r8 driver hash-red, bit-exact
    in repo), drifted compared on the SAME microunit value both sides,
    and a deterministic final report order."""
    return (
        joined.groupBy("grp", "n_ref", "n_cur")
        .agg(
            micro6(
                F.sum(
                    (F.col("p_cur") - F.col("p_ref"))
                    * F.log(F.col("p_cur") / F.col("p_ref"))
                )
            ).alias("psi")
        )
        .select(
            F.col("grp").alias(group_col),
            "n_ref",
            "n_cur",
            "psi",
            (F.col("psi") > 0.2).alias("drifted"),
        )
        .orderBy(group_col)
    )

TOP3_GATE = 0.80
RECALL10_GATE = 0.70


def evaluate(results: DataFrame, gold: DataFrame) -> DataFrame:
    """One metrics row: (top1, top3, top10, recall_at_10, precision_at_10,
    mrr, duplicate_rate) averaged over queries."""
    hits = results.join(gold, ["query_id", "file"]).select(
        "query_id", "rank"
    )
    per_q_hit = hits.groupBy("query_id").agg(
        F.min("rank").alias("first_hit"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    gold_sizes = gold.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_gold"))
    res_stats = results.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_results"),
        F.count_distinct("file").alias("n_distinct"),
    )
    per_q = (
        gold_sizes.join(per_q_hit, "query_id", "left")
        .join(res_stats, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("first_hit", F.lit(10**9)).alias("first_hit"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_gold",
            F.coalesce("n_results", F.lit(0)).alias("n_results"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        )
    )
    return per_q.agg(
        F.round(F.avg((F.col("first_hit") <= 1).cast("double")), 6).alias("top1"),
        F.round(F.avg((F.col("first_hit") <= 3).cast("double")), 6).alias("top3"),
        F.round(F.avg((F.col("first_hit") <= 10).cast("double")), 6).alias("top10"),
        F.round(
            F.avg(F.col("n_hits").cast("double") / F.col("n_gold")), 6
        ).alias("recall_at_10"),
        F.round(
            F.avg(
                F.when(F.col("n_results") > 0,
                       F.col("n_hits").cast("double") / F.col("n_results"))
                .otherwise(0.0)
            ),
            6,
        ).alias("precision_at_10"),
        F.round(
            F.avg(
                F.when(F.col("first_hit") <= 10, 1.0 / F.col("first_hit"))
                .otherwise(0.0)
            ),
            6,
        ).alias("mrr"),
        F.round(
            F.avg(
                F.when(F.col("n_results") > 0,
                       1.0 - F.col("n_distinct").cast("double") / F.col("n_results"))
                .otherwise(0.0)
            ),
            6,
        ).alias("duplicate_rate"),
    )


def verdict(metrics_row) -> dict:
    """Gate check (top3 >= 0.80 AND recall@10 >= 0.70)."""
    ok = metrics_row["top3"] >= TOP3_GATE and metrics_row["recall_at_10"] >= RECALL10_GATE
    return {
        "pass": bool(ok),
        "top3": metrics_row["top3"],
        "recall_at_10": metrics_row["recall_at_10"],
        "gates": {"top3": TOP3_GATE, "recall_at_10": RECALL10_GATE},
    }


def ndcg(results: DataFrame, gold: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, dcg, idcg, ndcg) — graded-relevance nDCG@k per query
    (Järvelin & Kekäläinen 2002), the metric evaluate()'s binary top-k
    family can't express: gold carries an integer `rel` grade and
    position i contributes (2^rel - 1)/log2(i + 1). IDCG ranks the gold
    set by (rel DESC, file ASC) — the deterministic ideal ordering — and
    nDCG = DCG/IDCG (0 when the query's gold set is empty of gain).

    Scale shape: DCG is one equi-join of the top-k results against gold
    on (query_id, file) + a map-side-combinable per-query sum; IDCG is
    one rank window PARTITIONED BY query (each partition = a gold set,
    bounded); the final join is per-query-row sized. Nothing touches
    the corpus."""
    gain = F.pow(F.lit(2.0), F.col("rel")) - F.lit(1.0)
    dcg = (
        results.filter(F.col("rank") <= k)
        .join(gold, ["query_id", "file"])
        .groupBy("query_id")
        .agg(
            F.sum(gain / F.log2(F.col("rank") + F.lit(1.0))).alias("dcg")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("file")
    )
    idcg = (
        gold.withColumn("i", F.row_number().over(w))
        .filter(F.col("i") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("i") + F.lit(1.0))).alias("idcg"))
    )
    return (
        idcg.join(dcg, "query_id", "left")
        .select(
            "query_id",
            F.round(F.coalesce("dcg", F.lit(0.0)), 6).alias("dcg"),
            F.round("idcg", 6).alias("idcg"),
            F.round(
                F.when(
                    F.col("idcg") > 0,
                    F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg"),
        )
    )


def feature_drift_psi(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    ts_col: str = "ts",
    width: float = 5.0,
    eps: float = 1e-4,
) -> DataFrame:
    """(group, n_ref, n_cur, psi, drifted) — Population Stability Index
    per group between the REFERENCE window (first half of the observed
    time range) and the CURRENT window (second half): the standard
    ingest-drift monitor for a training-data pipeline (PSI > 0.2 =
    actionable shift, the published credit-scoring rule of thumb carried
    into ML data-quality practice).

    PSI = Σ_buckets (p_cur − p_ref) · ln(p_cur / p_ref) over fixed-width
    value buckets (floor(value/width) — the histogram_quantiles bucket
    discipline: deterministic, mergeable, oracle-replayable; no
    quantile-based "auto" binning that a second engine can't replay).
    Shares are (count + eps)/(n + eps·n_buckets) add-eps smoothed over
    the UNION of the two windows' buckets, so empty-on-one-side buckets
    contribute a finite, deterministic penalty instead of ±inf.

    Scale shape: the window split point is a lazy 1-row broadcast
    aggregate (min+max)/2 over ts — no driver action; then ONE
    (group, bucket, side) map-side-combinable count and closed-form
    arithmetic over the bounded bucket dimension. The corpus is touched
    exactly once."""
    # fractional epoch seconds on BOTH sides (cast timestamp → double ==
    # DuckDB epoch(ts)): unix_timestamp truncates to whole seconds, so a
    # subsecond event near the midpoint could land in different ref/cur
    # windows in operator vs oracle (r8 ADVICE).
    ep = lambda c: F.col(c).cast("double")  # noqa: E731
    mid = events.agg(
        ((F.max(ep(ts_col)) + F.min(ep(ts_col))) / 2).alias("__mid")
    )
    sided = (
        events.crossJoin(F.broadcast(mid))
        .select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) / F.lit(float(width))).alias("bucket"),
            F.when(ep(ts_col) < F.col("__mid"), F.lit("ref"))
            .otherwise(F.lit("cur"))
            .alias("side"),
        )
    )
    counts = sided.groupBy("grp", "bucket").agg(
        F.sum(F.when(F.col("side") == "ref", 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("side") == "cur", 1).otherwise(0)).alias("c_cur"),
    )
    per_grp = counts.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    e = F.lit(float(eps))
    joined = counts.join(per_grp, "grp").select(
        "grp",
        "n_ref",
        "n_cur",
        ((F.col("c_ref") + e) / (F.col("n_ref") + e * F.col("n_buckets"))).alias(
            "p_ref"
        ),
        ((F.col("c_cur") + e) / (F.col("n_cur") + e * F.col("n_buckets"))).alias(
            "p_cur"
        ),
    )
    return _psi_emit(joined, group_col)


def drift_reference(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    width: float = 5.0,
) -> DataFrame:
    """(grp, bucket, c_ref) — the frozen reference profile for
    psi_vs_reference / streaming_drift_psi: per-group fixed-width value
    bucket counts over a chosen reference corpus (one map-side-combinable
    aggregate). At scale this is a tiny maintained dimension table
    (groups × buckets), written once per reference window."""
    return (
        events.select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) / F.lit(float(width))).alias("bucket"),
        )
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("c_ref"))
    )


def psi_vs_reference(
    events: DataFrame,
    ref: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    width: float = 5.0,
    eps: float = 1e-4,
) -> DataFrame:
    """(group, n_ref, n_cur, psi, drifted) — feature_drift_psi's PSI with
    an EXPLICIT frozen reference profile (drift_reference output) instead
    of the first-half split: the deployment shape, where the profile is
    computed once from a blessed corpus and every later window is
    monitored against it. Same smoothing: add-eps shares over the UNION
    of reference and current buckets per group. The current side is one
    (grp, bucket) count; the reference is a bounded dimension — the
    full-outer union join runs over buckets, never rows."""
    cur = (
        events.select(
            F.col(group_col).alias("grp"),
            F.floor(F.col(value_col) / F.lit(float(width))).alias("bucket"),
        )
        .groupBy("grp", "bucket")
        .agg(F.count(F.lit(1)).alias("c_cur"))
    )
    counts = (
        ref.select("grp", "bucket", "c_ref")
        .join(cur, ["grp", "bucket"], "full_outer")
        .select(
            "grp",
            "bucket",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
    )
    per_grp = counts.groupBy("grp").agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    e = F.lit(float(eps))
    joined = counts.join(per_grp, "grp").select(
        "grp",
        "n_ref",
        "n_cur",
        ((F.col("c_ref") + e) / (F.col("n_ref") + e * F.col("n_buckets"))).alias(
            "p_ref"
        ),
        ((F.col("c_cur") + e) / (F.col("n_cur") + e * F.col("n_buckets"))).alias(
            "p_cur"
        ),
    )
    return _psi_emit(joined, group_col)
