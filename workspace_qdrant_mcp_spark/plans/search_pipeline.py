"""The composed hybrid-search pipeline — the reference's `search` MCP tool
as one DataFrame program (query lifecycle traced in SURVEY §3.1).

Phases: per-leg search with per-leg thresholds (dense t, sparse t*0.5)
→ optional relevance decay (before fusion) → RRF fusion (hybrid mode, with
empty-leg pass-through) → sort score desc → slice to limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators import bm25, dense, fusion


def hybrid_fuse(sem_leg: DataFrame, kw_leg: DataFrame, id_cols: list[str]) -> DataFrame:
    """RRF fusion with the reference's pass-through semantics: if either leg
    is empty the combined (un-fused) legs are returned as-is
    (fusion.rs:170-171). Expressed fully in-plan (fusion.rrf_fuse_lazy):
    each leg subplan is evaluated exactly once by the full-outer fusion
    join, and the emptiness decision is a window count over the joined
    bounded candidate frame — no probe actions, no checkpoint
    materialization, the whole hybrid search is one Spark job."""
    return fusion.rrf_fuse_lazy(sem_leg, kw_leg, id_cols)


def enrich_with_tenants(leg: DataFrame, tenants: DataFrame) -> DataFrame:
    """Attach tenant_id to a bounded (<=2*limit) result leg.

    The tenant map is corpus-sized (one row per document) — NEVER broadcast
    it whole (at 100 TB that's billions of rows; VERDICT r1 #3). Prune it to
    the leg's ids first with a broadcast LEFT SEMI join (the small leg is
    the only broadcast side), then broadcast the pruned map into the
    enrichment join. Same pattern as dedup's candidate-pruned verify join.
    """
    pruned = tenants.join(F.broadcast(leg.select("doc_id")), "doc_id", "left_semi")
    return leg.join(F.broadcast(pruned), "doc_id", "left")


def hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    query_terms: list[str],
    query_vec_id: int = 0,
    limit: int = fusion.DEFAULT_LIMIT,
    threshold: float = fusion.DEFAULT_SCORE_THRESHOLD,
    terms: DataFrame | None = None,
) -> DataFrame:
    """Hybrid search over the synthetic corpus: documents = the text corpus
    (sparse leg), embeddings = its dense vectors (dense leg; vec_id is the
    doc key). The query embedding is the stored vector of ``query_vec_id``
    (stand-in for the R1 query-embedding step, kept inside the plan as a
    1-row broadcast).

    Returns (doc_id, score) — RRF-fused, sorted desc, sliced to ``limit``.
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == query_vec_id).select("embedding")

    # Per-leg candidate fetch is 2*limit (flow.rs:319); dense >= t,
    # sparse >= t*0.5 (search_collection, flow.rs:~search_collection).
    kw_leg = bm25.sparse_search(
        spark, docs, query_terms, id_col="doc_id", text_col="text",
        k=2 * limit, threshold=threshold * 0.5, terms=terms,
    )
    sem_leg = dense.dense_search(
        emb, qvec, id_col="vec_id", vec_col="embedding",
        k=2 * limit, threshold=threshold,
    ).withColumnRenamed("vec_id", "doc_id")

    fused = hybrid_fuse(sem_leg, kw_leg, ["doc_id"])
    return (
        fused.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def hybrid_search_indexed(
    spark: SparkSession,
    sf_dir: str,
    query_terms: list[str],
    postings_path: str,
    ann_store_path: str,
    centroids: DataFrame,
    query_vec_id: int = 0,
    limit: int = fusion.DEFAULT_LIMIT,
    threshold: float = fusion.DEFAULT_SCORE_THRESHOLD,
    n_probe: int = 3,
) -> DataFrame:
    """hybrid_search served OFF THE MAINTAINED STORES — the serving path
    a deployment actually runs (reference: the daemon queries Qdrant's
    index + the persisted sparse vectors, flow_collect.rs:104-179; it
    never rescans the collection per query):

      - keyword leg: bm25.sparse_search reading the MAINTAINED postings
        table (read_postings) instead of re-tokenizing the corpus — the
        tokenize+explode+tf groupBy never runs at query time;
      - dense leg: candidates from the maintained IVF cell store
        (ann.ann_store_candidates — cell_id equi-join against the
        query's n_probe probe cells), then the EXACT dense_search leg
        semantics on the pruned set: unrounded cosine, include-self,
        score >= threshold, top 2*limit by (score desc, id asc).

    Result contract: hash-identical to brute-force hybrid_search (the
    driver oracle IS the brute-force SQL) whenever the probed cells
    cover the true top-2*limit — pinned by test_ann's indexed==brute
    parity at two SFs; n_probe trades recall for scan fraction at 100 TB
    exactly as in ivf_topk."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == query_vec_id).select("embedding")

    kw_leg = bm25.sparse_search(
        spark, docs, query_terms, id_col="doc_id", text_col="text",
        k=2 * limit, threshold=threshold * 0.5,
        terms=bm25.read_postings(spark, postings_path, id_col="doc_id"),
    )
    # query_id = -1 sits outside the corpus id space, so the generator's
    # candidates keep the query's own stored vector (brute force does)
    q = qvec.select(F.lit(-1).cast("long").alias("query_id"), "embedding")
    from ..functions.vectors import cosine
    from ..operators import ann

    cand = ann.ann_store_candidates(
        spark, ann_store_path, centroids, q, n_probe=n_probe
    )
    sem_leg = (
        cand.select(
            F.col("vec_id").alias("doc_id"),
            cosine(F.col("embedding"), F.col("__qv")).alias("score"),
        )
        .filter(F.col("score") >= F.lit(threshold))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(2 * limit)
    )

    fused = hybrid_fuse(sem_leg, kw_leg, ["doc_id"])
    return (
        fused.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


def decayed_hybrid_search(
    spark: SparkSession,
    sf_dir: str,
    query_terms: list[str],
    decay_map: dict[str, float],
    query_vec_id: int = 0,
    limit: int = fusion.DEFAULT_LIMIT,
    threshold: float = fusion.DEFAULT_SCORE_THRESHOLD,
    terms: DataFrame | None = None,
) -> DataFrame:
    """Group/all-scope hybrid search with per-tenant relevance decay.

    The tenant analog is documents.source. Decay multiplies each leg
    result's score (default 0.4 for absent tenants) BEFORE fusion, so the
    decayed ordering feeds the rank-based RRF (scope.rs:61-77,
    flow_collect.rs:38-44). Thresholds remain at the leg level, applied to
    the RAW scores (the reference pushes them into the Qdrant query, which
    runs before decay ever sees a score).
    """
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == query_vec_id).select("embedding")
    tenants = docs.select("doc_id", F.col("source").alias("tenant_id"))

    kw_raw = bm25.sparse_search(
        spark, docs, query_terms, k=2 * limit, threshold=threshold * 0.5,
        terms=terms,
    ).localCheckpoint()
    sem_raw = (
        dense.dense_search(emb, qvec, k=2 * limit, threshold=threshold)
        .withColumnRenamed("vec_id", "doc_id")
        .localCheckpoint()
    )

    kw_leg = fusion.apply_decay(
        enrich_with_tenants(kw_raw, tenants), decay_map
    ).select("doc_id", "score")
    sem_leg = fusion.apply_decay(
        enrich_with_tenants(sem_raw, tenants), decay_map
    ).select("doc_id", "score")

    fused = hybrid_fuse(sem_leg, kw_leg, ["doc_id"])
    return (
        fused.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(limit)
        .select("doc_id", F.round("score", 6).alias("score"))
    )
