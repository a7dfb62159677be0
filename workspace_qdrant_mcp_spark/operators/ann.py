"""Similarity search over an embedding column: brute-force cosine top-k as
the exact baseline, and an IVF-style cluster-pruned variant as the scale
path.

Brute force is O(N·d) per query but a pure narrow map + per-query
TakeOrdered — it parallelizes perfectly and is the correctness oracle for
any approximate index (SURVEY §7 M2 de-risk note).

IVF: partition vectors by nearest centroid (computed once, broadcast),
then search only the `n_probe` closest cells per query — the candidate
scan shrinks by ~n_cells/n_probe at the cost of recall. Same output
schema, swap-in replacement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm


def bruteforce_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — exact cosine top-k per query row,
    excluding self-matches. queries: (query_id, embedding), broadcast."""
    # per-side norms computed BEFORE the pair join (r13, guide §2.3):
    # each corpus vector's norm fold runs once, not once per query —
    # bit-identical (cosine = dot/(norm(a)*norm(b)), same folds)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__nq"),
    )
    scored = (
        emb.select(id_col, vec_col, norm(F.col(vec_col)).alias("__nv"))
        .crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            (
                dot(F.col(vec_col), F.col("__qv"))
                / (F.col("__nv") * F.col("__nq"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


def lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MLlib BucketedRandomProjectionLSH — the other
    scale path SURVEY R2 names. Euclidean-bucket candidates, re-scored by
    exact cosine, per-query top-k. Same output schema as bruteforce_topk /
    ivf_topk. Seeded → deterministic buckets."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    to_vec = lambda c: array_to_vector(  # noqa: E731
        F.transform(F.col(c), lambda x: x.cast("double"))
    )
    base = emb.select(F.col(id_col), F.col(vec_col), to_vec(vec_col).alias("features"))
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv"), to_vec(vec_col).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    ).fit(base)
    # candidates = pairs sharing >= 1 hash bucket (the join is bucket-based
    # even with an unbounded radius — recall is tuned by numHashTables /
    # bucketLength), then exact cosine re-scoring
    cand = lsh.approxSimilarityJoin(base, q, float("inf"), distCol="__d")
    scored = cand.select(
        F.col(f"datasetB.{query_id_col}").alias(query_id_col),
        F.col(f"datasetA.{id_col}").alias(id_col),
        cosine(
            F.col(f"datasetA.{vec_col}"), F.col("datasetB.__qv")
        ).alias("score"),
    ).filter(F.col(id_col) != F.col(query_id_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


def srp_planes(n_planes: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic Rademacher hyperplanes for signed-random-projection
    LSH: sign(p, d) = ±1 from md5("srp|p|d"). No RNG state — the same
    literal matrix is inlined into the Spark plan and the DuckDB oracle,
    so buckets (and therefore the approximate result set) are
    bit-identical across engines and runs."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"srp|{p}|{d}".encode()).digest()[0] % 2 == 0 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_band_keys(
    vec_col, planes: list[list[float]], bits_per_band: int = 4
):
    """ARRAY<STRUCT<band INT, key INT>> — one bucket key per band, where
    each key packs `bits_per_band` sign bits of the plane projections.
    Pure column expressions (zip_with + ordered aggregate fold)."""
    bits = []
    for row in planes:
        s = F.array(*[F.lit(v) for v in row])
        proj = F.aggregate(
            F.zip_with(vec_col, s, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)))
    n_bands = len(planes) // bits_per_band
    keys = []
    for b in range(n_bands):
        key = F.lit(0)
        for i in range(bits_per_band):
            key = key + bits[b * bits_per_band + i] * F.lit(1 << i)
        keys.append(
            F.struct(F.lit(b).alias("band"), key.cast("int").alias("key"))
        )
    return F.array(*keys)


def srp_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 16,
    bits_per_band: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k via deterministic SRP-LSH: banded sign
    signatures generate candidates (the ONLY pair source — never N²),
    exact cosine re-scores them, window top-k per query.

    100 TB shape: the bands table is narrow (id, band, key) — the vector
    never rides through the explode — and the candidate id set (bounded
    by n_queries × bucket occupancy) is broadcast back against the corpus
    for the verify join, the same prune-then-broadcast discipline as
    dedup.minhash_lsh_neardup."""
    planes = srp_planes(n_planes, dim)
    bands = emb.select(
        F.col(id_col),
        F.explode(srp_band_keys(F.col(vec_col), planes, bits_per_band)).alias("kb"),
    ).select(id_col, F.col("kb.band").alias("band"), F.col("kb.key").alias("key"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    qbands = queries.select(
        F.col(query_id_col),
        F.explode(
            srp_band_keys(F.col(vec_col), planes, bits_per_band)
        ).alias("kb"),
    ).select(query_id_col, F.col("kb.band").alias("band"), F.col("kb.key").alias("key"))
    cand = (
        bands.join(F.broadcast(qbands), ["band", "key"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col)
        .distinct()
    )
    scored = (
        emb.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qv")).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Learn IVF centroids with MLlib KMeans (seeded → deterministic model).
    Returns (cell_id, embedding ARRAY<DOUBLE>) compatible with ivf_topk.
    The index build is the batch Spark job the reference's design doc
    assigns to Spark (BASELINE.json: batch embedding/index build, no online
    serving)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = emb.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(train)
    spark = emb.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, ["cell_id", vec_col])


def assign_ivf_cells(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-dot-product centroid (1 narrow join
    against a broadcast centroid table + per-row argmax)."""
    c = centroids.select(
        F.col("cell_id"), F.col(vec_col).alias("__cv")
    )
    scored = emb.crossJoin(F.broadcast(c)).select(
        id_col, vec_col, "cell_id", dot(F.col(vec_col), F.col("__cv")).alias("__d")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("__d"), F.asc("cell_id"))
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(id_col, vec_col, "cell_id")
    )


def _query_probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    n_probe: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, __qv, cell_id) — each query's n_probe nearest cells by
    max dot against the broadcast centroid table; ties cell_id ASC. THE
    one definition of the probe-cell selection, shared by ivf_topk, the
    maintained-store search, and (as the rank-1 special case) home-cell
    assignment."""
    c = centroids.select("cell_id", F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    return (
        q.crossJoin(F.broadcast(c))
        .select(
            query_id_col,
            "__qv",
            "cell_id",
            dot(F.col("__qv"), F.col("__cv")).alias("__d"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("__d"), F.asc("cell_id")
                )
            ),
        )
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, "__qv", "cell_id")
    )


def _cell_probe_topk(
    assigned: DataFrame,
    qcells: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — the shared probe tail: candidates
    from the cell_id equi-join of the assignment table with the probe
    cells, exact cosine, self-exclusion, per-query top-k on (score DESC,
    id ASC). broadcast_queries=False when the query side is corpus-sized
    (the k-NN graph) — then the equi-join shuffles both sides on the
    cell instead."""
    # per-side norms before the join (r13): one norm fold per corpus
    # vector / per probe row instead of one per scored pair —
    # bit-identical to cosine()
    qn = qcells.withColumn("__nq", norm(F.col("__qv")))
    q = F.broadcast(qn) if broadcast_queries else qn
    scored = (
        assigned.withColumn("__nv", norm(F.col(vec_col)))
        .join(q, "cell_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            (
                dot(F.col(vec_col), F.col("__qv"))
                / (F.col("__nv") * F.col("__nq"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: per query, search only the n_probe nearest cells.

    At 100 TB the assignment table is written bucketed by cell_id so the
    probe join prunes file groups instead of scanning the corpus.
    """
    assigned = assign_ivf_cells(emb, centroids, id_col, vec_col)
    qcells = _query_probe_cells(queries, centroids, n_probe, vec_col, query_id_col)
    return _cell_probe_topk(assigned, qcells, k, id_col, vec_col, query_id_col)


def knn_graph(
    emb: DataFrame,
    k: int = 5,
    n_cells: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "ivf",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — the k-NN GRAPH: cosine top-k
    neighbors for EVERY vector (directed; same schema as the query-set
    top-k legs). The primitive SemDeDup-style semantic clustering,
    graph-based dedup and diversity analysis all start from.

    mode='brute' is the exact all-pairs baseline (broadcast self-join;
    the oracle twin, and fine to |corpus| ~ broadcast threshold).
    mode='ivf' is the scale path: each vector is INDEXED in its home
    cell and QUERIES its n_probe nearest cells, candidates come from an
    equi-join on cell_id — corpus-sized on BOTH sides, so no broadcast:
    the shuffle key is the cell, candidate volume is sum of cell²
    within probes rather than corpus², and cell balance (KMeans) bounds
    the skew. Recall vs the exact graph is gated in pytest alongside
    the other ANN legs."""
    if mode == "brute":
        q = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col))
        return bruteforce_topk(emb, q, k, id_col, vec_col)
    if mode != "ivf":
        raise ValueError(
            f"knn_graph: mode={mode!r} is not a thing; 'brute' (exact) "
            f"or 'ivf' (approximate) — a typo here must not silently "
            f"hand back recall<1 results"
        )
    cents = (
        centroids
        if centroids is not None
        else train_ivf_centroids(emb, n_cells, id_col, vec_col)
    )
    # ONE centroid scan serves both roles: rank 1 is the home-cell
    # assignment (the indexed side), ranks 1..n_probe are the query
    # probes — queries ARE the corpus here, so a separate
    # assign_ivf_cells pass would rescan the corpus against the
    # centroids and re-shuffle the same global window a second time
    c = cents.select("cell_id", F.col(vec_col).alias("__cv"))
    ranked = (
        emb.select(F.col(id_col), F.col(vec_col))
        .crossJoin(F.broadcast(c))
        .select(
            id_col,
            vec_col,
            "cell_id",
            dot(F.col(vec_col), F.col("__cv")).alias("__d"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.desc("__d"), F.asc("cell_id")
                )
            ),
        )
        .filter(F.col("__r") <= max(1, n_probe))
        .localCheckpoint()
    )
    assigned = ranked.filter(F.col("__r") == 1).select(
        id_col, vec_col, "cell_id"
    )
    qcells = ranked.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        "cell_id",
    )
    # corpus-sized query side: the shared probe tail must NOT broadcast it
    return _cell_probe_topk(
        assigned, qcells, k, id_col, vec_col, broadcast_queries=False
    )


def sq_bounds(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One-row (__mn, __mx) global component bounds for int8 scalar
    quantization — computed IN-PLAN (per-row array_min/max, then a global
    min/max aggregate: one map-side-combined pass, no driver collect), so
    the quantizer stays a pure dataflow at any corpus size."""
    return emb.select(
        F.min(F.array_min(vec_col)).cast("double").alias("__mn"),
        F.max(F.array_max(vec_col)).cast("double").alias("__mx"),
    )


def _sq_denom() -> F.Column:
    mn, mx = F.col("__mn"), F.col("__mx")
    return F.when(mx == mn, F.lit(1.0)).otherwise(mx - mn)


def sq_code_expr(vec_col) -> F.Column:
    """ARRAY<TINYINT> int8 codes: component x -> floor((x-mn)*255/(mx-mn)
    + 0.5) - 128, i.e. round-to-nearest into [0,255] shifted to the signed
    byte range — a 4x footprint cut vs float32 (the point of scalar
    quantization: the approximate scan is memory-bandwidth-bound).
    Requires __mn/__mx columns in scope (join sq_bounds first)."""
    mn = F.col("__mn")
    return F.transform(
        vec_col,
        lambda x: (
            # clamp to the byte range BEFORE the tinyint cast: bounds are
            # corpus-wide, so a query component outside [mn,mx] would
            # otherwise produce a code outside [-128,127] that wraps
            # silently under non-ANSI Spark while the oracle's CAST errors
            # — divergent candidate sets for out-of-corpus queries
            F.greatest(
                F.lit(-128),
                F.least(
                    F.lit(127),
                    F.floor(
                        (x.cast("double") - mn) * F.lit(255.0) / _sq_denom()
                        + F.lit(0.5)
                    )
                    - F.lit(128),
                ),
            )
        ).cast("tinyint"),
    )


def sq_dequant_expr(code_col) -> F.Column:
    """ARRAY<DOUBLE> reconstruction: v -> mn + (v+128)*(mx-mn)/255 — the
    asymmetric-distance reconstruction the approximate scoring pass runs
    over. Same literal arithmetic order as the DuckDB oracle."""
    mn = F.col("__mn")
    return F.transform(
        code_col,
        lambda v: mn
        + (v.cast("double") + F.lit(128.0)) * _sq_denom() / F.lit(255.0),
    )


def sq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    oversample: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — int8 scalar-quantized ANN with
    exact rescoring, the quantization pipeline the reference's vector
    store exposes as `quantization_config` (storage/collections/basic.rs:39
    — configured off by default there; this is the Spark realization of
    turning it on): quantize the corpus to int8 codes, rank by cosine over
    the RECONSTRUCTED vectors (asymmetric-distance scan at 1/4 the float32
    memory bandwidth), keep k*oversample candidates per query, rescore
    ONLY those with full-precision cosine over the original embeddings,
    return the exact-rescored top-k.

    100 TB shape: the codes table is the only full-corpus scan and it is
    4x (vs fp32) / 8x (vs fp64) smaller than the raw embeddings; the
    rescore join touches k*oversample rows per query via a broadcast
    candidate list — the oversample→rescore funnel is the same
    prune-then-broadcast discipline as srp_topk. Everything is column
    expressions; deterministic (no RNG), so the DuckDB oracle replays it
    bit-for-bit."""
    bounds = sq_bounds(emb, vec_col)
    coded = (
        emb.crossJoin(F.broadcast(bounds))
        .select(
            F.col(id_col),
            F.col(vec_col),
            "__mn",
            "__mx",
            sq_code_expr(F.col(vec_col)).alias("__code"),
        )
        .withColumn("__dq", sq_dequant_expr(F.col("__code")))
    )
    q = (
        queries.crossJoin(F.broadcast(bounds))
        .select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qv"),
            "__mn",
            "__mx",
            sq_code_expr(F.col(vec_col)).alias("__qcode"),
        )
        .withColumn("__qdq", sq_dequant_expr(F.col("__qcode")))
        .select(query_id_col, "__qv", "__qdq")
    )
    # per-side norms before the pair join (r13) — bit-identical
    approx = (
        coded.withColumn("__ndq", norm(F.col("__dq")))
        .crossJoin(F.broadcast(q.withColumn("__nqdq", norm(F.col("__qdq")))))
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            (
                dot(F.col("__dq"), F.col("__qdq"))
                / (F.col("__ndq") * F.col("__nqdq"))
            ).alias("__ascore"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__ascore"), F.asc(id_col))
    cand = (
        approx.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * oversample)
        .select(query_id_col, id_col)
    )
    rescored = (
        emb.join(F.broadcast(cand), id_col)
        .join(F.broadcast(q.select(query_id_col, "__qv")), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qv")).alias("score"),
        )
    )
    wf = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) with asymmetric-distance (ADC) scoring
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_CODES = 16  # codes per subspace


def pq_codebook(
    emb: DataFrame,
    dim: int,
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(m, code_id, sub ARRAY<DOUBLE>) — the PQ codebook. Deterministic
    rule (oracle parity, the semdedup convention): entry (m, j) is
    subspace m of the corpus vector with id == j. At 100 TB the
    codebook comes from per-subspace sampled k-means (Jégou et al.
    2011); like semdedup's centroids, codebook QUALITY only moves the
    recall/compression trade-off — the plan shape is identical, and the
    exact-rescore funnel bounds the damage of a bad codebook."""
    # single scan: the m subspace rows are generated per input row by an
    # inline explode instead of an m-way union of m full scans (r13,
    # guide §2.3 — identical rows, 1/m the scan work and plan size)
    s = dim // m
    base = emb.filter(F.col(id_col) < n_codes)
    subs = F.array(
        *[
            F.struct(
                F.lit(mi).alias("m"),
                F.transform(
                    F.slice(F.col(vec_col), mi * s + 1, s),
                    lambda x: x.cast("double"),
                ).alias("sub"),
            )
            for mi in range(m)
        ]
    )
    return base.select(
        F.col(id_col).alias("code_id"), F.explode(subs).alias("__ms")
    ).select(
        F.col("__ms.m").alias("m"),
        "code_id",
        F.col("__ms.sub").alias("sub"),
    )


def _subspaces(
    df: DataFrame, dim: int, m: int, key_col: str, vec_col: str, out_key: str
) -> DataFrame:
    # single scan via inline explode, not an m-way union of full scans
    # (r13, guide §2.3): identical (key, m, sub) rows, 1/m the scan work
    s = dim // m
    subs = F.array(
        *[
            F.struct(
                F.lit(mi).alias("m"),
                F.transform(
                    F.slice(F.col(vec_col), mi * s + 1, s),
                    lambda x: x.cast("double"),
                ).alias("sub"),
            )
            for mi in range(m)
        ]
    )
    return df.select(
        F.col(key_col).alias(out_key), F.explode(subs).alias("__ms")
    ).select(
        out_key,
        F.col("__ms.m").alias("m"),
        F.col("__ms.sub").alias("sub"),
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    dim: int,
    m: int = PQ_M,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, m, code_id) — the compressed corpus: per subspace, the
    L2-nearest codebook entry (min-(distance, code_id) struct — the
    deterministic argmin). This narrow int table is the ONLY
    full-corpus artifact the approximate scan reads: dim doubles per
    vector become m small ints (64x8B → 8x1B-class at production
    sizes) — the memory-bandwidth story that makes PQ the default
    billion-scale ANN layout."""
    subs = _subspaces(emb, dim, m, id_col, vec_col, id_col)
    cb = codebook.select("m", "code_id", F.col("sub").alias("csub"))
    l2 = F.aggregate(
        F.zip_with(
            F.col("sub"), F.col("csub"), lambda x, y: (x - y) * (x - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        subs.join(F.broadcast(cb), "m")
        .select(id_col, "m", "code_id", l2.alias("__d"))
        .groupBy(id_col, "m")
        .agg(F.min(F.struct(F.col("__d"), F.col("code_id"))).alias("b"))
        .select(id_col, "m", F.col("b.code_id").alias("code_id"))
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    oversample: int = 3,
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — PQ ANN with ADC scoring and
    exact rescore (Jégou, Douze & Schmid 2011): encode the corpus to
    per-subspace codes once; per query, precompute the m×n_codes
    lookup table of query-subvector · codebook-entry dots (a broadcast
    dim); the approximate score of a corpus vector is the ORDERED sum
    of its codes' LUT entries — the scan touches only the narrow codes
    table and never the raw vectors. Top k·oversample per query then
    rescore with full-precision cosine (the sq_topk funnel).

    Determinism: the per-vector ADC sum is an m-ordered fold over the
    collected (m, partial) list, NOT a groupBy float sum — float
    addition is order-dependent and a partition-ordered sum could
    diverge between engines/runs (the HLL ordered-window discipline);
    ranking ties break on vec_id."""
    cb = pq_codebook(emb, dim, m, n_codes, id_col, vec_col)
    codes = pq_encode(emb, cb, dim, m, id_col, vec_col)
    qsubs = _subspaces(queries, dim, m, query_id_col, vec_col, query_id_col)
    pd_dot = F.aggregate(
        F.zip_with(F.col("sub"), F.col("csub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = (
        qsubs.join(
            F.broadcast(cb.select("m", "code_id", F.col("sub").alias("csub"))),
            "m",
        )
        .select(query_id_col, "m", "code_id", pd_dot.alias("pd"))
    )
    adot = (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .groupBy(query_id_col, id_col)
        .agg(F.sort_array(F.collect_list(F.struct("m", "pd"))).alias("l"))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.col("l"), F.lit(0.0), lambda acc, x: acc + x["pd"]
            ).alias("__ascore"),
        )
        .filter(F.col(id_col) != F.col(query_id_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__ascore"), F.asc(id_col)
    )
    cand = (
        adot.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * oversample)
        .select(query_id_col, id_col)
    )
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    rescored = (
        emb.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qv")).alias("score"),
        )
    )
    wf = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


def ivf_pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    dim: int,
    k: int = 5,
    n_probe: int = 2,
    oversample: int = 3,
    m: int = PQ_M,
    n_codes: int = PQ_CODES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — IVF-PQ: the billion-scale layout
    (FAISS's IndexIVFPQ; Jégou et al. 2011) as a composition of the two
    existing funnels. The inverted file prunes WHICH vectors are scored
    (only the n_probe nearest cells per query — at production scale the
    codes table is bucketed by cell_id, so pruning skips file groups);
    PQ/ADC decides HOW cheaply (narrow codes + broadcast LUT, no raw
    vectors in the scan); the exact-cosine rescore funnel bounds the
    accuracy cost of both approximations at once.

    Plan: cell assignment (broadcast-centroid argmax) ⋈ codes table →
    semi-join on the probed (query, cell) pairs → LUT join on
    (m, code_id) → m-ordered ADC fold → top k·oversample → exact
    rescore. Every join is an equi-join; the only per-query state is the
    m×n_codes LUT and the n_probe cell list, both broadcast."""
    cb = pq_codebook(emb, dim, m, n_codes, id_col, vec_col)
    codes = pq_encode(emb, cb, dim, m, id_col, vec_col)
    cells = assign_ivf_cells(emb, centroids, id_col, vec_col).select(
        id_col, "cell_id"
    )
    c = centroids.select("cell_id", F.col(vec_col).alias("__cv"))
    qcells = (
        queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
        .crossJoin(F.broadcast(c))
        .select(
            query_id_col,
            "cell_id",
            dot(F.col("__qv"), F.col("__cv")).alias("__d"),
        )
        .withColumn(
            "__r",
            F.row_number().over(
                Window.partitionBy(query_id_col).orderBy(
                    F.desc("__d"), F.asc("cell_id")
                )
            ),
        )
        .filter(F.col("__r") <= n_probe)
        .select(query_id_col, "cell_id")
    )
    qsubs = _subspaces(queries, dim, m, query_id_col, vec_col, query_id_col)
    pd_dot = F.aggregate(
        F.zip_with(F.col("sub"), F.col("csub"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    lut = qsubs.join(
        F.broadcast(cb.select("m", "code_id", F.col("sub").alias("csub"))),
        "m",
    ).select(query_id_col, "m", "code_id", pd_dot.alias("pd"))
    # probe pruning: keep only (query, vector) pairs whose vector lives
    # in one of the query's probed cells
    probed = cells.join(F.broadcast(qcells), "cell_id").select(
        query_id_col, id_col
    )
    adot = (
        codes.join(F.broadcast(lut), ["m", "code_id"])
        .join(probed, [query_id_col, id_col], "left_semi")
        .groupBy(query_id_col, id_col)
        .agg(F.sort_array(F.collect_list(F.struct("m", "pd"))).alias("l"))
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.col("l"), F.lit(0.0), lambda acc, x: acc + x["pd"]
            ).alias("__ascore"),
        )
        .filter(F.col(id_col) != F.col(query_id_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("__ascore"), F.asc(id_col)
    )
    cand = (
        adot.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k * oversample)
        .select(query_id_col, id_col)
    )
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("__qv"))
    rescored = (
        emb.join(F.broadcast(cand), id_col)
        .join(F.broadcast(qv), query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(F.col(vec_col), F.col("__qv")).alias("score"),
        )
    )
    wf = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        rescored.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, F.round("score", 6).alias("score"), "rnk")
    )


# ---------------------------------------------------------------------------
# Maintained IVF index store (the postings/signature-store discipline
# applied to ANN: cell assignments are written at ingest against FROZEN
# centroids, and a query probes the store without re-assigning the
# corpus — the billion-scale index-maintenance shape: FAISS/Qdrant add
# vectors to fixed cells too, retraining centroids is a separate
# offline job)
# ---------------------------------------------------------------------------

ANN_STORE_SCHEMA = "vec_id long, embedding array<float>, cell_id int"


def _ann_store_schema(id_type: str, vec_type: str) -> str:
    return f"vec_id {id_type}, embedding array<{vec_type}>, cell_id int"


def read_ann_store(
    spark, store_path: str, id_type: str = "long", vec_type: str = "float"
) -> DataFrame:
    """The maintained (vec_id, embedding, cell_id) assignment table;
    empty-typed frame if the store does not exist yet. Only a MISSING
    store reads as empty — an unreadable one aborts the update loudly
    (update rewrites the store as kept ∪ delta). id_type/vec_type follow
    the corpus key (the embeddings table is long/float; the chunks
    table's point_id is an md5 STRING with double mock vectors — the
    read_postings id_type discipline)."""
    import os

    if os.path.exists(store_path):
        return spark.read.parquet(store_path)
    return spark.createDataFrame([], _ann_store_schema(id_type, vec_type))


def update_ann_store(
    spark,
    store_path: str,
    centroids: DataFrame,
    changed_vecs: DataFrame | None = None,
    deleted_ids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    id_type: str = "long",
    vec_type: str = "float",
) -> None:
    """Incremental IVF maintenance: drop the rows of changed/deleted
    vectors (one anti-join on vec_id), assign the changed vectors to
    their home cell against the FROZEN centroid table and append.
    INVARIANT (asserted in tests): after any update sequence the store
    equals assign_ivf_cells() over the current corpus with the same
    centroids — incremental == rebuild, so search off the store is
    exactly the batch IVF search. The touched set is delta-sized; at
    production scale this is a Delta MERGE on a table bucketed by
    cell_id (the probe join then prunes file groups)."""
    from ..store_util import overwrite_store, union_keys

    overwrite_store(
        store_path,
        read_ann_store(spark, store_path, id_type, vec_type),
        "vec_id",
        gone=union_keys(
            "vec_id",
            (
                changed_vecs.select(
                    F.col(id_col).cast(id_type).alias("vec_id")
                )
                if changed_vecs is not None
                else None
            ),
            (
                deleted_ids.select(F.col("vec_id").cast(id_type))
                if deleted_ids is not None
                else None
            ),
        ),
        fresh=(
            assign_ivf_cells(changed_vecs, centroids, id_col, vec_col).select(
                F.col(id_col).cast(id_type).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                F.col("cell_id").cast("int"),
            )
            if changed_vecs is not None
            else None
        ),
    )


def lloyd_kmeans(
    emb: DataFrame,
    k: int = 8,
    n_rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster_id, dist) — k-means topic assignment after
    n_rounds UNROLLED Lloyd iterations (Lloyd 1982) from the
    deterministic first-k init (centroid j = the vector with id j, the
    semdedup/IVF house convention): per round, assign every point to its
    min-squared-distance centroid (ties cluster_id ASC), then recompute
    each centroid as the per-dimension mean of its members, ROUNDED to 6
    decimals so a second engine replays the identical centroid values
    (the fixed-round discipline of k_core/k_truss: no convergence probe,
    no RNG, no trained model — a DuckDB oracle can unroll the same
    rounds). Empty clusters keep their previous centroid.

    The curation use is cluster-balanced sampling / topic data cards
    (SemDeDup §3 uses exactly this clustering as its proximity blocks);
    the production trainer at 100 TB is seeded MLlib KMeans over a
    sample (train_ivf_centroids) — this operator is its
    oracle-replayable twin, same output contract.

    Plan shape per round: one broadcast-centroid argmin (k·dim scalar
    work per row, no shuffle) + one (cluster_id, pos) mean aggregate
    (posexplode → map-side-combinable avg over n·dim narrow rows, the
    only shuffle). Rounds are a fixed small constant; nothing driver-
    side, nothing quadratic.

    NOTE: construction is EAGER — the first-k init guard runs a bounded
    Spark action (cents.count(), one corpus filter) at call time, so
    merely building the plan scans once. Deliberate: a silent sub-k
    init would skew every downstream per-cluster quota; callers
    composing lazily should call this last."""
    pts = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # the first-k init REQUIRES ids 0..k-1 to all be present (dense
    # zero-based numeric ids, the corpus contract); sparse / non-zero-
    # based / string ids would silently yield fewer than k clusters and
    # skew every downstream per-cluster quota — fail loudly instead
    # (the loud-failure discipline; the probe is bounded by k rows).
    # r13: the centroid state is BOUNDED model state (k×dim rounded
    # doubles), so it lives on the driver between rounds — the former
    # lazy cents lineage referenced each round's centroids twice
    # (assign + the empty-cluster join), so the final plan duplicated
    # the corpus-assign subtree exponentially in n_rounds (~1900
    # formatted plan lines, 114 Exchange at 3 rounds). Collected
    # round-6 means are exact: collect returns the engine's double,
    # createDataFrame replays it bit-for-bit (guide §2.4, §8).
    init_rows = (
        pts.filter(F.col(id_col) < k)
        .select(F.col(id_col).cast("int").alias("cluster_id"), "v")
        .collect()
    )
    cent_map = {r["cluster_id"]: list(r["v"]) for r in init_rows}
    if len(cent_map) != k or sorted(cent_map) != list(range(k)):
        raise ValueError(
            f"lloyd_kmeans first-k init found {len(cent_map)} of {k} "
            f"centroids: ids 0..{k - 1} must all be present in {id_col}"
        )
    spark = emb.sparkSession

    def _cents_df(cmap):
        return spark.createDataFrame(
            [(cid, cmap[cid]) for cid in sorted(cmap)],
            "cluster_id int, c array<double>",
        )

    def assign(points, centroids):
        sq = F.aggregate(
            F.zip_with("v", "c", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        w = Window.partitionBy(id_col).orderBy(
            F.asc("__d"), F.asc("cluster_id")
        )
        return (
            points.crossJoin(F.broadcast(centroids))
            .select(id_col, "v", "cluster_id", sq.alias("__d"))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select(id_col, "v", "cluster_id", "__d")
        )

    for _ in range(n_rounds):
        assigned = assign(pts, _cents_df(cent_map))
        mean_rows = (
            assigned.select(
                "cluster_id", F.posexplode("v").alias("pos", "val")
            )
            .groupBy("cluster_id", "pos")
            .agg(F.round(F.avg("val"), 6).alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cm")
            )
            .collect()
        )
        # empty clusters keep their previous centroid (the former
        # left-join coalesce, replayed driver-side)
        for r in mean_rows:
            cent_map[r["cluster_id"]] = list(r["cm"])
    final = assign(pts, _cents_df(cent_map))
    return final.select(
        id_col, "cluster_id", F.round("__d", 6).alias("dist")
    )


def ann_store_profile_df(store: DataFrame) -> DataFrame:
    """ann_store_profile over an ALREADY-OPEN store snapshot (the pinned
    localCheckpoint api.enable_store_serving holds) — no parquet read."""
    return (
        store.groupBy(F.col("cell_id").cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c_ref"))
        .select(F.lit("ann_cells").alias("grp"), "bucket", "c_ref")
    )


def ann_store_profile(
    spark, store_path: str, id_type: str = "long", vec_type: str = "float"
) -> DataFrame:
    """(grp, bucket, c_ref) — the maintained ANN store's cell-occupancy
    profile in quality.drift_reference's schema: the FROZEN reference
    for ann_store_drift, computed once at (re)build time. One bounded
    aggregate over the store's cell_id column (n_cells rows out)."""
    return ann_store_profile_df(
        read_ann_store(spark, store_path, id_type, vec_type)
    )


def ann_store_drift(
    current_vecs: DataFrame,
    centroids: DataFrame,
    profile: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(grp, n_ref, n_cur, psi, drifted) — Population Stability Index of
    the CURRENT corpus's frozen-centroid cell-assignment shares against
    the store's build-time occupancy profile: the staleness monitor for
    the maintained IVF store (VERDICT r8 #6). The store serves frozen
    assignments — correct by construction — but as the corpus drifts the
    frozen centroids stop partitioning it evenly, probe recall decays,
    and nothing in the serving path says so. PSI over cell shares is
    the same credit-scoring discipline as quality.feature_drift_psi
    (> 0.2 = actionable), applied to the index's own occupancy.

    Refresh playbook when drifted fires: retrain centroids offline
    (train_ivf_centroids / MLlib KMeans over a sample), rebuild the
    store with update_ann_store against the new centroid table, then
    re-assert the recall floor (test_ann's ann_recall gate) before
    swapping serving over.

    Scale shape: one broadcast-centroid argmax over the current corpus
    (the ingest-time assignment cost, no shuffle), one bucket count,
    then closed-form PSI over the bounded cell dimension via
    quality.psi_vs_reference."""
    from .quality import psi_vs_reference

    cur = assign_ivf_cells(current_vecs, centroids, id_col, vec_col).select(
        F.lit("ann_cells").alias("grp"),
        F.col("cell_id").cast("double").alias("value"),
    )
    return psi_vs_reference(
        cur, profile, group_col="grp", value_col="value", width=1.0
    )


def ann_store_candidates(
    spark,
    store_path: str,
    centroids: DataFrame,
    queries: DataFrame,
    n_probe: int = 2,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    id_type: str = "long",
    vec_type: str = "float",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(query_id, __qv, vec_id, embedding) — the maintained store's rows
    inside each query's n_probe probe cells: the cell_id equi-join of the
    assignment table with the probe-cell selection, BEFORE any scoring.
    This is ann_store_topk's candidate generator exposed undecorated (no
    cosine, no self-exclusion, no top-k) so serving paths — the indexed
    hybrid search — can apply their own leg semantics (threshold,
    include-self, unrounded ordering) to the pruned set. The corpus scan
    a brute-force dense leg needs never happens: candidates are the
    probed cells' rows only (reference context: this is the Qdrant
    serving path, flow_collect.rs:104-179 — the daemon queries an index,
    it never rescans the collection). Pass `assigned` (an already-open
    snapshot of the store — api.enable_store_serving's pinned
    localCheckpoint) to skip the per-query parquet read; the default
    path reads the store fresh."""
    if assigned is None:
        assigned = read_ann_store(spark, store_path, id_type, vec_type)
    qcells = _query_probe_cells(
        queries, centroids, n_probe, vec_col, query_id_col
    ).withColumn("cell_id", F.col("cell_id").cast("int"))
    return assigned.join(F.broadcast(qcells), "cell_id").select(
        query_id_col, "__qv", "vec_id", "embedding"
    )


def ann_store_topk(
    spark,
    store_path: str,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    id_type: str = "long",
    vec_type: str = "float",
    assigned: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, score, rnk) — IVF top-k OFF THE MAINTAINED
    STORE: per query the n_probe nearest cells (against the same frozen
    centroids the store was built with), candidates from the store's
    cell_id equi-join, exact cosine, per-query top-k. Equals ivf_topk
    over the current corpus (asserted in tests) because the store equals
    the batch assignment — the corpus is never re-assigned at query
    time. id_type/vec_type must match the store's build types (the
    read_postings discipline). Pass `assigned` (an already-open pinned
    snapshot of the store) to skip the per-query parquet read — the
    open-index serving shape (ann_cell_candidates' contract)."""
    if assigned is None:
        assigned = read_ann_store(spark, store_path, id_type, vec_type)
    qcells = _query_probe_cells(
        queries, centroids, n_probe, vec_col, query_id_col
    ).withColumn("cell_id", F.col("cell_id").cast("int"))
    return _cell_probe_topk(
        assigned, qcells, k, "vec_id", "embedding", query_id_col
    )


def cluster_balanced_sample(
    emb: DataFrame,
    k: int = 8,
    n_rounds: int = 3,
    per_cluster: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster_id, rnk) — a deterministic cluster-BALANCED
    subsample over the lloyd_kmeans topic assignment: per cluster, the
    per_cluster members with smallest salted md5 hash (the bottomk_sample
    consistent-hash discipline — reproducible, shard-invariant, no RNG).
    This is the downstream step the clustering exists for: SemDeDup-style
    pipelines and topic-balanced eval sets draw a fixed-size quota from
    EVERY cluster so head topics cannot crowd out tail topics (the
    cluster-quota variant of temperature flattening).

    Scale shape: the assignment's cost (see lloyd_kmeans) plus ONE
    per-cluster rank window over (hash, id) — partitioned by cluster_id,
    never global; clusters with fewer than per_cluster members return
    entirely (rnk identifies the draw order for downstream trimming)."""
    from ..functions.hashing import md5_hash64

    asg = lloyd_kmeans(emb, k=k, n_rounds=n_rounds, id_col=id_col,
                       vec_col=vec_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.asc("__h"), F.asc(id_col)
    )
    return (
        asg.withColumn(
            "__h", md5_hash64(F.col(id_col).cast("string"), salt="cbs|")
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= per_cluster)
        .select(id_col, "cluster_id", "rnk")
    )
