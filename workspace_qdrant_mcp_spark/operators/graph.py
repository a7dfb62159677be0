"""Graph operators: traversal, PageRank, components, centrality, communities.

The reference keeps a code-relationship graph (graph_nodes/graph_edges,
graph/mod.rs:210-432) and computes analytics as pure functions over an
exported adjacency snapshot (LOCK-SCOPE contract, graph/algorithms/mod.rs:1-9)
— which is exactly Spark's execution model: immutable edge DataFrames in,
result DataFrames out.

Operators and their parity targets:
  - k_hop_neighbors  : query_related recursive CTE, DISTINCT nodes, min
                       depth, depth-ordered (sqlite_store.rs:265-309, G1)
  - impact_analysis  : reverse traversal (sqlite_store.rs:311+, G3)
  - pagerank         : damping 0.85, dangling mass redistributed uniformly,
                       deterministic (algorithms/pagerank.rs:33-143, G5)
  - connected_components : deterministic min-label propagation (the
                       undirected-reachability core of the community
                       detectors; HashMin variant)
  - label_propagation: most-frequent neighbor label with MIN-label
                       deterministic tiebreak, <=50 iters, min size 2
                       (algorithms/community.rs:81-184, G6)
  - betweenness      : Brandes, undirected, normalized 2/((n-1)(n-2)),
                       clamped <=1, optional first-k source sampling with
                       n/k scaling (algorithms/betweenness.rs:49-184, G8)
  - degree stats / orphans : metrics.rs:283-356 (A1, A2)

The test graph is derived from TPC-H lineitem: parts co-ordered in the same
order form an edge (src = smaller partkey) — the symbol co-occurrence shape
(A13, cooccurrence_schema).

Scale notes: traversal = frontier joins (frontier stays small vs the edge
table, broadcast when possible); pagerank iterations are map-side-combinable
groupBys on dst; per-source Brandes parallelizes over executors with a
broadcast adjacency (mapPartitions over the source list — the one place
imperative per-partition logic is genuinely needed).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGERANK_DAMPING = 0.85
LPA_MAX_ITERS = 50
LPA_MIN_COMMUNITY_SIZE = 2


# ---------------------------------------------------------------------------
# Graph derivation + stats
# ---------------------------------------------------------------------------

def cooccurrence_edges(lineitem: DataFrame) -> DataFrame:
    """(src, dst, weight) — parts co-ordered in the same order; src < dst;
    weight = number of distinct co-orders. Self-join on l_orderkey shuffles
    on the order key; per-order part lists are tiny so no skew."""
    a = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count_distinct("ok").alias("weight"))
    )


def nodes_from_edges(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
    )


def degree_stats(edges: DataFrame) -> DataFrame:
    """(node_id, out_deg, in_deg, total_weight) — A1 analog."""
    out_d = edges.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg"), F.sum("weight").alias("w_out")
    )
    in_d = edges.groupBy(F.col("dst").alias("node_id")).agg(
        F.count(F.lit(1)).alias("in_deg"), F.sum("weight").alias("w_in")
    )
    return (
        out_d.join(in_d, "node_id", "full_outer")
        .select(
            "node_id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("w_out", F.lit(0)) + F.coalesce("w_in", F.lit(0))).alias(
                "total_weight"
            ),
        )
    )


def orphan_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Nodes with no incident edges — left anti join against the endpoint
    union (metrics.rs:342-356)."""
    endpoints = nodes_from_edges(edges)
    return nodes.join(endpoints, "node_id", "left_anti")


# ---------------------------------------------------------------------------
# Traversals (G1-G4): iterative frontier joins
# ---------------------------------------------------------------------------

def k_hop_neighbors(
    edges: DataFrame,
    seed: int,
    max_hops: int = 2,
    reverse: bool = False,
) -> DataFrame:
    """(node_id, depth) — nodes reachable from `seed` in <= max_hops
    directed hops, at their MINIMUM depth, seed excluded. `reverse=True`
    traverses incoming edges (impact analysis, G3).

    Frontier-join loop: depth-d frontier joined to edges gives depth d+1.
    The frontier is orders of magnitude smaller than the edge table, so
    Spark broadcasts it into the join; max_hops is small by contract
    (reference clamps 1..3, graph/mod.rs:648-662)."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    frontier = e.sparkSession.createDataFrame([(seed,)], ["u"])
    reached = frontier.withColumn("depth", F.lit(0))
    out = None
    for depth in range(1, max_hops + 1):
        frontier = (
            e.join(F.broadcast(frontier), "u")
            .select(F.col("v").alias("u"))
            .distinct()
        )
        step = frontier.withColumn("depth", F.lit(depth))
        out = step if out is None else out.unionByName(step)
        reached = reached.unionByName(step)
    return (
        out.groupBy(F.col("u").alias("node_id"))
        .agg(F.min("depth").alias("depth"))
        .filter(F.col("node_id") != seed)
    )


# ---------------------------------------------------------------------------
# PageRank (G5)
# ---------------------------------------------------------------------------

def pagerank(
    edges: DataFrame,
    n_iters: int = 10,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """(node_id, rank) after exactly n_iters synchronous iterations.

    rank_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} rank_t(u)/outdeg(u) + dangling_t/N)
    with dangling mass redistributed uniformly — the reference's semantics
    (pagerank.rs:33-143: damping 0.85, dangling handled, deterministic).
    Fixed iteration count (vs tol 1e-6) keeps the oracle expressible; the
    loop is a chain of groupBy(dst) aggregations — each is map-side
    combinable, the scale-canonical PageRank plan.
    """
    # Materialize the (possibly expensive) edge derivation once — every
    # iteration re-reads it, and without this the lazy lineage re-runs the
    # upstream join n_iters times.
    e = edges.select("src", "dst").localCheckpoint()
    nodes = nodes_from_edges(e)
    out_deg = e.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    ranks = (
        nodes.join(out_deg, "node_id", "left")
        .select(
            "node_id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.lit(1.0).alias("rank"),
        )
        .localCheckpoint()
    )
    n = ranks.count()
    ranks = ranks.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(n_iters):
        # dangling mass as a lazy 1-row aggregate cross-joined into the
        # update — one Spark job per iteration (the checkpoint), not two
        dang = ranks.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        contrib = (
            e.join(ranks.select(F.col("node_id").alias("src"), "rank", "out_deg"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("inflow"))
        )
        ranks = (
            ranks.select("node_id", "out_deg")
            .join(contrib, "node_id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node_id",
                "out_deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce("inflow", F.lit(0.0)) + F.col("dang") / F.lit(float(n)))
                ).alias("rank"),
            )
            # eager checkpoint: one materialization per iteration, constant
            # lineage depth (without it the plan deepens quadratically)
            .localCheckpoint()
        )
    return ranks.select("node_id", "rank")


# ---------------------------------------------------------------------------
# Connected components (HashMin deterministic label propagation)
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, n_iters: int = 15) -> DataFrame:
    """(node_id, component) — component = min node id reachable over the
    UNDIRECTED edge set after n_iters rounds of min-label propagation.
    Deterministic by construction (min is order-free). n_iters must be >=
    graph diameter; each round is one join + one min-groupBy."""
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        nodes_from_edges(und)
        .select("node_id", F.col("node_id").alias("component"))
        .localCheckpoint()
    )
    prev_sum = None
    for _ in range(n_iters):
        nbr_min = (
            und.join(labels.select(F.col("node_id").alias("src"), "component"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.min("component").alias("nbr"))
        )
        labels = (
            labels.join(nbr_min, "node_id", "left")
            .select(
                "node_id",
                F.least(
                    F.col("component"), F.coalesce("nbr", F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint()
        )
        # labels only ever decrease; an unchanged sum ⇒ fixed point reached
        # — further iterations are identity, so early exit preserves the
        # exact fixed-n_iters semantics (and the oracle's output)
        cur_sum = labels.agg(F.sum("component")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# ---------------------------------------------------------------------------
# Label propagation (G6 — reference-deterministic variant)
# ---------------------------------------------------------------------------

def export_adjacency(edges: DataFrame) -> tuple[list[int], dict[int, list[int]]]:
    """G9 AdjacencyExport: sorted node ids + undirected neighbor lists
    (sorted — the BTreeSet discipline, community.rs:100-110). The snapshot
    is collected once; every driver-side algorithm is a pure function over
    it (LOCK-SCOPE, graph/algorithms/mod.rs:1-9)."""
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    pdf = und.toPandas()  # Arrow batches, not Row objects
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        if s != d:
            adj[int(s)].append(int(d))
    node_ids = sorted(adj.keys())
    for k in adj:
        adj[k] = sorted(set(adj[k]))
    return node_ids, dict(adj)


def label_propagation(
    edges: DataFrame,
    max_iters: int = LPA_MAX_ITERS,
    min_size: int = LPA_MIN_COMMUNITY_SIZE,
) -> DataFrame:
    """(node_id, community) — the reference's deterministic LPA, replicated
    exactly (community.rs:114-149): ASYNCHRONOUS sweeps in ascending
    node-index order (later nodes see earlier updates within the same
    sweep — this is what prevents 2-cycle label oscillation), label choice =
    most frequent neighbor label with MIN-label tiebreak, isolated nodes
    keep their own label, stop at fixed point or max_iters; communities
    below min_size dropped (size-2 default).

    Runs driver-side over the exported adjacency — the reference's own
    architecture (single-threaded pure function over AdjacencyExport);
    per-tenant code graphs are small by contract (SURVEY §7). A Pregel-style
    synchronous variant would NOT be parity-faithful (different fixed
    points), so distribution here would change semantics."""
    spark = edges.sparkSession
    node_ids, adj = export_adjacency(edges)
    idx = {v: i for i, v in enumerate(node_ids)}
    nbrs = [[idx[u] for u in adj[v]] for v in node_ids]
    labels = list(range(len(node_ids)))
    for _ in range(max_iters):
        changed = False
        for i in range(len(node_ids)):
            if not nbrs[i]:
                continue
            counts: dict[int, int] = {}
            for j in nbrs[i]:
                counts[labels[j]] = counts.get(labels[j], 0) + 1
            # max count, then MIN label (community.rs:133-137)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            if labels[i] != best:
                labels[i] = best
                changed = True
        if not changed:
            break
    sizes: dict[int, int] = {}
    for lb in labels:
        sizes[lb] = sizes.get(lb, 0) + 1
    rows = [
        (node_ids[i], node_ids[labels[i]])
        for i in range(len(node_ids))
        if sizes[labels[i]] >= min_size
    ]
    return spark.createDataFrame(rows, ["node_id", "community"])


# ---------------------------------------------------------------------------
# Betweenness centrality (G8 — Brandes, parallel over sources)
# ---------------------------------------------------------------------------

def betweenness(
    edges: DataFrame,
    sample_k: int | None = None,
) -> DataFrame:
    """(node_id, centrality) — Brandes over the undirected graph.

    Architecture mirrors the reference exactly: export the adjacency once
    (G9 AdjacencyExport — here a broadcast dict), then run the pure
    per-source accumulation in parallel over executors (mapPartitions over
    the source list). Normalization 2/((n-1)(n-2)) clamped to <=1; optional
    first-k source sampling scaled by n/k (betweenness.rs:49-184 — Bader
    approximation, sources in sorted order for determinism)."""
    spark = edges.sparkSession
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    # Arrow transfer, not Row collect: the adjacency snapshot of a dense
    # co-occurrence graph is millions of edges — toPandas moves it as
    # columnar batches (~10x faster than collect() of Row objects)
    pdf = und.toPandas()
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
        adj[int(s)].append(int(d))
    node_ids = sorted(adj.keys())
    n = len(node_ids)
    if n < 3:
        return spark.createDataFrame(
            [(v, 0.0) for v in node_ids], ["node_id", "centrality"]
        )
    # index-based CSR-style adjacency: the BFS inner loop runs over int
    # lists, not dict lookups — ~3x faster in CPython for dense graphs
    idx = {v: i for i, v in enumerate(node_ids)}
    nbrs: list[list[int]] = [
        sorted(idx[u] for u in adj[v]) for v in node_ids
    ]
    src_idx = list(range(n)) if sample_k is None else list(range(min(sample_k, n)))
    scale = 1.0 if sample_k is None else n / float(len(src_idx))
    badj = spark.sparkContext.broadcast(nbrs)

    def per_source(src_iter):
        from collections import deque

        g = badj.value
        m = len(g)
        acc = [0.0] * m
        for s in src_iter:
            dist = [-1] * m
            sigma = [0.0] * m
            delta = [0.0] * m
            preds: list[list[int]] = [[] for _ in range(m)]
            dist[s] = 0
            sigma[s] = 1.0
            order = []
            dq = deque([s])
            while dq:
                v = dq.popleft()
                order.append(v)
                dv1 = dist[v] + 1
                sv = sigma[v]
                for w in g[v]:
                    if dist[w] < 0:
                        dist[w] = dv1
                        dq.append(w)
                    if dist[w] == dv1:
                        sigma[w] += sv
                        preds[w].append(v)
            for w in reversed(order):
                coeff = (1.0 + delta[w]) / sigma[w]
                for v in preds[w]:
                    delta[v] += sigma[v] * coeff
                if w != s:
                    acc[w] += delta[w]
        for node, val in enumerate(acc):
            if val != 0.0:
                yield (node, val)

    parts = max(1, min(len(src_idx), spark.sparkContext.defaultParallelism))
    raw = (
        spark.sparkContext.parallelize(src_idx, parts)
        .mapPartitions(per_source)
        .reduceByKey(lambda a, b: a + b)
    )
    norm = 2.0 / ((n - 1) * (n - 2))
    acc_df = spark.createDataFrame(
        raw.map(lambda kv: (node_ids[kv[0]], kv[1])), ["node_id", "raw"]
    )
    all_nodes = spark.createDataFrame([(v,) for v in node_ids], ["node_id"])
    return all_nodes.join(acc_df, "node_id", "left").select(
        "node_id",
        F.least(
            # undirected: each pair counted twice → halve before normalizing
            F.coalesce(F.col("raw"), F.lit(0.0)) / 2.0 * F.lit(norm * scale),
            F.lit(1.0),
        ).alias("centrality"),
    )
