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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..ckpt import RollingCheckpoint, checkpoint_with
from ..io import fan_out

PAGERANK_DAMPING = 0.85
# Below this node count the per-iteration rank/label table is broadcast
# into the edge join (map-side, no edge shuffle per iteration); above it
# the join falls back to shuffle — the only plan that works for graphs
# whose state exceeds executor memory.
BROADCAST_STATE_MAX_NODES = 2_000_000
LPA_MAX_ITERS = 50
LPA_MIN_COMMUNITY_SIZE = 2


# ---------------------------------------------------------------------------
# Graph derivation + stats
# ---------------------------------------------------------------------------

def cooccurrence_edges(lineitem: DataFrame) -> DataFrame:
    """(src, dst, weight) — parts co-ordered in the same order; src < dst;
    weight = number of distinct co-orders. Self-join on l_orderkey shuffles
    on the order key; per-order part lists are tiny so no skew.

    (ok, part) is deduplicated BEFORE the self-join: the join input shrinks,
    each surviving pair is exactly one distinct co-order, and the final
    aggregate becomes a plain count — cheaper than count_distinct, which
    internally expands to a second aggregation over (src, dst, ok)."""
    li = (
        fan_out(lineitem)
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .dropDuplicates(["ok", "pk"])
    )
    a = li.select("ok", F.col("pk").alias("src"))
    b = li.select("ok", F.col("pk").alias("dst"))
    return (
        a.join(b, "ok")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
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


def batch_k_hop(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 2,
    reverse: bool = False,
) -> DataFrame:
    """(seed, node_id, depth) — k_hop_neighbors for EVERY seed in ONE job.

    The reference's 1-hop/2-hop/impact latencies are SQLite point-lookup
    budgets (1/10/100 ms); Spark's per-job floor is ~1 s, so interactive
    parity comes from amortization: all seeds ride the same frontier join
    (the frontier carries a seed column), and per-seed cost drops to
    job_time / |seeds| — the `graph_context` pattern. Broadcast stays
    bounded: the frontier is ≤ |seeds| × frontier-width rows."""
    src, dst = ("dst", "src") if reverse else ("src", "dst")
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    frontier = seeds.select(F.col("seed"), F.col("seed").alias("u")).distinct()
    out = None
    for depth in range(1, max_hops + 1):
        frontier = (
            e.join(F.broadcast(frontier), "u")
            .select("seed", F.col("v").alias("u"))
            .distinct()
        )
        step = frontier.withColumn("depth", F.lit(depth))
        out = step if out is None else out.unionByName(step)
    return (
        out.groupBy("seed", F.col("u").alias("node_id"))
        .agg(F.min("depth").alias("depth"))
        .filter(F.col("node_id") != F.col("seed"))
    )


FIND_PATH_PAD = 6  # zero-pad ids so string-lex order == hop-sequence order


def find_path(
    edges: DataFrame,
    source: int,
    target: int,
    max_depth: int = 3,
) -> DataFrame:
    """G2 find_path (sqlite_store.rs:456-516): the first shortest directed
    path source→target within max_depth, as one row (node_id, depth, path)
    — path is the comma-joined node sequence, like the reference's
    `bfs.path || ',' || e.target_node_id` accumulator; empty DataFrame when
    unreachable (the reference returns None).

    The reference's `ORDER BY depth ASC LIMIT 1` leaves equal-depth ties to
    SQLite's exploration order; here the tie is broken deterministically by
    the lexicographically-least path string (ids zero-padded to equal width
    so string order == hop-sequence order). Instead of enumerating every
    simple path (the recursive CTE's shape — exponential in degree), each
    BFS level keeps only the lex-min path per newly-reached node: on a
    shortest path every intermediate node is visited at exactly its own BFS
    depth, so the per-level min-fold provably yields the same
    (depth, path)-minimal row as full enumeration, with per-node state
    instead of per-path state — the 100 TB-safe shape. Cycles need no
    guard for the same reason (a first-visit frontier cannot revisit)."""
    spark = edges.sparkSession
    e = edges.select("src", "dst").localCheckpoint()

    def _pad(col):
        return F.lpad(col.cast("string"), FIND_PATH_PAD, "0")

    out_schema = "node_id bigint, depth int, path string"
    if source == target:
        return spark.createDataFrame([], out_schema)
    frontier = spark.createDataFrame([(source,)], "node bigint").select(
        "node", _pad(F.col("node")).alias("path")
    )
    visited = frontier.select("node")
    # separate rollers: frontier(d) and visited(d) each supersede only
    # their own previous generation (visited(d) is checkpointed AFTER the
    # union that reads frontier(d), so the release order is safe)
    roll_f = RollingCheckpoint(spark)
    roll_v = RollingCheckpoint(spark)
    for depth in range(1, max_depth + 1):
        frontier = roll_f(
            e.join(F.broadcast(frontier), e.src == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.concat(F.col("path"), F.lit(","), _pad(F.col("dst"))).alias("path"),
            )
            .groupBy("node")
            .agg(F.min("path").alias("path"))
            .join(F.broadcast(visited), "node", "left_anti")
        )
        hit = frontier.filter(F.col("node") == target).select("path").take(1)
        if hit:
            return spark.createDataFrame(
                [(target, depth, hit[0]["path"])], out_schema
            )
        visited = roll_v(visited.unionByName(frontier.select("node")))
    return spark.createDataFrame([], out_schema)


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
    # static (node_id, out_deg) table — pinned once; each round unions it
    # into the contribution aggregate so every node stays present WITHOUT
    # the former per-round join-back onto the rank state (r13, guide
    # §2.4: sum over {contribs…, 0.0} == coalesce(sum(contribs), 0.0)
    # exactly for these nonnegative doubles, and max over {out_deg, nulls}
    # recovers the static degree)
    static = (
        nodes.join(out_deg, "node_id", "left")
        .select(
            "node_id", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
        )
        .localCheckpoint()
    )
    n = static.count()
    # each iteration's rank state supersedes the previous one — roll the
    # checkpoints so storage stays constant across n_iters (and across a
    # long multi-query session; see ckpt.py)
    roll = RollingCheckpoint(edges.sparkSession)
    # the dangling-mass probe rides the checkpoint-materialization job
    # (r14, guide §2.4): the eager-checkpoint-then-collect shape paid TWO
    # full passes over the rank state per round; with_action fuses them
    # into one job with identical values (same aggregate over the same
    # materialized state)
    _dang_probe = lambda d: d.filter(F.col("out_deg") == 0).agg(  # noqa: E731
        F.coalesce(F.sum("rank"), F.lit(0.0))
    ).collect()[0][0]
    ranks, dang = roll.with_action(
        static.select("node_id", "out_deg", F.lit(1.0 / n).alias("rank")),
        _dang_probe,
    )
    # Small-state graphs: broadcast the rank vector into the edge join so
    # each iteration is map-side over the (checkpointed, never reshuffled)
    # edge table + ONE shuffle for the dst aggregation. Huge graphs fall
    # back to the shuffle join automatically.
    bcast = n <= BROADCAST_STATE_MAX_NODES
    for _ in range(n_iters):
        state = ranks.select(F.col("node_id").alias("src"), "rank", "out_deg")
        contrib = (
            e.join(F.broadcast(state) if bcast else state, "src")
            .select(
                F.col("dst").alias("node_id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
                F.lit(None).cast("long").alias("od"),
            )
        )
        base = static.select(
            "node_id", F.lit(0.0).alias("c"), F.col("out_deg").alias("od")
        )
        nxt = (
            contrib.unionByName(base)
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"), F.max("od").alias("out_deg"))
            .select(
                "node_id",
                "out_deg",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.col("inflow") + F.lit(dang) / F.lit(float(n)))
                ).alias("rank"),
            )
        )
        # one checkpoint materialization per iteration (constant lineage
        # depth); the NEXT round's dangling mass is probed by the same job
        ranks, dang = roll.with_action(nxt, _dang_probe)
    return ranks.select("node_id", "rank")


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    n_iters: int = 10,
    damping: float = PAGERANK_DAMPING,
) -> DataFrame:
    """(node_id, rank) — PageRank with the teleport distribution
    concentrated on `seeds` (uniform over them): the random surfer
    restarts at a seed instead of anywhere, so ranks measure proximity
    TO the seed set — the "related to this symbol neighborhood" ranking
    that global PageRank can't give. Dangling mass also returns to the
    seeds (the standard PPR convention). Identical plan shape to
    pagerank(): per-iteration map-side-combinable groupBy(dst) with
    rolling checkpoints; the teleport vector is a column CASE, never a
    table."""
    if not seeds:
        raise ValueError("personalized_pagerank needs at least one seed")
    e = edges.select("src", "dst").localCheckpoint()
    nodes = nodes_from_edges(e)
    out_deg = e.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    p_seed = 1.0 / len(seeds)
    pcol = F.when(F.col("node_id").isin(seeds), F.lit(p_seed)).otherwise(
        F.lit(0.0)
    )
    # static (node_id, out_deg) union leg replaces the per-round
    # join-back, dangling mass collected as a literal — same re-shape as
    # pagerank() above (r13, guide §2.4); float-exact because the extra
    # 0.0 term is additive identity for these nonnegative sums
    static = (
        nodes.join(out_deg, "node_id", "left")
        .select(
            "node_id", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
        )
        .localCheckpoint()
    )
    roll = RollingCheckpoint(edges.sparkSession)
    # dangling probe fused into the checkpoint job — see pagerank (r14)
    _dang_probe = lambda d: d.filter(F.col("out_deg") == 0).agg(  # noqa: E731
        F.coalesce(F.sum("rank"), F.lit(0.0))
    ).collect()[0][0]
    ranks, dang = roll.with_action(
        static.select("node_id", "out_deg", pcol.alias("rank")), _dang_probe
    )
    bcast = static.count() <= BROADCAST_STATE_MAX_NODES
    for _ in range(n_iters):
        state = ranks.select(F.col("node_id").alias("src"), "rank", "out_deg")
        contrib = (
            e.join(F.broadcast(state) if bcast else state, "src")
            .select(
                F.col("dst").alias("node_id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
                F.lit(None).cast("long").alias("od"),
            )
        )
        base = static.select(
            "node_id", F.lit(0.0).alias("c"), F.col("out_deg").alias("od")
        )
        nxt = (
            contrib.unionByName(base)
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"), F.max("od").alias("out_deg"))
            .select(
                "node_id",
                "out_deg",
                (
                    F.lit(1.0 - damping) * pcol
                    + F.lit(damping)
                    * (F.col("inflow") + F.lit(dang) * pcol)
                ).alias("rank"),
            )
        )
        ranks, dang = roll.with_action(nxt, _dang_probe)
    return ranks.select("node_id", F.round("rank", 6).alias("rank"))


# ---------------------------------------------------------------------------
# Connected components (HashMin deterministic label propagation)
# ---------------------------------------------------------------------------

def connected_components(edges: DataFrame, n_iters: int = 15) -> DataFrame:
    """(node_id, component) — component = min node id reachable over the
    UNDIRECTED edge set after n_iters rounds of min-label propagation.
    Deterministic by construction (min is order-free). n_iters must be >=
    graph diameter; each round is one join + one min-groupBy."""
    # No distinct on the symmetrized union: min-label propagation is
    # duplicate-insensitive (min over a multiset), so the dedup shuffle
    # would buy nothing.
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint()
    )
    roll = RollingCheckpoint(edges.sparkSession)
    labels = roll(
        nodes_from_edges(und)
        .select("node_id", F.col("node_id").alias("component"))
    )
    bcast = labels.count() <= BROADCAST_STATE_MAX_NODES
    prev_sum = None
    for _ in range(n_iters):
        state = labels.select(F.col("node_id").alias("src"), "component")
        # min over {own label} ∪ {neighbor labels} via union+groupBy —
        # exactly least(own, min(nbrs)) but without the per-round
        # join-back onto the label state (r13, guide §2.4; integer min
        # is order- and duplicate-insensitive)
        msgs = und.join(
            F.broadcast(state) if bcast else state, "src"
        ).select(F.col("dst").alias("node_id"), "component")
        # labels only ever decrease; an unchanged sum ⇒ fixed point reached
        # — further iterations are identity, so early exit preserves the
        # exact fixed-n_iters semantics (and the oracle's output). The sum
        # probe rides the checkpoint-materialization job (r14, guide
        # §2.4: one pass per round instead of checkpoint + probe).
        labels, cur_sum = roll.with_action(
            msgs.unionByName(labels.select("node_id", "component"))
            .groupBy("node_id")
            .agg(F.min("component").alias("component")),
            lambda d: d.agg(F.sum("component")).collect()[0][0],
        )
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


# ---------------------------------------------------------------------------
# Label propagation (G6 — reference-deterministic variant)
# ---------------------------------------------------------------------------

def _collect_adjacency_csr(edges: DataFrame):
    """Collect the DIRECTED edge list once (Arrow columnar transfer — half
    the rows of a pre-symmetrized union, and no distinct shuffle) and
    symmetrize + dedup + CSR-index in numpy on the driver. Returns
    (node_ids int64 array sorted asc, indptr, indices) with per-node
    neighbor indices sorted asc (the BTreeSet discipline) and self-loops
    dropped."""
    import numpy as np

    pdf = edges.select("src", "dst").toPandas()
    s = pdf["src"].to_numpy(dtype=np.int64)
    d = pdf["dst"].to_numpy(dtype=np.int64)
    keep = s != d
    s, d = s[keep], d[keep]
    u = np.concatenate([s, d])
    v = np.concatenate([d, s])
    node_ids = np.unique(u)
    m = len(node_ids)
    if m == 0:
        return node_ids, np.zeros(1, dtype=np.int64), np.zeros(0, dtype=np.int64)
    iu = np.searchsorted(node_ids, u)
    iv = np.searchsorted(node_ids, v)
    key = np.unique(iu * m + iv)  # dedup multi-edges; sorted by (iu, iv)
    indptr = np.searchsorted(key // m, np.arange(m + 1))
    return node_ids, indptr, key % m


def export_adjacency(edges: DataFrame) -> tuple[list[int], dict[int, list[int]]]:
    """G9 AdjacencyExport: sorted node ids + undirected neighbor lists
    (sorted — the BTreeSet discipline, community.rs:100-110). The snapshot
    is collected once; every driver-side algorithm is a pure function over
    it (LOCK-SCOPE, graph/algorithms/mod.rs:1-9). Sized for per-tenant
    code graphs; above LPA_DISTRIBUTED_THRESHOLD nodes, LPA callers
    should use label_propagation(mode='auto') so the iterative-join
    fallback runs instead of collecting this snapshot."""
    node_ids, indptr, indices = _collect_adjacency_csr(edges)
    ids = node_ids.tolist()
    lst = indices.tolist()
    adj = {
        ids[i]: [ids[j] for j in lst[indptr[i] : indptr[i + 1]]]
        for i in range(len(ids))
    }
    return ids, adj


# Above this many nodes the driver-side adjacency export (the reference's
# own AdjacencyExport architecture — fine for per-tenant code graphs, which
# are small by contract) would serialize too much state on the driver;
# label_propagation(mode='auto') switches to the iterative-join fallback.
LPA_DISTRIBUTED_THRESHOLD = 100_000


def label_propagation_distributed(
    edges: DataFrame,
    max_iters: int = LPA_MAX_ITERS,
    min_size: int = LPA_MIN_COMMUNITY_SIZE,
    n_phases: int = 8,
) -> DataFrame:
    """(node_id, community) — the 100 TB-scale LPA fallback: iterative
    DataFrame joins, nothing ever collected to the driver.

    Same per-node choice rule as the reference (community.rs:129-137):
    most frequent neighbor label, MIN-label tiebreak. The reference's
    ASYNCHRONOUS ascending-node-order sweep is inherently sequential, so
    the distributed variant uses a multi-color Gauss-Seidel schedule:
    each sweep runs n_phases sub-steps, sub-step p updating only nodes
    with node_id % n_phases == p against the partially-updated state.
    Within a neighborhood whose node ids don't collide mod n_phases
    (e.g. consecutive-id cliques of size <= n_phases) this IS the async
    sweep; a plain 2-color (red-black) or fully synchronous (Jacobi)
    schedule oscillates on cliques because same-phase neighbors swap
    labels simultaneously. Phase collisions between adjacent nodes can
    still oscillate in principle, so the loop is bounded by max_iters;
    every stable state of this schedule is also a fixed point of the
    reference's async sweep (the per-node stability condition is
    identical). The fixed point reached may label a community by a
    different member id than the driver-side sweep, so communities are
    normalized to content-addressed labels: community = min member node
    id (the leiden/dedup-survivors convention). Use the driver-side path
    when exact reference label parity matters and the graph fits
    (mode='auto' on label_propagation picks by node count against
    LPA_DISTRIBUTED_THRESHOLD).

    Per sweep: n_phases sub-steps x (one equi-join on labels + one
    groupBy) — shuffle-bounded, AQE-friendly; lineage is truncated per
    sub-step with localCheckpoint so sweeps don't stack a growing plan."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    # keep n_phases+1 generations: `before` (the sweep-start labels) is
    # read by the end-of-sweep changed-count diff, so it must survive all
    # n_phases sub-step checkpoints of that sweep — still a constant
    # footprint, vs max_iters*n_phases generations unreleased before
    roll = RollingCheckpoint(edges.sparkSession, keep_last=n_phases + 1)
    labels = roll(
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("label", F.col("node_id"))
    )
    for _ in range(max_iters):
        before = labels
        for phase in range(n_phases):
            nbr_labels = labels.select(
                F.col("node_id").alias("dst"), F.col("label").alias("nbr_label")
            )
            best = (
                # pmod, not %: Spark's % keeps the dividend's sign, so a
                # negative node id would match NO phase and never update
                und.filter(F.pmod(F.col("src"), F.lit(n_phases)) == phase)
                .join(nbr_labels, "dst")
                .groupBy(F.col("src").alias("node_id"), "nbr_label")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .groupBy("node_id")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("nbr_label")).alias("neg"))
                    ).alias("m")
                )
                .select("node_id", (-F.col("m.neg")).alias("best"))
            )
            labels = roll(
                labels.join(best, "node_id", "left")
                .select(
                    "node_id",
                    F.coalesce("best", "label").alias("label"),
                )
            )
        n_changed = (
            before.withColumnRenamed("label", "old")
            .join(labels, "node_id")
            .filter(F.col("old") != F.col("label"))
            .count()
        )
        if n_changed == 0:
            break
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("sz"),
        F.min("node_id").alias("community"),
    )
    return (
        labels.join(sizes.filter(F.col("sz") >= min_size), "label")
        .select("node_id", "community")
    )


def label_propagation(
    edges: DataFrame,
    max_iters: int = LPA_MAX_ITERS,
    min_size: int = LPA_MIN_COMMUNITY_SIZE,
    mode: str = "driver",
    distributed_threshold: int = LPA_DISTRIBUTED_THRESHOLD,
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
    per-tenant code graphs are small by contract (SURVEY §7). A
    synchronous distributed variant is not exactly parity-faithful
    (different fixed points are possible), so the driver path is the
    default — but above LPA_DISTRIBUTED_THRESHOLD nodes the adjacency
    export itself becomes the bottleneck, and mode='auto' falls back to
    label_propagation_distributed (multi-color iterative joins,
    min-member community ids). mode='driver'/'distributed' force a
    path."""
    if mode not in ("driver", "auto", "distributed"):
        raise ValueError(
            f"unknown label_propagation mode {mode!r}; "
            "expected 'driver', 'auto', or 'distributed'"
        )
    if mode == "distributed":
        return label_propagation_distributed(edges, max_iters, min_size)
    if mode == "auto":
        n_nodes = (
            edges.select(F.col("src").alias("v"))
            .unionByName(edges.select(F.col("dst").alias("v")))
            .distinct()
            .count()
        )
        if n_nodes > distributed_threshold:
            return label_propagation_distributed(edges, max_iters, min_size)
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
# Triangle counting & k-core decomposition (graph-quality analytics
# extending A1/A2 — clustering structure and dense-core membership over
# the same co-occurrence / symbol graphs)
# ---------------------------------------------------------------------------

# order-key pack: deg * 10^12 + node_id is collision-free while node ids
# stay below 10^12 (TPC-H partkeys and symbol ids are far below)
_TRI_PACK = 10**12


def triangle_counts(edges: DataFrame) -> DataFrame:
    """(node_id, n_triangles) — exact per-node triangle participation
    over the UNDIRECTED simple graph (self-loops and multi-edges
    ignored); nodes in no triangle are omitted.

    Scale-canonical degree-ordered plan (the MapReduce triangle-counting
    scheme of Suri & Vassilvitskii 2011): orient every edge from its
    lower-(degree, id) endpoint to the higher one, generate wedges only
    at each node's oriented out-neighbors, and close them with one
    equi-join back on the oriented edge set. Orientation bounds any
    node's out-degree by O(√m), so the wedge explosion at hub nodes —
    the thing that kills the naive a<b<c three-way join on a skewed
    graph — cannot happen; both joins are plain shuffles on (src) /
    (b, c). The (deg, id) tiebreak makes the orientation (and the plan's
    intermediate sizes) deterministic."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    tris = _closed_triangles(und)
    return (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def _closed_triangles(und: DataFrame) -> DataFrame:
    """(a, b, c) — every triangle of the SYMMETRIC simple edge set
    `und`, each exactly once, via the degree-ordered orientation (Suri &
    Vassilvitskii 2011) triangle_counts has always used; extracted (r7,
    behavior-preserving) so k_truss can enumerate the same triangles
    per peel round without duplicating the orientation."""
    deg = und.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    key = (F.col("deg") * F.lit(_TRI_PACK) + F.col("node_id")).alias("k")
    keyed = deg.select("node_id", key)
    oriented = (
        und.join(keyed.select(F.col("node_id").alias("src"), F.col("k").alias("ks")), "src")
        .join(keyed.select(F.col("node_id").alias("dst"), F.col("k").alias("kd")), "dst")
        .filter(F.col("ks") < F.col("kd"))
        .select("src", "dst", "ks", "kd")
    )
    wedges = (
        oriented.alias("x")
        .join(oriented.alias("y"), "src")
        .filter(F.col("x.kd") < F.col("y.kd"))
        .select(
            F.col("src").alias("a"),
            F.col("x.dst").alias("b"),
            F.col("y.dst").alias("c"),
        )
    )
    return wedges.join(
        oriented.select(F.col("src").alias("b"), F.col("dst").alias("c")),
        ["b", "c"],
    ).select("a", "b", "c")


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(node_id, degree, n_triangles, clustering_coeff) — the local
    clustering coefficient cc(v) = 2·T(v) / (deg(v)·(deg(v)-1)) over the
    undirected simple graph; nodes of degree < 2 have cc = 0. A pure
    composition: the degree-ordered triangle counts joined to the simple
    degrees — no new shuffle shape beyond triangle_counts itself."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    deg = und.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tri = triangle_counts(edges)
    return (
        deg.join(tri, "node_id", "left")
        .select(
            "node_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_triangles", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def k_core(edges: DataFrame, k: int = 3, n_iters: int = 30) -> DataFrame:
    """(node_id, core_degree) — the k-core of the undirected simple
    graph: the maximal subgraph where every node has degree >= k;
    core_degree is the node's degree WITHIN the core. Computed by the
    standard peeling fixpoint: repeatedly drop nodes with current
    degree < k. Deterministic (pure set operations); n_iters bounds the
    rounds (each round is one degree aggregate + one semi-join — the
    peel can only remove nodes, so an unchanged count is a fixpoint and
    iteration stops early, preserving exact fixed-round semantics for
    the oracle's unrolled CTE)."""
    und = (
        edges.select("src", "dst")
        .unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    roll = RollingCheckpoint(edges.sparkSession)
    cur = roll(und)
    prev_n = None
    for _ in range(n_iters):
        keep = (
            cur.groupBy(F.col("src").alias("node_id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node_id")
        )
        # the fixpoint count probe rides the checkpoint-materialization
        # job (r14, guide §2.4: one pass per peel round, not two)
        cur, n = roll.with_action(
            cur.join(keep.withColumnRenamed("node_id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node_id", "dst"), "dst", "left_semi"),
            lambda d: d.count(),
        )
        if n == prev_n:
            break
        prev_n = n
    return cur.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def _use_distributed_bfs(
    edges: DataFrame, mode: str, threshold: int | None
) -> bool:
    """Path selector shared by the BFS-harness centralities: 'driver' /
    'distributed' force; 'auto' counts nodes (one bounded aggregate,
    the label_propagation(mode='auto') discipline) and picks the
    frontier-join fallback above the threshold so the driver CSR
    collect can never exceed driver memory."""
    if mode not in ("driver", "auto", "distributed"):
        raise ValueError(
            f"unknown BFS-centrality mode {mode!r}; "
            "expected 'driver', 'auto', or 'distributed'"
        )
    if mode == "distributed":
        return True
    if mode == "driver":
        return False
    cap = BFS_DISTRIBUTED_THRESHOLD if threshold is None else threshold
    n_nodes = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    return n_nodes > cap


def harmonic_centrality(
    edges: DataFrame,
    sample_k: int | None = None,
    mode: str = "auto",
    distributed_threshold: int | None = None,
) -> DataFrame:
    """(node_id, harmonic) — harmonic centrality H(v) = Σ_{u≠v} 1/d(u,v)
    over the undirected simple graph (unreachable pairs contribute 0,
    which is what makes harmonic — unlike classic closeness —
    well-defined on disconnected graphs). Same architecture as
    betweenness: adjacency exported once to a broadcast CSR, per-source
    BFS accumulation parallel over executors via mapPartitions; since
    d is symmetric, accumulating 1/d(s, w) into w over ALL sources s
    yields H(w) exactly. Optional first-k source sampling scaled n/k
    (the Bader-style approximation betweenness uses).

    mode='auto' (default): above BFS_DISTRIBUTED_THRESHOLD nodes the
    driver CSR export would exceed driver memory, so the frontier-join
    fallback (harmonic_centrality_distributed) runs instead, with the
    default source budget when the caller picked none.
    'driver'/'distributed' force a path."""
    if _use_distributed_bfs(edges, mode, distributed_threshold):
        return harmonic_centrality_distributed(
            edges, sample_k=sample_k or BFS_DISTRIBUTED_DEFAULT_SOURCES
        )
    spark = edges.sparkSession
    np_ids, indptr, indices = _collect_adjacency_csr(edges)
    node_ids = np_ids.tolist()
    n = len(node_ids)
    if n == 0:
        return spark.createDataFrame([], "node_id long, harmonic double")
    lst = indices.tolist()
    nbrs: list[list[int]] = [lst[indptr[i] : indptr[i + 1]] for i in range(n)]
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
            dist[s] = 0
            dq = deque([s])
            while dq:
                v = dq.popleft()
                dv1 = dist[v] + 1
                for w in g[v]:
                    if dist[w] < 0:
                        dist[w] = dv1
                        dq.append(w)
                        acc[w] += 1.0 / dv1
        for node, val in enumerate(acc):
            if val != 0.0:
                yield (node, val)

    parts = max(1, min(len(src_idx), spark.sparkContext.defaultParallelism))
    raw = (
        spark.sparkContext.parallelize(src_idx, parts)
        .mapPartitions(per_source)
        .reduceByKey(lambda a, b: a + b)
    )
    acc_df = spark.createDataFrame(
        raw.map(lambda kv: (node_ids[kv[0]], kv[1])), ["node_id", "raw"]
    )
    all_nodes = spark.createDataFrame([(v,) for v in node_ids], ["node_id"])
    return all_nodes.join(acc_df, "node_id", "left").select(
        "node_id",
        F.round(
            F.coalesce(F.col("raw"), F.lit(0.0)) * F.lit(scale), 6
        ).alias("harmonic"),
    )


def eccentricity(
    edges: DataFrame,
    mode: str = "auto",
    distributed_threshold: int | None = None,
) -> DataFrame:
    """(node_id, eccentricity) — max shortest-path distance from each
    node to any node REACHABLE from it (per-component eccentricity;
    the component's diameter = max, radius = min of these). Same
    broadcast-CSR + per-source BFS harness as harmonic/betweenness;
    since d is symmetric, source s's BFS pushes max-updates into every
    reached node, and the integer max-merge across sources is
    order-insensitive (no float discipline needed).

    mode='auto' (default): above BFS_DISTRIBUTED_THRESHOLD nodes the
    frontier-join fallback runs with the default source budget — a
    sampled LOWER-BOUND estimate there (exact all-sources eccentricity
    is O(n²) state at that scale); below it the exact driver harness."""
    if _use_distributed_bfs(edges, mode, distributed_threshold):
        return eccentricity_distributed(
            edges, sample_k=BFS_DISTRIBUTED_DEFAULT_SOURCES
        )
    spark = edges.sparkSession
    np_ids, indptr, indices = _collect_adjacency_csr(edges)
    node_ids = np_ids.tolist()
    n = len(node_ids)
    if n == 0:
        return spark.createDataFrame([], "node_id long, eccentricity int")
    lst = indices.tolist()
    nbrs: list[list[int]] = [lst[indptr[i] : indptr[i + 1]] for i in range(n)]
    badj = spark.sparkContext.broadcast(nbrs)

    def per_source(src_iter):
        from collections import deque

        g = badj.value
        m = len(g)
        acc = [0] * m
        for s in src_iter:
            dist = [-1] * m
            dist[s] = 0
            dq = deque([s])
            while dq:
                v = dq.popleft()
                dv1 = dist[v] + 1
                for w in g[v]:
                    if dist[w] < 0:
                        dist[w] = dv1
                        dq.append(w)
                        if dv1 > acc[w]:
                            acc[w] = dv1
        for node, val in enumerate(acc):
            if val:
                yield (node, val)

    parts = max(1, min(n, spark.sparkContext.defaultParallelism))
    raw = (
        spark.sparkContext.parallelize(list(range(n)), parts)
        .mapPartitions(per_source)
        .reduceByKey(max)
    )
    acc_df = spark.createDataFrame(
        raw.map(lambda kv: (node_ids[kv[0]], kv[1])), ["node_id", "raw"]
    )
    all_nodes = spark.createDataFrame([(v,) for v in node_ids], ["node_id"])
    return all_nodes.join(acc_df, "node_id", "left").select(
        "node_id",
        F.coalesce(F.col("raw"), F.lit(0)).cast("int").alias("eccentricity"),
    )


# ---------------------------------------------------------------------------
# Betweenness centrality (G8 — Brandes, parallel over sources)
# ---------------------------------------------------------------------------

def betweenness(
    edges: DataFrame,
    sample_k: int | None = None,
    mode: str = "auto",
    distributed_threshold: int | None = None,
) -> DataFrame:
    """(node_id, centrality) — Brandes over the undirected graph.

    Architecture mirrors the reference exactly: export the adjacency once
    (G9 AdjacencyExport — here a broadcast dict), then run the pure
    per-source accumulation in parallel over executors (mapPartitions over
    the source list). Normalization 2/((n-1)(n-2)) clamped to <=1; optional
    first-k source sampling scaled by n/k (betweenness.rs:49-184 — Bader
    approximation, sources in sorted order for determinism).

    mode='auto' (default): above BFS_DISTRIBUTED_THRESHOLD nodes the
    frontier-join Brandes (betweenness_distributed) runs instead of the
    driver CSR export, with the default source budget when the caller
    picked none. 'driver'/'distributed' force a path."""
    if _use_distributed_bfs(edges, mode, distributed_threshold):
        return betweenness_distributed(
            edges, sample_k=sample_k or BFS_DISTRIBUTED_DEFAULT_SOURCES
        )
    spark = edges.sparkSession
    # Arrow transfer of the directed edge list + numpy symmetrize/dedup/CSR
    # (no union-distinct shuffle, no Python edge loop — both measured
    # multi-second at 1M+ edges)
    np_ids, indptr, indices = _collect_adjacency_csr(edges)
    node_ids = np_ids.tolist()
    n = len(node_ids)
    if n < 3:
        return spark.createDataFrame(
            [(v, 0.0) for v in node_ids], ["node_id", "centrality"]
        )
    # index-based adjacency as plain int lists: the BFS inner loop iterates
    # lists ~2x faster than numpy slices in CPython
    lst = indices.tolist()
    nbrs: list[list[int]] = [
        lst[indptr[i] : indptr[i + 1]] for i in range(n)
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
            # NOTE: the reference's normalize_betweenness divides the
            # DOUBLE-COUNTED undirected accumulation by (n-1)(n-2)/2
            # without halving (betweenness.rs:103-128) — its scores are 2x
            # the textbook value, clamped at 1.0. Strict numeric parity >
            # textbook here.
            F.coalesce(F.col("raw"), F.lit(0.0)) * F.lit(norm * scale),
            F.lit(1.0),
        ).alias("centrality"),
    )


# ---------------------------------------------------------------------------
# Distributed BFS-harness fallback (the 100 TB path for the centralities)
#
# The driver-side harness above (betweenness/harmonic/eccentricity) mirrors
# the reference's AdjacencyExport architecture (graph/algorithms/mod.rs:1-9
# LOCK-SCOPE snapshot): collect the CSR once, fan per-source BFS over
# executors via a broadcast. Per-tenant code graphs are small by contract,
# but a tenant graph past driver memory must not kill the job — so above
# BFS_DISTRIBUTED_THRESHOLD nodes, mode='auto' switches to a pure
# frontier-join formulation where NOTHING is ever collected: a
# level-synchronous multi-source BFS keyed by source (the same iterative
# shape as label_propagation_distributed), shared by all three
# centralities. Sources are the first k node ids ascending — the exact
# convention of the driver harness's Bader-style sampling
# (betweenness.rs:49-184), so sampled results agree across paths.
# ---------------------------------------------------------------------------

BFS_DISTRIBUTED_THRESHOLD = LPA_DISTRIBUTED_THRESHOLD
# Source budget for the distributed fallback when the caller didn't pick
# one: k sampled sources keep in-flight state at O(k * n) rows (visited
# table) regardless of graph size, scaled back by n/k.
BFS_DISTRIBUTED_DEFAULT_SOURCES = 256


def _undirected_simple(edges: DataFrame) -> DataFrame:
    """(u, v) — symmetrized, self-loop-free, deduped edge frame (the
    distributed twin of _collect_adjacency_csr's numpy normalization)."""
    base = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        base.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(
            base.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        .distinct()
    )


def _multi_source_bfs(
    und: DataFrame,
    sources: DataFrame,
    max_depth: int = 64,
):
    """visited (src, node_id, dist, sigma): shortest-path forest from every
    source in `sources` (one column `src`) over the undirected simple
    graph `und` (u, v), with sigma = number of shortest s→node paths.

    Level-synchronous frontier joins: depth d's frontier joins the edge
    table once, sums sigma over all level-d predecessors (every shortest
    path to a depth-d+1 node runs through a depth-d neighbor, so the
    groupBy-sum IS the Brandes sigma recurrence), anti-joins the visited
    set, and becomes depth d+1. Per depth: one equi-join + one groupBy +
    one anti-join — all shuffle-bounded and AQE-friendly; state is the
    visited table, O(k·n) rows for k sources. The per-depth emptiness
    count() is a bounded driver action (≤ graph diameter ≤ max_depth —
    the k_core fixpoint discipline). Sigma values are integer path
    counts carried as doubles: exact under float addition up to 2^53,
    so the shuffle's reduce order cannot perturb them."""
    spark = und.sparkSession
    roll_v = RollingCheckpoint(spark, keep_last=2)
    roll_f = RollingCheckpoint(spark, keep_last=2)
    frontier = roll_f(
        sources.select(
            "src",
            F.col("src").alias("node_id"),
            F.lit(0).alias("dist"),
            F.lit(1.0).alias("sigma"),
        )
    )
    visited = roll_v(frontier)
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(und, frontier["node_id"] == und["u"])
            .select("src", F.col("v").alias("node_id"), "sigma")
            .groupBy("src", "node_id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(
                visited.select("src", "node_id"),
                ["src", "node_id"],
                "left_anti",
            )
            .select("src", "node_id", F.lit(depth).alias("dist"), "sigma")
        )
        frontier = roll_f(nxt)
        if frontier.limit(1).count() == 0:
            break
        visited = roll_v(visited.unionByName(frontier))
    else:
        # the loop exhausted max_depth with the frontier still non-empty:
        # every pair farther than max_depth hops would be SILENTLY absent
        # from the forest, skewing harmonic/eccentricity/betweenness with
        # no signal (the driver-side harness has no such cap). Loud
        # failure, the scc / bloom_pruned_join discipline (ADVICE r7 #3);
        # callers with genuinely huge diameters pass a bigger max_depth.
        raise RuntimeError(
            f"_multi_source_bfs: frontier still non-empty at "
            f"max_depth={max_depth}; results would silently omit all "
            f"pairs farther than {max_depth} hops — raise max_depth"
        )
    return visited


def _distributed_sources(
    und: DataFrame, sample_k: int | None
) -> tuple[DataFrame, DataFrame]:
    """(all_nodes, sources): first sample_k node ids ascending (all nodes
    when sample_k is None) — the driver harness's deterministic
    source-sampling convention, as a plan."""
    nodes = und.select(F.col("u").alias("node_id")).distinct()
    if sample_k is None:
        return nodes, nodes.select(F.col("node_id").alias("src"))
    srcs = (
        nodes.orderBy("node_id")
        .limit(sample_k)
        .select(F.col("node_id").alias("src"))
    )
    return nodes, srcs


def harmonic_centrality_distributed(
    edges: DataFrame,
    sample_k: int | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """(node_id, harmonic) — frontier-join twin of harmonic_centrality:
    H(w) = Σ_{s ∈ sources} 1/d(s, w) · (n/k), exact when sample_k is
    None (all sources). Nothing collected to the driver."""
    und = _undirected_simple(edges).localCheckpoint()
    nodes, srcs = _distributed_sources(und, sample_k)
    counts = nodes.agg(
        F.count(F.lit(1)).cast("double").alias("n_nodes")
    ).crossJoin(
        srcs.agg(F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double").alias("k_src"))
    )
    visited = _multi_source_bfs(und, srcs, max_depth)
    acc = (
        visited.filter(F.col("dist") > 0)
        .groupBy("node_id")
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("raw"))
    )
    return (
        nodes.join(acc, "node_id", "left")
        .crossJoin(F.broadcast(counts))
        .select(
            "node_id",
            F.round(
                F.coalesce(F.col("raw"), F.lit(0.0))
                * F.col("n_nodes") / F.col("k_src"),
                6,
            ).alias("harmonic"),
        )
    )


def eccentricity_distributed(
    edges: DataFrame,
    sample_k: int | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """(node_id, eccentricity) — frontier-join twin of eccentricity():
    ecc(w) = max_{s ∈ sources} d(s, w). Exact with all sources
    (sample_k None); with a sample it is the standard LOWER-BOUND
    estimator (every observed distance is a true distance — exact
    distributed eccentricity at scale needs iFUB-style refinement, out
    of scope; the bound is what sampled pivots give)."""
    und = _undirected_simple(edges).localCheckpoint()
    nodes, srcs = _distributed_sources(und, sample_k)
    visited = _multi_source_bfs(und, srcs, max_depth)
    acc = visited.groupBy("node_id").agg(F.max("dist").alias("raw"))
    return nodes.join(acc, "node_id", "left").select(
        "node_id",
        F.coalesce(F.col("raw"), F.lit(0)).cast("int").alias("eccentricity"),
    )


def betweenness_distributed(
    edges: DataFrame,
    sample_k: int | None = None,
    max_depth: int = 64,
) -> DataFrame:
    """(node_id, centrality) — Brandes as frontier joins, the 100 TB
    fallback for betweenness(): forward multi-source BFS builds
    (dist, sigma) per (src, node); the dependency back-propagation runs
    level-by-level from the deepest frontier inward, each level one
    equi-join + groupBy over the shortest-path predecessor relation
    (edge (u,v) with dist_v = dist_u + 1 under the same src). Same
    normalization and n/k source scaling as the driver path — including
    the reference's deliberately un-halved double-counted normalization
    (betweenness.rs:103-128)."""
    spark = edges.sparkSession
    und = _undirected_simple(edges).localCheckpoint()
    nodes, srcs = _distributed_sources(und, sample_k)
    n = nodes.count()
    if n < 3:
        return nodes.select("node_id", F.lit(0.0).alias("centrality"))
    k = srcs.count()
    visited = _multi_source_bfs(und, srcs, max_depth)
    # shortest-path DAG edges: u (pred) → v, per source
    vu = visited.select(
        "src",
        F.col("node_id").alias("u"),
        F.col("dist").alias("du"),
        F.col("sigma").alias("su"),
    )
    vv = visited.select(
        "src",
        F.col("node_id").alias("v"),
        F.col("dist").alias("dv"),
        F.col("sigma").alias("sv"),
    )
    preds = (
        und.join(vu, "u")
        .join(vv, ["src", "v"])
        .filter(F.col("dv") == F.col("du") + 1)
        .select("src", "u", "v", "dv", "su", "sv")
        .localCheckpoint()
    )
    max_d = visited.agg(F.max("dist")).first()[0] or 0
    roll = RollingCheckpoint(spark, keep_last=2)
    # delta rows are written exactly once per (src, node): all of a
    # node's dependency contributions arrive in the single backward
    # level equal to its depth + 1
    delta = roll(
        spark.createDataFrame([], "src long, node_id long, delta double")
    )
    for lvl in range(max_d, 0, -1):
        dw = delta.select(
            "src", F.col("node_id").alias("v"), F.col("delta").alias("delta_w")
        )
        contrib = (
            preds.filter(F.col("dv") == lvl)
            .join(dw, ["src", "v"], "left")
            .select(
                "src",
                F.col("u").alias("node_id"),
                (
                    F.col("su") / F.col("sv")
                    * (F.lit(1.0) + F.coalesce(F.col("delta_w"), F.lit(0.0)))
                ).alias("part"),
            )
            .groupBy("src", "node_id")
            .agg(F.sum("part").alias("delta"))
        )
        delta = roll(delta.unionByName(contrib))
    acc = (
        delta.filter(F.col("node_id") != F.col("src"))
        .groupBy("node_id")
        .agg(F.sum("delta").alias("raw"))
    )
    norm = 2.0 / ((n - 1) * (n - 2))
    scale = 1.0 if sample_k is None else n / float(k)
    return nodes.join(acc, "node_id", "left").select(
        "node_id",
        F.least(
            F.coalesce(F.col("raw"), F.lit(0.0)) * F.lit(norm * scale),
            F.lit(1.0),
        ).alias("centrality"),
    )


# ---------------------------------------------------------------------------
# Strongly connected components (directed — cycle structure of the
# CALLS symbol graph: mutual recursion groups, dependency knots)
# ---------------------------------------------------------------------------

def strongly_connected_components(
    edges: DataFrame, max_peels: int = 20, n_iters: int = 100,
    max_trim_rounds: int = 64,
) -> DataFrame:
    """(node_id, scc_id) — scc_id = min node id (lexicographic for
    string ids) of each node's strongly connected component, over the
    DIRECTED edge set. The directed twin of connected_components:
    impact analysis treats a dependency knot (mutual recursion, cyclic
    imports) as one unit, and SCC is what finds the knots.

    Algorithm: Orzan-style coloring + peel, built from the same
    min-label machinery as the undirected CC (public algorithm;
    forward-backward coloring is the standard distributed SCC):
      1. FORWARD coloring to fixpoint: color(v) = min over {v} and all
         ancestors — one join + min-groupBy per round, RollingCheckpoint
         bounding lineage and storage.
      2. Nodes with color == own id are ROOTS. SCC(root c) = nodes of
         color c that REACH c — a backward flag propagation restricted
         to the color class (paths inside an SCC never leave it, so the
         class restriction is lossless).
      3. Peel the found SCCs (their nodes' edges drop) and repeat on
         the remainder; a peeled-empty node is a singleton SCC.
    Each peel round starts with a TRIM fixpoint (standard FW-BW trim):
    nodes with zero remaining in-degree or out-degree (self-loops
    ignored) are singleton SCCs by definition and are assigned + removed
    BEFORE coloring — so acyclic chain/DAG structure (a deep ascending-id
    call chain, the typical CALLS-graph shape that previously peeled one
    node per round, ADVICE r7 #1) collapses in cheap trim rounds (one
    probe each) instead of consuming coloring fixpoints. Peel rounds are
    then bounded by the cycle structure only — the longest chain of
    CYCLIC SCCs meeting the min-color root per pass; max_peels
    exhaustion raises rather than returning a partial answer. n_iters
    bounds min-label propagation depth (≥ the longest directed path
    inside the post-trim graph; a single cycle of length L needs ~L
    rounds — raise n_iters for pathological ring graphs, the failure is
    loud). Every driver action is a bounded fixpoint probe (the k_core
    discipline)."""
    spark = edges.sparkSession
    # one RollingCheckpoint per frame FAMILY: a single roller releases
    # t-1 when t lands, which is only safe on a linear chain — colors,
    # flags and the shrinking edge set interleave, so each gets its own
    roll_rem = RollingCheckpoint(spark)
    # edge-count probe rides the materialization job (r14, guide §2.4);
    # n_rem tracks the surviving edge count so the per-peel emptiness
    # probes are free (they used to be a limit(1).count() job each)
    ed, n_rem = checkpoint_with(
        edges.select("src", "dst").distinct(), lambda d: d.count()
    )
    # lazy on purpose: all_nodes is read exactly once, in the final
    # leftover-singleton assembly — checkpointing it was a whole extra
    # action over the full edge table per call (guide §5: cache only
    # what is reused)
    all_nodes = nodes_from_edges(ed)
    assigned = None  # (node_id, scc_id)

    def _fixpoint_colors(rem: DataFrame, nodes: DataFrame) -> DataFrame:
        # the per-round change flag rides INSIDE the checkpointed
        # generation (chg = incoming min beats current color), so the
        # convergence probe is a scan of the fresh checkpoint — not a
        # second shuffle join of generation t against t-1 (guide §2.4:
        # one exchange fewer per round, and keep_last drops to 1)
        roll = RollingCheckpoint(spark)
        colors = roll(nodes.select("node_id", F.col("node_id").alias("color")))
        for _ in range(n_iters):
            # min over {own color} ∪ {incoming colors} via union+groupBy
            # (r13, the connected_components shape): exactly
            # least(own, min(msgs)) with no join-back exchange; chg =
            # the min beat the own color, read from the own-row flag
            msgs = rem.join(
                colors.select(F.col("node_id").alias("src"), "color"),
                "src",
            ).select(
                F.col("dst").alias("node_id"),
                "color",
                F.lit(False).alias("own"),
            )
            # the chg probe rides the checkpoint-materialization job
            # (r14, guide §2.4: one pass per round, not checkpoint+probe)
            new, changed = roll.with_action(
                msgs.unionByName(
                    colors.select("node_id", "color", F.lit(True).alias("own"))
                )
                .groupBy("node_id")
                .agg(
                    F.min("color").alias("color"),
                    F.min(
                        F.when(F.col("own"), F.col("color"))
                    ).alias("__old"),
                )
                .select(
                    "node_id",
                    "color",
                    (F.col("color") < F.col("__old")).alias("chg"),
                ),
                lambda d: d.filter("chg").count(),
            )
            colors = new.select("node_id", "color")
            if changed == 0:
                return colors
        raise RuntimeError(
            f"scc: forward coloring did not converge in {n_iters} rounds"
        )

    remaining = ed
    for _peel in range(max_peels):
        if n_rem == 0:
            break
        # TRIM fixpoint: a node absent from the non-self-loop src set
        # (zero out-degree) or dst set (zero in-degree) cannot be in any
        # directed cycle — singleton SCC; removing it can expose more,
        # so iterate. A pure DAG empties here without one coloring round.
        for _trim in range(max_trim_rounds):
            # one union + one max-groupBy instead of two distincts, a
            # join and an anti-join against nodes_from_edges (guide
            # §2.3/§2.4: same answer — a node is trivial iff it lacks a
            # non-self-loop out-edge or in-edge — in a single exchange)
            endpoint_flags = remaining.select(
                F.col("src").alias("node_id"),
                (F.col("src") != F.col("dst")).alias("o"),
                F.lit(False).alias("i"),
            ).unionByName(
                remaining.select(
                    F.col("dst").alias("node_id"),
                    F.lit(False).alias("o"),
                    (F.col("src") != F.col("dst")).alias("i"),
                )
            )
            # emptiness probe rides the checkpoint job (r14, guide §2.4)
            triv, n_triv = checkpoint_with(
                endpoint_flags.groupBy("node_id")
                .agg(F.max("o").alias("has_out"), F.max("i").alias("has_in"))
                .filter(~(F.col("has_out") & F.col("has_in")))
                .select("node_id"),
                lambda d: d.count(),
            )
            if n_triv == 0:
                break
            found_triv = triv.select(
                "node_id", F.col("node_id").alias("scc_id")
            )
            assigned = (
                found_triv
                if assigned is None
                else assigned.unionByName(found_triv)
            )
            remaining, n_rem = roll_rem.with_action(
                remaining.join(
                    triv.withColumnRenamed("node_id", "src"),
                    "src",
                    "left_anti",
                ).join(
                    triv.withColumnRenamed("node_id", "dst"),
                    "dst",
                    "left_anti",
                ),
                lambda d: d.count(),
            )
            if n_rem == 0:
                break
        if n_rem == 0:
            break
        nodes = nodes_from_edges(remaining)
        colors = _fixpoint_colors(remaining, nodes)
        # backward reach-the-root flags within each color class; as in
        # _fixpoint_colors the newly-flagged bit rides inside the
        # checkpointed generation so the convergence probe is a scan,
        # not a t-vs-t-1 shuffle join (guide §2.4)
        roll_fl = RollingCheckpoint(spark)
        flags = roll_fl(
            colors.select(
                "node_id",
                "color",
                (F.col("node_id") == F.col("color")).alias("inscc"),
            )
        )
        for _ in range(n_iters):
            flagged_dst = flags.filter("inscc").select(
                F.col("node_id").alias("dst"), F.col("color").alias("dcolor")
            )
            cand = (
                remaining.join(flagged_dst, "dst")
                .select(F.col("src").alias("node_id"), "dcolor")
                .distinct()
            )
            # union+groupBy instead of the join-back (r13, same shape
            # as the forward loop): max(bool) over {own inscc, match
            # hits} is the OR; the own row carries color (match rows
            # ride a null) and the old flag for the chg probe
            match = (
                cand.join(
                    colors.withColumnRenamed("color", "vcolor"), "node_id"
                )
                .filter(F.col("dcolor") == F.col("vcolor"))
                .select(
                    "node_id",
                    F.lit(None)
                    .cast(flags.schema["color"].dataType)
                    .alias("color"),
                    F.lit(True).alias("inscc"),
                    F.lit(False).alias("own"),
                )
                .distinct()
            )
            new, changed = roll_fl.with_action(
                match.unionByName(
                    flags.select(
                        "node_id", "color", "inscc", F.lit(True).alias("own")
                    )
                )
                .groupBy("node_id")
                .agg(
                    F.max("color").alias("color"),
                    F.max("inscc").alias("inscc"),
                    F.max(
                        F.when(F.col("own"), F.col("inscc"))
                    ).alias("__old"),
                )
                .select(
                    "node_id",
                    "color",
                    "inscc",
                    (F.col("inscc") & ~F.col("__old")).alias("chg"),
                ),
                lambda d: d.filter("chg").count(),
            )
            flags = new.select("node_id", "color", "inscc")
            if changed == 0:
                break
        # lazy: the roll_rem.with_action job below reads `gone` (derived
        # from found) and materializes this checkpoint as part of the
        # same pass (r14) — nothing releases it before then
        found = flags.filter("inscc").select(
            "node_id", F.col("color").alias("scc_id")
        ).localCheckpoint(eager=False)
        assigned = (
            found if assigned is None else assigned.unionByName(found)
        )
        gone = found.select("node_id")
        remaining, n_rem = roll_rem.with_action(
            remaining.join(
                gone.withColumnRenamed("node_id", "src"), "src", "left_anti"
            ).join(
                gone.withColumnRenamed("node_id", "dst"), "dst", "left_anti"
            ),
            lambda d: d.count(),
        )
    else:
        raise RuntimeError(f"scc: not peeled out after {max_peels} rounds")
    # nodes whose every edge was peeled away without being flagged are
    # singleton SCCs of the remainder
    if assigned is None:
        return all_nodes.select(
            "node_id", F.col("node_id").alias("scc_id")
        )
    left = all_nodes.join(assigned.select("node_id"), "node_id", "left_anti")
    return assigned.unionByName(
        left.select("node_id", F.col("node_id").alias("scc_id"))
    )


def adamic_adar(
    edges: DataFrame, hub_ceiling: int = 256, k: int = 50
) -> DataFrame:
    """(a, b, common_neighbors, adamic_adar) — the top-k NON-adjacent
    node pairs ranked by the Adamic-Adar index AA(a,b) = Σ_{z ∈
    Γ(a)∩Γ(b)} 1/ln|Γ(z)| (Adamic & Adar 2003), the standard local
    link-prediction score: shared rare neighbors count more than shared
    hubs. The "symbols that should probably be related" suggester next
    to G1's existing-neighbor expansion (reference context:
    graph/algorithms/mod.rs neighborhood ops — the reference walks
    existing edges; this predicts missing ones from the same adjacency).

    Scale shape: wedges are generated AT their center z by one
    self-equi-join of the neighbor list on z — never a pair join over
    nodes — so work is Σ d(z)², and the hub_ceiling excludes centers
    with degree > ceiling BEFORE the join (the standard frequent-
    neighbor cap: a 10^6-degree hub would alone emit 10^12 wedges, and
    its 1/ln contribution is negligible by construction). The cap is
    part of the operator's definition — deterministic, and replayed
    identically by the oracle. Map-side-combinable groupBy(a,b), one
    left-anti join against the existing edge set, TakeOrdered(k) with
    (a, b) ASC tiebreak. The undirected edge set is materialized once
    (r13, guide §5): it feeds three consumers (degrees, the wedge
    join's neighbor list, the existing-edge anti set) whose upstream
    co-occurrence derivation was re-planned and re-scanned per
    consumer — measured 4.8→3.9 s warm at sf0.1."""
    und = _undirected_simple(edges).localCheckpoint()
    deg = und.groupBy(F.col("u").alias("z")).agg(
        F.count(F.lit(1)).alias("deg_z")
    )
    nz = (
        und.select(F.col("u").alias("z"), F.col("v").alias("n"))
        .join(deg.filter(F.col("deg_z") <= hub_ceiling), "z")
    )
    wedges = (
        nz.alias("x")
        .join(nz.alias("y"), "z")
        .filter(F.col("x.n") < F.col("y.n"))
        .select(
            F.col("x.n").alias("a"),
            F.col("y.n").alias("b"),
            (F.lit(1.0) / F.log(F.col("x.deg_z"))).alias("contrib"),
        )
    )
    scored = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).alias("common_neighbors"),
        F.round(F.sum("contrib"), 6).alias("adamic_adar"),
    )
    existing = und.filter(F.col("u") < F.col("v")).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    return (
        scored.join(existing, ["a", "b"], "left_anti")
        .orderBy(F.desc("adamic_adar"), F.asc("a"), F.asc("b"))
        .limit(k)
    )


MSF_DRIVER_MERGE_MAX_COMPS = 5_000_000


def minimum_spanning_forest(
    edges: DataFrame,
    max_rounds: int = 14,
    driver_merge_max: int = MSF_DRIVER_MERGE_MAX_COMPS,
) -> DataFrame:
    """(src, dst, weight) — the minimum spanning forest of the
    undirected weighted graph by distributed Borůvka: each round every
    component selects its minimum outgoing edge under the STRICT total
    order (weight, src, dst) — the tie-broken comparator that makes the
    classic acyclicity argument hold and the result unique — then
    components merge and the round repeats until no cross-component
    edge remains. The backbone extractor for the co-occurrence graph
    (the minimal structure that keeps every connected pair connected at
    minimum total weight).

    Scale shape: components at least halve per round, so outer rounds
    are O(log n). Edge scanning / min-edge selection is always
    distributed (map-side combinable min of struct(weight, src, dst)
    per component). Component MERGING works on the CONTRACTED comp
    graph — at most ONE (cu, cv) pair per component, a set that halves
    every round and is orders of magnitude smaller than nodes or edges
    — with the LPA-style auto-switch (label_propagation precedent): at
    or below `driver_merge_max` pairs the merge is a driver union-find
    over that bounded contracted set and the new labels come back as
    one broadcast-joined mapping; above it, _pointer_jump_labels runs
    a segmented distributed pointer-jumping pass on the same comp
    graph with no driver state. Both paths compute the identical
    min-label components, so the switch never changes the result. Per
    round the driver path costs 2 small jobs — min-edge collect and
    label remap; the selected-forest accumulator stays LAZY (a union
    chain over the per-round checkpointed min tables, lineage depth =
    round count; cross-round edge sets are disjoint by construction so
    no union-wide re-distinct, r13). RollingCheckpoint on the label
    state bounds lineage and storage; the empty-pair fixpoint exit
    preserves exact fixed-round semantics for the oracle's unrolled
    CTE chain."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    e = e.localCheckpoint()
    spark = edges.sparkSession
    roll_lab = RollingCheckpoint(spark)
    nodes = (
        e.select(F.col("src").alias("node_id"))
        .unionByName(e.select(F.col("dst").alias("node_id")))
        .distinct()
    )
    labels = roll_lab(nodes.select("node_id", F.col("node_id").alias("comp")))
    selected = None
    for _ in range(max_rounds):
        lu = labels.select(F.col("node_id").alias("src"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("node_id").alias("dst"), F.col("comp").alias("cv"))
        cross = e.join(lu, "src").join(lv, "dst").filter(F.col("cu") != F.col("cv"))
        both = cross.select(
            F.col("cu").alias("comp"), "src", "dst", "weight", "cu", "cv"
        ).unionByName(
            cross.select(
                F.col("cv").alias("comp"), "src", "dst", "weight", "cu", "cv"
            )
        )
        mins = (
            both.groupBy("comp")
            .agg(F.min(F.struct("weight", "src", "dst", "cu", "cv")).alias("m"))
            .select(
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.weight").alias("weight"),
                F.col("m.cu").alias("cu"),
                F.col("m.cv").alias("cv"),
            )
        ).localCheckpoint()
        pairs = [
            (r["cu"], r["cv"])
            for r in mins.select("cu", "cv")
            .limit(driver_merge_max + 1)
            .collect()
        ]
        if not pairs:
            break
        if len(pairs) <= driver_merge_max:
            # contracted-graph union-find: input is ≤ one pair per
            # component (bounded, halving) — never nodes or edges
            parent: dict = {}

            def _find(x):
                while parent.setdefault(x, x) != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in pairs:
                ra, rb = _find(a), _find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            mapping = [(c, _find(c)) for c in parent]
            map_df = spark.createDataFrame(mapping, "comp long, __new long")
            labels = roll_lab(
                labels.join(F.broadcast(map_df), "comp", "left").select(
                    "node_id",
                    F.coalesce("__new", F.col("comp")).alias("comp"),
                )
            )
        else:
            labels = _pointer_jump_labels(labels, mins, roll_lab)
        # lazy accumulation (r13): sel_new reads the CHECKPOINTED mins,
        # so the union chain's lineage depth is just the round count —
        # the former per-round roll_sel checkpoint action bought
        # nothing. Cross-round edges are disjoint by construction (a
        # selected edge's endpoints share a component from the merge
        # on), so the within-round distinct suffices and the former
        # union-wide re-distinct per round is dropped.
        sel_new = mins.select("src", "dst", "weight").distinct()
        selected = (
            sel_new if selected is None
            else selected.unionByName(sel_new)
        )
    if selected is None:
        return e.limit(0)
    return selected


def _pointer_jump_labels(labels, mins, roll_lab, segment: int = 3):
    """Distributed label refresh for the above-threshold Borůvka merge,
    operating ENTIRELY on the contracted comp graph (≤ one (cu, cv)
    pair per component): min-label propagation with pointer jumping
    (m2 = lbl(lbl(c)) doubles label reach per step, so ceil(log2 m)+3
    steps guarantee convergence for any merge-structure diameter ≤ m),
    checkpointed every `segment` chained steps because each step
    references the label frame three times — an unsegmented chain
    grows 3^k plan nodes and was measured to hang Catalyst at k=16.
    The fixpoint — min comp label per merged group — is identical to
    the driver union-find's output, so the auto-switch never changes
    the result; node labels then update via one joined mapping."""
    import math

    pair_edges = (
        mins.select(F.col("cu").alias("u"), F.col("cv").alias("v"))
        .unionByName(
            mins.select(F.col("cv").alias("u"), F.col("cu").alias("v"))
        )
        .distinct()
        .localCheckpoint()
    )
    cl = (
        pair_edges.select(F.col("u").alias("comp"))
        .distinct()
        .select("comp", F.col("comp").alias("lbl"))
        .localCheckpoint()
    )
    m = cl.count()
    steps = math.ceil(math.log2(max(m, 2))) + 3
    roll_cl = RollingCheckpoint(mins.sparkSession)
    done = 0
    while done < steps:
        k = min(segment, steps - done)
        for _ in range(k):
            state = cl.select(F.col("comp").alias("__u"), "lbl")
            nbr = (
                pair_edges.join(state, pair_edges["u"] == state["__u"])
                .groupBy(F.col("v").alias("comp"))
                .agg(F.min("lbl").alias("m1"))
            )
            l2 = cl.select(F.col("comp").alias("__c"), F.col("lbl").alias("m2"))
            cl = (
                cl.join(l2, cl["lbl"] == l2["__c"], "left")
                .join(nbr, "comp", "left")
                .select(
                    "comp",
                    F.least(
                        F.col("lbl"),
                        F.coalesce("m1", F.col("lbl")),
                        F.coalesce("m2", F.col("lbl")),
                    ).alias("lbl"),
                )
            )
        cl = roll_cl(cl)
        done += k
    mapping = cl.select("comp", F.col("lbl").alias("__new"))
    return roll_lab(
        labels.join(mapping, "comp", "left").select(
            "node_id", F.coalesce("__new", F.col("comp")).alias("comp")
        )
    )


def random_walks(edges: DataFrame, walk_len: int = 4) -> DataFrame:
    """(walk_id, step, node) — one deterministic uniform random walk of
    `walk_len` steps from EVERY node of the undirected simple graph:
    the walk corpus a DeepWalk/node2vec-style embedding trains on
    (Perozzi et al. 2014), generated as data. "Random" is a fixed
    pseudo-random function, not an RNG: at step t the walk moves to the
    neighbor u minimizing md5("walk|" || walk_id || "|" || t || "|" ||
    u) — uniform over neighbors (hash order is a fixed random
    permutation per (walk, step)), identical across engines, runs, and
    partitionings, which is what makes the walk corpus oracle-checkable
    and reproducible for training.

    Scale shape: step t is ONE equi-join of the current frontier (one
    row per live walk) against the adjacency on the current node, then
    a per-walk argmin over (hash, node) — a min(struct(h, v)) hash
    aggregate (r13, guide §2.3: map-side partial aggregation collapses
    each walk's candidates to one row per map task BEFORE the shuffle,
    where the former row_number window shipped and sorted every
    candidate; (h, v) is unique per walk since the simple graph's
    neighbors are distinct, so struct-min == the (h asc, v asc)
    row_number pick exactly). Work per step is Σ deg(current nodes) —
    the same cost as one sparse matrix-vector step — and the plan is a
    linear chain of walk_len such joins with no iteration-state
    checkpointing needed."""
    from ..functions.hashing import md5_hash64

    und = _undirected_simple(edges)
    starts = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .select(
            F.col("node").alias("walk_id"),
            F.lit(0).alias("step"),
            "node",
        )
    )
    frames = [starts]
    cur = starts
    for t in range(1, walk_len + 1):
        cand = cur.join(
            und, cur["node"] == und["u"]
        ).select("walk_id", F.col("v"))
        h = md5_hash64(
            F.concat_ws(
                "|",
                F.col("walk_id").cast("string"),
                F.lit(str(t)),
                F.col("v").cast("string"),
            ),
            salt="walk|",
        )
        nxt = (
            cand.withColumn("__h", h)
            .groupBy("walk_id")
            .agg(F.min(F.struct("__h", "v")).alias("__m"))
            .select(
                "walk_id",
                F.lit(t).alias("step"),
                F.col("__m.v").alias("node"),
            )
        )
        frames.append(nxt)
        cur = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def k_truss(edges: DataFrame, k: int = 4, n_iters: int = 10) -> DataFrame:
    """(u, v, support) — the k-truss of the undirected simple graph
    (Cohen 2008): the maximal subgraph where every EDGE closes at least
    k-2 triangles within the subgraph, with each surviving edge's final
    within-truss support. The edge-level strengthening of k-core — a
    cohesion gate that single high-degree hubs cannot pass, which is
    what makes it the standard dense-community primitive.

    Computed by the support-peeling fixpoint: orient every edge ONCE by
    the initial (degree, id) key — triangle_counts' degree-ordered
    scheme, work Σ d(v)² bounded O(m^1.5), hub-safe — then per round
    enumerate the surviving subgraph's triangles over the oriented edge
    list itself, credit each triangle to its three edges (map-side
    combinable count), drop edges below k-2, repeat. Any strict total
    node order enumerates each triangle exactly once, so the per-edge
    support is identical whether the orientation is recomputed per round
    or fixed up front; fixing it saves the degree aggregation and both
    re-keying joins every round (r13). n_iters bounds the rounds; the
    peel only removes edges, so an unchanged count is a fixpoint and
    iteration stops early — preserving exact fixed-round semantics for
    the oracle's unrolled CTE chain (the k_core discipline).
    RollingCheckpoint keeps the iteration state footprint constant."""
    simple = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )
    # Orient ONCE by the initial (degree, id) key and keep the oriented
    # edge list itself as the iteration state (guide §2.4): any strict
    # total node order enumerates each triangle exactly once, so the
    # per-edge support — and with it every peel round's survivor set —
    # is independent of WHICH order is used. The previous shape
    # re-derived degrees and re-keyed/re-oriented the surviving edge set
    # inside every round (~3 extra exchanges per round for identical
    # output). Initial-degree orientation keeps the O(√m) out-degree
    # bound exactly on round one and within a constant afterwards
    # (peeling only removes edges).
    und = simple.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(
        simple.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("node_id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    keyed = deg.select(
        "node_id",
        (F.col("deg") * F.lit(_TRI_PACK) + F.col("node_id")).alias("k"),
    )
    oriented = (
        und.join(
            keyed.select(F.col("node_id").alias("src"), F.col("k").alias("ks")),
            "src",
        )
        .join(
            keyed.select(F.col("node_id").alias("dst"), F.col("k").alias("kd")),
            "dst",
        )
        .filter(F.col("ks") < F.col("kd"))
        .select("src", "dst", "ks", "kd")
    )
    roll = RollingCheckpoint(edges.sparkSession)
    cur = roll(oriented)
    prev_n = None

    def _support(cur_o: DataFrame) -> DataFrame:
        """(src, dst, support) keyed by the oriented edge: each triangle
        (a,b,c) credits its three oriented edges (a,b), (a,c), (b,c) —
        the same map-side-combinable count as before, minus the per-round
        re-orientation."""
        wedges = (
            cur_o.alias("x")
            .join(cur_o.alias("y"), "src")
            .filter(F.col("x.kd") < F.col("y.kd"))
            .select(
                F.col("src").alias("a"),
                F.col("x.dst").alias("b"),
                F.col("y.dst").alias("c"),
            )
        )
        tris = wedges.join(
            cur_o.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            ["b", "c"],
        ).select("a", "b", "c")
        pairs = (
            tris.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                tris.select(F.col("a").alias("src"), F.col("c").alias("dst"))
            )
            .unionByName(
                tris.select(F.col("b").alias("src"), F.col("c").alias("dst"))
            )
        )
        return pairs.groupBy("src", "dst").agg(
            F.count(F.lit(1)).alias("support")
        )

    for _ in range(n_iters):
        sup = _support(cur)
        # fixpoint count probe fused into the checkpoint job (r14, §2.4)
        cur, n = roll.with_action(
            cur.join(sup, ["src", "dst"], "left")
            .filter(F.coalesce("support", F.lit(0)) >= k - 2)
            .select("src", "dst", "ks", "kd"),
            lambda d: d.count(),
        )
        if n == prev_n:
            break
        prev_n = n
    final_sup = _support(cur)
    return cur.join(final_sup, ["src", "dst"], "left").select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        F.coalesce("support", F.lit(0)).alias("support"),
    )
