"""Deterministic Leiden community detection with the CPM objective (G7).

Parity target: the reference's in-house deterministic Leiden
(graph/algorithms/leiden/mod.rs + refine.rs + aggregate.rs), itself an
implementation of Traag, Waltman & van Eck (2019), "From Louvain to
Leiden", Sci Rep 9:5233. Semantics replicated here:

  - CPM objective  H = Σ_c (e_c − γ·C(n_c,2)); node-count sizes, weighted
    edges (mod.rs:260-339 local_move_phase).
  - Phase 2 refinement: within each phase-1 community every node starts as
    a singleton sub-community and merges only into candidates that are
    γ-WELL-CONNECTED to the rest of the community —
    w(T, C\\T) > γ·|T|·(|C|−|T|) — AND improve CPM (refine.rs:29-156,
    Traag Alg. 2). Cut weight is single-counted (refine.rs:108-131).
  - Phase 3 aggregation: refined sub-communities become super-nodes;
    self-loops retained at half weight per endpoint visit
    (aggregate.rs:33-90); local move re-runs on the aggregate graph and
    the result is lifted back (mod.rs:156-196).
  - Recursive size-gated split (DOM-06, mod.rs:365-448): a community with
    ≥ max_members is re-clustered at γ′ = γ·resolution_step; the split is
    accepted only when it yields ≥2 parts all ≥ min_members (a clique is
    irreducible and stays whole), then parts recurse.
  - Determinism (DOM-01): index-order visits, strict-greater greedy gains
    with lowest-community tiebreak, no RNG in any path.

Architecture mirrors the reference exactly (LOCK-SCOPE): a pure function
over the exported adjacency snapshot, run driver-side — per-tenant code
graphs are small by contract (SURVEY §7 de-risk note); a multi-tenant
100 TB run loops tenants through this same function.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

GAMMA_DEFAULT = 0.25
RESOLUTION_STEP = 1.5
MAX_MEMBERS = 200
MIN_MEMBERS = 4


# ---------------------------------------------------------------------------
# Phase 1 — local moving (mod.rs:260-339)
# ---------------------------------------------------------------------------

def _local_move(adj: list[dict[int, float]], partition: list[int], gamma: float) -> bool:
    """Greedy CPM local move in index order until stable. Sizes are node
    counts of the CURRENT graph (aggregate nodes count 1 — the reference's
    approximation). Returns True if any node moved."""
    n = len(adj)
    comm_size: dict[int, int] = defaultdict(int)
    for c in partition:
        comm_size[c] += 1
    any_moved = False
    changed = True
    while changed:
        changed = False
        for node in range(n):
            c_cur = partition[node]
            w_to_comm: dict[int, float] = defaultdict(float)
            for nb, w in adj[node].items():
                w_to_comm[partition[nb]] += w
            w_to_cur = w_to_comm.get(c_cur, 0.0)
            delta_remove = -w_to_cur + gamma * (comm_size[c_cur] - 1.0)
            best_comm, best_gain = c_cur, 0.0
            for c_cand in sorted(w_to_comm):
                if c_cand == c_cur:
                    continue
                delta_add = w_to_comm[c_cand] - gamma * comm_size.get(c_cand, 0)
                gain = delta_remove + delta_add
                if gain > best_gain or (gain == best_gain and c_cand < best_comm):
                    best_gain, best_comm = gain, c_cand
            if best_comm != c_cur:
                comm_size[c_cur] -= 1
                comm_size[best_comm] += 1
                partition[node] = best_comm
                changed = True
                any_moved = True
    return any_moved


# ---------------------------------------------------------------------------
# Phase 2 — refinement with the γ-well-connectedness gate (refine.rs)
# ---------------------------------------------------------------------------

def _refine(adj: list[dict[int, float]], partition: list[int], gamma: float) -> list[int]:
    """node → refined sub-community id. Every node starts as a singleton;
    merges happen only into sub-communities T with
    w(T, C\\T) > γ·|T|·(|C|−|T|) (single-counted cut) that also improve
    CPM; lowest-sub-id tiebreak; sweeps until stable."""
    n = len(adj)
    communities: dict[int, list[int]] = defaultdict(list)
    for node in range(n):
        communities[partition[node]].append(node)
    refined = list(range(n))
    for comm in sorted(communities):
        members = communities[comm]  # ascending (built in index order)
        comm_size = len(members)
        if comm_size <= 1:
            continue
        member_set = set(members)
        # incremental sub-community membership index (semantics unchanged
        # from the per-sweep recomputation; O(1) size/member lookups)
        subs: dict[int, set[int]] = defaultdict(set)
        for m in members:
            subs[refined[m]].add(m)
        changed = True
        while changed:
            changed = False
            for node in members:
                cur_sub = refined[node]
                cur_sub_size = len(subs[cur_sub])
                w_to_sub: dict[int, float] = defaultdict(float)
                for nb, w in adj[node].items():
                    if nb in member_set:
                        w_to_sub[refined[nb]] += w
                w_to_cur = w_to_sub.get(cur_sub, 0.0)
                delta_remove = -w_to_cur + gamma * (cur_sub_size - 1.0)
                best_sub, best_gain = cur_sub, 0.0
                for cand_sub in sorted(w_to_sub):
                    if cand_sub == cur_sub:
                        continue
                    cand_set = subs[cand_sub]
                    cand_size = len(cand_set)
                    # γ-well-connectedness: cut from T to C\T, each cut
                    # edge counted once (iterate T-side endpoints only).
                    w_cut = sum(
                        w
                        for m in cand_set
                        for nb, w in adj[m].items()
                        if nb in member_set and nb not in cand_set
                    )
                    if w_cut <= gamma * cand_size * (comm_size - cand_size):
                        continue
                    delta_add = w_to_sub[cand_sub] - gamma * cand_size
                    gain = delta_remove + delta_add
                    if gain > best_gain or (gain == best_gain and cand_sub < best_sub):
                        best_gain, best_sub = gain, cand_sub
                if best_sub != cur_sub:
                    subs[cur_sub].discard(node)
                    subs[best_sub].add(node)
                    refined[node] = best_sub
                    changed = True
    return refined


# ---------------------------------------------------------------------------
# Phase 3 — aggregation (aggregate.rs:33-90)
# ---------------------------------------------------------------------------

def _aggregate(
    adj: list[dict[int, float]], refined: list[int]
) -> tuple[list[dict[int, float]], list[int]]:
    """(aggregate adjacency with self-loops, node→agg map). Each refined
    sub-community becomes one aggregate node (ids assigned in sub-id
    order); every endpoint visit contributes w/2, so an undirected edge is
    counted once and intra-sub edges land as self-loops."""
    sub_ids = sorted(set(refined))
    sub_to_agg = {s: i for i, s in enumerate(sub_ids)}
    node_to_agg = [sub_to_agg[s] for s in refined]
    agg_adj: list[dict[int, float]] = [defaultdict(float) for _ in sub_ids]
    for i in range(len(adj)):
        ai = node_to_agg[i]
        for j, w in adj[i].items():
            aj = node_to_agg[j]
            if ai == aj:
                agg_adj[ai][ai] += w / 2.0
            else:
                agg_adj[ai][aj] += w / 2.0
                agg_adj[aj][ai] += w / 2.0
    return [dict(d) for d in agg_adj], node_to_agg


def _flat_leiden(adj: list[dict[int, float]], gamma: float) -> list[int]:
    """The three-phase loop (mod.rs:140-196): local move → refine →
    aggregate → aggregate local move → lift, until neither move phase
    changes anything; contiguous relabel in node order."""
    n = len(adj)
    if n == 0:
        return []
    if n == 1:
        return [0]
    partition = list(range(n))
    while True:
        moved = _local_move(adj, partition, gamma)
        refined = _refine(adj, partition, gamma)
        agg_adj, node_to_agg = _aggregate(adj, refined)
        # aggregate node → phase-1 community (first constituent wins)
        agg_n = len(agg_adj)
        prev_agg = [-1] * agg_n
        for orig in range(n):
            a = node_to_agg[orig]
            if prev_agg[a] == -1:
                prev_agg[a] = partition[orig]
        agg_partition = list(prev_agg)
        agg_moved = _local_move(agg_adj, agg_partition, gamma)
        new_partition = [agg_partition[node_to_agg[o]] for o in range(n)]
        if not moved and not agg_moved:
            partition = new_partition
            break
        partition = new_partition
        if partition == [prev_agg[node_to_agg[o]] for o in range(n)]:
            break
    # contiguous relabel, node-order deterministic
    relabel: dict[int, int] = {}
    out = []
    for c in partition:
        if c not in relabel:
            relabel[c] = len(relabel)
        out.append(relabel[c])
    return out


# ---------------------------------------------------------------------------
# Recursive size-gated split (DOM-06, mod.rs:365-448)
# ---------------------------------------------------------------------------

def _partition_to_output(partition: list[int]) -> list[list[int]]:
    by_comm: dict[int, list[int]] = defaultdict(list)
    for node, c in enumerate(partition):
        by_comm[c].append(node)
    return sorted((sorted(m) for m in by_comm.values()), key=lambda m: m[0])


def _split_community(
    members: list[int],
    adj: list[dict[int, float]],
    gamma: float,
    step: float,
    max_members: int,
    min_members: int,
) -> list[list[int]]:
    if len(members) < max_members or len(members) < min_members:
        return [members]
    orig_to_sub = {orig: i for i, orig in enumerate(members)}
    sub_adj: list[dict[int, float]] = [defaultdict(float) for _ in members]
    for sub_i, orig_i in enumerate(members):
        for orig_j, w in adj[orig_i].items():
            sub_j = orig_to_sub.get(orig_j)
            if sub_j is not None:
                sub_adj[sub_i][sub_j] += w
    next_gamma = gamma * step
    sub_partition = _flat_leiden([dict(d) for d in sub_adj], next_gamma)
    sub_parts = [
        [members[i] for i in part] for part in _partition_to_output(sub_partition)
    ]
    clean = len(sub_parts) >= 2 and all(len(p) >= min_members for p in sub_parts)
    if not clean:
        return [members]  # irreducible (e.g. a clique) — keep whole
    out: list[list[int]] = []
    for part in sub_parts:
        out.extend(
            _split_community(part, adj, next_gamma, step, max_members, min_members)
        )
    return out


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def _build_adj(edges: DataFrame) -> tuple[list, list[dict[int, float]]]:
    """Collect the (small, capped) edge table into a symmetric weighted
    adjacency; self-loops skipped (mod.rs:124-127), nodes kept."""
    cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns else [])
    pdf = edges.select(*cols).toPandas()
    node_ids = sorted(set(pdf["src"]).union(pdf["dst"]))
    idx = {v: i for i, v in enumerate(node_ids)}
    adj: list[dict[int, float]] = [defaultdict(float) for _ in node_ids]
    ws = pdf["weight"] if "weight" in pdf.columns else [1.0] * len(pdf)
    for s, d, w in zip(pdf["src"], pdf["dst"], ws):
        if s == d:
            continue
        adj[idx[s]][idx[d]] += float(w)
        adj[idx[d]][idx[s]] += float(w)
    return node_ids, [dict(d) for d in adj]


def leiden(
    edges: DataFrame,
    gamma: float = GAMMA_DEFAULT,
    resolution_step: float = RESOLUTION_STEP,
    max_members: int = MAX_MEMBERS,
    min_members: int = MIN_MEMBERS,
) -> DataFrame:
    """(node_id, community) — community = min original node id in the final
    cluster (stable, content-addressed labels). Weighted when the edge
    table has a `weight` column, else unit weights."""
    spark = edges.sparkSession
    node_ids, adj = _build_adj(edges)

    flat = _flat_leiden(adj, gamma)
    communities = []
    for members in _partition_to_output(flat):
        communities.extend(
            _split_community(
                members, adj, gamma, resolution_step, max_members, min_members
            )
        )
    rows = []
    for mem in communities:
        label = min(node_ids[m] for m in mem)
        for m in mem:
            rows.append((node_ids[m], label))
    rows.sort()
    return spark.createDataFrame(rows, ["node_id", "community"])


# ---------------------------------------------------------------------------
# Hard value signal (G7): post-hoc invariant audit of an all-phases run
# ---------------------------------------------------------------------------

def _connected_pieces(members: list[int], adj: list[dict[int, float]]) -> int:
    """Number of connected components induced by `members` (intra edges
    only). A correct Leiden partition has exactly 1 per community (Traag
    et al. 2019, guarantee (i); refine.rs keeps sub-communities connected
    and phase-1 merges only along edges)."""
    member_set = set(members)
    seen: set[int] = set()
    pieces = 0
    for start in members:
        if start in seen:
            continue
        pieces += 1
        stack = [start]
        seen.add(start)
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v in member_set and v not in seen:
                    seen.add(v)
                    stack.append(v)
    return pieces


def leiden_invariants(
    edges: DataFrame,
    gamma: float = GAMMA_DEFAULT,
    resolution_step: float = RESOLUTION_STEP,
    max_members: int = MAX_MEMBERS,
    min_members: int = MIN_MEMBERS,
) -> DataFrame:
    """One-row audit of a full Leiden run (all phases incl. the recursive
    split) on the given (capped) edge table. Every column is either
    independently SQL-computable from the edges (n_nodes / n_assigned) or
    a violation counter of a property any correct run must satisfy
    (mod.rs:260-339 stability, refine.rs connectivity guarantee,
    DOM-01 min-label determinism, CPM >= the singleton-partition
    baseline H=0 that phase 1 starts from):

      n_nodes                  distinct endpoints in the edge table
      n_assigned               assignment rows emitted (== n_nodes)
      dup_assignments          nodes assigned to >1 community (== 0)
      localmove_violations     nodes with a strictly-positive CPM gain
                               single-node move AFTER a node-level
                               _local_move re-stabilization pass over the
                               flat partition (== 0: _local_move must not
                               return while a positive move remains; the
                               raw flat partition is only aggregate-level
                               stable and is not audited directly)
      disconnected_communities flat communities with >1 connected piece
                               (== 0: the Leiden connectivity guarantee)
      label_min_violations     final labels != min member node id (== 0)
      split_coverage_ok        split phase preserved the node set
      cpm_ge_singletons        phase-1 greedy CPM >= 0 (the singleton
                               start it monotonically ascends from)
    """
    spark = edges.sparkSession
    node_ids, adj = _build_adj(edges)
    n = len(node_ids)

    flat = _flat_leiden(adj, gamma)

    comm_members: dict[int, list[int]] = defaultdict(list)
    for node, c in enumerate(flat):
        comm_members[c].append(node)

    # local-move stability at base gamma (same gain formula as _local_move).
    # Leiden's termination guarantees node-level stability at the AGGREGATE
    # level of the last iteration, not of the unfolded flat partition — so
    # the flat partition is first re-stabilized with one node-level
    # _local_move pass, then audited. Violations therefore mean exactly
    # "_local_move returned while a strictly-positive single-node move
    # remained" (a termination bug), never the false positive a correct
    # run could produce on the raw flat partition (graphs/gammas where an
    # aggregate-stable partition is not node-stable).
    stab = list(flat)
    _local_move(adj, stab, gamma)
    stab_size: dict[int, int] = defaultdict(int)
    for c in stab:
        stab_size[c] += 1
    localmove_violations = 0
    eps = 1e-9
    for node in range(n):
        c_cur = stab[node]
        w_to_comm: dict[int, float] = defaultdict(float)
        for nb, w in adj[node].items():
            w_to_comm[stab[nb]] += w
        delta_remove = -w_to_comm.get(c_cur, 0.0) + gamma * (stab_size[c_cur] - 1.0)
        for c_cand, w_cand in w_to_comm.items():
            if c_cand == c_cur:
                continue
            if delta_remove + w_cand - gamma * stab_size[c_cand] > eps:
                localmove_violations += 1
                break

    disconnected = sum(
        1 for m in comm_members.values() if _connected_pieces(m, adj) > 1
    )

    # The SQL oracle cannot recompute disconnected_communities — the
    # partition exists only on this side, and the oracle string has no
    # access to it (it sees only the base tables). The strongest
    # available cross-check is therefore a SECOND, mechanically
    # independent recomputation here: distributed min-label connected
    # components (graph.connected_components — iterative DataFrame
    # joins, nothing shared with the recursive-DFS _connected_pieces)
    # over the community-induced edge subgraph. Pieces per community =
    # distinct CC labels among members with intra-community edges +
    # isolated members. A disagreement is an audit-machinery bug and
    # fails the query loudly instead of emitting a self-asserted zero.
    from . import graph as graph_ops

    intra = [
        (int(node_ids[i]), int(node_ids[j]))
        for i in range(n)
        for j in adj[i]
        if i < j and flat[i] == flat[j]
    ]
    cc_map: dict[int, int] = {}
    if intra:
        cc_df = graph_ops.connected_components(
            spark.createDataFrame(intra, "src long, dst long"), n_iters=30
        )
        cc_map = {
            r["node_id"]: r["component"] for r in cc_df.collect()
        }
    disconnected_cc = 0
    for members in comm_members.values():
        labels = {
            cc_map[int(node_ids[m])]
            for m in members
            if int(node_ids[m]) in cc_map
        }
        isolated = sum(
            1 for m in members if int(node_ids[m]) not in cc_map
        )
        if len(labels) + isolated > 1:
            disconnected_cc += 1
    if disconnected_cc != disconnected:
        raise AssertionError(
            "leiden connectivity audit mismatch: DFS counted "
            f"{disconnected} disconnected communities, distributed CC "
            f"counted {disconnected_cc}"
        )

    # Cross-verification of the connectivity-audit MACHINERY itself: the
    # oracle cannot see the Spark partition, so `disconnected == 0` alone
    # would be self-asserted by this audit code. n_graph_components runs
    # the SAME _connected_pieces DFS over the whole capped graph — a pure
    # graph property the SQL oracle recomputes independently (recursive
    # min-reachable-label CTE); a bug in the DFS shows up as a mismatch.
    n_graph_components = _connected_pieces(list(range(n)), adj)

    # CPM ascent invariant: phase-1 local move starts from the singleton
    # partition (H = 0) and every accepted move strictly increases the
    # true CPM, so its result must score >= 0 on the original graph. (The
    # FINAL flat partition is exempt: aggregate-level moves use the
    # reference's node-count-size approximation — mod.rs:260-339 — and may
    # legitimately drift the exact objective below the baseline.)
    p1 = list(range(n))
    _local_move(adj, p1, gamma)
    p1_size: dict[int, int] = defaultdict(int)
    for c in p1:
        p1_size[c] += 1
    intra: dict[int, float] = defaultdict(float)
    for i in range(n):
        for j, w in adj[i].items():
            if i < j and p1[i] == p1[j]:
                intra[p1[i]] += w
    cpm = sum(
        intra.get(c, 0.0) - gamma * s * (s - 1) / 2.0
        for c, s in p1_size.items()
    )

    # full public pipeline (flat + recursive split) for the output-side
    # invariants, via the same deterministic entry point users call
    out_rows = [
        (r["node_id"], r["community"])
        for r in leiden(
            edges, gamma, resolution_step, max_members, min_members
        ).collect()
    ]
    assigned_nodes = [nid for nid, _ in out_rows]
    by_label: dict = defaultdict(list)
    for nid, label in out_rows:
        by_label[label].append(nid)
    label_min_violations = sum(
        1 for label, mem in by_label.items() if label != min(mem)
    )

    row = (
        n,
        len(out_rows),
        len(assigned_nodes) - len(set(assigned_nodes)),
        localmove_violations,
        disconnected,
        label_min_violations,
        sorted(assigned_nodes) == list(node_ids),
        cpm >= -eps,
        n_graph_components,
    )
    return spark.createDataFrame(
        [row],
        "n_nodes long, n_assigned long, dup_assignments long, "
        "localmove_violations long, disconnected_communities long, "
        "label_min_violations long, split_coverage_ok boolean, "
        "cpm_ge_singletons boolean, n_graph_components long",
    )
