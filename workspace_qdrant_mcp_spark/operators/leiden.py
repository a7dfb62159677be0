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
    cols = ["src", "dst"] + (["weight"] if "weight" in edges.columns else [])
    pdf = edges.select(*cols).toPandas()
    node_ids = sorted(set(pdf["src"]).union(pdf["dst"]))
    idx = {v: i for i, v in enumerate(node_ids)}
    adj: list[dict[int, float]] = [defaultdict(float) for _ in node_ids]
    ws = pdf["weight"] if "weight" in pdf.columns else [1.0] * len(pdf)
    for s, d, w in zip(pdf["src"], pdf["dst"], ws):
        if s == d:
            continue  # self-loops skipped (mod.rs:124-127)
        adj[idx[s]][idx[d]] += float(w)
        adj[idx[d]][idx[s]] += float(w)
    adj = [dict(d) for d in adj]

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
