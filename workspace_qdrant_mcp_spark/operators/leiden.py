"""Deterministic Leiden community detection with the CPM objective (G7).

Parity target: the reference's in-house deterministic Leiden
(graph/algorithms/leiden/mod.rs + refine.rs + aggregate.rs, ~900 LoC):
  - CPM objective  Σ_c (e_c − γ·C(n_c,2))
  - phases: local move → refinement (γ-well-connected merges) → aggregate,
    repeated until stable
  - determinism: nodes processed in sorted order, greedy best-gain with
    lowest-community tiebreak — bit-identical reruns (DOM-01), no RNG in
    the hot path (the reference pins seed 42 for the same reason)

Architecture mirrors the reference exactly (LOCK-SCOPE): a pure function
over the exported adjacency snapshot, run driver-side — per-tenant code
graphs are small by contract (SURVEY §7 de-risk note). The refinement
phase here is the simplified well-connectedness variant: refined
communities are the connected components of each local-move community
(guarantees internal connectivity, the property Leiden adds over Louvain);
the γ-threshold merge test of the full algorithm is approximated by the
CPM gain test in the next local-move round.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame

from .graph import export_adjacency

GAMMA_DEFAULT = 0.25
MAX_LEVELS = 10


def _local_move(nbrs, weights, node_w, labels, gamma):
    """Greedy CPM local move, sorted node order, until stable. Returns True
    if anything moved. CPM delta for moving node i (weight w_i) from its
    community to community c: links(i,c) − γ·w_i·W_c  (vs staying:
    links(i,own\\{i}) − γ·w_i·(W_own − w_i))."""
    n = len(nbrs)
    comm_w = defaultdict(float)
    for i in range(n):
        comm_w[labels[i]] += node_w[i]
    moved_any = True
    changed = False
    while moved_any:
        moved_any = False
        for i in range(n):
            own = labels[i]
            links = defaultdict(float)
            for j, w in zip(nbrs[i], weights[i]):
                links[labels[j]] += w
            base = links.get(own, 0.0) - gamma * node_w[i] * (comm_w[own] - node_w[i])
            best_c, best_gain = own, 0.0
            for c in sorted(links):
                if c == own:
                    continue
                gain = (links[c] - gamma * node_w[i] * comm_w[c]) - base
                if gain > best_gain + 1e-12 or (
                    abs(gain - best_gain) <= 1e-12 and best_gain > 0 and c < best_c
                ):
                    best_c, best_gain = c, gain
            if best_c != own:
                comm_w[own] -= node_w[i]
                comm_w[best_c] += node_w[i]
                labels[i] = best_c
                moved_any = True
                changed = True
    return changed


def _refine(nbrs, labels):
    """Split each community into its connected components (sorted-order
    BFS) so every refined community is internally connected."""
    n = len(nbrs)
    new_labels = [-1] * n
    next_label = 0
    for start in range(n):
        if new_labels[start] != -1:
            continue
        comm = labels[start]
        stack = [start]
        new_labels[start] = next_label
        while stack:
            v = stack.pop()
            for j in nbrs[v]:
                if new_labels[j] == -1 and labels[j] == comm:
                    new_labels[j] = next_label
                    stack.append(j)
        next_label += 1
    return new_labels


def leiden(edges: DataFrame, gamma: float = GAMMA_DEFAULT) -> DataFrame:
    """(node_id, community) — community = min original node id in the final
    cluster (stable, content-addressed labels)."""
    spark = edges.sparkSession
    node_ids, adj = export_adjacency(edges)
    idx = {v: i for i, v in enumerate(node_ids)}
    nbrs = [[idx[u] for u in adj[v]] for v in node_ids]
    weights = [[1.0] * len(x) for x in nbrs]
    node_w = [1.0] * len(node_ids)
    # member sets carried across aggregation levels
    members: list[list[int]] = [[i] for i in range(len(node_ids))]

    for _level in range(MAX_LEVELS):
        labels = list(range(len(nbrs)))
        changed = _local_move(nbrs, weights, node_w, labels, gamma)
        labels = _refine(nbrs, labels)
        n_comms = len(set(labels))
        if not changed or n_comms == len(nbrs):
            break
        # aggregate: communities become super-nodes
        remap: dict[int, int] = {}
        for lb in labels:
            if lb not in remap:
                remap[lb] = len(remap)
        new_n = len(remap)
        new_members: list[list[int]] = [[] for _ in range(new_n)]
        new_w = [0.0] * new_n
        agg_edges: dict[tuple[int, int], float] = defaultdict(float)
        for i in range(len(nbrs)):
            ci = remap[labels[i]]
            new_members[ci].extend(members[i])
            new_w[ci] += node_w[i]
            for j, w in zip(nbrs[i], weights[i]):
                cj = remap[labels[j]]
                if ci != cj:
                    agg_edges[(ci, cj)] += w
        nbrs = [[] for _ in range(new_n)]
        weights = [[] for _ in range(new_n)]
        for (a, b), w in sorted(agg_edges.items()):
            nbrs[a].append(b)
            weights[a].append(w)
        node_w = new_w
        members = new_members

    rows = []
    for ci, mem in enumerate(members):
        label = min(node_ids[m] for m in mem)
        for m in mem:
            rows.append((node_ids[m], label))
    rows.sort()
    return spark.createDataFrame(rows, ["node_id", "community"])
