"""Graph-expansion fusion (R11, GitHub #80) — expand fused search results
through the code graph and alpha-blend scores.

Exact parity with client/src/search/graph_fusion.rs:
  constants (:26-53): ALPHA=0.7, CONVERGENCE_BONUS=0.1, <=5 nodes/seed,
  <=50 total, top-20 candidates, edge types CALLS/USES_TYPE/CONTAINS,
  <=2 hops, the NARROW 10-entry code-chunk-type set
  algorithm (:165-244): per-candidate traversal in candidate order →
  skip self → convergence bonus +0.1 to ORIGINAL results only (added
  BEFORE the alpha scaling, so the bonus is scaled too) → expanded node
  score = (1-ALPHA)*proximity with proximity 1.0/0.8/0.5 by depth →
  originals scaled by ALPHA → re-sort desc. Runs BEFORE diversity/slice.
  candidate collection (:69-102): JS-falsy field semantics (empty string
  == missing) and the relative_path NULLISH-coalesce quirk (a
  present-but-empty relative_path does NOT fall back to file_path — the
  row is skipped).
  node ids (graph/mod.rs:808-827): sha256(tenant|file|symbol|type)[:16].

The traversal provider is pluggable: the Spark-backed one runs ONE
multi-seed frontier join for all <=20 seeds (not 20 sequential queries —
same results, one pass over the edge table), then the order-sensitive
per-seed caps run driver-side over that tiny result, mirroring the
reference's sequential candidate order.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.7
CONVERGENCE_BONUS = 0.1
MAX_EXPANDED_PER_RESULT = 5
MAX_EXPANDED_TOTAL = 50
MAX_CANDIDATES = 20
FUSION_EDGE_TYPES = ("CALLS", "USES_TYPE", "CONTAINS")
FUSION_MAX_HOPS = 2
FUSION_CODE_CHUNK_TYPES = frozenset(
    ["function", "async_function", "method", "class", "struct", "trait",
     "interface", "enum", "impl", "module"]
)


def compute_node_id(tenant: str, file_path: str, symbol: str, sym_type: str) -> str:
    """sha256(tenant|file|symbol|type) first 16 hex chars."""
    h = hashlib.sha256(f"{tenant}|{file_path}|{symbol}|{sym_type}".encode())
    return h.hexdigest()[:16]


def graph_proximity_score(depth: int) -> float:
    return 1.0 if depth == 0 else (0.8 if depth == 1 else 0.5)


def _falsy(v) -> bool:
    return v is None or v == ""


def collect_candidates(results: list[dict]) -> list[dict]:
    """TS collectCandidates: skip when any required field is falsy; only the
    narrow code-chunk-type set seeds expansion."""
    out = []
    for r in results:
        p = r.get("payload", {})
        sym = p.get("chunk_symbol_name")
        ct = p.get("chunk_chunk_type")
        tid = p.get("tenant_id")
        # nullish coalesce: fall back to file_path only when relative_path
        # is MISSING, not when empty
        fp = p.get("relative_path") if "relative_path" in p and p["relative_path"] is not None else p.get("file_path")
        if _falsy(sym) or _falsy(ct) or _falsy(tid) or _falsy(fp):
            continue
        if ct not in FUSION_CODE_CHUNK_TYPES:
            continue
        out.append({"tenant_id": tid, "node_id": compute_node_id(tid, fp, sym, ct)})
    return out


def expand_and_fuse(
    results: list[dict],
    query_related: Callable[[str, str], list[dict]],
    collection: str = "projects",
) -> list[dict]:
    """The fusion pass. results: [{id, score, collection, payload, ...}];
    query_related(tenant_id, node_id) -> [{node_id, depth, symbol_name,
    symbol_type, file_path}] ordered (depth, symbol_name) — the traversal
    contract (sqlite_store.rs:285). Returns the new result list, sorted."""
    candidates = collect_candidates(results)
    if not candidates:
        return results
    existing = {r["id"] for r in results}
    by_id = {r["id"]: r for r in results}
    expanded: list[dict] = []
    total = 0
    for cand in candidates[:MAX_CANDIDATES]:
        try:
            nodes = query_related(cand["tenant_id"], cand["node_id"])
        except Exception:
            continue  # timeout/error swallowed (TS catch → [])
        for node in nodes[:MAX_EXPANDED_PER_RESULT]:
            if node["node_id"] == cand["node_id"]:
                continue
            if node["node_id"] in existing:
                orig = by_id.get(node["node_id"])
                if orig is not None:  # bonus ORIGINALS only (TS results.find)
                    orig["score"] += CONVERGENCE_BONUS
                continue
            if total >= MAX_EXPANDED_TOTAL:
                break
            prox = graph_proximity_score(node["depth"])
            expanded.append({
                "id": node["node_id"],
                "score": (1.0 - ALPHA) * prox,
                "collection": collection,
                "search_type": "graph",
                "payload": {
                    "tenant_id": cand["tenant_id"],
                    "chunk_symbol_name": node.get("symbol_name", ""),
                    "chunk_chunk_type": node.get("symbol_type", ""),
                    "file_path": node.get("file_path", ""),
                    "source": "graph_expansion",
                },
            })
            existing.add(node["node_id"])
            total += 1
    for r in results:
        r["score"] *= ALPHA  # bonus (added above) is scaled too — TS ordering
    out = results + expanded
    out.sort(key=lambda r: -r["score"])
    return out


def spark_query_related(
    edges: DataFrame,
    seeds: list[tuple[str, str]],
    nodes: DataFrame | None = None,
    max_hops: int = FUSION_MAX_HOPS,
    edge_types: tuple[str, ...] = FUSION_EDGE_TYPES,
) -> dict[str, list[dict]]:
    """One multi-seed traversal for all candidates. edges: (tenant_id,
    source_node_id, target_node_id, edge_type); nodes: (node_id,
    symbol_name, symbol_type, file_path). Returns {seed_node_id: [node
    dicts ordered by (depth, symbol_name)]}."""
    spark = edges.sparkSession
    if not seeds:
        return {}
    e = (
        edges.filter(F.col("edge_type").isin(list(edge_types)))
        .select(
            F.col("source_node_id").alias("u"), F.col("target_node_id").alias("v")
        )
        .localCheckpoint()
    )
    frontier = spark.createDataFrame(
        [(nid, nid) for _, nid in seeds], ["seed", "u"]
    )
    out = None
    for depth in range(1, max_hops + 1):
        frontier = (
            e.join(F.broadcast(frontier), "u")
            .select("seed", F.col("v").alias("u"))
            .distinct()
        )
        step = frontier.withColumn("depth", F.lit(depth))
        out = step if out is None else out.unionByName(step)
    reached = (
        out.groupBy("seed", F.col("u").alias("node_id"))
        .agg(F.min("depth").alias("depth"))
    )
    if nodes is not None:
        reached = reached.join(nodes, "node_id", "left")
    rows = reached.collect()
    result: dict[str, list[dict]] = {nid: [] for _, nid in seeds}
    for r in rows:
        d = r.asDict()
        result.setdefault(d["seed"], []).append(
            {
                "node_id": d["node_id"],
                "depth": d["depth"],
                "symbol_name": d.get("symbol_name") or "",
                "symbol_type": d.get("symbol_type") or "",
                "file_path": d.get("file_path") or "",
            }
        )
    for nid in result:
        result[nid].sort(key=lambda n: (n["depth"], n["symbol_name"]))
    return result
