"""Graph construction + advanced traversal operators (G4, G10, G11, G12).

  extract_symbols     (G11): regex-based symbol extraction from code text →
                      nodes with the reference's deterministic id scheme
                      sha256(tenant|file|symbol|type)[:16]
                      (graph/mod.rs:808-827) + CONTAINS edges (file→symbol)
                      and CALLS edges (symbol body references another
                      symbol's name). A tree-sitter chunker slots in behind
                      the same output schema (the reference's own extractor
                      is tree-sitter based, graph/extractor/mod.rs).
  narrative_sections  (G12): markdown '#'-heading sections → section nodes
                      + EXPLAINS edges when a section's text mentions a
                      symbol name UNAMBIGUOUSLY (exactly one node carries
                      that name — the Aho-Corasick unambiguity rule,
                      narrative/sections.rs).
  resolve_stub_edges  (G10): repoint edges whose target is a name-only stub
                      node (empty file_path) to the real definition —
                      same-file preference, then unique-in-tenant; prune
                      stubs that stay unresolved (graph/mod.rs:748-786).
  cross_boundary      (G4): bidirectional traversal with the tenant
                      relaxation set {tenant, __global__, libraries...},
                      per-edge-type base confidence (EXPLAINS 0.6,
                      COVERS_TOPIC 0.6, IMPLEMENTS_CONCEPT 0.7, else 1.0)
                      multiplied by edge weight, MAX confidence per reached
                      node, hops clamped 1..3
                      (sqlite_store.rs:805-830, cross_boundary.rs:30-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GLOBAL_TENANT = "__global__"

EDGE_BASE_CONFIDENCE = {
    "EXPLAINS": 0.6,
    "COVERS_TOPIC": 0.6,
    "IMPLEMENTS_CONCEPT": 0.7,
}

_SYMBOL_RE = r"(?:def|fn|class|struct|trait)\s+([A-Za-z_][A-Za-z0-9_]*)"


def _node_id(tenant, file_path, symbol, sym_type):
    return F.substring(
        F.sha2(F.concat_ws("|", tenant, file_path, symbol, sym_type), 256), 1, 16
    )


def symbol_nodes(docs: DataFrame) -> DataFrame:
    """(node_id, tenant_id, symbol_name, symbol_type, file_path) — the
    per-FILE symbol definitions. Strictly per-file derivation, so the
    maintained store can delete+append by file_path (S8 incremental)."""
    return (
        docs.select(
            "tenant_id",
            "file_path",
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.col("content"), F.lit(_SYMBOL_RE), 1)
                )
            ).alias("symbol_name"),
        )
        .withColumn("symbol_type", F.lit("function"))
        .select(
            _node_id(
                F.col("tenant_id"), F.col("file_path"),
                F.col("symbol_name"), F.col("symbol_type"),
            ).alias("node_id"),
            "tenant_id", "symbol_name", "symbol_type", "file_path",
        )
        .distinct()
    )


def call_tokens(docs: DataFrame) -> DataFrame:
    """(tenant_id, file_path, callee) — call-site tokens `name(`
    (word-boundary-guarded) per file. Also strictly per-file, hence
    incrementally maintainable; the regex extraction over content is the
    content-bound cost of the graph sink, and it only ever runs on the
    changed files."""
    return docs.select(
        "tenant_id", "file_path",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(
                    F.col("content"),
                    F.lit(r"(?:^|[^A-Za-z0-9_])([A-Za-z_][A-Za-z0-9_]*)\("),
                    1,
                )
            )
        ).alias("callee"),
    )


def resolve_call_edges(nodes: DataFrame, tokens: DataFrame) -> DataFrame:
    """CALLS edges as a pure join over the two narrow derived tables —
    an EQUI-join on (tenant, name), a simple approximation of the
    reference's tree-sitter call analysis with the same edge schema.
    (The token extraction replaced an earlier per-tenant quadratic
    contains() join: at scale this is a hash join, not
    |files|x|symbols| string scans.)"""
    callers = nodes.select(
        F.col("tenant_id"), F.col("file_path"),
        F.col("file_path").alias("src_file"),
        F.col("symbol_name").alias("caller"),
    )
    callees = nodes.select(
        F.col("tenant_id"),
        F.col("symbol_name").alias("callee"),
        F.col("node_id").alias("target_node_id"),
    )
    calls = (
        callers.join(tokens, ["tenant_id", "file_path"])
        .join(callees, ["tenant_id", "callee"])
        .filter(F.col("caller") != F.col("callee"))
        .select(
            "tenant_id",
            _node_id(
                F.col("tenant_id"), F.col("src_file"),
                F.col("caller"), F.lit("function"),
            ).alias("source_node_id"),
            "target_node_id",
            F.lit("CALLS").alias("edge_type"),
            F.col("src_file").alias("source_file"),
            F.lit(1.0).alias("weight"),
        )
        .distinct()
    )
    return calls.withColumn(
        "edge_id",
        F.substring(
            F.sha2(
                F.concat_ws(
                    "|", F.col("tenant_id"), F.col("source_node_id"),
                    F.col("target_node_id"), F.col("edge_type"),
                ),
                256,
            ),
            1, 16,
        ),
    ).select(
        "edge_id", "tenant_id", "source_node_id", "target_node_id",
        "edge_type", "source_file", "weight",
    )


def extract_symbols(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """docs: (tenant_id, file_path, content) → (nodes, edges).

    nodes: (node_id, tenant_id, symbol_name, symbol_type, file_path)
    edges: (edge_id, tenant_id, source_node_id, target_node_id, edge_type,
            source_file, weight)

    Composition of the per-file derivations + the resolution join —
    identical output to the maintained-store path (graph_store.py), which
    keeps the nodes/tokens tables incrementally and re-resolves edges."""
    nodes = symbol_nodes(docs)
    return nodes, resolve_call_edges(nodes, call_tokens(docs))


def narrative_sections(
    docs: DataFrame, nodes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Markdown sections → document_section nodes + EXPLAINS edges to
    symbols mentioned unambiguously (exactly one definition of that name
    in the tenant)."""
    secs = docs.select(
        "tenant_id", "file_path",
        F.posexplode(F.split(F.col("content"), "(?m)^#+\\s*")).alias(
            "section_idx", "section_text"
        ),
    ).filter(F.length(F.trim(F.col("section_text"))) > 0)
    sec_nodes = secs.select(
        _node_id(
            F.col("tenant_id"), F.col("file_path"),
            F.col("section_idx").cast("string"), F.lit("document_section"),
        ).alias("node_id"),
        "tenant_id",
        F.col("section_idx").cast("string").alias("symbol_name"),
        F.lit("document_section").alias("symbol_type"),
        "file_path", "section_text",
    )
    # unambiguous names only: exactly one definition per (tenant, name)
    uniq = (
        nodes.groupBy("tenant_id", "symbol_name")
        .agg(F.count(F.lit(1)).alias("n"), F.first("node_id").alias("target_node_id"))
        .filter(F.col("n") == 1)
        .withColumnRenamed("symbol_name", "mention")
    )
    explains = (
        sec_nodes.join(uniq, "tenant_id")
        .filter(F.col("section_text").contains(F.col("mention")))
        .select(
            "tenant_id",
            F.col("node_id").alias("source_node_id"),
            "target_node_id",
            F.lit("EXPLAINS").alias("edge_type"),
            F.col("file_path").alias("source_file"),
            F.lit(1.0).alias("weight"),
        )
    )
    return sec_nodes.drop("section_text"), explains


def resolve_stub_edges(
    nodes: DataFrame, edges: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """G10: stub nodes have empty file_path. Edges pointing at a stub are
    repointed to the real node with the same (tenant, symbol_name) —
    preferring a definition in the edge's source_file, else requiring a
    UNIQUE definition in the tenant; unresolved edges keep the stub but the
    stub nodes themselves are pruned from the node table when orphaned."""
    stubs = nodes.filter(F.coalesce(F.col("file_path"), F.lit("")) == "").select(
        F.col("node_id").alias("stub_id"),
        F.col("tenant_id"),
        F.col("symbol_name"),
    )
    real = nodes.filter(F.coalesce(F.col("file_path"), F.lit("")) != "").select(
        "tenant_id", "symbol_name",
        F.col("node_id").alias("real_id"), F.col("file_path").alias("real_file"),
    )
    cand = stubs.join(real, ["tenant_id", "symbol_name"])
    to_stub = edges.join(
        cand, edges["target_node_id"] == cand["stub_id"], "left"
    )
    # preference: same-file definition first, then unique-in-tenant
    pref = (
        to_stub.withColumn(
            "same_file", (F.col("real_file") == F.col("source_file")).cast("int")
        )
        .withColumn(
            "n_defs", F.count("real_id").over(Window.partitionBy("edge_id"))
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("edge_id").orderBy(
                    F.desc("same_file"), F.asc("real_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
    )
    resolved = pref.select(
        "edge_id", edges["tenant_id"], "source_node_id",
        F.when(
            F.col("real_id").isNotNull()
            & ((F.col("same_file") == 1) | (F.col("n_defs") == 1)),
            F.col("real_id"),
        ).otherwise(F.col("target_node_id")).alias("target_node_id"),
        "edge_type", "source_file", "weight",
    )
    # prune stubs no longer referenced by any edge
    referenced = resolved.select(F.col("target_node_id").alias("node_id")).union(
        resolved.select(F.col("source_node_id").alias("node_id"))
    ).distinct()
    kept_nodes = nodes.join(
        stubs.select(F.col("stub_id").alias("node_id")), "node_id", "left_anti"
    ).unionByName(
        nodes.join(stubs.select(F.col("stub_id").alias("node_id")), "node_id")
        .join(referenced, "node_id")
    )
    return kept_nodes, resolved


def cross_boundary(
    nodes: DataFrame,
    edges: DataFrame,
    seed: str,
    source_tenant: str,
    library_tenants: list[str] | None = None,
    max_hops: int = 2,
    edge_types: list[str] | None = None,
) -> DataFrame:
    """(node_id, confidence, depth) — bidirectional hops inside the tenant
    relaxation set; confidence of a hop = edge weight × per-type base;
    MAX confidence and MIN depth per reached node."""
    max_hops = max(1, min(3, max_hops))  # clamp 1..3 (graph/mod.rs:648-662)
    tenants = [source_tenant, GLOBAL_TENANT] + (library_tenants or [])
    allowed_nodes = nodes.filter(F.col("tenant_id").isin(tenants)).select(
        "node_id"
    )
    e = edges
    if edge_types:
        e = e.filter(F.col("edge_type").isin(edge_types))
    base = F.lit(1.0)
    for et, b in sorted(EDGE_BASE_CONFIDENCE.items()):
        base = F.when(F.col("edge_type") == et, F.lit(b)).otherwise(base)
    conf = (F.coalesce(F.col("weight"), F.lit(1.0)) * base).alias("hop_conf")
    und = (
        e.select(F.col("source_node_id").alias("u"), F.col("target_node_id").alias("v"), conf)
        .unionByName(
            e.select(F.col("target_node_id").alias("u"), F.col("source_node_id").alias("v"), conf)
        )
        .join(allowed_nodes.withColumnRenamed("node_id", "v"), "v")
        .localCheckpoint()
    )
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(seed, 1.0)], ["u", "conf"])
    out = None
    for depth in range(1, max_hops + 1):
        stepped = (
            und.join(F.broadcast(frontier), "u")
            .select(F.col("v").alias("u"), F.col("hop_conf").alias("conf"))
            .groupBy("u")
            .agg(F.max("conf").alias("conf"))
        )
        frontier = stepped
        step = stepped.withColumn("depth", F.lit(depth))
        out = step if out is None else out.unionByName(step)
    return (
        out.filter(F.col("u") != seed)
        .groupBy(F.col("u").alias("node_id"))
        .agg(F.max("conf").alias("confidence"), F.min("depth").alias("depth"))
    )
