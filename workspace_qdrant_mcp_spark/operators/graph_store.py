"""S8 maintained graph sink — incremental symbol-graph maintenance.

The reference writes graph_nodes/graph_edges at INGEST (graph/mod.rs:
210-432): a file change updates the store, it never re-derives the
whole graph. The repo's extract_symbols rebuilt per corpus; this module
closes that gap with the same discipline as the sparse-postings and
minhash-signature stores:

  - nodes.parquet / tokens.parquet are strictly PER-FILE derivations
    (graph_extract.symbol_nodes / call_tokens), so an update is one
    anti-join delete on file_path + a delta-sized append — the regex
    extraction over content (the content-bound cost) only ever runs on
    the changed files;
  - edges are the RESOLUTION JOIN over those two narrow tables
    (graph_extract.resolve_call_edges). A file change can flip edges in
    UNRELATED files (file A's `foo(` token resolves iff some file
    defines foo — adding/removing a definition in file B rewires A), so
    edge maintenance recomputes exactly the affected slice: sources in
    the changed files, plus sources in any file holding a call token
    whose callee name was DEFINED-before-or-after in a changed file
    (the added/removed-symbol diff). Everything else is kept verbatim.

INVARIANT (asserted in tests, including the cross-file rewiring case):
after any update sequence, (nodes, tokens, edges) equal a full
extract_symbols rebuild over the current corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph_extract import call_tokens, resolve_call_edges, symbol_nodes

NODES_SCHEMA = (
    "node_id string, tenant_id string, symbol_name string, "
    "symbol_type string, file_path string"
)
TOKENS_SCHEMA = "tenant_id string, file_path string, callee string"
EDGES_SCHEMA = (
    "edge_id string, tenant_id string, source_node_id string, "
    "target_node_id string, edge_type string, source_file string, "
    "weight double"
)


def _read(spark: SparkSession, path: str, schema: str) -> DataFrame:
    # missing store == empty; an unreadable store must abort the update
    # loudly (the kept∪delta overwrite would otherwise truncate it)
    if os.path.exists(path):
        return spark.read.parquet(path)
    return spark.createDataFrame([], schema)


def read_graph_store(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        _read(spark, os.path.join(store_dir, "nodes.parquet"), NODES_SCHEMA),
        _read(spark, os.path.join(store_dir, "tokens.parquet"), TOKENS_SCHEMA),
        _read(spark, os.path.join(store_dir, "edges.parquet"), EDGES_SCHEMA),
    )


def update_graph_store(
    spark: SparkSession,
    store_dir: str,
    changed_docs: DataFrame | None = None,
    deleted_paths: DataFrame | None = None,
) -> None:
    """One incremental maintenance step. changed_docs: (tenant_id,
    file_path, content) for created/modified files; deleted_paths:
    (tenant_id, file_path) for removals."""
    nodes, tokens, edges = read_graph_store(spark, store_dir)

    gone = None
    if changed_docs is not None:
        gone = changed_docs.select("tenant_id", "file_path")
    if deleted_paths is not None:
        d = deleted_paths.select("tenant_id", "file_path")
        gone = d if gone is None else gone.unionByName(d)
    if gone is None:
        return
    gone = gone.distinct().localCheckpoint()

    new_nodes = (
        symbol_nodes(changed_docs)
        if changed_docs is not None
        else spark.createDataFrame([], NODES_SCHEMA)
    )
    new_tokens = (
        call_tokens(changed_docs)
        if changed_docs is not None
        else spark.createDataFrame([], TOKENS_SCHEMA)
    )

    # symbol names whose DEFINITION set changed (defined before or after
    # in a touched file) — these can rewire call edges in any file of
    # the same tenant
    old_defs = nodes.join(gone, ["tenant_id", "file_path"], "left_semi")
    flipped_syms = (
        old_defs.select("tenant_id", "symbol_name")
        .unionByName(new_nodes.select("tenant_id", "symbol_name"))
        .distinct()
    )

    nodes_next = (
        nodes.join(gone, ["tenant_id", "file_path"], "left_anti")
        .unionByName(new_nodes)
        .localCheckpoint()
    )
    tokens_next = (
        tokens.join(gone, ["tenant_id", "file_path"], "left_anti")
        .unionByName(new_tokens)
        .localCheckpoint()
    )

    # affected edge sources: the touched files + any file with a call
    # token on a flipped symbol name (bounded by the delta's symbol
    # fan-in, not the corpus)
    affected = (
        gone.unionByName(
            tokens_next.join(
                F.broadcast(
                    flipped_syms.withColumnRenamed("symbol_name", "callee")
                ),
                ["tenant_id", "callee"],
            ).select("tenant_id", "file_path")
        )
        .distinct()
        .localCheckpoint()
    )
    re_tokens = tokens_next.join(affected, ["tenant_id", "file_path"], "left_semi")
    # the resolution join needs the FULL definition table on the callee
    # side (an affected caller may call an untouched file's symbol);
    # restricting the token side to the affected files restricts the
    # caller side too (the join keys on the token's file), so re_edges
    # sources are exactly the affected files
    re_edges = resolve_call_edges(nodes_next, re_tokens)
    # files outside `affected` cannot gain/lose edges: their tokens are
    # unchanged and none of their callee names flipped — keep verbatim
    edges_next = (
        edges.join(
            affected.withColumnRenamed("file_path", "source_file"),
            ["tenant_id", "source_file"],
            "left_anti",
        )
        .unionByName(re_edges)
        .localCheckpoint()
    )

    nodes_next.write.mode("overwrite").parquet(
        os.path.join(store_dir, "nodes.parquet")
    )
    tokens_next.write.mode("overwrite").parquet(
        os.path.join(store_dir, "tokens.parquet")
    )
    edges_next.write.mode("overwrite").parquet(
        os.path.join(store_dir, "edges.parquet")
    )
