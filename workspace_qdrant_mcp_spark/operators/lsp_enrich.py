"""LSP enrichment payload (SURVEY §2.9) — the Spark analog of
strategies/processing/file/lsp_payload.rs:1-120.

The reference asks a live LSP server for references / type info /
imports / definition per symbol and serializes them into point payload
fields (capping references at 20, keeping the full count). No LSP
server runs in a batch analytics engine, so the same payload fields are
derived from the extracted symbol graph — the static-analysis subset of
what an LSP would answer:

  lsp_enrichment_status   'success' (the graph resolved the symbol)
  lsp_definition_file     the defining file (node identity)
  lsp_type_signature/kind a signature string + the node's symbol type
  lsp_references          sorted distinct call-site files, capped at 20
                          (lsp_payload.rs take(20)), pipe-joined
  lsp_references_count    the UNCAPPED distinct reference count
  imports (separate fn)   per-file import targets with stdlib flag and
                          corpus-resolution (lsp_payload.rs add_imports)

Scale shape: one groupBy on target_node_id over the edge table plus one
left equi-join back to nodes — the same partitioning the graph store
already uses; no Python, no driver collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REFERENCES_CAP = 20  # lsp_payload.rs:45 take(20)

# the stdlib judgement of lsp_payload.rs add_imports' is_stdlib flag,
# frozen to python's common stdlib module names (public knowledge)
STDLIB_MODULES = frozenset(
    "os sys re json math time typing collections itertools functools io "
    "pathlib subprocess logging datetime random string struct hashlib "
    "abc enum dataclasses contextlib copy pickle socket threading queue "
    "unittest argparse glob shutil tempfile zlib gzip csv base64".split()
)

IMPORT_RE = r"^(?:from|import) +([A-Za-z_][A-Za-z0-9_.]*)"


def enrich_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node LSP payload columns from the symbol graph. nodes/edges
    are the extract_symbols schema (graph_extract.py)."""
    refs = edges.groupBy(F.col("target_node_id").alias("node_id")).agg(
        F.sort_array(F.collect_set("source_file")).alias("__ref_files")
    )
    out = nodes.join(refs, "node_id", "left")
    has_refs = F.col("__ref_files").isNotNull()
    return out.select(
        "node_id",
        "tenant_id",
        "symbol_name",
        "file_path",
        F.lit("success").alias("lsp_enrichment_status"),
        F.col("file_path").alias("lsp_definition_file"),
        F.concat(F.lit("def "), F.col("symbol_name"), F.lit("()")).alias(
            "lsp_type_signature"
        ),
        F.col("symbol_type").alias("lsp_type_kind"),
        F.when(
            has_refs,
            F.array_join(F.slice("__ref_files", 1, REFERENCES_CAP), "|"),
        ).alias("lsp_references"),
        F.when(has_refs, F.size("__ref_files").cast("long")).alias(
            "lsp_references_count"
        ),
    )


def extract_imports(docs: DataFrame) -> DataFrame:
    """(tenant_id, file_path, import_name, is_stdlib, resolved,
    target_file) — per-file import lines resolved against the corpus's
    own modules (file stem == import root), lsp_payload.rs add_imports
    field-for-field. Equi-join on (tenant_id, module root); no scans."""
    imports = docs.select(
        "tenant_id",
        "file_path",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"regexp_extract_all(content, '(?m){IMPORT_RE}', 1)"
                )
            )
        ).alias("import_name"),
    ).withColumn(
        "__root", F.split(F.col("import_name"), r"\.").getItem(0)
    )
    # corpus module table: file stem (basename minus extension) per file
    modules = docs.select(
        "tenant_id",
        F.col("file_path").alias("target_file"),
        F.regexp_replace(
            F.element_at(F.split(F.col("file_path"), "/"), -1),
            r"\.[A-Za-z0-9]+$",
            "",
        ).alias("__root"),
    ).distinct()
    out = imports.join(modules, ["tenant_id", "__root"], "left")
    return out.select(
        "tenant_id",
        "file_path",
        "import_name",
        F.col("__root").isin(*STDLIB_MODULES).alias("is_stdlib"),
        (
            F.col("target_file").isNotNull()
            | F.col("__root").isin(*STDLIB_MODULES)
        ).alias("resolved"),
        "target_file",
    )
