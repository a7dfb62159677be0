"""The chunks store: the engine's core table, derived deterministically from
the synthetic documents corpus (schema from SURVEY §1.3, payload parity with
chunk_embed/payload.rs:39-115).

Collections route the way the reference's multi-tenant store does
(projects / libraries / rules / scratchpad — filters.rs:108-134): here a
deterministic assignment from doc_id exercises every routing branch:
  doc_id % 17 == 0 → libraries (with library_name/path, some tombstoned)
  doc_id % 23 == 0 → rules
  doc_id % 29 == 0 → scratchpad
  otherwise        → projects
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.embedder import mock_embed
from .io import load_table
from .sources.documents import chunk_text, code_lines


def collection_expr() -> F.Column:
    return (
        F.when(F.col("doc_id") % 17 == 0, F.lit("libraries"))
        .when(F.col("doc_id") % 23 == 0, F.lit("rules"))
        .when(F.col("doc_id") % 29 == 0, F.lit("scratchpad"))
        .otherwise(F.lit("projects"))
    )


def build_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per chunk with the reference's payload columns. At scale this
    is a partitioned table (collection, tenant_id) written once by the
    ingestion stream; here it is derived lazily from documents."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_text(docs).join(docs, "doc_id")
    enriched = (
        chunks.withColumn("collection", collection_expr())
        .withColumn("tenant_id", F.col("source"))
        .withColumn(
            "branches",
            F.when(
                F.col("doc_id") % 11 == 0, F.array(F.lit("main"), F.lit("dev"))
            ).otherwise(F.array(F.lit("main"))),
        )
        .withColumn(
            "relative_path",
            F.concat(
                F.lit("src/"), F.col("source"), F.lit("/doc_"),
                F.col("doc_id").cast("string"), F.lit(".txt"),
            ),
        )
        .withColumn("file_type", F.when(F.col("doc_id") % 2 == 0, "code").otherwise("text"))
        .withColumn(
            "tags",
            F.array(F.col("lang"), F.concat(F.lit("len_"), (F.col("n_chars") / 100).cast("int").cast("string"))),
        )
        .withColumn(
            "concept_tags",
            F.when(F.col("doc_id") % 5 == 0, F.array(F.lit("hot"))).otherwise(
                F.array().cast("array<string>")
            ),
        )
        .withColumn(
            "component_id",
            F.concat(F.lit("comp."), (F.col("doc_id") % 7).cast("string")),
        )
        .withColumn(
            "library_name",
            F.when(F.col("collection") == "libraries",
                   F.concat(F.lit("lib"), (F.col("doc_id") % 3).cast("string"))),
        )
        .withColumn(
            "library_path",
            F.when(F.col("collection") == "libraries",
                   F.concat(F.lit("/libs/"), F.col("library_name"))),
        )
        .withColumn(
            "deleted",
            F.when(
                (F.col("collection") == "libraries") & (F.col("doc_id") % 51 == 0),
                F.lit(True),
            ),
        )
        .withColumn("file_hash", F.md5(F.col("text").cast("binary")))
        .withColumn(
            "point_id",
            F.md5(
                F.concat_ws(
                    "|", F.col("tenant_id"), F.col("relative_path"),
                    F.col("chunk_index").cast("string"),
                ).cast("binary")
            ),
        )
        .withColumn("dense", mock_embed(F.col("content")))
        # parent unit: non-first chunks point at chunk 0 of their document
        # (R14 parent-context expansion, flow_collect.rs:300-362)
        .withColumn(
            "parent_unit_id",
            F.when(
                F.col("chunk_index") > 0,
                F.md5(
                    F.concat_ws(
                        "|", F.col("tenant_id"), F.col("relative_path"), F.lit("0")
                    ).cast("binary")
                ),
            ),
        )
    )
    return enriched.select(
        "point_id", "collection", "tenant_id", "branches", "relative_path",
        "chunk_index", "content", "file_hash", "lang", "file_type", "tags",
        "concept_tags", "component_id", "library_name", "library_path",
        "deleted", "dense", "doc_id", "parent_unit_id",
    )


def build_code_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    lines = code_lines(docs)
    meta = docs.select(
        "doc_id",
        F.col("source").alias("tenant_id"),
        F.concat(
            F.lit("src/"), F.col("source"), F.lit("/doc_"),
            F.col("doc_id").cast("string"), F.lit(".txt"),
        ).alias("file_path"),
    )
    return lines.join(meta, "doc_id")
