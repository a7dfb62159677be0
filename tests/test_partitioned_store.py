"""Partitioned chunks-store layout: write partitioned by (collection,
tenant_id), read back, and prove partition pruning — the Spark analog of the
reference's collection/tenant routing (filters.rs:108-134, SURVEY §1.3)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.store import build_chunks
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_on_tenant(spark, tmp_path):
    path = str(tmp_path / "chunks_store")
    chunks = build_chunks(spark, SF_SMOKE)
    (
        chunks.write.partitionBy("collection", "tenant_id")
        .mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)

    # correctness round-trip
    assert back.count() == chunks.count()

    q = back.filter(
        (F.col("collection") == "projects") & (F.col("tenant_id") == "src1")
    ).select("point_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the tenant/collection predicates must become partition-filter pruning,
    # not row filters after a full scan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:300]
    assert "collection" in pf and "tenant_id" in pf

    rows = q.collect()
    expect = chunks.filter(
        (F.col("collection") == "projects") & (F.col("tenant_id") == "src1")
    ).count()
    assert len(rows) == expect > 0


def test_predicate_stack_prunes_partitions(spark, tmp_path):
    """The full P1-P8 stack over a partitioned store: the tenant IN-set
    (P1, group scope) and collection routing must land in
    PartitionFilters — at 100 TB these predicates skip whole directories,
    not rows."""
    from workspace_qdrant_mcp_spark.functions import filters as FL

    path = str(tmp_path / "chunks_store_stack")
    build_chunks(spark, SF_SMOKE).write.partitionBy(
        "collection", "tenant_id"
    ).mode("overwrite").parquet(path)
    back = spark.read.parquet(path)

    q = (
        back.filter(F.col("collection").isin(["projects", "libraries"]))
        .filter(FL.tenant_filter(["src1", "src11", "src13"]))
        .filter(FL.branch_filter("dev"))
        .filter(FL.tag_filter(["en", "len_2"]))
        .filter(FL.path_glob_filter("src/src1*/doc_*.txt"))
        .filter(FL.component_filter("comp"))
        .filter(FL.not_deleted_filter())
        .select("point_id")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert "tenant_id" in pf and "collection" in pf
    # the non-partition predicates (glob prefix on relative_path) are
    # pushed to the parquet row groups, not applied post-scan
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1].split("]")[0]
    assert "relative_path" in pushed
