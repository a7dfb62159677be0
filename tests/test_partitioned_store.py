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
