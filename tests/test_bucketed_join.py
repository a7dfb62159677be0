"""Bucketing evidence: pre-bucketed tables join WITHOUT a shuffle — the
co-located-join strategy ARCHITECTURE.md prescribes for the big fact
tables (chunks ⋈ postings at 100 TB)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", "n_chars")
    for name, df in [("b_left", left), ("b_right", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_left").join(spark.table("b_right"), "doc_id")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket co-location: zero shuffle
        assert j.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")
