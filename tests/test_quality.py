"""Quality-harness fixtures with hand-computed metric values, plus an
end-to-end gold run: exact search must retrieve the planted needle docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.api import WqmEngine
from workspace_qdrant_mcp_spark.operators import quality
from tests.conftest import SF_SMOKE


def test_metrics_hand_computed(spark):
    # q1: gold {a,b}; results hit a at rank 2 → top3 yes, recall 1/2, mrr 1/2
    # q2: gold {c};   results miss entirely   → all zero for q2
    results = spark.createDataFrame(
        [("q1", 1, "x"), ("q1", 2, "a"), ("q1", 3, "y"),
         ("q2", 1, "z"), ("q2", 2, "z")],
        ["query_id", "rank", "file"],
    )
    gold = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q2", "c")], ["query_id", "file"]
    )
    m = quality.evaluate(results, gold).collect()[0]
    assert m["top1"] == pytest.approx(0.0)
    assert m["top3"] == pytest.approx(0.5)
    assert m["recall_at_10"] == pytest.approx((1 / 2 + 0) / 2, abs=1e-6)
    assert m["precision_at_10"] == pytest.approx((1 / 3 + 0) / 2, abs=1e-6)
    assert m["mrr"] == pytest.approx((1 / 2 + 0) / 2, abs=1e-6)
    # q2 has a duplicate (z twice): dup rates (0, 1/2) → avg 0.25
    assert m["duplicate_rate"] == pytest.approx(0.25)
    v = quality.verdict(m)
    assert not v["pass"]


def test_gold_run_exact_mode(spark):
    """Known-item retrieval: every doc containing the rare term 'dup' is a
    gold item for the query 'dup'; exact mode must surface them."""
    eng = WqmEngine(spark, SF_SMOKE)
    res = eng.search("dup", mode="exact", limit=100)
    ranked = (
        res.orderBy(F.desc("score"), F.asc("point_id"))
        .limit(10)
        .select(
            F.lit("g1").alias("query_id"),
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .orderBy(F.desc("score"), F.asc("point_id"))
            ).alias("rank"),
            F.col("relative_path").alias("file"),
        )
    )
    gold = (
        eng.chunks.filter(F.instr(F.lower(F.col("content")), "dup") > 0)
        .select(F.lit("g1").alias("query_id"), F.col("relative_path").alias("file"))
        .distinct()
    )
    m = quality.evaluate(ranked, gold).collect()[0]
    assert m["top1"] == 1.0  # the top exact match is a gold doc by construction
    assert m["recall_at_10"] > 0


def test_gold_run_hybrid_mode_passes_reference_gates(spark):
    """The `wqm benchmark search-quality` analog on the live pipeline
    (semantic-search-benchmarking.md:33-46): known-item queries — each
    query is a chunk's exact content, so the deterministic embedder puts
    its source chunk(s) at cosine 1.0 — must clear the reference's verdict
    gates: top3 >= 80%, recall@10 >= 70%."""
    from pyspark.sql import Window

    eng = WqmEngine(spark, SF_SMOKE)
    # 8 deterministic known-items: first chunk of the 8 lowest doc_ids
    items = (
        eng.chunks.filter(F.col("chunk_index") == 0)
        .orderBy("doc_id")
        .limit(8)
        .select("doc_id", "content")
        .collect()
    )
    ranked_parts, gold_parts = [], []
    for it in items:
        qid = f"q{it['doc_id']}"
        res = eng.search(it["content"], mode="hybrid", limit=10, diverse=False)
        ranked_parts.append(
            res.select(
                F.lit(qid).alias("query_id"),
                F.row_number()
                .over(Window.orderBy(F.desc("score"), F.asc("point_id")))
                .alias("rank"),
                F.col("relative_path").alias("file"),
            ).filter(F.col("rank") <= 10)
        )
        gold_parts.append(
            eng.chunks.filter(F.col("content") == it["content"])
            .select(
                F.lit(qid).alias("query_id"),
                F.col("relative_path").alias("file"),
            )
            .distinct()
        )
    from functools import reduce

    ranked = reduce(lambda a, b: a.unionByName(b), ranked_parts)
    gold = reduce(lambda a, b: a.unionByName(b), gold_parts)
    m = quality.evaluate(ranked, gold).collect()[0]
    v = quality.verdict(m)
    assert v["pass"], v


class TestNdcg:
    def test_hand_computed(self, spark):
        import math

        from workspace_qdrant_mcp_spark.operators import quality

        # q1: results r1=relevant(rel2), r2=miss, r3=relevant(rel1)
        results = spark.createDataFrame(
            [("q1", 1, "a"), ("q1", 2, "x"), ("q1", 3, "b")],
            "query_id string, rank int, file string",
        )
        gold = spark.createDataFrame(
            [("q1", "a", 2), ("q1", "b", 1), ("q1", "c", 1)],
            "query_id string, file string, rel int",
        )
        r = quality.ndcg(results, gold, k=10).collect()[0]
        dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
        # ideal order: a(2), b(1), c(1)  (rel DESC, file ASC)
        idcg = (
            (2**2 - 1) / math.log2(2)
            + (2**1 - 1) / math.log2(3)
            + (2**1 - 1) / math.log2(4)
        )
        assert r["dcg"] == round(dcg, 6)
        assert r["idcg"] == round(idcg, 6)
        assert r["ndcg"] == round(dcg / idcg, 6)

    def test_no_hits_is_zero_not_missing(self, spark):
        from workspace_qdrant_mcp_spark.operators import quality

        results = spark.createDataFrame(
            [("q1", 1, "x")], "query_id string, rank int, file string"
        )
        gold = spark.createDataFrame(
            [("q1", "a", 3)], "query_id string, file string, rel int"
        )
        r = quality.ndcg(results, gold).collect()[0]
        assert r["dcg"] == 0.0 and r["ndcg"] == 0.0 and r["idcg"] > 0

    def test_perfect_ranking_is_one(self, spark):
        from workspace_qdrant_mcp_spark.operators import quality

        results = spark.createDataFrame(
            [("q1", 1, "a"), ("q1", 2, "b")],
            "query_id string, rank int, file string",
        )
        gold = spark.createDataFrame(
            [("q1", "a", 2), ("q1", "b", 1)],
            "query_id string, file string, rel int",
        )
        assert quality.ndcg(results, gold).collect()[0]["ndcg"] == 1.0


class TestFeatureDriftPsi:
    def test_shifted_type_flags_and_stable_type_does_not(self, spark):
        # type 'shift': values all ~2 in the first half, all ~42 in the
        # second (total bucket migration -> large PSI). type 'flat':
        # identical value mix in both halves -> PSI ~ 0 (only the add-eps
        # smoothing differs, below any threshold).
        rows = []
        for i in range(50):
            rows.append((i, "2024-01-01T00:00:00Z", "shift", 2.0))
            rows.append((1000 + i, "2024-01-03T00:00:00Z", "shift", 42.0))
            rows.append((2000 + i, "2024-01-01T00:00:00Z", "flat", float(i % 3)))
            rows.append((3000 + i, "2024-01-03T00:00:00Z", "flat", float(i % 3)))
        df = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        from workspace_qdrant_mcp_spark.operators import quality

        out = {
            r["event_type"]: r
            for r in quality.feature_drift_psi(df).collect()
        }
        assert out["shift"]["drifted"] is True
        assert out["shift"]["psi"] > 1.0
        assert out["flat"]["drifted"] is False
        assert abs(out["flat"]["psi"]) < 0.01
        assert out["flat"]["n_ref"] == out["flat"]["n_cur"] == 50

    def test_midpoint_split_is_inclusive_on_current_side(self, spark):
        # an event exactly AT the midpoint belongs to the current window
        # (< mid is ref) — pin the boundary so both engines agree
        rows = [
            (1, "2024-01-01T00:00:00Z", "t", 0.0),
            (2, "2024-01-02T00:00:00Z", "t", 0.0),  # exactly mid
            (3, "2024-01-03T00:00:00Z", "t", 0.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts string, event_type string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        from workspace_qdrant_mcp_spark.operators import quality

        r = quality.feature_drift_psi(df).collect()[0]
        assert (r["n_ref"], r["n_cur"]) == (1, 2)

    def test_psi_is_nonnegative_on_real_corpus(self, spark):
        # every PSI term (p_cur - p_ref)·ln(p_cur/p_ref) has matching
        # signs, so PSI >= 0 by construction — pin the invariant on the
        # real events table where bucket unions and smoothing all engage
        from tests.conftest import SF_SMOKE

        from workspace_qdrant_mcp_spark.io import load_table
        from workspace_qdrant_mcp_spark.operators import quality

        rows = quality.feature_drift_psi(
            load_table(spark, SF_SMOKE, "events")
        ).collect()
        assert rows
        assert all(r["psi"] >= 0.0 for r in rows)
