"""Pipeline parity (the reference's pipeline_parity_tests.rs strategy):
the api.search facade must equal the independently-composed operator
pipeline, and key queries must stay oracle-true at sf0.1 (scale spot
check beyond the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from workspace_qdrant_mcp_spark.api import WqmEngine, _tokenize_py
from workspace_qdrant_mcp_spark.functions.embedder import mock_embed
from workspace_qdrant_mcp_spark.functions.vectors import cosine
from workspace_qdrant_mcp_spark.operators import fusion
from tests.conftest import SF_SMOKE
from tests.oracle_util import compare

SF_BIG = "/root/testdata/sf0.1"


def test_api_search_equals_composed_pipeline(spark):
    """keyword-mode api.search == hand-composed sparse leg over the same
    filtered candidate set (single collection → no diversity)."""
    eng = WqmEngine(spark, SF_SMOKE)
    got = {
        (r["point_id"], round(r["score"], 9))
        for r in eng.search(
            "dup", mode="keyword", collections=["projects"], limit=10
        ).collect()
    }
    cand = eng._filtered(collections=["projects"])
    leg = eng._sparse_leg(cand, _tokenize_py("dup"), 20, 0.15)
    want = {
        (r["point_id"], round(r["score"], 9))
        for r in leg.orderBy(F.desc("score"), F.asc("point_id")).limit(10).collect()
    }
    assert got == want


def test_api_hybrid_semantic_leg_matches_direct_cosine(spark):
    eng = WqmEngine(spark, SF_SMOKE)
    res = eng.search(
        "dup spark", mode="semantic", collections=["projects"], limit=5,
        threshold=-1.0, diverse=False,
    ).collect()
    qv = spark.createDataFrame([("dup spark",)], ["q"]).select(
        mock_embed(F.col("q")).alias("qv")
    )
    direct = (
        eng._filtered(collections=["projects"])
        .crossJoin(F.broadcast(qv))
        .select("point_id", cosine(F.col("dense"), F.col("qv")).alias("score"))
        .orderBy(F.desc("score"), F.asc("point_id"))
        .limit(5)
        .collect()
    )
    assert [r["point_id"] for r in res] == [r["point_id"] for r in direct]
    for a, b in zip(res, direct):
        assert a["score"] == pytest.approx(b["score"])


@pytest.mark.parametrize(
    "name",
    ["hybrid_search_rrf", "bm25_sparse_topk", "grep_exact_lines", "dedup_exact"],
)
def test_scale_spot_check_sf01(spark, name):
    """Oracle parity at 10x the driver's gate SF — catches scale-dependent
    drift (partition-count sensitivity, tie handling across bigger sets)."""
    df = entrymod.queries()[name](spark, SF_BIG)
    compare(df, entrymod.oracle_sql()[name], SF_BIG)
