"""Multimodal plumbing (batch shapes, determinism, stub gating) and Leiden
CPM fixtures (two triangles + bridge, determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from workspace_qdrant_mcp_spark.operators.leiden import leiden
from workspace_qdrant_mcp_spark.sources import multimodal as mm
from tests.conftest import SF_SMOKE


class TestMultimodal:
    def test_asset_schema_and_modalities(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        assets = mm.build_assets(docs)
        mods = {r["modality"] for r in assets.select("modality").distinct().collect()}
        assert mods == {"image", "audio", "video"}
        img = assets.filter(F.col("modality") == "image").take(1)[0]
        assert img["width"] is not None and img["duration_s"] is None

    def test_feature_extraction_batch_shape_and_determinism(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents").limit(50)
        assets = mm.build_assets(docs)
        f1 = {r["asset_id"]: r["features"] for r in mm.extract_features(assets).collect()}
        f2 = {r["asset_id"]: r["features"] for r in mm.extract_features(assets).collect()}
        assert f1 == f2  # deterministic fake decode
        assert all(len(v) == mm.FEATURE_DIM for v in f1.values())
        assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)

    def test_real_decoder_is_explicitly_stubbed(self):
        with pytest.raises(NotImplementedError):
            mm._decode_media(b"bytes", "image", use_real_decoder=True)

    def test_frame_sample_plan(self, spark):
        docs = load_table(spark, SF_SMOKE, "documents")
        assets = mm.build_assets(docs)
        frames = mm.frame_sample_plan(assets, every_s=10.0)
        one = frames.groupBy("asset_id").count().take(1)[0]
        dur = assets.filter(F.col("asset_id") == one["asset_id"]).take(1)[0]["duration_s"]
        assert one["count"] == max(1, int(dur // 10.0))


class TestLeiden:
    def test_two_triangles_bridge_two_communities(self, spark):
        edges = spark.createDataFrame(
            [(0, 1, 1), (1, 2, 1), (0, 2, 1), (3, 4, 1), (4, 5, 1), (3, 5, 1),
             (1, 3, 1)],
            ["src", "dst", "weight"],
        )
        out = {r["node_id"]: r["community"] for r in leiden(edges).collect()}
        comms = {}
        for node, c in out.items():
            comms.setdefault(c, set()).add(node)
        assert sorted(map(sorted, comms.values())) == [[0, 1, 2], [3, 4, 5]]

    def test_deterministic_reruns(self, spark):
        edges = spark.createDataFrame(
            [(i, (i + 1) % 8, 1) for i in range(8)] + [(0, 4, 1)],
            ["src", "dst", "weight"],
        )
        a = sorted(map(tuple, leiden(edges).collect()))
        b = sorted(map(tuple, leiden(edges).collect()))
        assert a == b

    def test_two_weak_bridged_cliques_gamma1(self, spark):
        # leiden/tests.rs:36-78 (int_a3_leiden_two_clusters): two 4-cliques
        # (w=1.0) + weak bridge 1-5 (w=0.01) at γ=1.0 → exactly the cliques.
        rows = (
            [(i, j, 1.0) for i in range(4) for j in range(i + 1, 4)]
            + [(i, j, 1.0) for i in range(4, 8) for j in range(i + 1, 8)]
            + [(1, 5, 0.01)]
        )
        edges = spark.createDataFrame(rows, "src long, dst long, weight double")
        out = {r["node_id"]: r["community"] for r in leiden(edges, gamma=1.0).collect()}
        comms = {}
        for node, c in out.items():
            comms.setdefault(c, set()).add(node)
        assert sorted(map(sorted, comms.values())) == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_size_gated_recursive_split(self, spark):
        # leiden/tests.rs:96-171 (int_a3_leiden_recursion): two dense
        # 4-blobs (w=3.0) + full bipartite bridge (w=1.2). γ=1.0 merges
        # them into one 8-community ≥ max_members=6; re-clustering at
        # γ'=1.5 penalizes the 1.2 bridge and recovers the blobs.
        rows = (
            [(i, j, 3.0) for i in range(4) for j in range(i + 1, 4)]
            + [(i, j, 3.0) for i in range(4, 8) for j in range(i + 1, 8)]
            + [(i, j, 1.2) for i in range(4) for j in range(4, 8)]
        )
        edges = spark.createDataFrame(rows, "src long, dst long, weight double")
        out = leiden(
            edges, gamma=1.0, resolution_step=1.5, max_members=6, min_members=3
        ).collect()
        comms = {}
        for r in out:
            comms.setdefault(r["community"], set()).add(r["node_id"])
        assert sorted(map(sorted, comms.values())) == [[0, 1, 2, 3], [4, 5, 6, 7]]

    def test_irreducible_clique_kept_whole(self, spark):
        # leiden/tests.rs:179-207: a 6-clique over max_members=4 cannot be
        # split into ≥min_members parts at any higher γ — kept whole.
        rows = [(i, j, 1.0) for i in range(6) for j in range(i + 1, 6)]
        edges = spark.createDataFrame(rows, "src long, dst long, weight double")
        out = leiden(
            edges, gamma=1.0, resolution_step=1.5, max_members=4, min_members=2
        ).collect()
        assert {r["community"] for r in out} == {0}
        assert len(out) == 6

    def test_high_gamma_splits_everything(self, spark):
        edges = spark.createDataFrame(
            [(0, 1, 1), (1, 2, 1)], ["src", "dst", "weight"]
        )
        out = leiden(edges, gamma=10.0).collect()
        # γ so high that no merge pays: every node is its own community
        assert len({r["community"] for r in out}) == 3
