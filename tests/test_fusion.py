"""Fusion/diversity/decay unit fixtures ported from the reference's tests
(client/src/qdrant/fusion_tests.rs, fusion_diversity_tests.rs,
search/scope_tests.rs) — same expected numbers."""

from __future__ import annotations

import pandas as pd
import pytest

from workspace_qdrant_mcp_spark.operators import fusion


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "score"])


class TestRRF:
    def test_item_in_both_legs_rank0_scores_2_over_61(self, spark):
        sem = _mk(spark, [(1, 0.9), (2, 0.5)])
        kw = _mk(spark, [(1, 3.0), (3, 1.0)])
        out = {
            r["doc_id"]: r["score"]
            for r in fusion.rrf_fuse({"semantic": sem, "keyword": kw}, ["doc_id"]).collect()
        }
        assert out[1] == pytest.approx(2.0 / 61.0)  # rank 0 in both legs
        assert out[2] == pytest.approx(1.0 / 62.0)  # rank 1 semantic only
        assert out[3] == pytest.approx(1.0 / 62.0)  # rank 1 keyword only

    def test_rank_tiebreak_is_id_asc(self, spark):
        # equal scores → rank by id asc, deterministic across reruns
        sem = _mk(spark, [(7, 0.5), (3, 0.5), (5, 0.5)])
        kw = _mk(spark, [(3, 1.0)])
        out = {
            r["doc_id"]: r["score"]
            for r in fusion.rrf_fuse({"semantic": sem, "keyword": kw}, ["doc_id"]).collect()
        }
        assert out[3] == pytest.approx(1.0 / 61.0 + 1.0 / 61.0)
        assert out[5] == pytest.approx(1.0 / 62.0)
        assert out[7] == pytest.approx(1.0 / 63.0)


class TestDecay:
    def test_default_multiplier_04_and_null_tenant_unchanged(self, spark):
        df = spark.createDataFrame(
            [(1, 1.0, "known"), (2, 1.0, "unknown"), (3, 1.0, None)],
            ["doc_id", "score", "tenant_id"],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in fusion.apply_decay(df, {"known": 0.8}).collect()
        }
        assert out[1] == pytest.approx(0.8)
        assert out[2] == pytest.approx(0.4)  # DEFAULT_DECAY_MULTIPLIER
        assert out[3] == pytest.approx(1.0)  # no tenant → unchanged


class TestDiversity:
    def _pdf(self, rows):
        return pd.DataFrame(rows, columns=["id", "score", "source_key"])

    def test_empty_diversity_score_is_1(self):
        assert fusion.diversity_score_pdf(self._pdf([])) == 1.0

    def test_cap_three_per_source_with_backfill(self):
        # 5 results from source A, 1 from B, all one tier (Δ <= 0.05):
        # round-robin A,B,A,A,A,A → cap keeps 3 A's + 1 B; the 2 spilled A's
        # backfill at the tail (count preserved — fusion.rs:292-297)
        rows = [
            (1, 0.50, "a"), (2, 0.49, "a"), (3, 0.48, "a"),
            (4, 0.47, "a"), (5, 0.46, "a"), (6, 0.455, "b"),
        ]
        out = fusion.diversify_pdf(self._pdf(rows), id_cols=["id"])
        assert list(out["id"]) == [1, 6, 2, 3, 4, 5]
        assert list(out["final_pos"]) == [0, 1, 2, 3, 4, 5]
        assert len(out) == 6  # backfill preserves count

    def test_tier_split_prevents_interleave_across_tiers(self):
        # gap > 0.05 starts a new tier; top result stays first even though
        # round-robin inside tier 2 reorders by source
        rows = [
            (1, 0.90, "a"),
            (2, 0.50, "a"), (3, 0.49, "b"), (4, 0.48, "a"),
        ]
        out = fusion.diversify_pdf(self._pdf(rows), id_cols=["id"])
        assert list(out["id"]) == [1, 2, 3, 4]

    def test_tier_top_measured_from_tier_start(self):
        # scores 0.50,0.46,0.42: 0.46 joins 0.50's tier (Δ=0.04) but 0.42 is
        # Δ=0.08 from the TIER TOP (0.50) → new tier (fusion.rs:318-340)
        rows = [(1, 0.50, "a"), (2, 0.46, "b"), (3, 0.42, "c")]
        out = fusion.diversify_pdf(self._pdf(rows), id_cols=["id"])
        assert list(out["id"]) == [1, 2, 3]

    def test_interleave_round_robin_first_seen_source_order(self):
        rows = [
            (1, 0.50, "a"), (2, 0.50, "b"), (3, 0.50, "a"), (4, 0.50, "b"),
        ]
        out = fusion.diversify_pdf(self._pdf(rows), id_cols=["id"])
        assert list(out["id"]) == [1, 2, 3, 4]

    def test_diversity_score_unique_over_total(self):
        pdf = self._pdf([(1, 0.5, "a"), (2, 0.4, "a"), (3, 0.3, "b")])
        assert fusion.diversity_score_pdf(pdf) == pytest.approx(2 / 3)
