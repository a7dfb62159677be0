"""MMR tag-selection fixtures (tag_selector.rs tests: λ tradeoff,
inter-tag similarity cutoff, max_tags cap) + Jaccard grouping values."""

from __future__ import annotations

import pytest

from workspace_qdrant_mcp_spark.operators.keywords import mmr_select


def test_mmr_picks_highest_relevance_first():
    cands = [
        ("a", 0.9, [1.0, 0.0]),
        ("b", 0.5, [0.0, 1.0]),
        ("c", 0.8, [0.5, 0.5]),
    ]
    out = mmr_select(cands, max_tags=3)
    assert out[0][0] == "a"
    assert out[0][1] == pytest.approx(0.7 * 0.9)  # λ·rel, no penalty round 1


def test_mmr_inter_tag_similarity_cutoff_rejects_near_duplicates():
    # b is (nearly) identical to a → max_sim 1.0 > 0.8 cutoff → excluded
    cands = [
        ("a", 0.9, [1.0, 0.0]),
        ("b", 0.89, [1.0, 0.0]),
        ("c", 0.2, [0.0, 1.0]),
    ]
    out = mmr_select(cands, max_tags=3)
    assert [t for t, _ in out] == ["a", "c"]


def test_mmr_diversity_beats_relevance_at_low_lambda():
    # with λ small, the similarity penalty dominates: after 'a', the
    # orthogonal 'c' wins over the more-relevant-but-similar 'b'
    cands = [
        ("a", 0.9, [1.0, 0.0]),
        ("b", 0.8, [0.9, 0.1]),
        ("c", 0.5, [0.0, 1.0]),
    ]
    out = mmr_select(cands, lam=0.3, max_tags=2)
    assert [t for t, _ in out] == ["a", "c"]


def test_mmr_respects_max_tags():
    cands = [(f"t{i}", 0.5, [float(i), 1.0]) for i in range(10)]
    out = mmr_select(cands, max_tags=3)
    assert len(out) == 3


def test_mmr_empty_candidates():
    assert mmr_select([]) == []
