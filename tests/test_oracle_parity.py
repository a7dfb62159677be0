"""Every queries() entry must hash-match its oracle_sql() at sf0.001 and
sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_util import compare

QUERIES = sorted(entrymod.queries().keys())


def _check(spark, name, sf_dir):
    df = entrymod.queries()[name](spark, sf_dir)
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (mirrors the driver's weaker gate for
        # non-SQL-expressible operators)
        assert len(df.columns) > 0
        assert df.count() >= 0
    else:
        compare(df, sql, sf_dir)


@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf0001(spark, name):
    _check(spark, name, SF_SMOKE)


@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf001(spark, name):
    _check(spark, name, SF_CORRECT)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


# r8: a third, scale tier for the round's additions — the driver gate
# runs at sf0.01; these re-run the exact compare at sf0.1 (10x) so the
# new operators carry scale-correctness evidence too. Bounded to the r8
# set: adding all 168 here would triple the suite's runtime for rows the
# driver already re-records every round.
R8_SCALE_QUERIES = [
    "graph_ktruss",
    "hybrid_search_indexed",
    "kmeans_topics",
    "temperature_mixture",
    "feature_drift_psi",
    "contrastive_pairs",
    "grep_indexed_lines",
    "cluster_balanced_sample",
]


@pytest.mark.parametrize("name", R8_SCALE_QUERIES)
def test_parity_sf01_scale_r8(spark, name):
    _check(spark, name, "/root/testdata/sf0.1")


# r9 (VERDICT r8 #7): the HEAVY-HITTER scale tier — the 10 most
# expensive bench queries (bench_out.json r8, minus those already in the
# r8 tier) re-run the exact driver compare at sf0.1. These are exactly
# the operators whose scale behavior could diverge from small SFs
# (bucket overflow, cap heuristics, blocking recall), so the 10x step is
# where a divergence would first show. The r9 additions ride along so
# new operators keep carrying scale evidence from birth.
R9_SCALE_QUERIES = [
    "minhash_lsh_neardup",
    "graph_scc",
    "prefix_jaccard_neardup",
    "ann_recall",
    "simhash_neardup",
    "graph_batch_2hop",
    "knn_graph",
    "grouping_jaccard",
    "dedup_survivors",
    "graph_pagerank",
    # r9-new, scale evidence from birth:
    "bpe_merges",
    "bpe_doc_tokens",
    "ann_store_drift",
]


@pytest.mark.scale
@pytest.mark.parametrize("name", R9_SCALE_QUERIES)
def test_parity_sf01_scale_heavy(spark, name):
    _check(spark, name, "/root/testdata/sf0.1")


# r10 additions: scale evidence from birth (same sf0.1 exact compare).
R10_SCALE_QUERIES = [
    "quality_classifier_weights",
    "quality_classifier_scores",
    "unigram_lm_pieces",
    "unigram_fertility",
    "wordpiece_merges",
    "wordpiece_doc_tokens",
    "doremi_weights",
    "kn_bigram_logppl",
    "tokenizer_compare",
    "kn_heldout_scores",
    "quality_classifier_pr_card",
    "embedding_pca",
    "embedding_pca_scores",
    "kn_trigram_logppl",
]


@pytest.mark.scale
@pytest.mark.parametrize("name", R10_SCALE_QUERIES)
def test_parity_sf01_scale_r10(spark, name):
    _check(spark, name, "/root/testdata/sf0.1")


# r11 additions: scale evidence from birth (same sf0.1 exact compare).
R11_SCALE_QUERIES = [
    "kn3_heldout_scores",
    "quality_classifier_indep_scores",
    "quality_classifier_pr_card",   # schema changed in r11 (both curves)
    "dup_span_removal",
    "zipf_ttr_card",
]


@pytest.mark.scale
@pytest.mark.parametrize("name", R11_SCALE_QUERIES)
def test_parity_sf01_scale_r11(spark, name):
    _check(spark, name, "/root/testdata/sf0.1")


# r13 additions: scale evidence from birth (same sf0.1 exact compare).
# ocr_extraction / video_frame_features render fixed-size synthetic
# payloads so the sf0.1 run mainly exercises the corpus-driven OCR text;
# scroll_keyset pages the 10x chunk store.
R13_SCALE_QUERIES = [
    "ocr_extraction",
    "video_frame_features",
    "scroll_keyset",
]


@pytest.mark.scale
@pytest.mark.parametrize("name", R13_SCALE_QUERIES)
def test_parity_sf01_scale_r13(spark, name):
    _check(spark, name, "/root/testdata/sf0.1")


# r10 (VERDICT r9 #1): the HUGEINT gate. DuckDB types an uncast integer
# sum() as HUGEINT (int128); the driver's Arrow/pandas hash path
# distinguishes it from Spark's LONG, while this repo's fetchall()-based
# compare collapses both to Python int — so the ONLY local defense is a
# type assert. Plan-only (`con.sql(q).types` — no execution), so checking
# all 177 oracles is cheap. compare() also asserts this per-run via
# oracle_util.assert_driver_safe_types; this test is the whole-registry
# sweep so a driver-unsafe oracle fails CI even if its parity case is
# skipped or rows-only.
def test_all_oracles_emit_driver_safe_types():
    import duckdb

    from tests.oracle_util import assert_driver_safe_types
    from workspace_qdrant_mcp_spark.io import TABLES

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
            )
        for name, sql in sorted(entrymod.oracle_sql().items()):
            assert_driver_safe_types(con, sql, name)
    finally:
        con.close()
