"""Incremental sparse-postings maintenance (S7 upgraded): after any
churn sequence the maintained store must equal a full doc_terms rebuild,
and sparse_search over the store must equal sparse_search computed
fresh."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.operators import bm25


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _as_set(df):
    return {tuple(r) for r in df.select("doc_id", "term", "tf").collect()}


def test_incremental_equals_rebuild_through_churn(spark, tmp_path):
    p = str(tmp_path / "postings")
    corpus = _docs(spark, [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, "gamma gamma delta"),
    ])
    bm25.update_postings(spark, p, changed_docs=corpus)
    assert _as_set(bm25.read_postings(spark, p)) == _as_set(
        bm25.doc_terms(corpus)
    )

    # churn: doc 2 rewritten, doc 3 deleted, doc 4 new
    changed = _docs(spark, [(2, "epsilon beta"), (4, "alpha zeta")])
    deleted = spark.createDataFrame([(3,)], "doc_id long")
    bm25.update_postings(spark, p, changed_docs=changed, deleted_ids=deleted)

    current = _docs(spark, [
        (1, "alpha beta alpha"),
        (2, "epsilon beta"),
        (4, "alpha zeta"),
    ])
    assert _as_set(bm25.read_postings(spark, p)) == _as_set(
        bm25.doc_terms(current)
    )

    # idempotent: re-applying the same delta changes nothing
    bm25.update_postings(spark, p, changed_docs=changed, deleted_ids=deleted)
    assert _as_set(bm25.read_postings(spark, p)) == _as_set(
        bm25.doc_terms(current)
    )


def test_delete_only_update(spark, tmp_path):
    p = str(tmp_path / "postings")
    corpus = _docs(spark, [(1, "a b"), (2, "b c")])
    bm25.update_postings(spark, p, changed_docs=corpus)
    bm25.update_postings(
        spark, p, deleted_ids=spark.createDataFrame([(1,)], "doc_id long")
    )
    assert _as_set(bm25.read_postings(spark, p)) == _as_set(
        bm25.doc_terms(_docs(spark, [(2, "b c")]))
    )


def test_sparse_search_off_store_matches_fresh(spark, tmp_path):
    p = str(tmp_path / "postings")
    corpus = _docs(spark, [
        (1, "dup dup alpha"),
        (2, "dup beta beta"),
        (3, "gamma gamma"),
        (4, "alpha dup"),
    ])
    bm25.update_postings(spark, p, changed_docs=corpus)
    fresh = bm25.sparse_search(spark, corpus, ["dup", "alpha"], k=4).collect()
    stored = bm25.sparse_search(
        spark, corpus, ["dup", "alpha"], k=4,
        terms=bm25.read_postings(spark, p),
    ).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in fresh] == [
        (r["doc_id"], round(r["score"], 9)) for r in stored
    ]


def test_stream_maintains_postings_in_lockstep(spark, tmp_path):
    """End-to-end: the ingest stream with postings_path keeps the FTS
    table equal to doc_terms over the LIVE (path, latest-content) set —
    through create, modify, and remove."""
    import json
    import os

    from workspace_qdrant_mcp_spark.streaming import ingest

    events_dir = str(tmp_path / "events")
    store = str(tmp_path / "store")
    dlq = str(tmp_path / "dlq")
    ckpt = str(tmp_path / "ckpt")
    postings = str(tmp_path / "postings")
    os.makedirs(events_dir)

    def run(name, rows):
        with open(os.path.join(events_dir, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        ingest.run_ingestion_stream(
            spark, events_dir, store, dlq, ckpt, postings_path=postings
        )

    run("b1.json", [
        {"path": "/w/a", "event_type": "create", "content": "alpha beta",
         "ts": "2024-01-01T00:00:01Z"},
        {"path": "/w/b", "event_type": "create", "content": "beta beta",
         "ts": "2024-01-01T00:00:02Z"},
    ])
    run("b2.json", [
        {"path": "/w/a", "event_type": "modify", "content": "gamma",
         "ts": "2024-01-01T00:01:00Z"},
        {"path": "/w/b", "event_type": "remove", "content": None,
         "ts": "2024-01-01T00:01:01Z"},
    ])

    live = spark.createDataFrame(
        [("/w/a", "gamma")], "path string, content string"
    )
    got = {
        tuple(r)
        for r in bm25.read_postings(
            spark, postings, id_col="path", id_type="string"
        ).select("path", "term", "tf").collect()
    }
    want = {
        tuple(r)
        for r in bm25.doc_terms(live, id_col="path", text_col="content")
        .select("path", "term", "tf").collect()
    }
    assert got == want and len(got) > 0
