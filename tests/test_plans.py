"""Physical-plan shape checks — the scale contract, asserted.

These lock in the properties ARCHITECTURE.md claims: filters reach the
parquet scan, projections prune columns, the dense leg is shuffle-free,
and whole-stage codegen covers the scoring expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from workspace_qdrant_mcp_spark.operators import dense
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    plan = _plan(q)
    assert "PushedFilters" in plan
    assert "lang" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_in_read_schema(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    q = docs.select("doc_id", "lang")
    plan = _plan(q)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema  # the big column is pruned


def test_dense_leg_is_shuffle_free(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    leg = dense.dense_search(emb, qvec, k=20, threshold=0.3)
    plan = _plan(leg)
    # brute-force cosine top-k: broadcast 1-row query + TakeOrdered — the
    # only exchange allowed is the broadcast itself
    assert "TakeOrderedAndProject" in plan
    for line in plan.splitlines():
        if "Exchange" in line and "Broadcast" not in line:
            raise AssertionError(f"unexpected shuffle in dense leg: {line}")


def test_graph_extraction_uses_equi_joins(spark):
    # CALLS extraction must be hash/sort-merge joins on (tenant, name) —
    # never a nested-loop/cartesian scan pairing every file with every
    # symbol (the shape that dies at 1000x the files)
    from workspace_qdrant_mcp_spark.operators import graph_extract as gx

    docs = load_table(spark, SF_SMOKE, "documents").select(
        F.col("source").alias("tenant_id"),
        F.concat(F.lit("f"), F.col("doc_id").cast("string")).alias("file_path"),
        F.concat(
            F.lit("def fn"), (F.col("doc_id") % 40).cast("string"),
            F.lit("(): fn"), ((F.col("doc_id") + 20) % 40).cast("string"),
            F.lit("()"),
        ).alias("content"),
    )
    _, edges = gx.extract_symbols(docs)
    plan = _plan(edges)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aggregation_path_in_wholestage_codegen(spark):
    # the tf/df word-count spine runs inside whole-stage codegen (the dense
    # leg's higher-order lambdas are interpreted expressions by design —
    # still JVM-side, just outside codegen spans)
    from workspace_qdrant_mcp_spark.operators import bm25

    import contextlib
    import io

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        docs = load_table(spark, SF_SMOKE, "documents")
        q = bm25.doc_terms(docs)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("codegen")
        out = buf.getvalue()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in out
    n = int(out.split("Found ")[1].split(" WholeStageCodegen")[0])
    assert n >= 1


def test_decayed_tenant_map_pruned_before_broadcast(spark):
    # The corpus-sized tenant map (one row per document) must never be
    # broadcast whole — it is pruned to the leg's <=2*limit ids with a
    # broadcast LEFT SEMI join first (small leg = only broadcast build
    # side), then the pruned map is broadcast into the enrichment join
    # (VERDICT r1 #3: the unpruned broadcast OOMs at 100 TB).
    from workspace_qdrant_mcp_spark.plans import search_pipeline

    docs = load_table(spark, SF_SMOKE, "documents")
    tenants = docs.select("doc_id", F.col("source").alias("tenant_id"))
    leg = spark.createDataFrame(
        [(1, 0.9), (3, 0.5)], "doc_id long, score double"
    ).localCheckpoint()
    out = search_pipeline.enrich_with_tenants(leg, tenants)
    plan = _plan(out)
    assert "LeftSemi" in plan, "tenant map must be semi-join-pruned pre-broadcast"
    assert "Scan parquet" in plan  # tenants streams from the file scan


def test_srp_lsh_is_bucket_join_not_cartesian(spark):
    # SRP-LSH candidates must come from the (band, key) equi-join, never a
    # nested-loop pairing of corpus x queries; the verify join broadcasts
    # only the bounded candidate id set.
    from workspace_qdrant_mcp_spark.operators import ann

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(ann.srp_topk(emb, q, k=5))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_apply_events_is_all_equi_joins(spark):
    # The S10 merge is equi-joins on path only: sort-merge/hash joins that
    # scale with AQE, no broadcast assumption on either corpus-sized side.
    from workspace_qdrant_mcp_spark.streaming import ingest

    base = spark.createDataFrame([("a", "x")], ["path", "content"])
    events = spark.createDataFrame(
        [("a", "upsert", "y", 1)],
        "path STRING, event_type STRING, content STRING, ts LONG",
    )
    plan = _plan(ingest.apply_events(base, events))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_round4_queries_avoid_cartesian_joins(spark):
    """The r4 additions must keep equi-join shapes: the nested-chunk
    parent resolution joins on (tenant_id, file_path) with the indent
    inequality as a residual, and the double-apply idempotency merge
    stays keyed on path — no nested-loop pairing that dies at scale."""
    import __spark_entry__ as entrymod

    for name in ("nested_chunks", "ingest_idempotency", "reconcile_diff",
                 "two_hop_chain", "dlq_decisions"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_nested_parent_join_is_broadcast_equi(spark):
    """The per-file unit table is tiny; Spark should broadcast one side
    of the parent join rather than shuffling both."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["nested_chunks"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_decontamination_has_no_cartesian(spark):
    # the gram join must be an equi-join on the hashed gram (inverted
    # index) — never an eval x train nested-loop pairing; the df-cap
    # filter must sit below the join, not above it
    from workspace_qdrant_mcp_spark.operators import curation

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    )
    out = curation.decontaminate(
        docs.filter(F.col("source") != "src1"),
        docs.filter(F.col("source") == "src1"),
    )
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_assign_is_exchange_free(spark):
    # the split is a property of doc_id — a pure column expression whose
    # plan contains no exchange of any kind
    from workspace_qdrant_mcp_spark.operators import curation

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(curation.split_assign(docs))
    assert "Exchange" not in plan


def test_round5_curation_queries_avoid_cartesian_joins(spark):
    """The r5 curation additions keep equi-join shapes: the repetition
    pivot joins back on doc_id, the funnel joins four doc-keyed
    aggregates, boilerplate strips by content equi-anti-join."""
    import __spark_entry__ as entrymod

    for name in (
        "gopher_repetition",
        "quality_buckets",
        "curation_funnel",
        "boilerplate_lines",
    ):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BatchEvalPython" not in plan, name  # no Python UDFs


def test_sq_topk_broadcasts_queries_and_rescores_via_hash_join(spark):
    # The SQ approximate scan pairs the corpus with the BOUNDED broadcast
    # query set (never a shuffled cartesian), and the k*oversample rescore
    # funnel comes back as broadcast HASH joins on (vec_id)/(query_id) —
    # the corpus is never paired with itself.
    from workspace_qdrant_mcp_spark.operators import ann

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = _plan(ann.sq_topk(emb, q, k=5))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # rescore equi-joins on candidate ids


def test_semdedup_pairs_only_inside_clusters(spark):
    # SemDeDup's only non-equi pairing is corpus x the BOUNDED broadcast
    # centroid table (n_centroids rows); the candidate-pair generator must
    # be the cluster_id equi self-join — never a corpus x corpus loop.
    from workspace_qdrant_mcp_spark.operators import dedup

    emb = load_table(spark, SF_SMOKE, "embeddings")
    plan = _plan(dedup.semdedup(emb))
    assert "CartesianProduct" not in plan
    # exactly the centroid-assign broadcast loop, nothing corpus-sized
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "BatchEvalPython" not in plan


def test_repeated_spans_is_two_stage_agg_and_equi_join(spark):
    # The span-occurrence count must partial-aggregate map-side and the
    # doc join-back must be an equi-join on the span key; no nested loops,
    # no Python UDFs in the explode/substring pipeline.
    from workspace_qdrant_mcp_spark.operators import dedup

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(dedup.repeated_spans(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
    assert "HashAggregate" in plan


def test_round6_queries_avoid_cartesian_joins(spark):
    """r6 additions keep equi-join shapes: degree-ordered triangle
    wedge+closing joins, k-core peel semi-joins, PQ's LUT join on
    (m, code_id), bloom's bit join, and the session-window rollup must
    never degrade to a nested-loop pairing. (ann_pq_topk's broadcast
    crossJoin of the 1-row bounds table is absent here by design —
    PQ joins codebook/LUT by key.)"""
    import __spark_entry__ as entrymod

    for name in ("graph_triangles", "graph_kcore", "ann_pq_topk",
                 "bloom_user_membership", "events_session_rollup"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        # the scalar proportional-cap join is the one permitted
        # nested-loop: a broadcast 1-ROW aggregate build side (Catalyst
        # constant-folds any synthetic equi-key, so this shape is
        # unavoidable AND optimal); every other NLJ is a scale bug.
        # Simple-mode plan keeps the join condition on the node line.
        # permitted shapes: the __cap residual filter, or an
        # unconditioned BuildRight Cross — both only arise from
        # F.broadcast(one-row-aggregate) scalar attaches in this repo
        # (a big-big cross would plan as CartesianProduct, asserted
        # absent above)
        simple = df._jdf.queryExecution().executedPlan().toString()
        for line in simple.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                ok = "__cap" in line or line.strip().endswith(
                    "BroadcastNestedLoopJoin BuildRight, Cross"
                )
                assert ok, (name, line)


def test_round7_queries_avoid_cartesian_joins(spark):
    """r7 additions keep equi-join shapes: the prefix-filter candidate
    join (gram equi-key), the salted join ((key, salt) equi-keys), the
    survivor argmax window, the grouped-HLL register aggregate, and the
    attribution union-tag window must never degrade to a nested-loop
    pairing. Broadcast 1-row scalar attaches (corpus size / max-ts) are
    the only permitted NLJ shapes, as in the r6 test."""
    import __spark_entry__ as entrymod

    for name in ("topk_per_group", "histogram_quantiles",
                 "prefix_jaccard_neardup", "hll_users_by_type",
                 "quality_survivors", "salted_join_hot_key",
                 "decayed_popularity", "last_touch_attribution"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        simple = df._jdf.queryExecution().executedPlan().toString()
        for line in simple.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                ok = "__cap" in line or line.strip().endswith(
                    "BroadcastNestedLoopJoin BuildRight, Cross"
                )
                assert ok, (name, line)


def test_r7_late_additions_plan_shapes(spark):
    """Late-r7 additions: the sliding rollup and bottom-k sample are
    pure aggregate/window plans (no joins at all beyond the scan); the
    bloom-pruned join's only nested-loop shape is the permitted 1-row
    broadcast filter attach, and its probe filter sits BEFORE the join;
    the k-NN graph's IVF mode pairs candidates through a cell_id
    equi-join, never a cartesian."""
    import __spark_entry__ as entrymod
    from workspace_qdrant_mcp_spark.io import load_table
    from workspace_qdrant_mcp_spark.operators.ann import knn_graph

    for name in ("events_sliding_rollup", "bottomk_sample"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name

    bj = entrymod.queries()["bloom_pruned_join"](spark, SF_SMOKE)
    plan = _plan(bj)
    assert "CartesianProduct" not in plan
    simple = bj._jdf.queryExecution().executedPlan().toString()
    for line in simple.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            # Catalyst fuses the bitmask probe INTO the 1-row broadcast
            # attach as the join condition — the pruning and the attach
            # are one operator, which is exactly the shape we want
            assert "BroadcastNestedLoopJoin BuildRight, Cross" in line, line
            assert "element_at" in line or "__bloom" in line, line

    emb = load_table(spark, SF_SMOKE, "embeddings")
    g = knn_graph(emb, k=3, n_cells=4, n_probe=2, mode="ivf")
    plan = _plan(g)
    assert "CartesianProduct" not in plan
    # the candidate pairing is the cell_id equi-join (hash or SMJ), and
    # the only NLJ is the broadcast centroid attach (bounded, by design)
    assert "cell_id" in plan


def test_interval_join_plans_as_equi_join(spark):
    """The stream-stream-capable interval join must plan as a hash/SMJ
    EQUI-join on the key with the time bound carried as the join
    condition — never a nested-loop over the inequality."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["events_interval_join"](spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert "HashJoin" in simple or "SortMergeJoin" in simple


def test_r7_session2_additions_plan_shapes(spark):
    """Second-session r7 additions keep the intended shapes: PMI / KMV /
    vocab-coverage / nDCG / char-entropy never degrade to a cartesian,
    and their only nested-loop shapes are the permitted bounded
    broadcast attaches (1-row scalar totals, the k-row KMV sketches,
    the vocab list); adamic_adar's wedge join is an equi-join on the
    center with the hub-ceiling filter applied BEFORE it."""
    import __spark_entry__ as entrymod

    for name in ("pmi_collocations", "kmv_source_overlap",
                 "vocab_coverage", "ndcg_metrics", "char_entropy",
                 "link_prediction_aa", "random_walks", "key_skew_report",
                 "fuzzy_term_pairs"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        simple = df._jdf.queryExecution().executedPlan().toString()
        for line in simple.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                ok = ("__cap" in line or line.strip().endswith(
                    "BroadcastNestedLoopJoin BuildRight, Cross"
                ))
                assert ok, (name, line)

    # char_entropy is aggregation-only: no join of any kind
    ce = entrymod.queries()["char_entropy"](spark, SF_SMOKE)
    assert "Join" not in _plan(ce)

    # graph_msf's returned forest is a checkpointed frame (the
    # iterative machinery already ran); assert it materialized without
    # a cartesian by running the query and checking the final plan
    msf = entrymod.queries()["graph_msf"](spark, SF_SMOKE)
    assert "CartesianProduct" not in _plan(msf)


def test_hybrid_search_indexed_serves_off_stores(spark):
    """The r8 indexed serving path (VERDICT r7 #7): the physical plan
    must read BOTH maintained stores (postings parquet, ann-cells
    parquet), route dense candidates through the cell_id probe
    equi-join, and never re-derive either store from the corpus at
    query time — documents' text column must be absent from every
    ReadSchema (no tokenize at serve time; documents is scanned only
    for the 1-row N aggregate), and no cartesian pairing anywhere."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["hybrid_search_indexed"](spark, SF_SMOKE)
    postings_path, ann_path, _ = entrymod._indexed_stores(spark, SF_SMOKE)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    # both store scans present
    assert postings_path.rsplit("/", 1)[-1] in plan
    assert ann_path.rsplit("/", 1)[-1] in plan
    # dense candidates come from the cell_id equi-join of the store
    simple = df._jdf.queryExecution().executedPlan().toString()
    assert any(
        "BroadcastHashJoin" in line and "cell_id" in line
        for line in simple.splitlines()
    ), "cell-probe equi-join missing"
    # no serve-time tokenization: text never read
    import re

    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        assert "text" not in m.group(1), m.group(0)


def test_r8_additions_plan_shapes(spark):
    """r8 additions keep the permitted join shapes: Lloyd k-means pairs
    rows only against the bounded broadcast centroid table (a Cross
    BNLJ with a k-row build side — the whitelisted bounded-broadcast
    shape), temperature_mixture and feature_drift_psi are aggregate
    plans whose only NLJ is the 1-row scalar attach, and nothing
    anywhere degrades to CartesianProduct."""
    import __spark_entry__ as entrymod

    for name in ("kmeans_topics", "temperature_mixture",
                 "feature_drift_psi", "graph_ktruss"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        simple = df._jdf.queryExecution().executedPlan().toString()
        for line in simple.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                ok = "__cap" in line or "__mid" in line or line.strip().endswith(
                    "BroadcastNestedLoopJoin BuildRight, Cross"
                )
                assert ok, (name, line)


def test_r9_additions_plan_shapes(spark):
    """r9 additions keep the permitted join shapes (VERDICT r8 #3's
    'plan shows no corpus-squared join'): the BPE trainer's only
    non-equi joins are the per-round 1-row best-pair broadcast attaches
    (a constant-key left join Catalyst folds to a BNLJ with a 1-ROW
    build side) — the corpus appears exactly once, as the word-count
    aggregate; bpe_doc_tokens re-tokenizes via a word equi-join; the
    drift monitor pairs rows only against the bounded broadcast
    centroid table. Nothing degrades to CartesianProduct."""
    import __spark_entry__ as entrymod

    for name in ("bpe_merges", "bpe_doc_tokens", "ann_store_drift"):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        simple = df._jdf.queryExecution().executedPlan().toString()
        for line in simple.splitlines():
            if "BroadcastNestedLoopJoin" in line:
                ok = "__k" in line or line.strip().endswith(
                    "BroadcastNestedLoopJoin BuildRight, Cross"
                ) or "BuildRight, LeftOuter" in line
                assert ok, (name, line)


def test_gram_in_filter_pushes_to_parquet_scan(spark, tmp_path):
    """The indexed-grep candidate stage uses an IN literal rather than a
    broadcast join precisely so a COLD gram store read prunes at the
    parquet scan (r9): assert PushedFilters carries In(gram, ...) and
    the scan reads only the two store columns."""
    from workspace_qdrant_mcp_spark.operators import grep as g

    lines = spark.createDataFrame(
        [(0, 1, "alpha dup"), (1, 1, "beta"), (2, 1, "gamma dup")],
        "doc_id long, line_number int, content string",
    )
    path = str(tmp_path / "grams")
    g.update_gram_index(spark, path, changed_lines=lines)
    df = g.grep_exact_indexed(
        lines, g.read_gram_index(spark, path), "dup"
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    import re

    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    # Catalyst folds a 1-element IN to EqualTo; multi-gram patterns keep In
    assert any(
        re.search(r"(In|EqualTo)\(gram,", ln) for ln in pushed
    ), pushed
    # column pruning: the gram-store scan reads only (doc_id, gram)
    gram_reads = [
        ln for ln in plan.splitlines()
        if "ReadSchema" in ln and "gram" in ln
    ]
    assert gram_reads and all(
        "content" not in ln for ln in gram_reads
    ), gram_reads


def test_quality_classifier_margins_broadcast_weights(spark):
    # the GD round's margin pass must broadcast the (dim+1)-row weight
    # table against the doc-feature table — a SortMergeJoin here would
    # shuffle the whole corpus per round at scale
    from pyspark.sql import functions as F

    from workspace_qdrant_mcp_spark.operators import quality_classifier as qc

    docs = load_table(spark, SF_SMOKE, "documents")
    feats = qc.qc_features(docs)
    w = spark.range(qc.QC_DIM + 1).select(
        F.col("id").alias("feat_id"), F.lit(0.1).alias("weight")
    )
    plan = _plan(qc._margins(feats, w, "doc_id"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_unigram_viterbi_is_shuffle_free(spark):
    # the E-step's Viterbi DP is a per-row fold with the piece model
    # inlined as a map literal: zero joins, zero exchanges — the only
    # shuffle in the E-step is the downstream usage aggregate
    from workspace_qdrant_mcp_spark.operators import unigram_lm as ulm

    words = spark.createDataFrame(
        [("scan", 3), ("table", 2)], "word string, n long"
    )
    plan = _plan(ulm.ulm_viterbi_pieces(words, {"s": 5, "c": 5, "a": 5}))
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_wordpiece_scoring_is_join_free(spark):
    # r13 second pass: ONE extended-pair aggregate per round is
    # collected (bounded model state), the symbol denominators are
    # integer lhs-sums of the collected rows, and the scored pairs are
    # a LOCAL relation — the scored-pair plan must carry NO join and NO
    # exchange; the word table is scanned once per round, not twice
    from workspace_qdrant_mcp_spark.operators import bpe

    docs = load_table(spark, SF_SMOKE, "documents")
    words = bpe._word_counts(docs, "text")
    plan = _plan(bpe._wp_scored_pairs(words))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan
    assert "Exchange" not in plan
    # createDataFrame(list) plans as a local ExistingRDD scan
    assert (
        "LocalTableScan" in plan
        or "ExistingRDD" in plan
        or "EmptyRelation" in plan
    )


def test_ext_pair_counts_match_pair_and_symbol_counts(spark):
    # the extended aggregate's interior rows must equal _pair_counts and
    # its lhs-sums must equal the per-symbol occurrence counts the old
    # separate symbol scan produced (the WordPiece score denominator) —
    # including single-symbol words (boundary-only rows) and repeated
    # adjacent symbols
    from workspace_qdrant_mcp_spark.operators import bpe

    docs = spark.createDataFrame(
        [(0, "aaa ab b ab aaa x"), (1, "aaa bx")],
        "doc_id long, text string",
    )
    words = bpe._word_counts(docs, "text")
    ext = bpe._ext_pair_counts(words).collect()
    interior = {
        (r["lhs"], r["rhs"]): int(r["cnt"]) for r in ext if r["rhs"] != ""
    }
    pairs = {
        (r["lhs"], r["rhs"]): int(r["cnt"])
        for r in bpe._pair_counts(words).collect()
    }
    assert interior == pairs
    sc: dict[str, int] = {}
    for r in ext:
        sc[r["lhs"]] = sc.get(r["lhs"], 0) + int(r["cnt"])
    # per-symbol occurrence counts computed independently
    import re as _re

    expect: dict[str, int] = {}
    for d in docs.collect():
        for w in _re.split(r"\s+", d["text"]):
            if not w:
                continue
            for ch in w:
                expect[ch] = expect.get(ch, 0) + 1
    assert sc == expect


def test_r10_continuation_queries_avoid_cartesian_and_python(spark):
    """The KN LM ladder, the frozen-LM scorer, the tokenizer bake-off,
    the PR card and the PCA pair keep the house plan contract: no
    CartesianProduct anywhere (the only nested-loop joins are 1-row
    broadcast totals — the documented lazy-scalar shape) and no Python
    UDFs (every expression is JVM-side)."""
    import __spark_entry__ as entrymod

    for name in (
        "kn_bigram_logppl",
        "kn_trigram_logppl",
        "kn_heldout_scores",
        "kn3_heldout_scores",
        "tokenizer_compare",
        "quality_classifier_pr_card",
        "quality_classifier_indep_scores",
        "dup_span_removal",
        "zipf_ttr_card",
        "embedding_pca",
        "embedding_pca_scores",
    ):
        df = entrymod.queries()[name](spark, SF_SMOKE)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        assert "BatchEvalPython" not in plan, name


def test_serving_paths_bound_before_rank(spark):
    """VERDICT r11 #1: the three serving-path operators (S9 retrieve
    paging, R16 fallback scroll, R17 exact scoring) must bound FIRST via
    orderBy().limit() (TakeOrderedAndProject — per-partition heaps) and
    only then rank; a single-partition Window over the unbounded filtered
    input is the shape that dies at 100x. The formatted plan tree prints
    root-first, so a Window node (if any) must appear ABOVE the
    TakeOrderedAndProject that feeds it."""
    from workspace_qdrant_mcp_spark.api import WqmEngine
    from workspace_qdrant_mcp_spark.operators import exact

    engine = WqmEngine(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")

    def tree(plan: str) -> str:
        # the tree section of explain("formatted") ends at the blank line
        # before the per-node detail blocks
        return plan.split("\n\n")[0]

    cases = {
        "retrieve": engine.retrieve(limit=25, offset=10, tenant=["src1"]),
        "fallback": engine.search_fallback("def", limit=10),
        "exact": exact.exact_search(docs, "def"),
    }
    for name, df in cases.items():
        t = tree(_plan(df))
        assert "TakeOrderedAndProject" in t, name
        win_lines = [i for i, l in enumerate(t.splitlines()) if "Window" in l]
        top_lines = [
            i for i, l in enumerate(t.splitlines())
            if "TakeOrderedAndProject" in l
        ]
        # every Window consumes the bounded TakeOrdered set (parent above
        # child in the root-first tree); fallback has no Window at all
        for w in win_lines:
            assert any(tk > w for tk in top_lines), (name, t)
    assert "Window" not in tree(_plan(cases["fallback"]))


def test_scroll_keyset_union_plan_is_take_ordered_per_page(spark):
    """VERDICT r12 #4: the keyset-paging registry query unions chained
    retrieve_after pages; the union plan must be one TakeOrderedAndProject
    per page (constant cost per page at any depth) with NO Window node
    and no global Sort of the unbounded filtered set — the offset
    formulation's row_number shape lives only in the oracle."""
    import __spark_entry__ as entrymod

    df = entrymod._q_scroll_keyset(spark, SF_SMOKE)
    plan = _plan(df)
    tree = plan.split("\n\n")[0]
    n_pages_taken = sum(
        1 for l in tree.splitlines() if "TakeOrderedAndProject" in l
    )
    assert n_pages_taken >= entrymod.KEYSET_PAGES, tree
    assert "Window" not in tree, tree
