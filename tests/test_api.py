"""API-surface tests: the 7 tools (SURVEY §2.10) against the sf0.001 corpus,
including filter predicate semantics (P1-P8) and the rules dedup gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.api import WqmEngine
from workspace_qdrant_mcp_spark.functions.filters import (
    extract_glob_prefix,
    glob_to_regex,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def engine(spark):
    return WqmEngine(spark, SF_SMOKE)


class TestFilters:
    def test_glob_prefix_extraction(self):
        # filters.rs:65-77 semantics: cut at first meta, back to last '/'
        assert extract_glob_prefix("src/*/file.rs") == "src/"
        assert extract_glob_prefix("src/mod_1/*.rs") == "src/mod_1/"
        assert extract_glob_prefix("docs/guide.md") == "docs/guide.md"
        assert extract_glob_prefix("*.rs") == ""

    def test_glob_regex(self):
        import re

        rx = glob_to_regex("src/*/doc_1?.txt")
        assert re.match(rx, "src/src3/doc_12.txt")
        assert not re.match(rx, "src/a/b/doc_12.txt")  # * stops at '/'
        assert re.match(glob_to_regex("src/**"), "src/a/b/c.txt")

    def test_tenant_and_branch_scoping(self, engine):
        res = engine.retrieve(tenant="src1", branch="dev", limit=500)
        rows = res.collect()
        assert rows, "dev-branch rows must exist (doc_id % 11 == 0 docs)"
        assert all(r["tenant_id"] == "src1" for r in rows)

    def test_deleted_tombstones_excluded(self, engine):
        res = engine.retrieve(collections=["libraries"], limit=10000)
        assert res.filter(F.col("deleted").isNotNull()).count() == 0

    def test_tag_or_group(self, engine):
        res = engine.retrieve(tags=["hot"], limit=10000).collect()
        assert rows_have_tag(res)

    def test_component_prefix(self, engine):
        # dotted-boundary semantics (filters.rs:277-285): 'comp' is a parent
        # of 'comp.3'; 'com' is NOT (no dot boundary)
        res = engine.retrieve(component="com", limit=100).collect()
        assert res == []
        res2 = engine.retrieve(component="comp.3", limit=100).collect()
        assert res2 and all(r["component_id"] == "comp.3" for r in res2)
        res3 = engine.retrieve(component="comp", limit=100).collect()
        assert res3  # parent prefix matches all comp.* ids


def rows_have_tag(rows):
    return bool(rows) and all("hot" in (r["concept_tags"] or []) for r in rows)


class TestSearch:
    def test_hybrid_returns_limit_with_stripped_metadata(self, engine):
        res = engine.search("dup spark vector", mode="hybrid", limit=5)
        rows = res.collect()
        assert 0 < len(rows) <= 5
        assert "dense" not in res.columns and "content" not in res.columns

    def test_hybrid_plan_assembly_runs_no_jobs(self, spark, engine):
        """The hybrid hot path must be one deferred plan: no take(1)
        emptiness probes, no eager count() for BM25's N (VERDICT r5 #3).
        Assembling the search DataFrame therefore launches ZERO Spark
        jobs; everything runs at collect()."""
        engine.chunks  # warm the session store outside the probe window
        sc = spark.sparkContext
        group = "hybrid-plan-probe"
        sc.setJobGroup(group, "plan assembly must be lazy")
        try:
            res = engine.search("dup spark vector", mode="hybrid", limit=5)
            jobs_during_assembly = sc.statusTracker().getJobIdsForGroup(group)
            assert jobs_during_assembly == [], jobs_during_assembly
            assert res.collect()
        finally:
            sc.setJobGroup("", "")

    def test_hybrid_empty_keyword_leg_passes_dense_through(self, engine):
        """Query terms with idf 0 everywhere ('the') → empty sparse leg →
        the dense leg's RAW cosine scores come back un-fused
        (fusion.rs:170-171), now via the in-plan pass-through."""
        # threshold 0.01 → sparse cut 0.005: idf-0 terms score exactly 0
        # and drop, while the dense leg keeps any positive cosine
        rows = engine.search(
            "the", mode="hybrid", limit=5, threshold=0.01, diverse=False
        ).collect()
        assert rows
        # raw cosine scores, not 1/(60+r) RRF values (max RRF contribution
        # from a single leg is 1/61 ≈ 0.0164)
        assert any(abs(r["score"]) > 0.05 for r in rows)

    def test_exact_mode_scoring(self, engine):
        rows = engine.search("dup", mode="exact").collect()
        assert rows
        scores = [r["score"] for r in rows]
        assert scores[0] == pytest.approx(1.0)
        assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))

    def test_semantic_only_leg(self, engine):
        rows = engine.search("dup batch", mode="semantic", limit=5,
                             threshold=-1.0, diverse=False).collect()
        assert rows

    def test_single_collection_skips_diversity(self, engine):
        rows = engine.search(
            "dup", mode="keyword", collections=["projects"], limit=5
        ).collect()
        assert all(r["collection"] == "projects" for r in rows)


class TestRetrieve:
    def test_paging_is_deterministic_and_disjoint(self, engine):
        p1 = [r["point_id"] for r in engine.retrieve(limit=10, offset=0).collect()]
        p2 = [r["point_id"] for r in engine.retrieve(limit=10, offset=10).collect()]
        assert len(p1) == 10 and len(p2) == 10
        assert not set(p1) & set(p2)
        again = [r["point_id"] for r in engine.retrieve(limit=10, offset=0).collect()]
        assert p1 == again

    def test_by_id(self, engine):
        some = engine.retrieve(limit=3).collect()
        ids = [r["point_id"] for r in some]
        got = engine.retrieve(ids=ids, limit=10).collect()
        assert {r["point_id"] for r in got} == set(ids)


class TestGrep:
    def test_exact_with_context(self, engine):
        rows = engine.grep("dup", context=1).collect()
        assert rows
        assert "context_before" in rows[0].asDict()

    def test_regex_and_glob_scope(self, engine):
        rows = engine.grep("sc[ae]n", regex=True, path_glob="src/src1/*").collect()
        assert all("/src1/" in r["file_path"] for r in rows)


class TestRulesStoreEmbedding:
    def test_rules_exact_dedup_and_fuzzy_gate(self, spark, engine):
        rules = spark.createDataFrame([("always run tests",)], ["text"])
        added, rules = engine.rules_add(rules, "  always run tests  ")
        assert not added  # exact trimmed dup
        added, rules = engine.rules_add(rules, "always run tests", force=True)
        assert not added  # exact dup wins even with force
        added, rules = engine.rules_add(rules, "totally new and different rule")
        assert added
        assert rules.count() == 2

    def test_store_note_idempotent(self, spark, engine):
        notes = spark.createDataFrame([], "text STRING, note_hash STRING")
        notes = engine.store_note(notes, "note A")
        notes = engine.store_note(notes, "note A")
        assert notes.count() == 1

    def test_embedding_info(self, engine):
        info = engine.embedding_info()
        assert info["dim"] == 16 and info["distance"] == "cosine"

    def test_search_event_log_appends(self, spark, engine):
        ev = spark.createDataFrame(
            [], "ts STRING, query STRING, mode STRING, n_results INT, latency_ms DOUBLE"
        )
        ev = engine.log_search_event(ev, "dup", "hybrid", 10, 42.5, "2026-01-01T00:00:00")
        ev = engine.log_search_event(ev, "scan", "exact", 3, 7.1, "2026-01-01T00:00:01")
        rows = ev.orderBy("ts").collect()
        assert len(rows) == 2 and rows[0]["query"] == "dup"


class TestFallbackExpansionParent:
    def test_fallback_constant_score_and_status(self, engine):
        rows = engine.search_fallback("dup", limit=5).collect()
        assert rows
        assert all(r["score"] == 0.5 for r in rows)
        assert all(r["status"] == "uncertain" for r in rows)
        assert all(r["search_type"] == "fallback" for r in rows)

    def test_expansion_keywords_capped_and_matched(self, spark, engine):
        tags = spark.createDataFrame([("spark",), ("vector",)], ["tag"])
        baskets = spark.createDataFrame(
            [("spark", f"kw{i}") for i in range(8)]
            + [("vector", f"vw{i}") for i in range(8)],
            ["tag", "keyword"],
        )
        kws = engine.expansion_keywords("spark vector query", tags, baskets)
        assert len(kws) == 10  # DEFAULT_MAX_EXPANDED_KEYWORDS
        kws2 = engine.expansion_keywords("nomatch", tags, baskets)
        assert kws2 == []

    def test_search_expanded_runs(self, spark, engine):
        tags = spark.createDataFrame([("spark",)], ["tag"])
        baskets = spark.createDataFrame([("spark", "dup")], ["tag", "keyword"])
        # query 'spark' alone scores 0 (idf=0); expansion merges 'dup' at
        # weight 0.5 → hits dup-containing chunks
        rows = engine.search_expanded("spark", tags, baskets, limit=5).collect()
        assert rows
        base = engine.search("spark", mode="keyword", limit=5).collect()
        assert not base  # without expansion the query finds nothing

    def test_search_expanded_assembly_runs_no_jobs(self, spark, engine):
        """search_expanded must be as lazy as search() (VERDICT r6 #2):
        no eager count() for BM25's N, and the basket-expansion term set
        joins IN-PLAN rather than collecting expansion_keywords()."""
        engine.chunks  # warm the session store outside the probe window
        tags = spark.createDataFrame([("spark",)], ["tag"])
        baskets = spark.createDataFrame([("spark", "dup")], ["tag", "keyword"])
        sc = spark.sparkContext
        group = "expanded-plan-probe"
        sc.setJobGroup(group, "expanded plan assembly must be lazy")
        try:
            res = engine.search_expanded("spark", tags, baskets, limit=5)
            jobs_during_assembly = sc.statusTracker().getJobIdsForGroup(group)
            assert jobs_during_assembly == [], jobs_during_assembly
            assert res.collect()
        finally:
            sc.setJobGroup("", "")

    def test_parent_context_attached(self, spark, engine):
        later_chunks = engine.chunks.filter(F.col("chunk_index") > 0).select(
            "point_id", "collection"
        ).limit(3)
        out = engine.attach_parent_context(later_chunks).collect()
        assert out and all(r["parent_unit_text"] is not None for r in out)
        first_chunks = engine.chunks.filter(F.col("chunk_index") == 0).select(
            "point_id", "collection"
        ).limit(3)
        out0 = engine.attach_parent_context(first_chunks).collect()
        assert all(r["parent_unit_text"] is None for r in out0)


class TestListFiles:
    def test_flat_and_summary(self, engine):
        flat = engine.list_files(tenant="src2").collect()
        assert flat and all(r["tenant_id"] == "src2" for r in flat)
        summary = engine.list_files(mode="summary").collect()
        assert sum(r["n_files"] for r in summary) >= len(flat)


class TestStoreServing:
    """r8: WqmEngine.search served off the maintained stores must equal
    the scan path row-for-row — the reference daemon's serving shape
    (every query hits Qdrant/SQLite indexes written at ingest,
    flow_collect.rs:104-179), here: postings table for the sparse leg,
    IVF cell store pruning the dense leg before the identical cosine
    expression."""

    @pytest.fixture(scope="class")
    def engines(self, spark, tmp_path_factory):
        scan = WqmEngine(spark, SF_SMOKE)
        served = WqmEngine(spark, SF_SMOKE)
        served.enable_store_serving(
            str(tmp_path_factory.mktemp("api_stores")), n_probe=4
        )
        return scan, served

    def _rows(self, df):
        return sorted(map(tuple, df.collect()))

    @pytest.mark.parametrize("mode", ["hybrid", "semantic", "keyword"])
    def test_modes_match_scan_path(self, engines, mode):
        scan, served = engines
        a = self._rows(scan.search("dup spark vector", mode=mode, limit=10))
        b = self._rows(served.search("dup spark vector", mode=mode, limit=10))
        assert a == b, mode
        assert a  # non-trivial result

    def test_filtered_search_matches_scan_path(self, engines, spark,
                                                tmp_path_factory):
        # filters shrink the candidate set UNDER the index, spreading the
        # filtered top-2k over MORE cells — at n_probe=4 the dense leg
        # visibly loses recall (the documented probe/recall trade), while
        # probing all cells restores exactness. Assert both halves.
        scan, served4 = engines
        kw = dict(collections=["projects"], file_type="code")
        a = self._rows(scan.search("dup spark", mode="hybrid", limit=10, **kw))
        b4 = self._rows(served4.search("dup spark", mode="hybrid", limit=10, **kw))
        served_all = WqmEngine(spark, SF_SMOKE)
        served_all.enable_store_serving(
            str(tmp_path_factory.mktemp("api_stores_all")), n_probe=10
        )
        b10 = self._rows(
            served_all.search("dup spark", mode="hybrid", limit=10, **kw)
        )
        assert b10 == a
        assert a
        assert b4 != a  # the trade is real: fewer probes, lower recall

    @pytest.mark.parametrize("mode", ["hybrid", "semantic"])
    def test_pca_pretransform_full_probe_is_exact(
        self, engines, spark, tmp_path_factory, mode
    ):
        # pretransform='pca' changes only the CELL GEOMETRY (1-D Voronoi
        # along the fitted top principal axis via the lifted
        # [proj,1]/[t,-t^2/2] encoding); final scoring stays on the raw
        # dense column, so probing all cells must equal the scan path
        # row-for-row under the new geometry too
        scan, _ = engines
        served = WqmEngine(spark, SF_SMOKE)
        served.enable_store_serving(
            str(tmp_path_factory.mktemp("api_stores_pca")),
            n_probe=10, pretransform="pca",
        )
        a = self._rows(scan.search("dup spark vector", mode=mode, limit=10))
        b = self._rows(served.search("dup spark vector", mode=mode, limit=10))
        assert a == b, mode
        assert a
        # the fitted model is frozen on the engine for query projection
        assert served._ann_pretransform is not None
        assert len(served._ann_pretransform["pc"]) == len(
            served._ann_pretransform["mu"]
        ) > 0
        # cells are genuinely partitioned along the axis (more than one
        # occupied cell — the lift would collapse to 2 cells under a
        # raw-dot assignment bug)
        occ = served._ann_store_df.select("cell_id").distinct().count()
        assert occ > 2

    def test_pca_pretransform_survives_drift_refresh(
        self, spark, tmp_path_factory
    ):
        # refresh_serving_if_drifted must rebuild under the SAME
        # pretransform and keep serving (the lifted drift comparison
        # projects the current corpus with the frozen model first)
        eng = WqmEngine(spark, SF_SMOKE)
        eng.enable_store_serving(
            str(tmp_path_factory.mktemp("api_stores_pca_drift")),
            n_probe=10, pretransform="pca",
        )
        before = self._rows(
            eng.search("dup spark vector", mode="semantic", limit=10)
        )
        out = eng.refresh_serving_if_drifted(threshold_psi=-1.0)  # force
        assert out["refreshed"] is True
        assert eng._ann_pretransform is not None
        after = self._rows(
            eng.search("dup spark vector", mode="semantic", limit=10)
        )
        assert after == before

    def test_expanded_search_reads_postings_too(self, engines, spark):
        scan, served = engines
        tags = spark.createDataFrame([("spark",)], ["tag"])
        baskets = spark.createDataFrame([("spark", "dup")], ["tag", "keyword"])
        a = self._rows(scan.search_expanded("spark", tags, baskets, limit=10))
        b = self._rows(served.search_expanded("spark", tags, baskets, limit=10))
        assert a == b
        assert a

    def test_served_queries_hold_indexes_open(
        self, engines, spark, tmp_path_factory
    ):
        # r9: enable_store_serving snapshots each store into a pinned
        # localCheckpoint (the reference daemon holds its indexes open;
        # per-query parquet re-reads cost 13x on indexed grep in the r9
        # serving-latency gate). The proof that serving reads the OPEN
        # snapshot and not the path: delete the on-disk stores after
        # enable, and every served query still answers — identically to
        # the scan engine.
        import shutil

        scan = engines[0]
        base = str(tmp_path_factory.mktemp("open_stores"))
        served = WqmEngine(spark, SF_SMOKE)
        served.enable_store_serving(base, n_probe=10)
        shutil.rmtree(base)
        for mode in ("hybrid", "semantic", "keyword"):
            a = self._rows(scan.search("dup spark vector", mode=mode, limit=10))
            b = self._rows(served.search("dup spark vector", mode=mode, limit=10))
            assert a == b and a, mode
        a = self._rows(scan.grep("dup"))
        b = self._rows(served.grep("dup"))
        assert a == b and a
        # and the served plan scans the snapshot RDDs, never a file path
        plan = (
            served.search("dup spark vector", mode="hybrid", limit=10)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Scan ExistingRDD" in plan
        assert base not in plan


class TestServingRefresh:
    def test_reenable_swaps_snapshots_and_releases_old_pins(
        self, spark, tmp_path_factory
    ):
        # the ann_store_drift refresh playbook's serving swap: re-call
        # enable_store_serving — the stores REBUILD from the corpus, a
        # fresh snapshot generation pins, queries keep answering
        # scan-identically, and the superseded generation's pinned
        # blocks are released (a long-lived engine re-enabling per
        # drift alarm must not leak a snapshot generation each time)
        from workspace_qdrant_mcp_spark import ckpt

        base = str(tmp_path_factory.mktemp("refresh_stores"))
        eng = WqmEngine(spark, SF_SMOKE)
        eng.enable_store_serving(base, n_probe=10)  # all cells: exact
        pins1 = set(eng._snapshot_pins)
        before = sorted(map(tuple, eng.grep("dup").collect()))
        assert before and pins1
        assert pins1 <= ckpt._PINNED

        eng.enable_store_serving(base, n_probe=10)
        pins2 = set(eng._snapshot_pins)
        # a fresh generation pinned; the old one fully un-pinned and no
        # longer persisted in the JVM
        assert pins2 and pins2.isdisjoint(pins1)
        assert not (pins1 & ckpt._PINNED)
        assert not (pins1 & ckpt.persistent_ids(spark))
        # serving stays correct off the new snapshots
        assert sorted(map(tuple, eng.grep("dup").collect())) == before
        scan = WqmEngine(spark, SF_SMOKE)
        a = sorted(map(tuple,
                       scan.search("dup spark vector", limit=10).collect()))
        b = sorted(map(tuple,
                       eng.search("dup spark vector", limit=10).collect()))
        assert a == b and a


class TestDriftRefreshLifecycle:
    def test_drift_triggers_refresh_and_recall_recovers(
        self, spark, tmp_path_factory
    ):
        # VERDICT r9 #5: the monitor and the swap, WIRED — a long-lived
        # engine drives drift -> rebuild -> re-snapshot -> recall floor,
        # with constant pin count across N cycles (the leak test).
        from pyspark.sql import functions as F

        from workspace_qdrant_mcp_spark import ckpt

        base = str(tmp_path_factory.mktemp("drift_refresh"))
        eng = WqmEngine(spark, SF_SMOKE)
        eng.enable_store_serving(base, n_probe=10)  # all cells: exact

        # calm corpus: the monitor stays quiet and nothing rebuilds
        r0 = eng.refresh_serving_if_drifted()
        assert not r0["refreshed"] and r0["psi"] <= 0.2
        assert r0["n_ref"] == r0["n_cur"]

        # corpus drifts: a third of the chunks' dense vectors shift by
        # +8.0 per dimension (the ann_store_drift query's shift — it
        # collapses the drifted third into its dominant cell)
        drifted_chunks = ckpt.pin(
            spark,
            lambda: eng.chunks.withColumn(
                "dense",
                F.when(
                    F.crc32(F.col("point_id")) % 3 == 0,
                    F.transform("dense", lambda x: x + F.lit(8.0)),
                ).otherwise(F.col("dense")),
            ).localCheckpoint(),
        )
        eng._chunks = drifted_chunks

        gens = [set(eng._snapshot_pins)]
        reports = []
        for _ in range(3):
            reports.append(eng.refresh_serving_if_drifted())
            gens.append(set(eng._snapshot_pins))
        # cycle 1 trips and rebuilds; the rebuilt store matches the new
        # corpus so cycles 2..N stay quiet — the monitor CONVERGES
        assert reports[0]["drifted"] and reports[0]["refreshed"]
        for r in reports[1:]:
            assert not r["refreshed"] and r["psi"] <= 0.2
        # no leak across refresh cycles: every superseded snapshot
        # generation of THIS engine fully releases (scoped to the
        # engine's own block ids — a global pin count races with other
        # engines' ContextCleaner GC), while the live generation stays
        # pinned and persisted. release() is non-blocking: poll.
        import time as _time

        current = gens[-1]
        superseded = set().union(*gens[:-1]) - current
        assert superseded, "the refresh never swapped a generation"
        for _ in range(50):
            if not (superseded & ckpt.persistent_ids(spark)):
                break
            _time.sleep(0.1)
        assert not (superseded & ckpt.persistent_ids(spark))
        assert not (superseded & ckpt._PINNED)
        assert current <= ckpt.persistent_ids(spark)
        assert current <= ckpt._PINNED

        # recall floor: after the refresh, serving off the rebuilt
        # store equals the scan path over the SAME drifted corpus,
        # row-for-row (n_probe covers all cells -> exactness contract)
        scan = WqmEngine(spark, SF_SMOKE)
        scan._chunks = drifted_chunks
        for mode in ("hybrid", "semantic", "keyword"):
            a = sorted(map(tuple, scan.search(
                "dup spark vector", mode=mode, limit=10).collect()))
            b = sorted(map(tuple, eng.search(
                "dup spark vector", mode=mode, limit=10).collect()))
            assert a == b and a, mode


class TestGrepIndexed:
    """r8 T3 upgrade: exact grep off the maintained trigram index must
    equal the full scan (lossless prefilter), the maintained index must
    equal a rebuild after churn, and non-qualifying queries must take
    the scan arm unchanged."""

    def _lines(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, line_number int, content string"
        )

    def test_indexed_equals_scan_including_substrings(self, spark):
        from workspace_qdrant_mcp_spark.operators import grep as g

        rows = [
            (0, 1, "plain dup here"),
            (0, 2, "nothing"),
            (1, 1, "embedded dedup word"),     # 'dup' inside a word
            (2, 1, "DUP uppercase only"),      # must NOT match (case)
            (3, 1, "du p split"),              # must NOT match
        ]
        lines = self._lines(spark, rows)
        idx = g.build_gram_index(lines)
        got = sorted(
            map(tuple, g.grep_exact_indexed(lines, idx, "dup").collect())
        )
        want = sorted(map(tuple, g.grep_exact(lines, "dup").collect()))
        assert got == want
        assert {(r[0]) for r in got} == {0, 1}

    def test_uppercase_pattern_indexed_equals_scan(self, spark):
        # the r8 ADVICE regression: the gram index is LOWERCASED
        # (char_shingles folds case), so raw mixed-case pattern grams
        # matched nothing and the indexed path silently dropped every
        # hit; folding the pattern grams makes candidates a case-
        # insensitive superset and the instr verify restores exactness
        from workspace_qdrant_mcp_spark.operators import grep as g

        rows = [
            (0, 1, "ab ABBA dup"),
            (1, 1, "abba lowercase only"),   # must NOT match (case)
            (2, 1, "Abba mixed"),            # must NOT match (case)
            (3, 1, "nothing here"),
        ]
        lines = self._lines(spark, rows)
        idx = g.build_gram_index(lines)
        got = sorted(
            map(tuple, g.grep_exact_indexed(lines, idx, "ABBA").collect())
        )
        want = sorted(map(tuple, g.grep_exact(lines, "ABBA").collect()))
        assert got == want
        assert {r[0] for r in got} == {0}

    def test_id_pushdown_arm_equals_semi_join(self, spark):
        # r9 third arm of the cost-based switch: selective patterns
        # collect the bounded candidate-id list and push it into the
        # line scan as an IN literal (the reference's fetch-by-rowid);
        # over-cap and zero-candidate cases must behave identically to
        # the semi-join arm
        from workspace_qdrant_mcp_spark.operators import grep as g

        rows = [
            (0, 1, "plain dup here"),
            (1, 1, "embedded dedup word"),
            (2, 1, "nothing"),
            (3, 1, "du p split"),
        ]
        lines = self._lines(spark, rows)
        idx = g.build_gram_index(lines)
        want = sorted(map(tuple, g.grep_exact(lines, "dup").collect()))
        for cap in (1, 2, 10_000):  # 1 = over-cap fallback (2 candidates)
            got = sorted(map(tuple, g.grep_exact_indexed(
                lines, idx, "dup", id_pushdown=cap).collect()))
            assert got == want, cap
        # zero candidates: empty result, schema preserved
        none = g.grep_exact_indexed(lines, idx, "zzz", id_pushdown=100)
        assert none.count() == 0
        assert none.columns == lines.columns

    def test_switch_arms_fall_back_to_scan(self, spark):
        from workspace_qdrant_mcp_spark.operators import grep as g

        lines = self._lines(spark, [(0, 1, "ab ABBA dup")])
        idx = g.build_gram_index(lines)
        # short literal (< n): scan arm
        short = g.grep_exact_indexed(lines, idx, "ab")
        assert [r["doc_id"] for r in short.collect()] == [0]
        # case-insensitive: scan arm (the raw-gram index cannot serve it)
        ci = g.grep_exact_indexed(lines, idx, "abba", case_insensitive=True)
        assert [r["doc_id"] for r in ci.collect()] == [0]

    def test_regex_gram_extraction_is_conservative(self):
        # the Cox trigram-query extraction: required AND-of-OR-of-AND
        # only — anything it cannot PROVE required must vanish
        from workspace_qdrant_mcp_spark.operators.grep import (
            regex_gram_groups as gg,
        )

        assert gg("dup") == [[["dup"]]]
        assert gg("sc[ae]n") == [[["can", "sca"], ["cen", "sce"]]]
        assert gg("foo.*bar") == [[["foo"]], [["bar"]]]
        assert gg("ab+cde") == [[["cde"]]]       # quantified atom dropped
        assert gg("colou?r") == [[["col", "olo"]]]
        assert gg("ABBA") == [[["abb", "bba"]]]  # folded for the index
        # groups/alternation can hide optionality -> no pruning at all
        assert gg("(abc)?x") is None
        assert gg("a|bcd") is None
        # unenumerable classes break runs but literal flanks survive
        assert gg("abc[defghijklm]nop") == [[["abc"]], [["nop"]]]
        assert gg("[a-z]{3}") is None
        assert gg("ab") is None                  # too short to gram
        # class SHORTHANDS are not literals: [\d] must break, never
        # require the gram 'adb' (the r9 lossless-contract bug)
        assert gg(r"a[\d]b") is None
        assert gg(r"abc[\d]def") == [[["abc"]], [["def"]]]
        assert gg(r"abc[\w][\s]xyz") == [[["abc"]], [["xyz"]]]
        # escaped punctuation inside a class IS a literal member
        assert gg(r"x[\.]yz") == [[[".yz", "x.y"]]]

    def test_regex_indexed_equals_scan(self, spark):
        from workspace_qdrant_mcp_spark.operators import grep as g

        rows = [
            (0, 1, "the scan begins"),
            (1, 1, "a scen e"),          # 'scen' present as substring
            (2, 1, "no match at all"),
            (3, 1, "SCAN uppercase"),    # rlike is case-sensitive: no hit
            (4, 1, "rescanning twice"),
            (5, 1, "foo then bar here"),
            (6, 1, "foo without the rest"),
        ]
        lines = self._lines(spark, rows)
        idx = g.build_gram_index(lines)
        for pat, hits in (
            ("sc[ae]n", {0, 1, 4}),
            ("foo.*bar", {5}),
            ("sc[ae]n|foo", {0, 1, 4, 5, 6}),  # alternation -> scan arm
            ("zzz+", set()),
            (r"scan[\s]b", {0}),  # [\d]-class bug: shorthand must break,
            (r"f[\w]o", {5, 6}),  # not enumerate as a literal char
        ):
            for cap in (0, 10_000, 1):
                got = sorted(map(tuple, g.grep_regex_indexed(
                    lines, idx, pat, id_pushdown=cap).collect()))
                want = sorted(map(tuple, g.grep_regex(lines, pat).collect()))
                assert got == want, (pat, cap)
            assert {r[0] for r in got} == hits, pat

    def test_gram_store_incremental_equals_rebuild(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from workspace_qdrant_mcp_spark.operators import grep as g

        path = str(tmp_path / "grams")
        l1 = self._lines(spark, [(0, 1, "alpha dup"), (1, 1, "beta")])
        l2 = self._lines(spark, [(2, 1, "gamma dup")])
        l1b = self._lines(spark, [(0, 1, "alpha CHANGED")])
        g.update_gram_index(spark, path, changed_lines=l1)
        g.update_gram_index(spark, path, changed_lines=l2)
        g.update_gram_index(spark, path, changed_lines=l1b)     # re-ingest 0
        g.update_gram_index(
            spark, path,
            deleted_ids=spark.createDataFrame([(1,)], "doc_id long"),
        )
        current = l1b.unionByName(l2)
        want = sorted(map(tuple, g.build_gram_index(current).collect()))
        got = sorted(map(tuple, g.read_gram_index(spark, path).collect()))
        assert got == want
        # and serving off the maintained store equals the scan
        res = sorted(map(tuple, g.grep_exact_indexed(
            current, g.read_gram_index(spark, path), "dup").collect()))
        assert res == sorted(map(tuple, g.grep_exact(current, "dup").collect()))
        assert res  # doc 2 still matches after the churn


class TestGrepStoreServing:
    def test_engine_grep_served_off_gram_index_matches_scan(
        self, spark, tmp_path_factory
    ):
        scan = WqmEngine(spark, SF_SMOKE)
        served = WqmEngine(spark, SF_SMOKE)
        served.enable_store_serving(
            str(tmp_path_factory.mktemp("grep_stores"))
        )
        for kw in (
            dict(),
            dict(tenant="src3"),
            dict(path_glob="src/src3/*.txt", context=1),
        ):
            a = sorted(map(tuple, scan.grep("dup", **kw).collect()))
            b = sorted(map(tuple, served.grep("dup", **kw).collect()))
            assert a == b, kw
            assert a, kw
        # regex serving: prunable patterns take the T2 indexed arm,
        # unprunable ones fall back to the scan — both must equal the
        # scan engine row-for-row
        for pat in ("sc[ae]n", "sc[ae]n|dup"):
            a = sorted(map(tuple, scan.grep(pat, regex=True).collect()))
            b = sorted(map(tuple, served.grep(pat, regex=True).collect()))
            assert a == b and a, pat

    def test_engine_grep_uppercase_pattern_matches_scan(
        self, spark, tmp_path_factory
    ):
        # r8 ADVICE: the serving switch must not alter grep semantics
        # for non-lowercase patterns. The synthetic corpus is all-
        # lowercase, so build a copy with an uppercase marker injected
        # into a few documents — a DISCRIMINATING case: before the
        # pattern-gram case fold, the served path returned zero rows
        # here while the scan path matched.
        import shutil

        from workspace_qdrant_mcp_spark.io import TABLES

        corpus = tmp_path_factory.mktemp("upper_corpus")
        for t in TABLES:
            if t != "documents":
                shutil.copy(f"{SF_SMOKE}/{t}.parquet", corpus / f"{t}.parquet")
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        docs.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 50 == 0,
                F.concat(F.col("text"), F.lit("\nSPARK Marker line")),
            ).otherwise(F.col("text")),
        ).write.mode("overwrite").parquet(str(corpus / "documents.parquet"))

        scan = WqmEngine(spark, str(corpus))
        served = WqmEngine(spark, str(corpus))
        served.enable_store_serving(
            str(tmp_path_factory.mktemp("upper_stores"))
        )
        for pat in ("SPARK Mark", "Marker line"):
            a = sorted(map(tuple, scan.grep(pat).collect()))
            b = sorted(map(tuple, served.grep(pat).collect()))
            assert a == b, pat
            assert a, pat
        # wrong-case query: both paths agree on zero matches
        a = sorted(map(tuple, scan.grep("spark mark").collect()))
        b = sorted(map(tuple, served.grep("spark mark").collect()))
        assert a == b == []


class TestKeysetPaging:
    def test_keyset_pages_equal_offset_pages(self, engine):
        """retrieve_after (the 100 TB keyset arm of S9) walks the same
        deterministic (point_id, collection) order as offset paging —
        every page identical — while each page plans as one filtered
        TakeOrdered of `limit` rows instead of an offset+limit heap."""
        cursor = None
        seen = []
        for pageno in range(4):
            rows = engine.retrieve_after(
                after=cursor, limit=10, tenant="src1"
            ).collect()
            want = engine.retrieve(
                limit=10, offset=10 * pageno, tenant="src1"
            ).collect()
            assert [tuple(r) for r in rows] == [tuple(r) for r in want]
            if not rows:
                break
            seen += [r["point_id"] for r in rows]
            last = rows[-1]
            cursor = (last["point_id"], last["collection"])
        assert len(seen) == len(set(seen)) and seen == sorted(seen)

    def test_keyset_page_is_take_ordered_not_window(self, engine, spark):
        import contextlib
        import io

        df = engine.retrieve_after(after=("p", "c"), limit=10)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().split("\n\n")[0]
        assert "TakeOrderedAndProject" in plan
        assert "Window" not in plan

    def test_retrieve_page_has_more_contract(self, engine):
        """has_more via over-fetch-by-1 (retrieve.rs:286-292 /
        retrieve.ts:261): full pages report has_more until the final
        short (or exactly-full) page, cursors chain without gaps, and
        the concatenation equals one big page."""
        all_rows = engine.retrieve_after(limit=10_000, tenant="src1").collect()
        assert len(all_rows) > 10
        got, cursor, has_more, pages = [], None, True, 0
        while has_more:
            rows, has_more, cursor = engine.retrieve_page(
                after=cursor, limit=7, tenant="src1"
            )
            got += rows
            pages += 1
            assert len(rows) <= 7
            if has_more:
                assert len(rows) == 7 and cursor is not None
            else:
                assert cursor is None
        assert [tuple(r) for r in got] == [tuple(r) for r in all_rows]
        assert pages == -(-len(all_rows) // 7) or pages == len(all_rows) // 7 + 1

    def test_paging_edges(self, engine):
        """Bound-first paging edge cases: offset at/beyond the match
        count returns empty (not an error), a cursor past the last key
        returns empty, and limit larger than the set returns everything
        exactly once."""
        all_rows = engine.retrieve_after(limit=10_000, tenant="src1").collect()
        n = len(all_rows)
        assert engine.retrieve(limit=10, offset=n, tenant="src1").collect() == []
        assert (
            engine.retrieve(limit=10, offset=n + 50, tenant="src1").collect()
            == []
        )
        last = all_rows[-1]
        assert (
            engine.retrieve_after(
                after=(last["point_id"], last["collection"]),
                limit=10,
                tenant="src1",
            ).collect()
            == []
        )
        big = engine.retrieve(limit=n + 99, offset=0, tenant="src1").collect()
        assert [tuple(r) for r in big] == [tuple(r) for r in all_rows]

    def test_negative_offset_or_limit_fails_loud(self, engine):
        """Fail-loud discipline: a negative offset would silently shrink
        the TakeOrdered bound under the r12 bound-first paging plan —
        reject it at entry instead."""
        import pytest

        with pytest.raises(ValueError, match="offset/limit"):
            engine.retrieve(limit=10, offset=-5)
        with pytest.raises(ValueError, match="offset/limit"):
            engine.retrieve(limit=-1, offset=0)
        with pytest.raises(ValueError, match="limit must be"):
            engine.retrieve_after(limit=-1)

    def test_retrieve_page_zero_limit_fails_loud(self, engine):
        """ADVICE r12: retrieve_page(limit=0) used to return ([], True,
        None) — has_more with a None cursor breaks the chaining contract
        (cursor is None only on the last page); now rejected at entry."""
        import pytest

        with pytest.raises(ValueError, match="limit must be"):
            engine.retrieve_page(limit=0, tenant="src1")
        with pytest.raises(ValueError, match="limit must be"):
            engine.retrieve_page(limit=-3, tenant="src1")

    def test_offset_paging_matches_python_slice(self, engine):
        """Direct model check for the bound-first offset paging: every
        (offset, limit) page equals the Python slice of the full
        (point_id, collection)-ordered result."""
        full = [
            tuple(r)
            for r in engine.retrieve_after(limit=100_000, tenant="src0").collect()
        ]
        n = len(full)
        assert n > 30
        for off, lim in [(0, 1), (3, 7), (10, 25), (n - 1, 10), (0, n + 5)]:
            page = [
                tuple(r)
                for r in engine.retrieve(
                    limit=lim, offset=off, tenant="src0"
                ).collect()
            ]
            assert page == full[off:off + lim], (off, lim)
