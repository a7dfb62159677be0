"""Graph extraction / stub resolution / cross-boundary / graph-context
fixtures (G4, G10, G11, G12, R15, R18)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.api import WqmEngine
from workspace_qdrant_mcp_spark.operators import graph_extract as gx
from tests.conftest import SF_SMOKE

CODE_A = """
def alpha():
    beta()
def beta():
    pass
"""
CODE_B = """
def gamma():
    alpha()
"""
DOC_MD = """# Intro
This explains alpha in detail.
# Other
Nothing relevant here about delta_unknown.
"""


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [("t1", "a.py", CODE_A), ("t1", "b.py", CODE_B)],
        ["tenant_id", "file_path", "content"],
    )


class TestExtraction:
    def test_symbols_and_calls(self, spark, corpus):
        nodes, edges = gx.extract_symbols(corpus)
        names = {r["symbol_name"] for r in nodes.collect()}
        assert names == {"alpha", "beta", "gamma"}
        calls = {
            (r["source_node_id"], r["target_node_id"])
            for r in edges.filter(F.col("edge_type") == "CALLS").collect()
        }
        by_name = {r["symbol_name"]: r["node_id"] for r in nodes.collect()}
        assert (by_name["gamma"], by_name["alpha"]) in calls
        # file A defines alpha+beta and contains 'beta(' → alpha→beta
        assert (by_name["alpha"], by_name["beta"]) in calls

    def test_node_ids_are_sha256_scheme(self, spark, corpus):
        nodes, _ = gx.extract_symbols(corpus)
        import hashlib

        r = nodes.filter(F.col("symbol_name") == "gamma").collect()[0]
        expect = hashlib.sha256(b"t1|b.py|gamma|function").hexdigest()[:16]
        assert r["node_id"] == expect

    def test_narrative_explains_unambiguous_only(self, spark, corpus):
        nodes, _ = gx.extract_symbols(corpus)
        docs = spark.createDataFrame(
            [("t1", "README.md", DOC_MD)], ["tenant_id", "file_path", "content"]
        )
        secs, explains = gx.narrative_sections(docs, nodes)
        assert secs.count() == 2
        ex = explains.collect()
        by_name = {r["symbol_name"]: r["node_id"] for r in nodes.collect()}
        assert len(ex) == 1 and ex[0]["target_node_id"] == by_name["alpha"]


class TestStubResolution:
    def test_same_file_preference_and_prune(self, spark):
        nodes = spark.createDataFrame(
            [("n1", "t1", "foo", "function", "a.py"),
             ("n2", "t1", "foo", "function", "b.py"),
             ("s1", "t1", "foo", "function", ""),
             ("n3", "t1", "bar", "function", "a.py")],
            ["node_id", "tenant_id", "symbol_name", "symbol_type", "file_path"],
        )
        edges = spark.createDataFrame(
            [("e1", "t1", "n3", "s1", "CALLS", "a.py", 1.0)],
            ["edge_id", "tenant_id", "source_node_id", "target_node_id",
             "edge_type", "source_file", "weight"],
        )
        new_nodes, new_edges = gx.resolve_stub_edges(nodes, edges)
        e = new_edges.collect()[0]
        assert e["target_node_id"] == "n1"  # same-file (a.py) definition wins
        assert "s1" not in {r["node_id"] for r in new_nodes.collect()}

    def test_ambiguous_without_same_file_stays_stub(self, spark):
        nodes = spark.createDataFrame(
            [("n1", "t1", "foo", "function", "a.py"),
             ("n2", "t1", "foo", "function", "b.py"),
             ("s1", "t1", "foo", "function", ""),
             ("n3", "t1", "bar", "function", "c.py")],
            ["node_id", "tenant_id", "symbol_name", "symbol_type", "file_path"],
        )
        edges = spark.createDataFrame(
            [("e1", "t1", "n3", "s1", "CALLS", "c.py", 1.0)],
            ["edge_id", "tenant_id", "source_node_id", "target_node_id",
             "edge_type", "source_file", "weight"],
        )
        _, new_edges = gx.resolve_stub_edges(nodes, edges)
        # two candidate defs, neither in c.py → unresolved, stub kept
        assert new_edges.collect()[0]["target_node_id"] == "s1"


class TestCrossBoundary:
    def test_tenant_relaxation_and_confidence(self, spark):
        nodes = spark.createDataFrame(
            [("A", "t1", "a", "function", "a.py"),
             ("B", "__global__", "concept", "concept_node", ""),
             ("C", "libs", "c", "function", "c.py"),
             ("D", "t2", "d", "function", "d.py")],
            ["node_id", "tenant_id", "symbol_name", "symbol_type", "file_path"],
        )
        edges = spark.createDataFrame(
            [("e1", "t1", "A", "B", "COVERS_TOPIC", "a.py", 1.0),
             ("e2", "t1", "B", "C", "IMPLEMENTS_CONCEPT", "", 1.0),
             ("e3", "t1", "A", "D", "CALLS", "a.py", 1.0)],
            ["edge_id", "tenant_id", "source_node_id", "target_node_id",
             "edge_type", "source_file", "weight"],
        )
        out = {
            r["node_id"]: (r["confidence"], r["depth"])
            for r in gx.cross_boundary(
                nodes, edges, "A", "t1", ["libs"], max_hops=2
            ).collect()
        }
        assert out["B"] == (pytest.approx(0.6), 1)   # COVERS_TOPIC base
        assert out["C"] == (pytest.approx(0.7), 2)   # IMPLEMENTS_CONCEPT base
        assert "D" not in out                         # foreign tenant blocked

    def test_hops_clamped(self, spark):
        nodes = spark.createDataFrame(
            [("A", "t1", "a", "f", "x"), ("B", "t1", "b", "f", "x")],
            ["node_id", "tenant_id", "symbol_name", "symbol_type", "file_path"],
        )
        edges = spark.createDataFrame(
            [("e1", "t1", "A", "B", "CALLS", "x", 1.0)],
            ["edge_id", "tenant_id", "source_node_id", "target_node_id",
             "edge_type", "source_file", "weight"],
        )
        out = gx.cross_boundary(nodes, edges, "A", "t1", max_hops=99)
        assert out.count() == 1  # clamped to 3, no crash


class TestGraphContextAndScope:
    def test_attach_graph_context(self, spark, corpus):
        eng = WqmEngine(spark, SF_SMOKE)
        nodes, edges = gx.extract_symbols(corpus)
        by_name = {r["symbol_name"]: r["node_id"] for r in nodes.collect()}
        results = spark.createDataFrame(
            [(by_name["alpha"], 0.9)], ["node_id", "score"]
        )
        out = eng.attach_graph_context(results, nodes, edges).collect()[0]
        assert out["callees"] == ["beta"]
        # file-level call approximation: beta shares alpha's file (where
        # 'alpha(' appears), so both beta and gamma register as callers
        assert out["callers"] == ["beta", "gamma"]

    def test_resolve_scope_longest_prefix(self, spark):
        eng = WqmEngine(spark, SF_SMOKE)
        wf = spark.createDataFrame(
            [("/home/u/proj", "p1"), ("/home/u/proj/sub", "p2"), ("/other", "p3")],
            ["folder", "tenant_id"],
        )
        assert eng.resolve_scope(wf, "/home/u/proj/sub/src") == "p2"
        assert eng.resolve_scope(wf, "/home/u/proj/docs") == "p1"
        assert eng.resolve_scope(wf, "/nowhere") is None  # fail-closed (F-001)


def test_lsp_imports_resolution(spark):
    """lsp_payload.rs add_imports parity: stdlib flag from the frozen
    module list, resolution against the corpus's own file stems."""
    from workspace_qdrant_mcp_spark.operators import lsp_enrich

    docs = spark.createDataFrame(
        [
            ("t0", "app/main.py", "import os\nimport util\nfrom vendor.x import y\nbody()"),
            ("t0", "app/util.py", "import json\ndef helper(): pass"),
        ],
        ["tenant_id", "file_path", "content"],
    )
    rows = {
        (r["file_path"], r["import_name"]): r
        for r in lsp_enrich.extract_imports(docs).collect()
    }
    os_row = rows[("app/main.py", "os")]
    assert os_row["is_stdlib"] and os_row["resolved"]
    assert os_row["target_file"] is None
    util_row = rows[("app/main.py", "util")]
    assert not util_row["is_stdlib"] and util_row["resolved"]
    assert util_row["target_file"] == "app/util.py"
    vendor_row = rows[("app/main.py", "vendor.x")]
    assert not vendor_row["is_stdlib"] and not vendor_row["resolved"]
    json_row = rows[("app/util.py", "json")]
    assert json_row["is_stdlib"] and json_row["resolved"]


def test_lsp_enrichment_reference_cap(spark):
    """references cap at 20 with the uncapped count retained."""
    from workspace_qdrant_mcp_spark.operators import lsp_enrich

    nodes = spark.createDataFrame(
        [("n1", "t0", "target_fn", "function", "lib.py")],
        ["node_id", "tenant_id", "symbol_name", "symbol_type", "file_path"],
    )
    edges = spark.createDataFrame(
        [(f"e{i}", "t0", f"s{i}", "n1", "calls", f"caller_{i:03d}.py", 1.0)
         for i in range(25)],
        ["edge_id", "tenant_id", "source_node_id", "target_node_id",
         "edge_type", "source_file", "weight"],
    )
    row = lsp_enrich.enrich_nodes(nodes, edges).collect()[0]
    assert row["lsp_references_count"] == 25
    assert len(row["lsp_references"].split("|")) == 20
    assert row["lsp_references"].startswith("caller_000.py|caller_001.py")
    assert row["lsp_type_signature"] == "def target_fn()"


class TestGraphStore:
    """S8 maintained graph sink (operators/graph_store): incremental ==
    full rebuild, including the cross-file rewiring case (a definition
    change in one file flips call edges in untouched files)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(
            rows, "tenant_id string, file_path string, content string"
        )

    def _canon(self, df):
        cols = sorted(df.columns)
        return sorted(tuple(r) for r in df.select(*cols).collect())

    def _assert_equals_rebuild(self, spark, store_dir, corpus):
        from workspace_qdrant_mcp_spark.operators import graph_store as gs

        nodes, tokens, edges = gs.read_graph_store(spark, store_dir)
        rn, re_ = gx.extract_symbols(corpus)
        assert self._canon(nodes) == self._canon(rn)
        assert self._canon(tokens) == self._canon(gx.call_tokens(corpus))
        assert self._canon(edges) == self._canon(re_)

    def test_update_sequence_equals_rebuild(self, spark, tmp_path):
        from workspace_qdrant_mcp_spark.operators import graph_store as gs

        store = str(tmp_path / "gstore")
        v1 = self._docs(spark, [
            ("t", "a.py", "def alpha():\n    beta()\n"),
            ("t", "b.py", "def beta():\n    pass\n"),
            ("t", "c.py", "def gamma():\n    delta()\n"),
        ])
        gs.update_graph_store(spark, store, changed_docs=v1)
        self._assert_equals_rebuild(spark, store, v1)

        # modify b.py (beta -> beta2: a.py's beta() call UNRESOLVES —
        # cross-file rewiring), add d.py defining delta (c.py's call
        # RESOLVES — rewiring the other direction), delete nothing
        v2_changed = self._docs(spark, [
            ("t", "b.py", "def beta2():\n    pass\n"),
            ("t", "d.py", "def delta():\n    pass\n"),
        ])
        gs.update_graph_store(spark, store, changed_docs=v2_changed)
        corpus2 = self._docs(spark, [
            ("t", "a.py", "def alpha():\n    beta()\n"),
            ("t", "b.py", "def beta2():\n    pass\n"),
            ("t", "c.py", "def gamma():\n    delta()\n"),
            ("t", "d.py", "def delta():\n    pass\n"),
        ])
        self._assert_equals_rebuild(spark, store, corpus2)
        # the rewiring actually happened: gamma->delta edge now exists
        _, _, edges = gs.read_graph_store(spark, store)
        assert edges.filter(F.col("source_file") == "c.py").count() == 1
        assert edges.filter(F.col("source_file") == "a.py").count() == 0

        # delete d.py: gamma's edge unresolves again
        gs.update_graph_store(
            spark, store,
            deleted_paths=spark.createDataFrame(
                [("t", "d.py")], "tenant_id string, file_path string"
            ),
        )
        corpus3 = corpus2.filter(F.col("file_path") != "d.py")
        self._assert_equals_rebuild(spark, store, corpus3)

    def test_tenant_isolation(self, spark, tmp_path):
        from workspace_qdrant_mcp_spark.operators import graph_store as gs

        store = str(tmp_path / "gstore2")
        v1 = self._docs(spark, [
            ("t1", "a.py", "def foo():\n    bar()\n"),
            ("t1", "b.py", "def bar():\n    pass\n"),
            ("t2", "a.py", "def foo():\n    bar()\n"),
        ])
        gs.update_graph_store(spark, store, changed_docs=v1)
        # t2 has no bar definition: its foo->bar must not resolve into
        # t1's node, before or after an unrelated t1 update
        v2 = self._docs(spark, [("t1", "b.py", "def bar():\n    baz()\n")])
        gs.update_graph_store(spark, store, changed_docs=v2)
        corpus = v1.filter(
            ~((F.col("tenant_id") == "t1") & (F.col("file_path") == "b.py"))
        ).unionByName(v2)
        self._assert_equals_rebuild(spark, store, corpus)
        _, _, edges = gs.read_graph_store(spark, store)
        assert edges.filter(F.col("tenant_id") == "t2").count() == 0
