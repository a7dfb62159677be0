"""Graph-expansion fusion fixtures — exact score algebra from
graph_fusion.rs (ALPHA=0.7, bonus 0.1 before scaling, (1-α)·proximity,
caps, falsy candidate filtering)."""

from __future__ import annotations

import pytest

from workspace_qdrant_mcp_spark.operators import graph_fusion as gf


def _result(id_, score, sym="fn_a", ct="function", tenant="t1", path="src/a.rs"):
    return {
        "id": id_, "score": score, "collection": "projects",
        "payload": {
            "chunk_symbol_name": sym, "chunk_chunk_type": ct,
            "tenant_id": tenant, "relative_path": path,
        },
    }


class TestCandidates:
    def test_empty_string_fields_are_falsy(self):
        r = _result("a", 1.0, sym="")
        assert gf.collect_candidates([r]) == []

    def test_non_code_chunk_type_skipped(self):
        r = _result("a", 1.0, ct="constant")  # in the WIDE set, not the narrow
        assert gf.collect_candidates([r]) == []

    def test_empty_relative_path_does_not_fall_back(self):
        # nullish-coalesce quirk: present-but-empty relative_path skips the row
        r = _result("a", 1.0)
        r["payload"]["relative_path"] = ""
        r["payload"]["file_path"] = "real/path.rs"
        assert gf.collect_candidates([r]) == []

    def test_missing_relative_path_falls_back_to_file_path(self):
        r = _result("a", 1.0)
        del r["payload"]["relative_path"]
        r["payload"]["file_path"] = "real/path.rs"
        cands = gf.collect_candidates([r])
        assert len(cands) == 1
        assert cands[0]["node_id"] == gf.compute_node_id(
            "t1", "real/path.rs", "fn_a", "function"
        )


class TestFusion:
    def test_alpha_scaling_and_expanded_scores(self):
        seed_id = gf.compute_node_id("t1", "src/a.rs", "fn_a", "function")
        results = [_result("r1", 1.0)]

        def related(tenant, node_id):
            assert node_id == seed_id
            return [
                {"node_id": "n1", "depth": 1, "symbol_name": "b",
                 "symbol_type": "function", "file_path": "f"},
                {"node_id": "n2", "depth": 2, "symbol_name": "c",
                 "symbol_type": "function", "file_path": "f"},
            ]

        out = gf.expand_and_fuse(results, related)
        scores = {r["id"]: r["score"] for r in out}
        assert scores["r1"] == pytest.approx(0.7 * 1.0)
        assert scores["n1"] == pytest.approx(0.3 * 0.8)  # (1-α)·prox(depth1)
        assert scores["n2"] == pytest.approx(0.3 * 0.5)
        assert [r["id"] for r in out] == ["r1", "n1", "n2"]  # sorted desc

    def test_convergence_bonus_applied_before_alpha(self):
        results = [_result("r1", 0.5), _result("r2", 0.4, sym="fn_b")]
        r2_node = gf.compute_node_id("t1", "src/a.rs", "fn_b", "function")

        def related(tenant, node_id):
            # expansion from r1's seed reaches r2 → r2 gets the bonus
            return [{"node_id": "r2", "depth": 1, "symbol_name": "x",
                     "symbol_type": "function", "file_path": "f"}] \
                if node_id != r2_node else []

        out = gf.expand_and_fuse(results, related)
        scores = {r["id"]: r["score"] for r in out}
        assert scores["r2"] == pytest.approx((0.4 + 0.1) * 0.7)  # bonus scaled
        assert scores["r1"] == pytest.approx(0.5 * 0.7)

    def test_caps_per_seed_and_self_skip(self):
        seed_id = gf.compute_node_id("t1", "src/a.rs", "fn_a", "function")
        results = [_result("r1", 1.0)]
        nodes = [{"node_id": seed_id, "depth": 0, "symbol_name": "self",
                  "symbol_type": "function", "file_path": "f"}] + [
            {"node_id": f"n{i}", "depth": 1, "symbol_name": f"s{i}",
             "symbol_type": "function", "file_path": "f"}
            for i in range(10)
        ]
        out = gf.expand_and_fuse(results, lambda t, n: nodes)
        expanded = [r for r in out if r.get("search_type") == "graph"]
        # take(5) applies BEFORE the self-skip → self consumes a slot: 4 added
        assert len(expanded) == 4
        assert {r["id"] for r in expanded} == {"n0", "n1", "n2", "n3"}

    def test_provider_error_swallowed(self):
        results = [_result("r1", 1.0)]

        def boom(t, n):
            raise RuntimeError("daemon down")

        out = gf.expand_and_fuse(results, boom)
        assert [r["id"] for r in out] == ["r1"]
        assert out[0]["score"] == pytest.approx(0.7)


class TestSparkTraversal:
    def test_multi_seed_related(self, spark):
        edges = spark.createDataFrame(
            [("t1", "A", "B", "CALLS"), ("t1", "B", "C", "CALLS"),
             ("t1", "A", "D", "IMPORTS")],  # IMPORTS not in fusion set
            ["tenant_id", "source_node_id", "target_node_id", "edge_type"],
        )
        rel = gf.spark_query_related(edges, [("t1", "A")])
        got = [(n["node_id"], n["depth"]) for n in rel["A"]]
        assert got == [("B", 1), ("C", 2)]  # D excluded (edge type filter)
