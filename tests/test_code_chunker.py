"""Semantic code chunking fixtures (tree_sitter/chunker analog):
unit-per-definition, module preamble, class typing, no-boundary fallback,
oversized fragmentation with overlap, multi-language anchors."""

from __future__ import annotations

from workspace_qdrant_mcp_spark.sources import code_chunker


def _chunk(spark, content, language="python", **kw):
    df = spark.createDataFrame(
        [("t0", "f.py", content)], ["tenant_id", "file_path", "content"]
    )
    rows = code_chunker.semantic_chunk(df, language, **kw).collect()
    return sorted(rows, key=lambda r: r["chunk_index"])


def test_units_per_definition_with_module_preamble(spark):
    src = "# header\nimport os\ndef a():\n    pass\nclass B:\n    x = 1\ndef c():\n    return 2"
    rows = _chunk(spark, src)
    assert [(r["unit_type"], r["symbol"]) for r in rows] == [
        ("module", ""), ("function", "a"), ("class", "B"), ("function", "c"),
    ]
    assert rows[0]["content"] == "# header\nimport os"
    assert rows[1]["content"] == "def a():\n    pass"
    assert rows[1]["start_line"] == 2 and rows[1]["end_line"] == 3
    # full reconstruction: chunks in order concatenate to the source
    assert "\n".join(r["content"] for r in rows) == src


def test_no_boundary_file_is_one_module_unit(spark):
    rows = _chunk(spark, "just\nplain\ntext")
    assert len(rows) == 1
    assert rows[0]["unit_type"] == "module" and rows[0]["symbol"] == ""


def test_oversized_unit_fragments_with_overlap(spark):
    body = "x" * 250
    rows = _chunk(spark, f"def big():\n    {body}", max_chars=120, overlap=20)
    frags = [r for r in rows if r["symbol"] == "big"]
    assert len(frags) > 1
    assert all(r["unit_index"] == 1 for r in frags)
    # overlap: fragment i+1 starts with the last `overlap` chars of i's window
    full = "def big():\n    " + body
    stride = 120 - 20
    for r in frags:
        assert r["content"] == full[r["fragment_index"] * stride:][:120]


def test_rust_and_go_anchors(spark):
    rust = "pub fn run() {}\nstruct Cfg {}\nimpl Cfg {}"
    rows = _chunk(spark, rust, language="rust")
    assert [(r["unit_type"], r["symbol"]) for r in rows] == [
        ("function", "run"), ("class", "Cfg"), ("class", "Cfg"),
    ]
    go = "func main() {}\ntype Point struct {}"
    rows = _chunk(spark, go, language="go")
    assert [(r["unit_type"], r["symbol"]) for r in rows] == [
        ("function", "main"), ("class", "Point"),
    ]


def test_nested_defs_stay_with_parent(spark):
    src = "def outer():\n    def inner():\n        pass\n    return inner"
    rows = _chunk(spark, src)
    assert len(rows) == 1
    assert rows[0]["symbol"] == "outer"
    assert "inner" in rows[0]["content"]
