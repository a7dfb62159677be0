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


LANG_SNIPPETS = {
    "ada": ("procedure Main is", "Main"),
    "bash": ("deploy() {", "deploy"),
    "c": ("static int add(int a, int b) {", "add"),
    "c-sharp": ("public sealed class Widget", "Widget"),
    "clojure": ("(defn parse-line [s]", "parse-line"),
    "cpp": ("class Vec3 {", "Vec3"),
    "dart": ("class Point {", "Point"),
    "elixir": ("defmodule MyApp.Worker do", "MyApp.Worker"),
    "elm": ("type alias Model =", "Model"),
    "erlang": ("handle_call(Req, From, State) ->", "handle_call"),
    "fortran": ("subroutine solve(n)", "solve"),
    "go": ("func main() {", "main"),
    "haskell": ("data Tree = Leaf | Node Tree Tree", "Tree"),
    "java": ("public final class Parser {", "Parser"),
    "javascript": ("export async function load() {", "load"),
    "julia": ("function step!(state)", "step!"),
    "kotlin": ("data class User(val id: Int)", "User"),
    "lisp": ("(defun walk (tree)", "walk"),
    "lua": ("local function split(s)", "split"),
    "ocaml": ("let rec fold f acc = function", "fold"),
    "odin": ("main :: proc() {", "main"),
    "pascal": ("procedure Swap(var a, b: Integer);", "Swap"),
    "perl": ("sub slurp {", "slurp"),
    "php": ("final class Router {", "Router"),
    "python": ("async def fetch(url):", "fetch"),
    "r": ("normalize <- function(x) {", "normalize"),
    "ruby": ("class Invoice", "Invoice"),
    "rust": ("pub fn run() {}", "run"),
    "scala": ("case class Point(x: Int)", "Point"),
    "scheme": ("(define (square x)", "square"),
    "sql": ("CREATE TABLE users (", "users"),
    "swift": ("public func render() {", "render"),
    "tsx": ("export default function App() {", "App"),
    "typescript": ("export interface Shape {", "Shape"),
    "vala": ("public class Widget : Object {", "Widget"),
    "zig": ("pub fn main() !void {", "main"),
}


def test_every_boundary_pattern_extracts_its_symbol():
    """Pure-regex check over all registry languages: the anchor matches
    its canonical definition line and captures the symbol (Python re is
    RE2/Java-compatible for these constructs)."""
    import re

    from workspace_qdrant_mcp_spark.sources import code_chunker as cc

    assert set(LANG_SNIPPETS) == set(cc.BOUNDARY_PATTERNS)
    for lang, (line, symbol) in LANG_SNIPPETS.items():
        m = re.search(cc.BOUNDARY_PATTERNS[lang], line)
        assert m, f"{lang}: no match on {line!r}"
        assert m.group(1) == symbol, f"{lang}: got {m.group(1)!r}"


def test_extension_routing():
    from workspace_qdrant_mcp_spark.sources import code_chunker as cc

    assert cc.language_for_path("src/a/b.rs") == "rust"
    assert cc.language_for_path("x/y.TSX") == "tsx"
    assert cc.language_for_path("noext") is None
    assert cc.language_for_path("conf.yaml") is None  # text fallback
    for lang in cc.EXTENSION_MAP.values():
        assert lang in cc.BOUNDARY_PATTERNS


def test_multilang_semantic_chunk_on_spark(spark):
    """The Java-regex side agrees for a representative non-default set."""
    for lang in ("java", "ruby", "typescript", "lua", "sql"):
        line, symbol = LANG_SNIPPETS[lang]
        rows = _chunk(spark, line + "\nbody", language=lang)
        assert rows[0]["symbol"] == symbol, lang


NESTED_SRC = """import os

class A:
    x = 1
    def m1(self):
        pass
    class Inner:
        def deep(self):
            return 1
def top():
    return 2
"""


def test_nested_definitions_become_child_chunks(spark):
    """tree_sitter/chunker/strategy.rs:19-56 parity: with nested=True,
    indented def/class lines open their own units, and parent_unit_id
    points at the nearest enclosing (shallower-indent) unit."""
    rows = _chunk(spark, NESTED_SRC, nested=True)
    got = [
        (r["unit_type"], r["symbol"], r["parent_unit_id"]) for r in rows
    ]
    assert got == [
        ("module", "", None),        # import preamble
        ("class", "A", None),        # top level: no parent
        ("function", "m1", 1),       # nested in A (unit 1)
        ("class", "Inner", 1),       # nested in A
        ("function", "deep", 3),     # nested in Inner (unit 3)
        ("function", "top", None),   # back to top level
    ]
    # unit boundaries: each definition line starts its unit
    by_symbol = {r["symbol"]: r for r in rows}
    assert by_symbol["m1"]["start_line"] == 4
    assert by_symbol["Inner"]["start_line"] == 6
    assert by_symbol["deep"]["start_line"] == 7
    assert by_symbol["top"]["start_line"] == 9


def test_nested_flag_off_is_byte_identical_to_flat(spark):
    """semantic_chunks (the oracle-backed driver query) must stay green:
    the default path ignores indented definitions entirely."""
    flat = _chunk(spark, NESTED_SRC)
    assert [(r["unit_type"], r["symbol"]) for r in flat] == [
        ("module", ""), ("class", "A"), ("function", "top"),
    ]
    assert "parent_unit_id" not in flat[0].asDict()


def test_nested_same_indent_siblings_resolve_to_own_parents(spark):
    src = (
        "class A:\n"
        "    def a1(self): pass\n"
        "class B:\n"
        "    def b1(self): pass\n"
    )
    rows = _chunk(spark, src, nested=True)
    got = {r["symbol"]: r["parent_unit_id"] for r in rows}
    assert got == {"A": None, "a1": 1, "B": None, "b1": 3}


def test_brace_mode_nests_unindented_functions(spark):
    """nest_mode='brace': nesting from the running {}-balance, so even
    completely unindented (minified-style) brace code resolves parents."""
    src = (
        "function outer() {\n"
        "let x = 1;\n"
        "function inner() {\n"
        "function deep() {\n"
        "return 1;\n"
        "}\n"
        "}\n"
        "}\n"
        "function next() {\n"
        "}\n"
    )
    df = spark.createDataFrame(
        [("t0", "a.js", src)], ["tenant_id", "file_path", "content"]
    )
    rows = sorted(
        code_chunker.semantic_chunk(
            df, "javascript", nested=True, nest_mode="brace"
        ).collect(),
        key=lambda r: r["chunk_index"],
    )
    got = [(r["symbol"], r["parent_unit_id"]) for r in rows]
    assert got == [
        ("outer", None),   # depth 0
        ("inner", 1),      # depth 1, inside outer
        ("deep", 2),       # depth 2, inside inner
        ("next", None),    # depth 0 again
    ]


def test_brace_mode_indent_equivalence_on_formatted_code(spark):
    """On conventionally-formatted code both depth measures give the same
    parent tree (up to the depth scale)."""
    src = (
        "function a() {\n"
        "    function m1() {\n"
        "        go();\n"
        "    }\n"
        "}\n"
        "function b() {\n"
        "    function m2() {\n"
        "    }\n"
        "}\n"
    )
    df = spark.createDataFrame(
        [("t0", "a.js", src)], ["tenant_id", "file_path", "content"]
    )
    by_mode = {}
    for mode in ("indent", "brace"):
        rows = code_chunker.semantic_chunk(
            df, "javascript", nested=True, nest_mode=mode
        ).collect()
        by_mode[mode] = {
            r["symbol"]: r["parent_unit_id"]
            for r in rows if r["unit_type"] != "module"
        }
    assert by_mode["indent"] == by_mode["brace"] == {
        "a": None, "m1": 1, "b": None, "m2": 3,
    }
