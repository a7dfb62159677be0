"""Adversarial cross-engine tokenizer parity: the Spark tokenizer and the
DuckDB oracle fragment must produce identical token streams on hostile
inputs (quotes, escapes, unicode, junk patterns) — this is the primitive
every BM25/sparse oracle depends on."""

from __future__ import annotations

import duckdb
import pandas as pd

from workspace_qdrant_mcp_spark.functions.text import (
    duckdb_tokenize_sql,
    tokenize_bm25,
)
from pyspark.sql import functions as F

ADVERSARIAL = [
    "",
    "   ",
    "a",
    "ab",
    "Hello, World!",
    "it's a \"quoted\" string",
    "back\\slash and for/ward",
    "deadbeefcafe1234",            # hex hash -> junk
    "v1.2.3 and 2.0 and v10",      # versions split on '.'
    "0xff 0XFF 0x1a2b3c",          # hex literals (case matters)
    "12345 00 9",                  # pure digits -> junk
    "__dunder__ --flag -x- /cmd/", # trim -_/ at both ends
    "tabs\tand\nnewlines\r\nhere",
    "(parens){braces}[brackets]<angles>",
    "semi;colon:comma,dot.quote'tick`tilde~",
    "at@hash#dollar$percent%caret^amp&star*plus+eq=pipe|",
    "snake_case_stays mixedCASE",
    "a-b-c a_b_c a/b/c",
    "ümlaut café naïve",           # non-ascii letters pass through
    "é ü a ab",                    # single multibyte char: 2 BYTES → kept
                                   # (Rust s.len(); 'a' 1 byte → dropped)
    "ends-with-dash- -starts",
    "x" * 500,
    ("word " * 50).strip(),
]


def test_tokenizer_identical_across_engines(spark):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], ["id", "text"]
    )
    spark_toks = {
        r["id"]: list(r["toks"])
        for r in sdf.select("id", tokenize_bm25(F.col("text")).alias("toks")).collect()
    }
    con = duckdb.connect()
    try:
        pdf = pd.DataFrame({"id": range(len(ADVERSARIAL)), "text": ADVERSARIAL})
        con.register("t", pdf)
        duck_toks = {
            i: list(toks)
            for i, toks in con.execute(
                f"SELECT id, {duckdb_tokenize_sql('text')} FROM t"
            ).fetchall()
        }
    finally:
        con.close()
    for i, text in enumerate(ADVERSARIAL):
        assert spark_toks[i] == duck_toks[i], (
            f"tokenizer divergence on {text!r}: "
            f"spark={spark_toks[i]} duckdb={duck_toks[i]}"
        )


def test_reference_tokenizer_semantics(spark):
    """Spot values pinned to bm25.rs:16-54 behavior."""
    cases = {
        "Hello, World!": ["hello", "world"],
        "v1.2.3": ["v1"],                      # '.' splits; '2','3' are digits/len-1
        "deadbeefcafe1234": [],                # hex hash
        "some/path here": ["here"],            # path-like token dropped
        "__init__ --x": ["init"],              # trims -_/ then len>1
        "0xff notjunk0x": ["notjunk0x"],       # hex literal exact-match only
    }
    sdf = spark.createDataFrame(list(cases.items()), ["text", "want"])
    got = {
        r["text"]: list(r["toks"])
        for r in sdf.select("text", tokenize_bm25(F.col("text")).alias("toks")).collect()
    }
    for text, want in cases.items():
        assert got[text] == want, f"{text!r}: {got[text]} != {want}"
