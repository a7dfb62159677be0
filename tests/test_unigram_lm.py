"""Unigram-LM tokenizer trainer (VERDICT r9 #4): hard-EM with exact
integer-cost Viterbi.

Certifications:
  1. Spark == a straight-Python reference implementing the identical
     spec, EXACTLY (all arithmetic is int64 after the quantized ln), on
     the real sf0.001 corpus AND a tiny constructed corpus.
  2. Viterbi semantics: longer-piece tie-break; words over MAX_WORD are
     excluded from training; application falls back to char count.
  3. EM does real work: a dominant multi-char piece survives pruning
     and starves its own substrings' usage (the piece-competition
     behavior that distinguishes unigram-LM from raw substring counts).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from workspace_qdrant_mcp_spark.operators import unigram_lm as ulm

SF = "/root/testdata/sf0.001"


def _ref_train(texts, rounds=ulm.ROUNDS):
    """Python reference for the full trainer spec (mirrors module doc)."""
    wc = Counter(
        w
        for t in texts
        for w in re.split(r"\s+", t.lower())
        if w and len(w) <= ulm.MAX_WORD
    )
    sub = Counter()
    for w, n in wc.items():
        for i in range(len(w)):
            for j in range(1, min(ulm.MAX_PIECE, len(w) - i) + 1):
                sub[w[i : i + j]] += n
    chars = {p for p in sub if len(p) == 1}
    multi = sorted(
        (p for p in sub if len(p) > 1), key=lambda p: (-sub[p], p)
    )[: ulm.SEED_MULTI]
    kept = {p: sub[p] for p in chars | set(multi)}

    def costs(cnts):
        tot = sum(cnts.values())
        return {p: round(math.log(tot / c) * 1e6) for p, c in cnts.items()}

    def viterbi(word, cost6):
        L = len(word)
        best = [0] + [None] * L
        back = [0] * (L + 1)
        for i in range(1, L + 1):
            bc, bj = None, 0
            for j in range(1, min(ulm.MAX_PIECE, i) + 1):
                c = cost6.get(word[i - j : i], ulm.BIG)
                tot = best[i - j] + c
                if bc is None or tot < bc or (tot == bc and j > bj):
                    bc, bj = tot, j
            best[i], back[i] = bc, bj
        pieces, i = [], L
        while i > 0:
            j = back[i]
            pieces.append(word[i - j : i])
            i -= j
        return pieces

    for _ in range(rounds):
        cost6 = costs(kept)
        usage = Counter()
        for w, n in wc.items():
            for p in viterbi(w, cost6):
                usage[p] += n
        n_multi = sum(1 for p in kept if len(p) > 1)
        keep_multi = sorted(
            (p for p in kept if len(p) > 1),
            key=lambda p: (-usage.get(p, 0), p),
        )[: max(n_multi - ulm.PRUNE_K, 0)]
        kept = {p: usage.get(p, 0) + 1 for p in chars | set(keep_multi)}
    cost6 = costs(kept)
    return sorted((p, len(p), kept[p], cost6[p]) for p in kept)


def _spark_pieces(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return [
        (r["piece"], r["piece_len"], r["cnt"], r["cost_micro"])
        for r in ulm.unigram_lm_pieces(docs).collect()
    ]


def test_matches_reference_on_corpus(spark):
    from workspace_qdrant_mcp_spark.io import load_table

    docs = load_table(spark, SF, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = [
        (r["piece"], r["piece_len"], r["cnt"], r["cost_micro"])
        for r in ulm.unigram_lm_pieces(docs).collect()
    ]
    assert got == _ref_train(texts)


def test_matches_reference_tiny_corpus(spark):
    rows = [
        (0, "banana bandana cabana"),
        (1, "banana banana band"),
        (2, "an na ban cab " + "x" * 20),   # the x-run exceeds MAX_WORD
    ]
    got = _spark_pieces(spark, rows)
    assert got == _ref_train([t for _, t in rows])
    # the over-length word contributed nothing:
    assert not any("x" in p for p, *_ in got)


def test_viterbi_tiebreak_and_fallback(spark):
    # cost map where 'ab'+'cd' ties 'abcd' exactly -> longer piece wins
    cost = {"a": 4, "b": 4, "c": 4, "d": 4, "ab": 4, "cd": 4, "abcd": 8}
    words = spark.createDataFrame([("abcd", 1)], "word string, n long")
    segs = ulm.ulm_viterbi_pieces(words, cost).collect()
    assert segs[0]["pieces"] == ["abcd"]
    # application: unseen long word falls back to one piece per char
    docs = spark.createDataFrame(
        [(0, "abcd " + "z" * 20)], "doc_id long, text string"
    )
    pieces = spark.createDataFrame(
        [(p, len(p), 1, c) for p, c in cost.items()],
        "piece string, piece_len int, cnt long, cost_micro long",
    )
    out = ulm.ulm_doc_tokens(docs, pieces).collect()
    assert out[0]["n_words"] == 2
    assert out[0]["n_pieces"] == 1 + 20   # 'abcd' + 20 chars fallback


def test_em_piece_competition(spark):
    # 'agg'/'alu'-style: a frequent word's full prefix should win usage
    # while its shadowed sub-pieces starve to the smoothing floor
    rows = [(i, "aggregate value table scan " * 3) for i in range(6)]
    got = _spark_pieces(spark, rows)
    multi = [(p, c) for p, _, c, _ in got if len(p) > 1]
    assert multi, "pruning removed every multi-char piece"
    winners = [p for p, c in multi if c > 1]
    starved = [p for p, c in multi if c == 1]
    assert winners, "no piece accumulated usage"
    assert starved, "EM never starved a shadowed piece"
    # and the final model actually COMPRESSES: every corpus word
    # segments into at most ceil(len/2) pieces under the final costs
    cost6 = {p: cost for p, _, _, cost in got}
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    segs = ulm.ulm_viterbi_pieces(
        ulm.ulm_word_counts(docs), cost6
    ).collect()
    for r in segs:
        assert len(r["pieces"]) <= -(-len(r["word"]) // 2), (
            r["word"], r["pieces"]
        )


def test_fertility_contract(spark):
    from workspace_qdrant_mcp_spark.io import load_table

    docs = load_table(spark, SF, "documents")
    rows = ulm.unigram_fertility(docs).collect()
    assert rows == sorted(rows, key=lambda r: r["source"])
    for r in rows:
        assert r["n_pieces"] >= r["n_words"] > 0
        assert abs(r["fertility"] - r["n_pieces"] / r["n_words"]) < 2e-6
