"""BPE merge-learning tests: the hand-computed merge chain on a tiny
corpus (every argmax and tie-break verified by hand), greedy-merge
string-rewrite semantics, degenerate corpora, and the doc re-tokenize
join. Oracle parity at sf0.001/0.01 runs in test_oracle_parity once the
queries are registered."""

from __future__ import annotations

from workspace_qdrant_mcp_spark.operators import bpe


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBpeMerges:
    def test_hand_computed_merge_chain(self, spark):
        # words: aaab x3, ab x4, banana x1
        # r1: pairs ab:7 (aaab 3 + ab 4), aa:6, an:2, na:2, ba:1 -> (a,b)
        # r2: aaab=[a,a,ab] -> aa:3, a+ab:3 tie -> rhs ASC picks (a,a)
        # r3: aaab=[aa,ab] -> (aa,ab):3 beats an:2
        # r4: aaab exhausted -> banana's (a,n):2
        docs = _docs(spark, [
            (0, "aaab aaab ab"), (1, "aaab banana"), (2, "ab ab ab"),
        ])
        got = [tuple(r) for r in bpe.bpe_merges(docs, n_merges=4).collect()]
        assert got == [
            (1, "a", "b", 7),
            (2, "a", "a", 3),
            (3, "aa", "ab", 3),
            (4, "a", "n", 2),
        ]

    def test_greedy_merge_is_left_to_right_nonoverlapping(self, spark):
        # pair STATS count every adjacent (overlapping) occurrence —
        # the Sennrich get_stats convention: 'aaaa' has 3 (a,a) pairs
        # per word. The MERGE is greedy non-overlapping: [aa][aa], so
        # round 2's best is (aa,aa) and the word becomes one token.
        docs = _docs(spark, [(0, "aaaa aaaa aaaa")])
        got = [tuple(r) for r in bpe.bpe_merges(docs, n_merges=2).collect()]
        assert got == [(1, "a", "a", 9), (2, "aa", "aa", 3)]
        toks = bpe.bpe_doc_tokens(docs, n_merges=2).collect()
        assert [(r["doc_id"], r["n_words"], r["n_bpe_tokens"]) for r in toks] \
            == [(0, 3, 3)]

    def test_odd_run_leaves_singleton(self, spark):
        # 'aaa' under (a,a) -> [aa, a]: the second round's best pair is
        # (aa, a) — greedy did not re-merge across the boundary
        docs = _docs(spark, [(0, "aaa aaa")])
        got = [tuple(r) for r in bpe.bpe_merges(docs, n_merges=2).collect()]
        assert got == [(1, "a", "a", 4), (2, "aa", "a", 2)]

    def test_vocabulary_exhaustion_truncates_output(self, spark):
        # single 2-char word: one merge possible, rounds 2+ emit nothing
        docs = _docs(spark, [(0, "ab ab")])
        got = [tuple(r) for r in bpe.bpe_merges(docs, n_merges=5).collect()]
        assert got == [(1, "a", "b", 2)]

    def test_single_char_corpus_learns_nothing(self, spark):
        docs = _docs(spark, [(0, "a b c a")])
        assert bpe.bpe_merges(docs, n_merges=3).count() == 0
        toks = bpe.bpe_doc_tokens(docs, n_merges=3).collect()
        assert [tuple(r) for r in toks] == [(0, 4, 4)]

    def test_doc_tokens_shrink_monotonically_with_merges(self, spark):
        docs = _docs(spark, [
            (0, "the theme theater"), (1, "the the theory"),
        ])
        n0 = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe.bpe_doc_tokens(docs, n_merges=0).collect()}
        n4 = {r["doc_id"]: r["n_bpe_tokens"]
              for r in bpe.bpe_doc_tokens(docs, n_merges=4).collect()}
        assert all(n4[d] < n0[d] for d in n0)
        # n_merges=0 degenerates to character counts
        assert n0[0] == len("thethemetheater")


class TestPackDocumentsBpe:
    def test_learned_vocab_packing_matches_hand_walk(self, spark):
        from workspace_qdrant_mcp_spark.operators import packing

        # trained on this corpus with 2 merges: (a,b)->ab, then (ab,ab)
        # -> abab; 'abab'=1 token, 'ab'=1, 'cd'=2 (c,d never merge at
        # n_merges=2 since ab pairs dominate), '' doc packs 0
        docs = _docs(spark, [
            (0, "abab abab ab"),   # tokens 1+1+1 = 3
            (1, "cd cd"),         # tokens 2+2 = 4
            (2, ""),              # zero words -> 0 tokens
        ])
        out = {r["doc_id"]: (r["tokens"], r["bin_id"], r["bin_fill"])
               for r in packing.pack_documents_bpe(
                   docs.withColumn(
                       "source", (docs.doc_id % 2).cast("string")
                   ),
                   budget=3, n_merges=2).collect()}
        # source 0: docs 0 (3 tokens) then 2 (0 tokens): bin 0 fills 3
        assert out[0] == (3, 0, 3)
        assert out[2] == (0, 0, 3)
        # source 1: doc 1 alone, 4 tokens > budget -> its own bin 0
        assert out[1] == (4, 0, 4)


class TestBpeFertility:
    def test_fertility_shrinks_with_merges_and_skips_empty(self, spark):
        from workspace_qdrant_mcp_spark.operators import bpe

        docs = spark.createDataFrame(
            [(0, "the the theme", "a"), (1, "xyz", "a"),
             (2, "", "b")],              # source b: all zero-word docs
            "doc_id long, text string, source string",
        )
        f0 = bpe.bpe_fertility(docs, n_merges=0).collect()
        assert [r["source"] for r in f0] == ["a"]   # b absent (no words)
        r0 = f0[0]
        # n_merges=0: every word is characters -> fertility = chars/words
        assert (r0["n_docs"], r0["n_words"], r0["n_bpe_tokens"]) == (2, 4, 14)
        assert r0["fertility"] == 3.5
        f4 = bpe.bpe_fertility(docs, n_merges=4).collect()[0]
        assert f4["fertility"] < r0["fertility"]
        assert f4["n_words"] == 4   # denominators unchanged by merges


class TestWordpieceMerges:
    def test_likelihood_beats_frequency(self, spark):
        # 'er' appears often but e and r also appear APART everywhere;
        # 'qu' is rarer but q NEVER appears without u — WordPiece must
        # pick qu first while BPE (raw frequency) picks er first.
        from workspace_qdrant_mcp_spark.operators import bpe

        rows = [
            (0, "er er er er er er ee rr ee rr ee rr"),
            (1, "qu qu qu er er ee rr ee rr"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        wp = bpe.wordpiece_merges(docs, n_merges=1).collect()
        assert (wp[0]["left_sym"], wp[0]["right_sym"]) == ("q", "u")
        bp = bpe.bpe_merges(docs, n_merges=1).collect()
        assert (bp[0]["left_sym"], bp[0]["right_sym"]) == ("e", "r")

    def test_matches_python_reference(self, spark):
        # straight-Python replay of the spec on a tiny corpus: pair and
        # symbol counts over the word table, score = quantized log
        # microunits, ties pair ASC, literal-replace merge.
        import math
        from collections import Counter

        from workspace_qdrant_mcp_spark.operators import bpe

        rows = [(0, "banana band bandana"), (1, "an na ban banana")]
        texts = [t for _, t in rows]
        wc = Counter(w for t in texts for w in t.lower().split())
        words = {w: list(w) for w in wc}

        def one_round():
            pc, sc = Counter(), Counter()
            for w, syms in words.items():
                for s in syms:
                    sc[s] += wc[w]
                for a, b in zip(syms, syms[1:]):
                    pc[(a, b)] += wc[w]
            scored = {
                p: round(
                    (math.log(c) - math.log(sc[p[0]]) - math.log(sc[p[1]]))
                    * 1e6
                )
                for p, c in pc.items()
            }
            best = min(scored, key=lambda p: (-scored[p], p))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best
                    ):
                        out.append(syms[i] + syms[i + 1])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
            return best, pc[best], scored[best]

        want = []
        for r in range(1, 4):
            b, cnt, sm = one_round()
            want.append((r, b[0], b[1], cnt, sm))

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            tuple(r)
            for r in bpe.wordpiece_merges(docs, n_merges=3).collect()
        ]
        assert got == want
        # and doc tokens reflect the merged symbol counts
        toks = {
            r["doc_id"]: (r["n_words"], r["n_wp_tokens"])
            for r in bpe.wordpiece_doc_tokens(docs, n_merges=3).collect()
        }
        want_toks = {
            i: (
                len(t.split()),
                sum(len(words[w]) for w in t.lower().split()),
            )
            for i, t in rows
        }
        assert toks == want_toks


class TestTokenizerCompare:
    def test_union_matches_standalone_families(self, spark):
        # the compare card must be EXACTLY the three standalone
        # fertility tables under a family tag — no re-derivation drift
        docs = spark.createDataFrame(
            [
                (0, "the cat sat", "s0"),
                (1, "the mat sat", "s0"),
                (2, "quick quack quorum", "s1"),
                (3, "the the the", "s1"),
            ],
            "doc_id long, text string, source string",
        )
        card = {
            (r["source"], r["family"]): (
                r["n_docs"], r["n_words"], r["n_tokens"], r["fertility"]
            )
            for r in bpe.tokenizer_compare(docs, n_merges=3).collect()
        }
        assert sorted({f for _, f in card}) == ["bpe", "unigram",
                                                "wordpiece"]
        from workspace_qdrant_mcp_spark.operators.unigram_lm import (
            unigram_fertility,
        )

        for fam, frame, ncol in [
            ("bpe", bpe.bpe_fertility(docs, n_merges=3), "n_bpe_tokens"),
            ("unigram", unigram_fertility(docs), "n_pieces"),
            ("wordpiece", bpe.wordpiece_fertility(docs, n_merges=3),
             "n_wp_tokens"),
        ]:
            for r in frame.collect():
                assert card[(r["source"], fam)] == (
                    r["n_docs"], r["n_words"], r[ncol], r["fertility"]
                ), (fam, r["source"])

    def test_families_disagree_on_constructed_corpus(self, spark):
        # the split-brain corpus from TestWordpieceMerges: likelihood
        # (WordPiece) and frequency (BPE) pick different first merges,
        # so the learned vocabularies — and the fertility card — differ
        docs = spark.createDataFrame(
            [
                (0, "quiz quit quip quad", "s0"),
                (1, "tata tate tame gate", "s0"),
            ],
            "doc_id long, text string, source string",
        )
        card = {
            (r["family"]): r["n_tokens"]
            for r in bpe.tokenizer_compare(docs, n_merges=2).collect()
        }
        assert card["bpe"] != card["wordpiece"]


class TestTokenStore:
    def test_apply_only_equals_trained_counts(self, spark):
        # doc_token_counts_with(docs, merges trained on docs) must equal
        # bpe_doc_tokens(docs): the trained table's final reprs ARE the
        # seed reprs with the merge rules replayed in order
        from workspace_qdrant_mcp_spark.operators import bpe

        docs = spark.createDataFrame(
            [(0, "banana band bandana"), (1, "an na ban banana scan")],
            "doc_id long, text string",
        )
        merges = bpe.bpe_merges(docs, n_merges=4)
        a = sorted(map(tuple, bpe.bpe_doc_tokens(docs, n_merges=4).collect()))
        b = sorted(map(tuple, bpe.doc_token_counts_with(docs, merges).collect()))
        assert a == b and a

    def test_incremental_equals_rebuild(self, spark, tmp_path):
        # the store invariant over upsert / re-ingest / delete batches,
        # with a FROZEN tokenizer trained on the initial corpus — new
        # batches may contain unseen words (merge replay on the delta
        # vocab still segments them)
        from workspace_qdrant_mcp_spark.operators import bpe

        path = str(tmp_path / "tokens")
        d1 = spark.createDataFrame(
            [(0, "banana band"), (1, "an na ban")], "doc_id long, text string"
        )
        d2 = spark.createDataFrame(
            [(2, "bandana zebra unseen")], "doc_id long, text string"
        )
        d0b = spark.createDataFrame(
            [(0, "banana CHANGED words")], "doc_id long, text string"
        )
        merges = bpe.bpe_merges(d1, n_merges=4).localCheckpoint()

        bpe.update_token_store(spark, path, merges, changed_docs=d1)
        bpe.update_token_store(spark, path, merges, changed_docs=d2)
        bpe.update_token_store(spark, path, merges, changed_docs=d0b)  # re-ingest 0
        bpe.update_token_store(
            spark, path, merges,
            deleted_ids=spark.createDataFrame([(1,)], "doc_id long"),
        )
        current = d0b.unionByName(d2)
        want = sorted(map(tuple,
                          bpe.doc_token_counts_with(current, merges).collect()))
        got = sorted(map(tuple,
                         bpe.read_token_store(spark, path).collect()))
        assert got == want and len(got) == 2

    def test_change_plus_delete_in_one_batch(self, spark, tmp_path):
        # the skeleton's change-wins contract: a doc changed AND deleted
        # in one call ends up per the caller's arguments, never duplicated
        from workspace_qdrant_mcp_spark.operators import bpe

        path = str(tmp_path / "tokens2")
        d1 = spark.createDataFrame(
            [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
        )
        merges = bpe.bpe_merges(d1, n_merges=2).localCheckpoint()
        bpe.update_token_store(spark, path, merges, changed_docs=d1)
        bpe.update_token_store(
            spark, path, merges,
            changed_docs=spark.createDataFrame(
                [(1, "d e f g")], "doc_id long, text string"
            ),
            deleted_ids=spark.createDataFrame([(0,)], "doc_id long"),
        )
        rows = bpe.read_token_store(spark, path).collect()
        assert [(r["doc_id"], r["n_words"]) for r in rows] == [(1, 4)]
