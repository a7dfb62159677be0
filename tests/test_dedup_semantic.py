"""semdedup (SemDeDup, arXiv:2303.09540) and repeated_spans (Lee et al.
2021, arXiv:2107.06499) on hand-built fixtures with known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.operators import dedup


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, lab, [float(x) for x in v]) for i, lab, v in rows],
        "vec_id long, label string, embedding array<float>",
    )


class TestSemDeDup:
    def test_near_twin_drops_for_min_id_exemplar(self, spark):
        # v0/v1 are the centroids (vec_id < n_centroids). v2 is a near
        # twin of v0 (same direction, cosine ~1); v3 sits alone in v1's
        # cluster. with_perturbed_vectors also adds a +2000000 copy of v0.
        emb = _emb(
            spark,
            [
                (0, "a", [1.0, 0.0]),
                (1, "a", [0.0, 1.0]),
                (2, "a", [0.98, 0.001]),
                (3, "a", [0.6, 0.8]),
            ],
        )
        out = dedup.semdedup(emb, n_centroids=2, threshold=0.97)
        rows = {r["vec_id"]: r for r in out.collect()}
        assert set(rows) == {0, 1, 2, 3, 2000000}
        assert rows[0]["is_kept"] and rows[0]["dropped_for"] is None
        assert rows[1]["is_kept"]
        assert rows[3]["is_kept"]
        # both the near twin and the perturbed copy fall to exemplar 0
        assert not rows[2]["is_kept"] and rows[2]["dropped_for"] == 0
        assert (
            not rows[2000000]["is_kept"]
            and rows[2000000]["dropped_for"] == 0
        )

    def test_cross_cluster_twins_survive(self, spark):
        # identical direction but forced into different clusters never
        # pair: blocking is the contract (SemDeDup scans within-cluster
        # only). v2 equals centroid v1's direction -> cluster 1, so it
        # cannot drop for v0 even though cos(v0, v2) < threshold anyway;
        # the assert is that every comparison stayed inside its block.
        emb = _emb(
            spark,
            [
                (0, "a", [1.0, 0.0]),
                (1, "a", [0.0, 1.0]),
                (2, "a", [0.0, 1.0]),
                (3, "a", [1.0, 0.0]),
            ],
        )
        out = dedup.semdedup(emb, n_centroids=2, threshold=0.97)
        rows = {r["vec_id"]: r for r in out.collect()}
        assert rows[2]["cluster_id"] == 1 and rows[2]["dropped_for"] == 1
        assert rows[3]["cluster_id"] == 0 and rows[3]["dropped_for"] == 0

    def test_exactly_one_exemplar_per_near_set(self, spark):
        emb = _emb(
            spark,
            [(i, "a", [1.0, 0.001 * i]) for i in range(5)]
            + [(5, "a", [0.0, 1.0])],
        )
        out = dedup.semdedup(emb, n_centroids=1, threshold=0.97)
        kept = [r["vec_id"] for r in out.filter("is_kept").collect()]
        # vectors 0-4 (+ the 2000000 copy of v0) are one near-set in the
        # single cluster; only min id 0 survives it. v5 is orthogonal.
        assert sorted(kept) == [0, 5]


class TestRepeatedSpans:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_hand_built_fractions(self, spark):
        uniq = "".join(chr(97 + (i * 7) % 26) for i in range(90))
        docs = self._docs(
            spark,
            [
                (1, "a" * 120),   # 3 spans, all identical -> all dup
                (2, uniq),        # 2 spans, unique in corpus
                (3, uniq),        # exact copy of 2 -> both docs all-dup
                (4, "z" * 30),    # shorter than span_len -> 0 spans
            ],
        )
        out = dedup.repeated_spans(docs, span_len=60, stride=30)
        rows = {r["doc_id"]: r for r in out.collect()}
        assert rows[1]["n_spans"] == 3 and rows[1]["dup_frac"] == 1.0
        assert rows[2]["n_spans"] == 2 and rows[2]["dup_frac"] == 1.0
        assert rows[3]["dup_frac"] == 1.0
        assert rows[4]["n_spans"] == 0 and rows[4]["dup_frac"] == 0.0

    def test_unique_corpus_has_zero_dup(self, spark):
        a = "".join(chr(97 + (i * 11) % 26) for i in range(100))
        b = "".join(chr(97 + (i * 5 + 3) % 26) for i in range(100))
        docs = self._docs(spark, [(1, a), (2, b)])
        out = dedup.repeated_spans(docs, span_len=60, stride=30)
        assert out.filter(F.col("n_dup_spans") > 0).count() == 0

    def test_bounds_invariant(self, spark):
        docs = self._docs(
            spark,
            [(i, ("abc" * 50)[: 30 + i * 13]) for i in range(10)],
        )
        out = dedup.repeated_spans(docs, span_len=60, stride=30)
        bad = out.filter(
            (F.col("n_dup_spans") > F.col("n_spans"))
            | (F.col("dup_frac") < 0)
            | (F.col("dup_frac") > 1)
        )
        assert bad.count() == 0
        assert out.count() == 10


class TestCrossSourceOverlap:
    def test_matrix_from_hand_built_pairs(self, spark):
        docs = spark.createDataFrame(
            [(1, "s0"), (2, "s0"), (3, "s1"), (4, "s2")],
            "doc_id long, source string",
        )
        pairs = spark.createDataFrame(
            [
                (1, 2, 0.9),            # s0 x s0
                (1, 3, 0.7),            # s0 x s1
                (3, 2000001, 0.5),      # near-copy of doc 1 -> s0 x s1
                (4, 2000002, 0.6),      # copy of doc 2 -> s0 x s2
            ],
            "id_a long, id_b long, jaccard double",
        )
        out = {
            (r["source_a"], r["source_b"]): (r["n_pairs"], r["avg_jaccard"])
            for r in dedup.cross_source_overlap(docs, pairs).collect()
        }
        assert out == {
            ("s0", "s0"): (1, 0.9),
            ("s0", "s1"): (2, 0.6),
            ("s0", "s2"): (1, 0.6),
        }


class TestNgramStopGramCap:
    """The stop-gram frequency cap in ngram_jaccard_pairs (the 100 TB
    skew mitigation: f docs sharing a gram → f² join rows)."""

    def test_universal_gram_generates_no_pairs(self, spark):
        # every doc shares one boilerplate trigram; tails are unique.
        # Uncapped, the shared gram alone joins all C(n,2) doc pairs;
        # capped, it is dropped and no pair survives.
        docs = spark.createDataFrame(
            [(i, f"shared boiler plate unique{i} tail{i} word{i}") for i in range(8)],
            "doc_id long, text string",
        )
        capped = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0)
        assert capped.count() == 0
        uncapped = dedup.ngram_jaccard_pairs(
            docs, n=3, threshold=0.0, max_df_frac=None
        )
        assert uncapped.count() == 8 * 7 // 2

    def test_jaccard_over_kept_grams(self, spark):
        # two near-identical docs plus boilerplate present in all docs:
        # the capped jaccard is computed over the KEPT gram sets only
        docs = spark.createDataFrame(
            [
                (1, "aa bb cc dd ee"),
                (2, "aa bb cc dd ff"),
                (3, "aa bb cc gg hh"),
                (4, "aa bb cc ii jj"),
                (5, "aa bb cc kk ll"),
            ],
            "doc_id long, text string",
        )
        # "aa bb cc" appears in 5/5 docs -> dropped at max_df_frac=0.5.
        # doc1 kept grams: {bb cc dd, cc dd ee}; doc2: {bb cc dd, cc dd ff}
        # -> intersection 1, union 3, jaccard 1/3
        rows = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(
                docs, n=3, threshold=0.3
            ).collect()
        }
        assert rows == {(1, 2): round(1 / 3, 6)}

    def test_cap_is_plan_side_not_driver(self, spark):
        # assembling the capped plan must launch no Spark jobs (the
        # n_docs denominator is a lazy 1-row broadcast aggregate)
        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
        )
        sc = spark.sparkContext
        group = "ngram-cap-probe"
        sc.setJobGroup(group, "lazy cap")
        try:
            df = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.0)
            assert sc.statusTracker().getJobIdsForGroup(group) == []
            df.collect()
        finally:
            sc.setJobGroup("", "")


class TestSemDeDupKMeansPath:
    def test_survivor_set_insensitive_to_centroid_source(self, spark):
        """SemDeDup's ablation: clustering quality barely matters — the
        blocking only bounds the pair scan. On the synthetic corpus the
        sampled-KMeans centroids and the deterministic vec_id rule must
        keep the SAME survivor set (near-twins always co-cluster)."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        det = {
            r["vec_id"]
            for r in dedup.semdedup(emb, n_centroids=8).collect()
            if r["is_kept"]
        }
        km = {
            r["vec_id"]
            for r in dedup.semdedup(
                emb, n_centroids=8, centroid_mode="kmeans"
            ).collect()
            if r["is_kept"]
        }
        assert det == km

    def test_kmeans_path_is_sampled_and_deterministic(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = dedup.semdedup(
            emb, n_centroids=4, centroid_mode="kmeans", sample_frac=0.5
        ).collect()
        b = dedup.semdedup(
            emb, n_centroids=4, centroid_mode="kmeans", sample_frac=0.5
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_unknown_mode_raises(self, spark):
        import pytest as _pytest

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        with _pytest.raises(ValueError, match="centroid_mode"):
            dedup.semdedup(emb, centroid_mode="nope")


class TestSignatureStore:
    """Maintained minhash signature store: incremental == rebuild (the
    postings-store invariant), and incremental near-dup off the store
    equals the batch path restricted to the new ids."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _canon(self, df):
        return sorted(tuple(r) for r in df.collect())

    def test_update_sequence_equals_rebuild(self, spark, tmp_path):
        p = str(tmp_path / "sigs")
        d1 = self._docs(spark, [(i, f"first wave document {i} " * 8) for i in range(6)])
        dedup.update_signature_store(spark, p, changed_docs=d1)
        # modify doc 2, add docs 6-7, delete doc 4
        d2 = self._docs(
            spark,
            [(2, "changed content entirely " * 8)]
            + [(i, f"second wave document {i} " * 8) for i in (6, 7)],
        )
        dels = spark.createDataFrame([(4,)], "doc_id long")
        dedup.update_signature_store(spark, p, changed_docs=d2, deleted_ids=dels)
        current = (
            d1.filter(~F.col("doc_id").isin(2, 4))
            .unionByName(d2)
        )
        rebuilt = dedup.minhash_signatures(current)
        got = dedup.read_signature_store(spark, p)
        assert self._canon(got) == self._canon(rebuilt)

    def test_incremental_matches_batch_restricted(self, spark, tmp_path):
        p = str(tmp_path / "sigs2")
        base = "the quick brown fox jumps over the lazy dog " * 6
        old = self._docs(
            spark,
            [(1, base), (2, base[:-30] + " tail variation one two")]
            + [(i, f"unrelated filler text number {i} " * 7) for i in (3, 4)],
        )
        dedup.update_signature_store(spark, p, changed_docs=old)
        new = self._docs(spark, [(10, base[:-15] + " slight tail"), (11, "completely new material " * 8)])
        dedup.update_signature_store(spark, p, changed_docs=new)
        corpus = old.unionByName(new)
        new_ids = new.select("doc_id")
        inc = self._canon(
            dedup.incremental_neardup(spark, p, corpus, new_ids)
        )
        full = dedup.minhash_lsh_neardup(corpus)
        restricted = self._canon(
            full.filter(
                F.col("id_a").isin(10, 11) | F.col("id_b").isin(10, 11)
            )
        )
        assert inc == restricted
        assert inc  # the near-twin of doc 1/2 must actually be found

    def test_batch_path_unchanged_by_refactor(self, spark):
        # the shared exact_verify_pairs refactor must keep the batch
        # operator's output identical on the near-copy corpus
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        corpus = dedup.with_near_copies(docs.select("doc_id", "text"))
        out = dedup.minhash_lsh_neardup(corpus)
        assert out.count() > 0
        assert out.filter(F.col("jaccard") < 0.5).count() == 0


class TestPrefixJaccard:
    """prefix_jaccard_pairs: losslessness vs the exhaustive inverted
    index, candidate-pruning effectiveness, and the prefix-length
    bound."""

    def test_matches_exhaustive_path(self, spark):
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_CORRECT

        corpus = dedup.with_near_copies(
            load_table(spark, SF_CORRECT, "documents")
        )
        fast = sorted(
            map(tuple, dedup.prefix_jaccard_pairs(corpus).collect())
        )
        slow = sorted(
            map(
                tuple,
                dedup.ngram_jaccard_pairs(corpus, max_df_frac=None).collect(),
            )
        )
        assert fast == slow and len(fast) > 0

    def test_prefix_prunes_universal_gram_fanout(self, spark):
        # a gram present in EVERY doc never lands in any prefix when
        # rarer grams fill the prefix budget first — the skew the full
        # inverted index needs a df cap for just doesn't join here
        docs = spark.createDataFrame(
            [
                (
                    i,
                    "common one two three "
                    + " ".join(f"u{i}x{j}" for j in range(9)),
                )
                for i in range(20)
            ],
            "doc_id long, text string",
        )
        # every pair shares exactly 2 grams of 11 (J = 0.1 << 0.5)
        out = dedup.prefix_jaccard_pairs(docs, threshold=0.5).collect()
        assert out == []

    def test_catches_known_near_duplicates(self, spark):
        base = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon"
        )
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + " extra"),
                (3, "totally different words everywhere nothing shared "
                    "here at all in this sentence of filler text"),
            ],
            "doc_id long, text string",
        )
        out = dedup.prefix_jaccard_pairs(docs, threshold=0.5).collect()
        assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
        assert out[0].jaccard >= 0.9


class TestQualitySurvivors:
    """quality_survivors: longest-member-wins policy over the same CC
    labels as survivors()."""

    def test_original_beats_truncated_copy(self, spark):
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_CORRECT

        corpus = dedup.with_near_copies(
            load_table(spark, SF_CORRECT, "documents")
        )
        pairs = dedup.ngram_jaccard_pairs(corpus)
        rows = dedup.quality_survivors(corpus, pairs).collect()
        by_comp: dict[int, list] = {}
        for r in rows:
            by_comp.setdefault(r.canonical_id, []).append(r)
        lens = {
            r.doc_id: r.n_chars
            for r in load_table(spark, SF_CORRECT, "documents").collect()
        }
        n_multi = 0
        for comp, members in by_comp.items():
            surv = [r for r in members if r.is_survivor]
            assert len(surv) == 1  # exactly one per component
            if len(members) > 1:
                n_multi += 1
                # the truncated near-copy (id >= offset) must NOT survive
                # when its full-length original is in the same component
                ids = {r.doc_id for r in members}
                orig = {i for i in ids if i < dedup.NEAR_COPY_OFFSET}
                if orig and surv[0].doc_id >= dedup.NEAR_COPY_OFFSET:
                    raise AssertionError(
                        f"truncated copy survived over original in {comp}"
                    )
        assert n_multi > 0  # the corpus does contain near-dup clusters

    def test_same_components_as_min_id_policy(self, spark):
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_SMOKE

        corpus = dedup.with_near_copies(
            load_table(spark, SF_SMOKE, "documents")
        )
        pairs = dedup.ngram_jaccard_pairs(corpus)
        a = {
            r.doc_id: r.canonical_id
            for r in dedup.survivors(corpus, pairs).collect()
        }
        b = {
            r.doc_id: r.canonical_id
            for r in dedup.quality_survivors(corpus, pairs).collect()
        }
        assert a == b  # only the survivor CHOICE differs, not the labels


class TestMinhashRecallGate:
    """LSH recall GATES (the ANN-recall-gate discipline applied to the
    near-dup funnel): measured against exhaustive char-shingle ground
    truth so a future banding/signature regression fails loudly instead
    of silently dropping borderline pairs. Precision is 1.0 by
    construction (candidates are exact-verified); the gates are on
    RECALL. Thresholds carry slack under the measured values (1.000 at
    J>=0.8, 0.962 at J>=0.5 with 16 hashes / 4 bands — the J=0.5
    detection probability 1-(1-J^4)^4 ~ 0.23 per borderline pair is why
    the lower gate is looser)."""

    def test_recall_floors(self, spark):
        from pyspark.sql import functions as F
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_SMOKE

        corpus = dedup.with_near_copies(
            load_table(spark, SF_SMOKE, "documents")
        )
        ids = corpus.select("doc_id")
        pairs_all = (
            ids.withColumnRenamed("doc_id", "id_a")
            .crossJoin(ids.withColumnRenamed("doc_id", "id_b"))
            .filter(F.col("id_a") < F.col("id_b"))
        )
        lsh = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.minhash_lsh_neardup(corpus).collect()
        }
        truth = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.exact_verify_pairs(
                corpus, pairs_all, threshold=0.5
            ).collect()
        }
        # precision: every LSH pair is a true pair with identical jaccard
        for k, j in lsh.items():
            assert k in truth and truth[k] == j
        t_high = {k for k, j in truth.items() if j >= 0.8}
        t_all = set(truth)
        r_high = len(t_high & set(lsh)) / max(1, len(t_high))
        r_all = len(t_all & set(lsh)) / max(1, len(t_all))
        assert r_high >= 0.95, f"recall@J>=0.8 regressed: {r_high:.3f}"
        assert r_all >= 0.90, f"recall@J>=0.5 regressed: {r_all:.3f}"


class TestContrastivePairs:
    def _emb(self, spark, rows):
        return spark.createDataFrame(
            rows, "vec_id long, label string, embedding array<float>"
        )

    def test_triplets_mined_from_blocks(self, spark):
        from workspace_qdrant_mcp_spark.operators import dedup

        # block A: 0 and 1 near-identical (positive pair), 2 oblique
        # (hard negative band), 3 orthogonal (below neg_lo, excluded)
        rows = [
            (0, "A", [1.0, 0.0, 0.0]),
            (1, "A", [0.999, 0.045, 0.0]),
            (2, "A", [0.7, 0.714, 0.0]),
            (3, "A", [0.0, 0.0, 1.0]),
            (4, "B", [0.0, 1.0, 0.0]),
        ]
        out = dedup.contrastive_pairs(
            self._emb(spark, rows),
            pos_threshold=0.99, neg_lo=0.3, neg_hi=0.9,
        ).collect()
        got = {(r["anchor_id"], r["pos_id"], r["neg_id"]) for r in out}
        assert (0, 1, 2) in got
        # no triplet may cross blocks or use the orthogonal vector
        for r in out:
            assert r["neg_id"] not in (3, 4)
            assert r["neg_cos"] < 0.9
            assert r["pos_cos"] >= 0.99

    def test_anchor_without_inband_negative_is_dropped(self, spark):
        from workspace_qdrant_mcp_spark.operators import dedup

        rows = [
            (0, "A", [1.0, 0.0]),
            (1, "A", [0.999, 0.045]),  # positive for 0, nothing in band
        ]
        out = dedup.contrastive_pairs(
            self._emb(spark, rows),
            pos_threshold=0.99, neg_lo=0.3, neg_hi=0.9,
        ).collect()
        assert out == []

    def test_overlapping_bands_raise(self, spark):
        import pytest

        from workspace_qdrant_mcp_spark.operators import dedup

        with pytest.raises(ValueError, match="neg_hi"):
            dedup.contrastive_pairs(
                self._emb(spark, [(0, "A", [1.0])]),
                pos_threshold=0.7, neg_hi=0.8,
            )


class TestDupSpanRemoval:
    """dedup.dup_span_removal (Lee et al. 2021 §4): remove every
    duplicated window except its canonical occurrence; maximal-span
    merging; trimmed-text reconstruction."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _rows(self, spark, rows, **kw):
        out = dedup.dup_span_removal(self._docs(spark, rows), **kw)
        return {r["doc_id"]: r for r in out.collect()}

    def test_exact_copy_keeps_one_occurrence(self, spark):
        uniq = "".join(chr(97 + (i * 7) % 26) for i in range(120))
        got = self._rows(spark, [(1, uniq), (2, uniq), (3, "z" * 30)])
        # doc 1 is canonical everywhere (lowest doc_id) -> untouched
        assert got[1]["n_spans_removed"] == 0
        assert got[1]["trimmed_text"] == uniq
        # doc 2: all 3 windows marked, they merge into ONE maximal span
        # [1, 120] and the whole text disappears
        assert got[2]["n_spans_removed"] == 1
        assert got[2]["removed_chars"] == 120
        assert got[2]["trimmed_text"] == ""
        # too-short doc: passes through verbatim
        assert got[3]["n_spans_removed"] == 0
        assert got[3]["trimmed_text"] == "z" * 30

    def test_shared_middle_trims_only_the_middle(self, spark):
        # two docs share a 60-char middle; heads/tails are unique.
        shared = "S" * 60
        a_head = "".join(chr(97 + (i * 5) % 26) for i in range(60))
        b_head = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(60))
        a = a_head + shared
        b = b_head + shared
        got = self._rows(spark, [(1, a), (2, b)], span_len=60, stride=60)
        # windows at stride 60: [1-60], [61-120]. The shared window is
        # canonical in doc 1 -> doc 1 untouched; doc 2 loses [61, 120]
        assert got[1]["trimmed_text"] == a
        assert got[2]["n_spans_removed"] == 1
        assert got[2]["removed_chars"] == 60
        assert got[2]["trimmed_text"] == b_head

    def test_adjacent_windows_merge_to_maximal_span(self, spark):
        # doc 2 repeats doc 1's full 150 chars, then adds a unique tail;
        # windows at stride 30 overlap -> they must merge to ONE span
        base = "".join(chr(97 + (i * 3) % 26) for i in range(150))
        tail = "".join(chr(65 + (i * 7) % 26) for i in range(40))
        got = self._rows(spark, [(1, base), (2, base + tail)])
        assert got[1]["n_spans_removed"] == 0
        r2 = got[2]
        assert r2["n_spans_removed"] == 1          # maximal merge
        # marked windows start at 1,31,61,91 (window [91,150] fits);
        # offsets beyond 91 produce windows crossing into the unique
        # tail, so the merged span is [1, 150]
        assert r2["removed_chars"] == 150
        assert r2["trimmed_text"] == tail

    def test_invariants_on_near_copy_corpus(self, spark):
        from workspace_qdrant_mcp_spark.io import load_table

        corpus = dedup.with_near_copies(
            load_table(spark, "/root/testdata/sf0.001", "documents")
        )
        out = dedup.dup_span_removal(corpus)
        n_in = corpus.count()
        assert out.count() == n_in                      # every doc emitted
        joined = out.join(
            corpus.select("doc_id", "text"), "doc_id"
        ).select(
            "doc_id", "removed_chars", "n_spans_removed",
            (F.length("text") - F.length("trimmed_text")).alias("cut"),
        )
        # chars removed from the text == the span ledger, every row
        assert joined.filter(
            F.col("cut") != F.col("removed_chars")
        ).count() == 0
        # the near-copy construction guarantees some removal happens
        assert out.agg(F.sum("n_spans_removed")).collect()[0][0] > 0


    def test_canonical_pick_survives_doc_ids_beyond_2_pow_32(self, spark):
        # VERDICT r11 #5 / ADVICE r11: the earlier packed long key
        # (doc_id*2^31 + off) silently mis-picked the canonical
        # occurrence once doc_id >= 2^32 (key collisions across docs) or
        # for negative ids; min(struct(doc_id, off)) must stay exact.
        uniq = "".join(chr(97 + (i * 7) % 26) for i in range(120))
        big = 2**33 + 5          # would have collided under the packed key
        bigger = 2**34 + 1
        got = self._rows(
            spark, [(big, uniq), (bigger, uniq), (-3, "z" * 30)]
        )
        # lowest doc_id holds the canonical copy -> untouched
        assert got[big]["n_spans_removed"] == 0
        assert got[big]["trimmed_text"] == uniq
        assert got[bigger]["n_spans_removed"] == 1
        assert got[bigger]["trimmed_text"] == ""
        # negative id, too short to window: verbatim pass-through
        assert got[-3]["trimmed_text"] == "z" * 30

    def test_canonical_pick_with_negative_doc_ids(self, spark):
        # negative ids order below positive ones: the canonical copy
        # must sit on the negative id, not wherever the packed key
        # arithmetic happened to land
        uniq = "".join(chr(97 + (i * 11 + 3) % 26) for i in range(120))
        got = self._rows(spark, [(-7, uniq), (4, uniq)])
        assert got[-7]["n_spans_removed"] == 0
        assert got[-7]["trimmed_text"] == uniq
        assert got[4]["n_spans_removed"] == 1
        assert got[4]["trimmed_text"] == ""
