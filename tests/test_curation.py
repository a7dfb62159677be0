"""Training-data curation: stable splits and benchmark decontamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.operators import curation


class TestSplitAssign:
    def test_partition_is_total_and_stable(self, spark):
        docs = spark.range(2000).select(F.col("id").alias("doc_id"))
        a = curation.split_assign(docs).select("doc_id", "split").collect()
        b = curation.split_assign(docs).select("doc_id", "split").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
        assert len(a) == 2000  # every doc assigned exactly once
        counts: dict[str, int] = {}
        for r in a:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert set(counts) == {"train", "val", "test"}
        # ratios hold to within keyed-hash noise on 2000 draws
        assert abs(counts["train"] / 2000 - 0.8) < 0.05
        assert abs(counts["val"] / 2000 - 0.1) < 0.03
        assert abs(counts["test"] / 2000 - 0.1) < 0.03

    def test_salt_draws_independent_assignment(self, spark):
        docs = spark.range(500).select(F.col("id").alias("doc_id"))
        a = {
            r["doc_id"]: r["split"]
            for r in curation.split_assign(docs).collect()
        }
        b = {
            r["doc_id"]: r["split"]
            for r in curation.split_assign(docs, salt="other|").collect()
        }
        assert a != b  # a different salt reshuffles ...
        assert set(a) == set(b)  # ... but still covers every doc

    def test_assignment_is_a_property_of_the_id(self, spark):
        # the same id must land in the same split regardless of which
        # shard/batch it arrives in (no RNG, no partition dependence)
        full = {
            r["doc_id"]: r["split"]
            for r in curation.split_assign(
                spark.range(100).select(F.col("id").alias("doc_id"))
            ).collect()
        }
        shard = {
            r["doc_id"]: r["split"]
            for r in curation.split_assign(
                spark.range(50, 100).select(F.col("id").alias("doc_id"))
                .repartition(7)
            ).collect()
        }
        assert all(full[k] == v for k, v in shard.items())


class TestDecontaminate:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_planted_overlap_is_flagged(self, spark):
        leak = "alpha beta gamma delta epsilon"  # one 5-gram
        train = self._df(
            spark,
            [
                (1, "clean words only here nothing shared at all"),
                (2, f"prefix {leak} suffix tokens"),
                (3, f"{leak} and then more text follows here"),
            ],
        )
        ev = self._df(spark, [(100, f"the benchmark contains {leak} inside")])
        out = {
            r["doc_id"]: (r["n_shared_grams"], r["n_eval_docs"])
            for r in curation.decontaminate(train, ev, n=5).collect()
        }
        assert set(out) == {2, 3}  # doc 1 is clean
        assert out[2][1] == 1 and out[3][1] == 1
        assert out[2][0] >= 1 and out[3][0] >= 1

    def test_df_cap_drops_boilerplate(self, spark):
        boiler = "this text is auto generated do not edit"
        train = self._df(
            spark, [(i, f"{boiler} body {i}") for i in range(20)]
        )
        ev = self._df(spark, [(100, f"{boiler} eval body")])
        # boilerplate appears in 21 docs; df_cap=10 silences it entirely
        assert curation.decontaminate(train, ev, n=5, df_cap=10).count() == 0
        # with a generous cap every train doc is (correctly) flagged
        assert curation.decontaminate(train, ev, n=5, df_cap=100).count() == 20

    def test_default_is_gpt3_13gram(self, spark):
        # the default collision width is 13 (Brown et al. 2020 app. C):
        # a 12-word shared span must NOT flag, a 13-word span must
        span12 = " ".join(f"w{i}" for i in range(12))
        span13 = " ".join(f"w{i}" for i in range(13))
        ev = self._df(spark, [(100, f"eval holds {span13} verbatim")])
        t12 = self._df(spark, [(1, f"prefix {span12} suffix")])
        t13 = self._df(spark, [(2, f"prefix {span13} suffix")])
        assert curation.decontaminate(t12, ev).count() == 0
        assert curation.decontaminate(t13, ev).count() == 1


class TestStratifiedSample:
    def test_rates_monotone_and_exclusive(self, spark):
        docs = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 4).cast("string")).alias(
                "source"
            ),
        )
        zero = curation.stratified_sample(docs, {"s0": 0.0}, default_rate=1.0)
        assert zero.filter(F.col("source") == "s0").count() == 0
        assert zero.filter(F.col("source") != "s0").count() == 750
        lo = {
            r["doc_id"]
            for r in curation.stratified_sample(
                docs, {}, default_rate=0.3
            ).collect()
        }
        hi = {
            r["doc_id"]
            for r in curation.stratified_sample(
                docs, {}, default_rate=0.6
            ).collect()
        }
        assert lo <= hi  # raising the rate only ADDS documents
        assert abs(len(lo) / 1000 - 0.3) < 0.05
        assert abs(len(hi) / 1000 - 0.6) < 0.05

    def test_sample_independent_of_split(self, spark):
        # mixing and splitting use different salts: the sampled subset's
        # split proportions match the full corpus's (no correlation)
        docs = spark.range(4000).select(F.col("id").alias("doc_id"))
        sampled = curation.stratified_sample(
            docs.withColumn("source", F.lit("s")), {}, default_rate=0.5
        )
        splits = curation.split_assign(sampled).groupBy("split").count()
        counts = {r["split"]: r["count"] for r in splits.collect()}
        total = sum(counts.values())
        assert abs(counts["train"] / total - 0.8) < 0.05


class TestQualityBuckets:
    def test_tertiles_per_source_ordered_by_quality(self, spark):
        rows = [
            (i, " ".join(f"word{j:02d}" for j in range(10 + 5 * i)), "s0")
            for i in range(6)
        ] + [(10, "a b", "s1"), (11, "c d", "s1"), (12, "e f", "s1")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = curation.quality_buckets(docs).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert len(by_src["s0"]) == 6 and len(by_src["s1"]) == 3
        sizes = {}
        for r in by_src["s0"]:
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
        assert sizes == {"head": 2, "middle": 2, "tail": 2}
        head_q = min(r["quality"] for r in by_src["s0"] if r["bucket"] == "head")
        tail_q = max(r["quality"] for r in by_src["s0"] if r["bucket"] == "tail")
        assert head_q >= tail_q
        # each s1 doc in its own tertile
        assert sorted(r["bucket"] for r in by_src["s1"]) == [
            "head",
            "middle",
            "tail",
        ]


class TestCurationFunnel:
    def test_funnel_counts_hand_built(self, spark):
        good = " ".join(f"word{j:02d}" for j in range(60))  # unique grams
        good2 = " ".join(f"item{j:02d}" for j in range(60))
        spammy = " ".join(["spam"] * 60)  # q passes, repetition fails
        rows = [
            (1, good, "a"),   # survives everything (canonical)
            (2, good, "a"),   # exact duplicate of 1 → dropped at dedup
            (3, spammy, "a"),  # dropped at repetition
            (4, "tiny", "a"),  # dropped at quality (word count)
            (5, good2, "a"),   # doc_id % 5 == 0 → PII augmentation hits
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        r = curation.curation_funnel(docs).collect()[0].asDict()
        assert r == {
            "source": "a",
            "n_total": 5,
            "n_quality": 4,
            "n_repetition": 3,
            "n_pii_clean": 2,
            "n_kept": 1,
        }


class TestMixturePlan:
    def test_closed_form_rates(self, spark):
        # source a: 100 tokens, source b: 300 tokens, targets 50/50 →
        # T = min(100/0.5, 300/0.5) = 200 → rate_a = 1.0,
        # rate_b = 0.5*200/300 = 1/3 (the scarce source binds).
        rows = [
            (1, " ".join(["w"] * 40), "a"),
            (2, " ".join(["w"] * 60), "a"),
            (3, " ".join(["w"] * 300), "b"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        out = {
            r["source"]: r.asDict()
            for r in curation.mixture_plan(docs, {"a": 0.5, "b": 0.5}).collect()
        }
        assert out["a"]["n_tokens"] == 100 and out["b"]["n_tokens"] == 300
        assert out["a"]["observed_share"] == 0.25
        assert out["a"]["rate"] == 1.0
        assert out["b"]["rate"] == round(1 / 3, 6)

    def test_rates_feed_stratified_sample(self, spark):
        # the planned rates are valid stratified_sample inputs: all in
        # (0, 1], and the binding source keeps everything
        docs = spark.createDataFrame(
            [(i, "x " * (10 + i % 3), f"s{i % 2}") for i in range(200)],
            "doc_id long, text string, source string",
        )
        plan = curation.mixture_plan(docs, {"s0": 0.7, "s1": 0.3})
        rates = {r["source"]: r["rate"] for r in plan.collect()}
        assert all(0 < r <= 1.0 for r in rates.values())
        assert max(rates.values()) == 1.0
        sampled = curation.stratified_sample(docs, rates)
        assert 0 < sampled.count() <= 200


class TestSessionize:
    def test_gap_splits_sessions_hand_built(self, spark):
        from workspace_qdrant_mcp_spark.operators import sessions

        rows = [
            (1, "2024-01-01T00:00:00", 7, 1.5),
            (2, "2024-01-01T00:10:00", 7, 2.5),   # 10 min gap → same session
            (3, "2024-01-01T07:00:00", 7, 4.0),   # 6h50m gap → new session
            (4, "2024-01-01T03:00:00", 8, 1.0),   # other user
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            (r["user_id"], r["session_idx"]): r.asDict()
            for r in sessions.sessionize(ev, gap_minutes=360).collect()
        }
        assert set(out) == {(7, 1), (7, 2), (8, 1)}
        first = out[(7, 1)]
        assert first["n_events"] == 2
        assert first["duration_sec"] == 600.0
        assert first["total_value"] == 4.0
        assert out[(7, 2)]["n_events"] == 1
        assert out[(7, 2)]["duration_sec"] == 0.0

    def test_exact_gap_boundary_stays_in_session(self, spark):
        from workspace_qdrant_mcp_spark.operators import sessions

        # a gap of EXACTLY gap_minutes does not break the session (> not >=)
        rows = [
            (1, "2024-01-01T00:00:00", 1, 0.0),
            (2, "2024-01-01T06:00:00", 1, 0.0),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = sessions.sessionize(ev, gap_minutes=360).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2


class TestDsirLogweights:
    def test_target_lookalike_scores_above_raw_typical(self, spark):
        # target docs are pure "alpha beta"; raw pool adds "gamma delta"
        # docs. A doc made of target-heavy tokens must out-weigh a doc of
        # pool-only tokens, and every weight is a finite number.
        docs = spark.createDataFrame(
            [
                (1, "alpha beta alpha", "tgt"),
                (2, "alpha beta beta", "tgt"),
                (3, "gamma delta gamma", "other"),
                (4, "alpha beta", "other"),       # looks like target
                (5, "gamma delta delta", "other"),
            ],
            "doc_id long, text string, source string",
        )
        out = {
            r["doc_id"]: r
            for r in curation.dsir_logweights(
                docs, target_value="tgt"
            ).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5}
        assert out[4]["log_w"] > out[3]["log_w"]
        assert out[1]["log_w"] > 0 > out[3]["log_w"]
        assert out[4]["n_tokens"] == 2

    def test_hand_computed_single_token_ratio(self, spark):
        # vocab {a, b}: c_raw = (2, 3), N_raw = 5, c_tgt = (2, 0),
        # N_tgt = 2, V = 2; doc 3 is one "b" ->
        # log_w = ln((0+1)/(2+2)) - ln((3+1)/(5+2)) = ln(1/4) - ln(4/7)
        import math

        docs = spark.createDataFrame(
            [(1, "a a", "tgt"), (2, "b b", "other"), (3, "b", "other")],
            "doc_id long, text string, source string",
        )
        out = {
            r["doc_id"]: r["log_w"]
            for r in curation.dsir_logweights(
                docs, target_value="tgt"
            ).collect()
        }
        assert out[3] == round(math.log(0.25) - math.log(4 / 7), 6)

    def test_zero_token_docs_absent(self, spark):
        docs = spark.createDataFrame(
            [(1, "a", "tgt"), (2, "   ", "other")],
            "doc_id long, text string, source string",
        )
        out = curation.dsir_logweights(docs, target_value="tgt")
        assert [r["doc_id"] for r in out.collect()] == [1]


class TestFunnelAndCohort:
    def _ev(self, spark, rows):
        from pyspark.sql import functions as FF

        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, event_type string"
        ).withColumn("ts", FF.to_timestamp("ts"))

    def test_funnel_enforces_strict_order(self, spark):
        from workspace_qdrant_mcp_spark.operators import sessions

        ev = self._ev(spark, [
            # user 1: full ordered funnel
            (1, 1, "2024-01-01 00:00:01", "view"),
            (2, 1, "2024-01-01 00:00:02", "click"),
            (3, 1, "2024-01-01 00:00:03", "purchase"),
            # user 2: clicked BEFORE viewing -> stalls at view
            (4, 2, "2024-01-01 00:00:01", "click"),
            (5, 2, "2024-01-01 00:00:02", "view"),
            # user 3: view+click only
            (6, 3, "2024-01-01 00:00:01", "view"),
            (7, 3, "2024-01-01 00:00:02", "click"),
            # user 4: purchase without any view -> counts nowhere
            (8, 4, "2024-01-01 00:00:01", "purchase"),
        ])
        out = {
            r["stage"]: r["n_users"]
            for r in sessions.funnel(ev).collect()
        }
        assert out == {"view": 3, "click": 2, "purchase": 1}

    def test_cohort_triangle_hand_built(self, spark):
        from workspace_qdrant_mcp_spark.operators import sessions

        ev = self._ev(spark, [
            (1, 1, "2024-01-01 10:00:00", "view"),   # cohort d0
            (2, 1, "2024-01-02 09:00:00", "view"),   # active d1
            (3, 1, "2024-01-04 09:00:00", "view"),   # active d3
            (4, 2, "2024-01-01 11:00:00", "view"),   # cohort d0
            (5, 3, "2024-01-02 11:00:00", "view"),   # cohort d1 (own day 0)
        ])
        out = {
            (str(r["cohort_day"])[:10], r["day_offset"]): r["n_users"]
            for r in sessions.cohort_retention(ev).collect()
        }
        assert out == {
            ("2024-01-01", 0): 2,
            ("2024-01-01", 1): 1,
            ("2024-01-01", 3): 1,
            ("2024-01-02", 0): 1,
        }


class TestShardAssignment:
    def test_deterministic_and_complete(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = curation.shard_assignment(docs, n_shards=8).collect()
        b = curation.shard_assignment(docs, n_shards=8).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        assert len(a) == docs.count()
        # positions are dense 0..k-1 within each shard
        by_shard = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss))), shard

    def test_token_balance_within_20pct(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = curation.shard_assignment(docs, n_shards=4).collect()
        tok = {}
        for r in rows:
            tok[r["shard"]] = tok.get(r["shard"], 0) + r["n_tokens"]
        mean = sum(tok.values()) / len(tok)
        for shard, t in tok.items():
            assert abs(t - mean) / mean < 0.2, (shard, t, mean)

    def test_assignment_is_exchange_free(self, spark):
        # the shard column itself must come from a pure column
        # expression: no Exchange before the first window (which
        # partitions BY shard — that one shuffle is the per-shard sort)
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = curation.shard_assignment(docs, n_shards=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 2  # window shuffle (+AQE read)


def test_mixture_plan_epochs_bounds_and_binding(spark):
    from workspace_qdrant_mcp_spark.io import load_table
    from workspace_qdrant_mcp_spark.operators import curation
    from tests.conftest import SF_CORRECT

    docs = load_table(spark, SF_CORRECT, "documents")
    targets = {f"src{i}": 1.0 / 20.0 for i in range(20)}
    rows = curation.mixture_plan_epochs(docs, targets, 4.0).collect()
    assert len(rows) == 20
    eps = {r["source"]: r["epochs"] for r in rows}
    # every source within (0, max_epochs]; the scarcest binds AT the cap
    assert all(0 < e <= 4.0 + 1e-9 for e in eps.values())
    assert abs(max(eps.values()) - 4.0) < 1e-6
    # realized token shares equal the targets: epochs_s * tokens_s is
    # proportional to target_s (uniform here -> all equal)
    toks = {r["source"]: r["n_tokens"] for r in rows}
    realized = {s: eps[s] * toks[s] for s in eps}
    lo, hi = min(realized.values()), max(realized.values())
    assert (hi - lo) / hi < 1e-4


class TestTemperatureMixture:
    def _docs(self, spark):
        # src0: 90 tokens across 3 docs; src1: 10 tokens in 1 doc
        rows = [(i, "w " * 30, "src0") for i in range(3)] + [
            (9, "w " * 10, "src1")
        ]
        return spark.createDataFrame(
            [(d, t.strip(), s) for d, t, s in rows],
            "doc_id long, text string, source string",
        )

    def test_alpha_one_is_proportional(self, spark):
        from workspace_qdrant_mcp_spark.operators import curation

        out = {
            r["source"]: r
            for r in curation.temperature_mixture(
                self._docs(spark), alpha=1.0
            ).collect()
        }
        assert out["src0"]["sampled_share"] == out["src0"]["observed_share"] == 0.9
        assert out["src1"]["boost"] == 1.0

    def test_alpha_zero_is_uniform(self, spark):
        from workspace_qdrant_mcp_spark.operators import curation

        out = {
            r["source"]: r["sampled_share"]
            for r in curation.temperature_mixture(
                self._docs(spark), alpha=0.0
            ).collect()
        }
        assert out == {"src0": 0.5, "src1": 0.5}

    def test_alpha_half_flattens_toward_scarce(self, spark):
        from workspace_qdrant_mcp_spark.operators import curation

        out = {
            r["source"]: r
            for r in curation.temperature_mixture(
                self._docs(spark), alpha=0.5
            ).collect()
        }
        # sqrt(0.9)/(sqrt(0.9)+sqrt(0.1)) = 0.75, sqrt(0.1)/... = 0.25
        assert out["src0"]["sampled_share"] == pytest.approx(0.75, abs=1e-6)
        assert out["src1"]["sampled_share"] == pytest.approx(0.25, abs=1e-6)
        assert out["src1"]["boost"] > 1.0 > out["src0"]["boost"]


class TestDoremiWeights:
    def test_monotone_in_excess_and_smoothed(self, spark):
        # the EG step's core contract: weight order follows excess order
        # strictly; every weight respects the eps/K uniform floor and
        # the distribution sums to 1
        from workspace_qdrant_mcp_spark.operators import curation

        rep = "the cat sat on the mat and the cat sat again " * 4
        words = [f"w{i}" for i in range(60)]
        scrambled = " ".join(words)
        mixed = "alpha beta alpha gamma beta alpha delta " * 3
        rows = (
            [(i, rep, "srcA") for i in range(8)]
            + [(100 + i, scrambled, "srcB") for i in range(8)]
            + [(200 + i, mixed, "srcC") for i in range(8)]
        )
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r for r in curation.doremi_weights(docs).collect()}
        assert set(out) == {"srcA", "srcB", "srcC"}
        by_excess = sorted(out, key=lambda s: out[s]["excess_logppl"])
        by_weight = sorted(out, key=lambda s: out[s]["doremi_weight"])
        assert by_excess == by_weight
        excesses = [out[s]["excess_logppl"] for s in by_excess]
        assert len(set(excesses)) == 3  # strictly ordered, not a tie
        tot = sum(r["doremi_weight"] for r in out.values())
        assert abs(tot - 1.0) < 1e-5
        floor = 0.1 / len(out)
        assert all(r["doremi_weight"] >= floor - 1e-9 for r in out.values())

    def test_eta_zero_is_uniform_smoothing_fixed_point(self, spark):
        # with eta = 0 the EG step is a no-op: every source gets exactly
        # (1 - eps)/K + eps/K = 1/K regardless of excess
        from workspace_qdrant_mcp_spark.operators import curation

        rows = [(0, "a b a b a b", "s1"), (1, "c d e f g h", "s2"),
                (2, "x y x y x y", "s3")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = curation.doremi_weights(docs, eta=0.0).collect()
        for r in out:
            assert abs(r["doremi_weight"] - 1 / 3) < 2e-6

    def test_docs_without_bigrams_carry_no_vote(self, spark):
        # single-token docs are absent from the bigram LM -> excluded
        # from the mean (the underlying queries' documented contract)
        from workspace_qdrant_mcp_spark.operators import curation

        rows = [(0, "alpha", "s1"), (1, "a b c d a b", "s1"),
                (2, "p q r s p q", "s2")]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r["n_docs"] for r in
               curation.doremi_weights(docs).collect()}
        assert out == {"s1": 1, "s2": 1}
