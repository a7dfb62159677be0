"""Deterministic HyperLogLog: accuracy within theory, register
mergeability (the property that makes sketches work distributed), and
the linear-counting small-range correction."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.operators import sketches


def _ids(spark, lo, hi, col="k"):
    return spark.range(lo, hi).select(F.col("id").alias(col))


def test_estimate_within_theoretical_error(spark):
    # 50k distinct — far beyond linear counting; 1.04/sqrt(256) = 6.5%
    # relative standard error, assert within 4 sigma
    n = 50_000
    out = sketches.hll_estimate(_ids(spark, 0, n), "k").collect()[0]
    assert out["exact_distinct"] == n
    rel = abs(out["hll_estimate"] - n) / n
    assert rel < 4 * sketches.hll_error_bound(), rel
    assert out["n_nonzero"] == out["m"]  # every register hit at 50k


def test_small_range_uses_linear_counting(spark):
    out = sketches.hll_estimate(_ids(spark, 0, 30), "k").collect()[0]
    assert out["n_nonzero"] <= 30
    # linear counting at tiny cardinality is very tight
    assert abs(out["hll_estimate"] - 30) < 6


def test_registers_merge_by_max(spark):
    # registers(A ∪ B) == max-merge(registers(A), registers(B)) — the
    # distributed-aggregation contract: partial sketches combine
    # losslessly, which is why ONE groupBy(bucket) scales to 100 TB
    a = _ids(spark, 0, 2_000)
    b = _ids(spark, 1_500, 4_000)
    union = _ids(spark, 0, 4_000)
    ra = {r["bucket"]: r["register"] for r in sketches.hll_registers(a, "k").collect()}
    rb = {r["bucket"]: r["register"] for r in sketches.hll_registers(b, "k").collect()}
    ru = {r["bucket"]: r["register"] for r in sketches.hll_registers(union, "k").collect()}
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru


def test_duplicates_do_not_move_the_estimate(spark):
    base = _ids(spark, 0, 1_000)
    dup = base.unionAll(base).unionAll(base)
    e1 = sketches.hll_estimate(base, "k").collect()[0]["hll_estimate"]
    e3 = sketches.hll_estimate(dup, "k").collect()[0]["hll_estimate"]
    assert e1 == e3


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    # 20 distinct keys into a 4x256 matrix: collisions unlikely, every
    # estimate >= exact always (the CMS guarantee), and most are exact
    df = spark.range(0, 2_000).select(
        (F.col("id") % 20).cast("string").alias("k")
    )
    probes = df.select(F.col("k").alias("key")).distinct()
    out = sketches.cms_point_estimates(df, "k", probes).collect()
    assert len(out) == 20
    assert all(r["cms_estimate"] >= r["exact_count"] for r in out)
    assert all(r["exact_count"] == 100 for r in out)
    exact_hits = sum(1 for r in out if r["cms_estimate"] == r["exact_count"])
    assert exact_hits >= 18  # collisions are the exception, not the rule


def test_cms_absent_key_estimates_small(spark):
    df = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    probes = spark.createDataFrame([("never-seen",)], "key string")
    r = sketches.cms_point_estimates(df, "k", probes).collect()[0]
    assert r["exact_count"] == 0
    # an absent key can only collide into occupied counters; with 100
    # keys over 256 buckets the min over 4 rows is almost surely tiny
    assert r["cms_estimate"] <= 5


def test_kmv_estimate_and_merge_discipline(spark):
    # 10k distinct: estimator within 5/sqrt(k-1) relative error
    n = 10_000
    out = sketches.kmv_distinct_estimate(_ids(spark, 0, n), "k").collect()[0]
    assert out["exact_distinct"] == n
    rel = abs(out["kmv_estimate"] - n) / n
    assert rel < 5 / (64 - 1) ** 0.5, rel
    # min-k merge: sketch(A ∪ B) == bottom-k of sketch(A) ∪ sketch(B)
    a = {r["h"] for r in sketches.kmv_sketch(_ids(spark, 0, 3000), "k").collect()}
    b = {r["h"] for r in sketches.kmv_sketch(_ids(spark, 2000, 6000), "k").collect()}
    u = [r["h"] for r in sketches.kmv_sketch(_ids(spark, 0, 6000), "k").collect()]
    assert sorted(a | b)[:64] == u


def test_kmv_sample_is_a_stable_subset_of_distinct_keys(spark):
    df = _ids(spark, 0, 500)
    s1 = [(r["rank"], r["key"]) for r in sketches.kmv_sketch(df, "k").collect()]
    s2 = [(r["rank"], r["key"]) for r in sketches.kmv_sketch(df.repartition(13), "k").collect()]
    assert s1 == s2  # partitioning-independent
    assert len(s1) == 64 and len({k for _, k in s1}) == 64


class TestBloom:
    def test_no_false_negatives_and_ghosts_flagged(self, spark):
        from workspace_qdrant_mcp_spark.operators import sketches

        df = spark.createDataFrame(
            [(f"u{i}",) for i in range(200)], ["k"]
        )
        probes = spark.createDataFrame(
            [(f"u{i}",) for i in range(0, 200, 20)]
            + [(f"zz{i}",) for i in range(5)],
            ["key"],
        )
        rows = {
            r["key"]: r
            for r in sketches.bloom_membership(df, "k", probes).collect()
        }
        # present_exact => maybe_present (the Bloom guarantee)
        for r in rows.values():
            if r["present_exact"]:
                assert r["maybe_present"]
        assert all(rows[f"u{i}"]["maybe_present"] for i in range(0, 200, 20))
        # density sanity: 200 keys * 4 hashes <= 800 of 1024 bits
        some = next(iter(rows.values()))
        assert 0 < some["n_bits_set"] <= 800
        assert 0 < some["fp_estimate"] < 1

    def test_or_merge_equals_union_build(self, spark):
        from workspace_qdrant_mcp_spark.operators import sketches

        a = spark.createDataFrame([(f"a{i}",) for i in range(50)], ["k"])
        b = spark.createDataFrame([(f"b{i}",) for i in range(50)], ["k"])
        merged = (
            sketches.bloom_bits(a, "k")
            .unionByName(sketches.bloom_bits(b, "k"))
            .distinct()
        )
        direct = sketches.bloom_bits(a.unionByName(b), "k")
        assert sorted(r["bit"] for r in merged.collect()) == sorted(
            r["bit"] for r in direct.collect()
        )


class TestHeavyHitters:
    def test_exact_answer_set_with_skewed_stream(self, spark):
        from workspace_qdrant_mcp_spark.operators import sketches

        # 1000 rows: two heavy keys (300 + 200), the rest a long tail of
        # 100 keys x 5 — with k=4 the threshold is 250, so exactly one
        # key qualifies... make two qualify: threshold n/k = 250 → only
        # 'hot1'(300) passes; k=5 → 200 threshold → hot1 only; use
        # k=4 with hot2=260: total 1000 = 300+260+440 (88 keys x 5)
        rows = (
            [("hot1",)] * 300 + [("hot2",)] * 260
            + [(f"tail{i}",) for i in range(88) for _ in range(5)]
        )
        df = spark.createDataFrame(rows, "user_id string").repartition(8)
        out = sketches.heavy_hitters(df, "user_id", k=4).collect()
        assert [(r["user_id"], r["cnt"]) for r in out] == [
            ("hot1", 300), ("hot2", 260)
        ]

    def test_mg_candidates_are_superset_of_true_heavies(self, spark):
        from workspace_qdrant_mcp_spark.operators import sketches

        rows = [("h",)] * 50 + [(f"t{i % 30}",) for i in range(100)]
        df = spark.createDataFrame(rows, "user_id string").repartition(4)
        cand = {
            r["key"] for r in sketches._mg_summaries(df, "user_id", 5).collect()
        }
        assert "h" in cand  # count 50 > n/(k+1) = 25 → must survive


    def test_null_keys_excluded_from_candidates_and_threshold(self, spark):
        # ADVICE r7 #4: a genuinely heavy null key must not be tracked as
        # the string 'None' (unmatchable by the semi-join) nor inflate
        # the n/k denominator. Nulls are excluded end-to-end: with 400
        # null rows + 300 hot rows + 300 tail, the non-null n is 600 and
        # hot (300) > 600/4 qualifies; counting nulls in n (1000) would
        # still pass here, but the 'None'-literal candidate bug would
        # emit a phantom key — assert exact output.
        from workspace_qdrant_mcp_spark.operators import sketches

        rows = (
            [(None,)] * 400 + [("hot",)] * 300
            + [(f"t{i}", ) for i in range(60) for _ in range(5)]
        )
        df = spark.createDataFrame(rows, "user_id string").repartition(8)
        out = sketches.heavy_hitters(df, "user_id", k=4).collect()
        assert [(r["user_id"], r["cnt"]) for r in out] == [("hot", 300)]

    def test_heavy_null_key_does_not_mask_threshold(self, spark):
        # nulls dominating the input: with nulls IN the denominator the
        # threshold would be 900/3=300 and 'hot' (200) would be missed;
        # excluding them the non-null n is 300, threshold 100, hot passes
        from workspace_qdrant_mcp_spark.operators import sketches

        rows = [(None,)] * 600 + [("hot",)] * 200 + [(f"u{i}",) for i in range(100)]
        df = spark.createDataFrame(rows, "user_id string").repartition(8)
        out = sketches.heavy_hitters(df, "user_id", k=3).collect()
        assert [(r["user_id"], r["cnt"]) for r in out] == [("hot", 200)]


class TestWeightedSample:
    def test_deterministic_and_weight_monotone(self, spark):
        from workspace_qdrant_mcp_spark.operators import curation

        docs = spark.createDataFrame(
            [(i, 10 if i < 50 else 1000) for i in range(100)],
            "doc_id long, n_chars long",
        )
        s1 = curation.weighted_sample(docs, k=20, weight_col="n_chars")
        s2 = curation.weighted_sample(docs, k=20, weight_col="n_chars")
        ids1 = [r["doc_id"] for r in s1.collect()]
        assert ids1 == [r["doc_id"] for r in s2.collect()]  # reproducible
        # heavy rows (100x weight) dominate the draw
        n_heavy = sum(1 for i in ids1 if i >= 50)
        assert n_heavy >= 15


# ---------------------------------------------------------------------------
# histogram_quantiles (mergeable fixed-width histogram estimates)
# ---------------------------------------------------------------------------

def test_histogram_quantiles_error_bound(spark):
    """|estimate - exact type-7 percentile| <= bucket width, per group and
    per prob — the bound that makes the sketch usable as a drop-in for
    the exact path at 100 TB."""
    from workspace_qdrant_mcp_spark.operators.sketches import histogram_quantiles
    from workspace_qdrant_mcp_spark.operators.temporal import value_quantiles
    from workspace_qdrant_mcp_spark.io import load_table
    from tests.conftest import SF_CORRECT

    width = 5.0
    ev = load_table(spark, SF_CORRECT, "events")
    est = {r.event_type: r for r in histogram_quantiles(ev, width=width).collect()}
    exact = {r.event_type: r for r in value_quantiles(ev).collect()}
    assert set(est) == set(exact)
    for g in est:
        for c in ("q5", "q9", "q99"):
            assert abs(est[g][c] - exact[g][c]) <= width, (g, c, est[g][c], exact[g][c])


def test_histogram_quantiles_merge_law(spark):
    """Estimates from the union equal estimates over pre-split halves
    re-aggregated — i.e. the histogram is a true mergeable summary: the
    (group, bucket) counts from disjoint shards add, and the quantile
    read depends only on the merged counts."""
    from workspace_qdrant_mcp_spark.operators.sketches import histogram_quantiles
    from workspace_qdrant_mcp_spark.io import load_table
    from tests.conftest import SF_CORRECT
    from pyspark.sql import functions as F

    ev = load_table(spark, SF_CORRECT, "events")
    whole = histogram_quantiles(ev, width=5.0).collect()
    # shard by an arbitrary hash and union back: same rows, different
    # physical arrangement — estimates must be identical
    a = ev.filter(F.crc32(F.col("event_id").cast("string")) % 2 == 0)
    b = ev.filter(F.crc32(F.col("event_id").cast("string")) % 2 == 1)
    merged = histogram_quantiles(a.unionByName(b), width=5.0).collect()
    key = lambda rows: sorted([tuple(r) for r in rows])
    assert key(whole) == key(merged)


# ---------------------------------------------------------------------------
# hll_estimate_by_group (grouped registers)
# ---------------------------------------------------------------------------

def test_grouped_hll_within_error_bound_per_group(spark):
    from workspace_qdrant_mcp_spark.operators.sketches import (
        hll_error_bound,
        hll_estimate_by_group,
    )
    from workspace_qdrant_mcp_spark.io import load_table
    from tests.conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    rows = hll_estimate_by_group(ev, "user_id", "event_type").collect()
    assert len(rows) == ev.select("event_type").distinct().count()
    tol = 4 * hll_error_bound()  # 4 sigma of 1.04/sqrt(m)
    for r in rows:
        assert abs(r.hll_estimate - r.exact_distinct) <= tol * r.exact_distinct, (
            r.event_type, r.hll_estimate, r.exact_distinct)


def test_grouped_hll_matches_global_on_single_group(spark):
    """Restricting to one group must reproduce the global sketch exactly
    (same registers, same estimate) — the grouped build is the global
    build per partition key, not a different sketch."""
    from pyspark.sql import functions as F
    from workspace_qdrant_mcp_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_by_group,
    )
    from workspace_qdrant_mcp_spark.io import load_table
    from tests.conftest import SF_CORRECT

    ev = load_table(spark, SF_CORRECT, "events")
    one = ev.filter(F.col("event_type") == "click")
    grouped = {
        r.event_type: r
        for r in hll_estimate_by_group(ev, "user_id", "event_type").collect()
    }
    glob = hll_estimate(one, "user_id").collect()[0]
    g = grouped["click"]
    assert (g.m, g.n_nonzero, g.hll_estimate, g.exact_distinct) == (
        glob.m, glob.n_nonzero, glob.hll_estimate, glob.exact_distinct)


class TestBloomPrunedJoin:
    def _dim(self, spark):
        from workspace_qdrant_mcp_spark.io import load_table
        from tests.conftest import SF_CORRECT

        docs = load_table(spark, SF_CORRECT, "documents").select(
            "doc_id", "source", "n_chars"
        )
        dim = (
            load_table(spark, SF_CORRECT, "documents")
            .select(
                "doc_id",
                F.regexp_count(F.col("text"), F.lit("dup")).cast("int").alias("n_dup"),
            )
            .filter(F.col("n_dup") > 0)
        )
        return docs, dim

    def test_equals_plain_join(self, spark):
        from workspace_qdrant_mcp_spark.operators.sketches import bloom_pruned_join

        docs, dim = self._dim(spark)
        got = sorted(map(tuple, bloom_pruned_join(docs, dim, "doc_id").collect()))
        want = sorted(map(tuple, docs.join(dim, "doc_id").collect()))
        assert got == want
        assert len(want) > 0

    def test_lossless_under_collision_pressure(self, spark):
        # m=64 bits for hundreds of keys -> the filter saturates and the
        # pruning passes nearly everything; the JOIN still removes every
        # false positive, so the result is unchanged (the no-false-negative
        # guarantee is what losslessness rests on, not low density).
        from workspace_qdrant_mcp_spark.operators.sketches import bloom_pruned_join

        docs, dim = self._dim(spark)
        got = sorted(
            map(tuple, bloom_pruned_join(docs, dim, "doc_id", m=64).collect())
        )
        want = sorted(map(tuple, docs.join(dim, "doc_id").collect()))
        assert got == want

    def test_semi_join_and_how_guard(self, spark):
        import pytest

        from workspace_qdrant_mcp_spark.operators.sketches import bloom_pruned_join

        docs, dim = self._dim(spark)
        got = sorted(
            r.doc_id
            for r in bloom_pruned_join(docs, dim, "doc_id", how="left_semi").collect()
        )
        want = sorted(r.doc_id for r in docs.join(dim, "doc_id", "left_semi").collect())
        assert got == want
        for how in ("left", "full", "right", "left_anti"):
            with pytest.raises(ValueError, match="bloom_pruned_join"):
                bloom_pruned_join(docs, dim, "doc_id", how=how)

    def test_filter_actually_prunes(self, spark):
        # the broadcast-probe predicate must reject non-member keys
        # BEFORE the join: with the default m, the pruned big side at
        # the filter output is within a few FPs of the true match count.
        from workspace_qdrant_mcp_spark.operators.sketches import (
            BLOOM_K,
            bloom_bits,
        )
        from workspace_qdrant_mcp_spark.functions.hashing import md5_hash64

        docs, dim = self._dim(spark)
        m = 1 << 17
        bits = set(r.bit for r in bloom_bits(dim.select("doc_id"), "doc_id", m).collect())
        probe = docs.select(
            "doc_id",
            *[
                (md5_hash64(F.col("doc_id").cast("string"), salt=f"bloom{j}|") % m).alias(f"h{j}")
                for j in range(BLOOM_K)
            ],
        ).collect()
        n_pass = sum(
            1 for r in probe if all(r[f"h{j}"] in bits for j in range(BLOOM_K))
        )
        n_true = dim.count()
        assert n_true <= n_pass <= n_true + 5

    def test_key_type_mismatch_raises(self, spark):
        # coerce-matched rows would become Bloom false negatives — the
        # guard must refuse mismatched key types up front
        import pytest

        from workspace_qdrant_mcp_spark.operators.sketches import bloom_pruned_join

        big = spark.createDataFrame([(1.0, "x")], "doc_id double, a string")
        small = spark.createDataFrame([(1, 2)], "doc_id int, n int")
        with pytest.raises(ValueError, match="types differ"):
            bloom_pruned_join(big, small, "doc_id")


class TestKmvSetEstimates:
    def test_exact_columns_and_validity_regime(self, spark):
        from workspace_qdrant_mcp_spark.operators.sketches import (
            kmv_set_estimates,
        )

        ka = spark.createDataFrame(
            [(f"a{i}",) for i in range(30)] + [("shared%d" % i,) for i in range(10)],
            "key string",
        )
        kb = spark.createDataFrame(
            [(f"b{i}",) for i in range(20)] + [("shared%d" % i,) for i in range(10)],
            "key string",
        )
        # union = 60 >= k=32 -> one row with exact union/intersection
        rows = kmv_set_estimates(ka, kb, k=32).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["exact_union"] == 60
        assert r["exact_intersection"] == 10
        assert 0.0 <= r["jaccard_estimate"] <= 1.0
        assert r["union_estimate"] > 0
        # under-k union -> empty frame (estimator validity regime)
        assert kmv_set_estimates(ka, kb, k=128).count() == 0

    def test_identical_sets_jaccard_one(self, spark):
        from workspace_qdrant_mcp_spark.operators.sketches import (
            kmv_set_estimates,
        )

        ka = spark.createDataFrame(
            [(f"x{i}",) for i in range(50)], "key string"
        )
        r = kmv_set_estimates(ka, ka, k=16).collect()[0]
        assert r["jaccard_estimate"] == 1.0
        assert r["exact_union"] == r["exact_intersection"] == 50
        assert r["intersection_estimate"] == r["union_estimate"]
