"""salted_join: result equality with the plain join, hot-key scatter
balance, and the (key, salt) partitioning actually reaching the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from workspace_qdrant_mcp_spark.operators.skew import salted_join
from tests.conftest import SF_CORRECT
from tests.test_plans import _plan


def _dim(ev):
    return ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_n"))


def test_salted_join_equals_plain_join(spark):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "event_type", "value"
    )
    dim = _dim(ev)
    salted = sorted(
        map(tuple, salted_join(ev, dim, "event_type", n_salts=8)
            .select("event_id", "event_type", "value", "type_n").collect())
    )
    plain = sorted(
        map(tuple, ev.join(dim, "event_type")
            .select("event_id", "event_type", "value", "type_n").collect())
    )
    assert salted == plain


def test_left_join_preserves_unmatched_rows(spark):
    big = spark.createDataFrame(
        [(i, "k" if i % 2 else "orphan") for i in range(100)],
        "id long, key string",
    )
    small = spark.createDataFrame([("k", 1)], "key string, payload int")
    out = salted_join(big, small, "key", n_salts=4, how="left").collect()
    assert len(out) == 100
    assert sum(1 for r in out if r.payload is None) == 50


def test_hot_key_scatters_across_salts(spark):
    # one key owns every row — the straggler case. The salt must spread
    # it: no single (key, salt) bucket holds more than ~2x its fair share.
    n, s = 10_000, 8
    big = spark.createDataFrame(
        [(i, "hot") for i in range(n)], "id long, key string"
    )
    big_s = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in big.columns])),
            F.lit(s),
        ).cast("int"),
    )
    counts = [
        r.cnt
        for r in big_s.groupBy("key", "__salt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    assert len(counts) == s  # every salt bucket populated
    assert max(counts) <= 2 * n // s


def test_salt_reaches_the_join_keys(spark):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "event_type"
    )
    plan = _plan(salted_join(ev, _dim(ev), "event_type", n_salts=8))
    # the pre-join exchange must partition on (key, salt), not key alone
    assert "__salt" in plan


def test_unsupported_how_raises(spark):
    # right/full/right_semi/right_anti would emit each small-side-only
    # row once per salt replica — the guard must refuse them up front.
    import pytest

    big = spark.createDataFrame([(1, "k")], "id long, key string")
    small = spark.createDataFrame([("k", 1)], "key string, payload int")
    for how in ("right", "full", "outer", "right_semi", "right_anti"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "key", n_salts=4, how=how)
    # the safe types still construct (no exception at plan time)
    for how in ("inner", "left", "left_semi", "left_anti"):
        salted_join(big, small, "key", n_salts=4, how=how)


class TestKeySkewReport:
    def test_hand_computed(self, spark):
        from workspace_qdrant_mcp_spark.operators.skew import key_skew_report

        # counts: a=1, b=1, c=2  (sorted asc: a(1),b(1),c(2) -> i=1,2,3)
        # gini = 2*(1*1+2*1+3*2)/(3*4) - 4/3 = 18/12 - 4/3 = 1/6
        df = spark.createDataFrame(
            [("a",), ("b",), ("c",), ("c",)], "k string"
        )
        r = key_skew_report(df, "k").collect()[0]
        assert r["n_keys"] == 3 and r["n_rows"] == 4
        assert r["top_key"] == "c" and r["top_share"] == 0.5
        assert r["gini"] == round(1 / 6, 6)

    def test_uniform_is_zero_hot_is_high(self, spark):
        from workspace_qdrant_mcp_spark.operators.skew import key_skew_report

        uniform = spark.createDataFrame(
            [(f"k{i % 10}",) for i in range(100)], "k string"
        )
        assert key_skew_report(uniform, "k").collect()[0]["gini"] == 0.0
        hot = spark.createDataFrame(
            [("hot",)] * 96 + [(f"k{i}",) for i in range(4)], "k string"
        )
        r = key_skew_report(hot, "k").collect()[0]
        assert r["top_key"] == "hot" and r["top_share"] == 0.96
        assert r["gini"] > 0.7
