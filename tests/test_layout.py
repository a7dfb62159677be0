"""Z-order layout: key determinism, locality of range partitions, and
the multi-column pruning win over single-column layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from workspace_qdrant_mcp_spark.operators import layout
from tests.conftest import SF_CORRECT


def _spans(spark, df, col_x, col_y, n_parts):
    keyed = layout.zorder_keys(df, col_x, col_y).repartitionByRange(
        n_parts, "zkey"
    )
    part = keyed.withColumn("pid", F.spark_partition_id())
    return (
        part.groupBy("pid")
        .agg(
            (F.max(col_x) - F.min(col_x)).alias("sx"),
            (F.max(col_y) - F.min(col_y)).alias("sy"),
            F.min(col_x).alias("lox"),
            F.max(col_x).alias("hix"),
            F.min(col_y).alias("loy"),
            F.max(col_y).alias("hiy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )


def test_zorder_partitions_are_local_in_both_dims(spark):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "value", "user_id"
    )
    stats = ev.agg(
        (F.max("value") - F.min("value")).alias("gx"),
        (F.max("user_id") - F.min("user_id")).alias("gy"),
    ).collect()[0]
    rows = _spans(spark, ev, "value", "user_id", 16)
    nonempty = [r for r in rows if r["n"] > 0]
    assert len(nonempty) >= 8
    # each z-partition covers a small rectangle: the MEAN per-partition
    # span must be well under the global span in BOTH dimensions (a
    # single-column range layout achieves this in one dim only)
    mean_sx = sum(r["sx"] for r in nonempty) / len(nonempty)
    mean_sy = sum(r["sy"] for r in nonempty) / len(nonempty)
    assert mean_sx < 0.45 * stats["gx"]
    assert mean_sy < 0.45 * stats["gy"]


def test_zorder_prunes_on_both_columns(spark):
    # zone-map pruning simulation: count partitions whose [min,max]
    # intersects a 25%-MASS predicate (bottom quartile by rows — range
    # framing would be meaningless on the skewed `value` column, where
    # a quarter of the RANGE holds most of the rows) — on EACH column,
    # a z-order layout must let a good fraction of partitions be
    # skipped, where a single-column layout prunes one dim only
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "value", "user_id"
    )
    g = ev.agg(
        F.min("value").alias("vlo"),
        F.expr("percentile(value, 0.25)").alias("vq"),
        F.min("user_id").alias("ulo"),
        F.expr("percentile(user_id, 0.25)").alias("uq"),
    ).collect()[0]
    rows = [r for r in _spans(spark, ev, "value", "user_id", 16) if r["n"] > 0]
    touch_v = sum(1 for r in rows if r["lox"] <= g["vq"] and r["hix"] >= g["vlo"])
    touch_u = sum(1 for r in rows if r["loy"] <= g["uq"] and r["hiy"] >= g["ulo"])
    assert touch_v <= len(rows) * 0.75
    assert touch_u <= len(rows) * 0.75


def test_zorder_key_interleave_exact(spark):
    # hand-checked Morton values on a tiny frame
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["k"]
        for r in df.select(
            "x", "y",
            layout.zorder_key(
                F.col("x").cast("long"), F.col("y").cast("long"), bits=4
            ).alias("k"),
        ).collect()
    }
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 3): 14}


def test_cluster_by_zorder_preserves_rows(spark):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "value", "user_id"
    )
    out = layout.cluster_by_zorder(ev, "value", "user_id", n_partitions=8)
    assert out.columns == ["event_id", "value", "user_id"]
    assert out.count() == ev.count()
    assert out.select(F.sum("event_id")).collect()[0][0] == \
        ev.select(F.sum("event_id")).collect()[0][0]


def test_zorder_unknown_mode_raises(spark):
    import pytest

    ev = load_table(spark, SF_CORRECT, "events")
    with pytest.raises(ValueError, match="zorder_keys"):
        layout.zorder_keys(ev, "value", "user_id", mode="quantile")
