"""Checkpoint lifecycle (ckpt.py): rolling release in iterative loops,
pinned session stores surviving the between-queries sweep, and the graph
operators actually running with a bounded persistent-RDD footprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark import ckpt
from workspace_qdrant_mcp_spark.operators import graph


def test_rolling_checkpoint_releases_superseded(spark):
    ckpt.clear_unpinned(spark)
    base = ckpt.persistent_ids(spark)
    roll = ckpt.RollingCheckpoint(spark)
    df = spark.range(100)
    for i in range(6):
        df = roll(df.withColumn("x", F.lit(i)))
    extra = ckpt.persistent_ids(spark) - base
    # only the last generation's blocks remain persisted
    assert len(extra) <= 1, extra
    # and the surviving state is still readable
    assert df.count() == 100
    ckpt.clear_unpinned(spark)


def test_rolling_keep_last_two(spark):
    ckpt.clear_unpinned(spark)
    base = ckpt.persistent_ids(spark)
    roll = ckpt.RollingCheckpoint(spark, keep_last=2)
    df = spark.range(10)
    for i in range(5):
        df = roll(df.withColumn("x", F.lit(i)))
    extra = ckpt.persistent_ids(spark) - base
    assert len(extra) <= 2, extra
    ckpt.clear_unpinned(spark)


def test_clear_unpinned_respects_pins(spark):
    ckpt.clear_unpinned(spark)
    pinned = ckpt.pin(spark, lambda: spark.range(50).localCheckpoint())
    loose = spark.range(25).localCheckpoint()
    assert loose.count() == 25
    released = ckpt.clear_unpinned(spark)
    assert released >= 1
    # pinned store still readable after the sweep (truncated lineage —
    # if its blocks had been released this count would throw)
    assert pinned.count() == 50


def test_pagerank_constant_checkpoint_footprint(spark):
    """A 10-iteration pagerank must not leave 10 generations of rank
    state persisted — only the final state (plus the edge snapshot)."""
    ckpt.clear_unpinned(spark)
    base = ckpt.persistent_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], ["src", "dst"]
    ).withColumn("weight", F.lit(1))
    pr = graph.pagerank(edges, n_iters=10)
    rows = {r["node_id"]: r["rank"] for r in pr.collect()}
    assert set(rows) == {1, 2, 3, 4}
    extra = ckpt.persistent_ids(spark) - base
    # edge snapshot + final rank state (+ possibly the pre-init state
    # released on next roll) — far fewer than the 12 an unrolled loop
    # would have pinned
    assert len(extra) <= 3, extra
    ckpt.clear_unpinned(spark)
    assert not (ckpt.persistent_ids(spark) - base)
