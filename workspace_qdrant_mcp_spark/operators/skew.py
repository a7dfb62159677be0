"""Skew mitigation operators.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits oversized
SORT-MERGE partitions at runtime, but it cannot help when (a) the join
is already a broadcast-hash join of a not-quite-broadcastable side, or
(b) a single key's rows must be processed together downstream (window/
grouped state). Manual SALTING is the standing technique the rest of
this repo's docstrings point at ("salt the key if one user owns the
stream") — this module makes it a real, tested operator instead of a
comment.

salted_join scatters the big side's hot keys across n_salts synthetic
sub-keys and replicates the small side once per salt, so no reducer
ever owns a hot key's entire row set:

  big:   (key, salt = h(row) % n_salts, payload)   — n rows, unchanged
  small: (key, salt = 0..n_salts-1, payload)       — |small| * n_salts
  join on (key, salt)                              — same result set

The small-side replication factor is the price; it is bounded and
explicit (n_salts * |small| rows), which is the whole point: the cost
moves from "one reducer gets 10^9 rows of one key" (a straggler that
stalls the stage at any cluster size) to "every reducer gets 1/n_salts
of them" (linear speedup with n_salts). Result equality with the plain
join is asserted in tests and by the driver oracle (which computes the
plain join in SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.emit import micro6


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big ⋈ small` on `on`, scattered over n_salts sub-keys.

    The big side's salt is a deterministic hash of the whole row (NOT
    monotonically_increasing_id, which changes across task retries and
    would break exactly-once sinks); any roughly-uniform assignment
    works — correctness never depends on the salt, only the balance
    does. The small side is replicated via a broadcast cross join with
    the 0..n_salts-1 range, so the pre-join exchange partitions on
    (key, salt) and a hot key's rows spread over n_salts reducers.

    Only join types that never EMIT small-side-unmatched rows are
    legal: the small side exists n_salts times, so any `how` that
    outputs a small row absent from big (right/full outer, right_semi,
    right_anti) would output it once per salt replica — n_salts copies
    where the plain join yields one. inner/left/left_semi/left_anti/
    cross are safe (each big row carries exactly one salt, so it meets
    exactly one replica of each matching small row). Unsupported types
    raise instead of returning silently wrong counts."""
    allowed = {"inner", "left", "leftouter", "left_outer",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti", "cross"}
    if how.lower().replace(" ", "") not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate small-side-only "
            f"rows once per salt replica; supported: inner/left/"
            f"left_semi/left_anti/cross"
        )
    salts = F.broadcast(
        big.sparkSession.range(n_salts).select(
            F.col("id").cast("int").alias("__salt")
        )
    )
    big_s = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.struct(*[F.col(c) for c in big.columns])),
            F.lit(n_salts),
        ).cast("int"),
    )
    small_s = small.crossJoin(salts)
    return big_s.join(small_s, [on, "__salt"], how).drop("__salt")


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """One row (n_keys, n_rows, top_key, top_share, gini) quantifying
    how skewed a key's distribution is — the DIAGNOSTIC that decides
    whether a join/groupBy on this key needs salted_join, AQE skew
    handling, or nothing: top_share is the straggler bound (the worst
    reducer's fraction of the data under hash partitioning), and the
    Gini coefficient G = (2·Σ i·cᵢ)/(n·Σcᵢ) − (n+1)/n over the
    ascending-sorted per-key counts summarizes the whole curve (0 =
    uniform, →1 = one key owns everything).

    Scale shape: one map-side-combinable count per key, then all math
    happens on the KEY-COUNT table (bounded by key cardinality, tiny
    relative to the data). The rank window is unpartitioned BY DESIGN —
    it orders the bounded key table, never the rows; for a key column
    with billions of distinct values the same report works off any
    count sketch, but then you'd not be considering a salted join."""
    from pyspark.sql.window import Window

    cnt = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy(F.asc("c"), F.asc("key"))
    ranked = cnt.withColumn("i", F.row_number().over(w))
    top = (
        cnt.orderBy(F.desc("c"), F.asc("key"))
        .limit(1)
        .select(F.col("key").alias("top_key"), F.col("c").alias("top_c"))
    )
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.sum(F.col("i") * F.col("c")).alias("s"),
    )
    # top_share/gini emitted in exact integer microunits (functions/
    # emit.py): the inputs are exact integers so the ratio doubles are
    # bit-identical across engines, and the microunit round removes the
    # engine-specific round(x, 6) implementation from the hash path
    # (r8 driver hash-red, bit-exact in repo).
    return agg.crossJoin(F.broadcast(top)).select(
        "n_keys",
        "n_rows",
        "top_key",
        micro6(F.col("top_c").cast("double") / F.col("n_rows")).alias(
            "top_share"
        ),
        micro6(
            (F.lit(2.0) * F.col("s"))
            / (F.col("n_keys").cast("double") * F.col("n_rows"))
            - (F.col("n_keys") + F.lit(1.0)) / F.col("n_keys")
        ).alias("gini"),
    )
