"""Data-layout operators: Z-order (Morton) clustering for multi-column
scan pruning.

Parquet pruning is min/max-zone based: a file (or row group) is skipped
when the predicate's range misses the file's [min, max] on the filtered
column. Range-partitioning by ONE column (the store-compaction layout,
operators/graph_store.py / api compaction) gives perfect pruning on that
column and none on any other. Z-ORDER interleaves the bits of several
rank-normalized columns into one key and range-partitions by it, so each
file covers a small HYPER-RECTANGLE of the combined space — every
z-ordered column prunes, each a bit worse than a dedicated sort, which
is the standard lakehouse trade (Delta OPTIMIZE ZORDER BY, Iceberg
sort-order z-order; the curve is public math — Morton 1966).

Scale shape: one agg for the min/max frame (lazy 1-row broadcast, the
repo's standard scalar-attach), one narrow map for the key, one
repartitionByRange(key) = sample + range exchange. No global sort of the
data itself; the sort happens only inside each output partition if the
writer asks for it. The key is deterministic (pure arithmetic of the
column values and the broadcast min/max), so a second engine replays it
bit-for-bit — unlike sample-based ntile normalization, which would make
the oracle depend on Spark's sampler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def _normalize(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map c linearly from [lo, hi] onto the integer grid [0, 2^bits-1].
    Degenerate frames (hi == lo) collapse to 0 — every row lands in one
    cell, which is the correct no-information layout."""
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(
        span > 0, (c.cast("double") - lo.cast("double")) / span
    ).otherwise(F.lit(0.0))
    cell = F.floor(frac * F.lit(float((1 << bits) - 1)) + F.lit(0.5))
    return cell.cast("long")


def zorder_key(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low `bits` bits of two grid coordinates into the
    Morton key: bit i of x lands at 2i, bit i of y at 2i+1. Pure integer
    arithmetic (shift/and/or unrolled per bit) so the DuckDB oracle runs
    the identical expression."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x, i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y, i).bitwiseAND(F.lit(1))
        key = key + F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
    return key


def zorder_keys(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = ZORDER_BITS,
    mode: str = "rank",
) -> DataFrame:
    """df plus (zx, zy, zkey): the grid coordinates and the Morton key
    for (col_x, col_y).

    mode='rank' (default): coordinates from exact percent_rank — the
    grid cells hold equal ROW mass, so a skewed column (most values
    near 0, a long tail) still spreads over the full grid and prunes;
    with min/max scaling a skewed column collapses into a few cells and
    every partition's zone covers the dense end (measured: the events
    `value` column touches 16/16 partitions under minmax, ≤ 70% under
    rank). Ties share a rank, hence a cell — deterministic, and the
    oracle replays it as SQL percent_rank. The global window is a sort
    of the write batch, acceptable at write time; the 100 TB swap is
    approx-quantile boundaries (the sampling Delta's OPTIMIZE ZORDER
    uses), at the cost of oracle-exactness.

    mode='minmax': linear scaling against the min/max frame attached as
    a lazy 1-row broadcast — no sort anywhere, right when the columns
    are known near-uniform."""
    from pyspark.sql.window import Window

    if mode not in ("rank", "minmax"):
        raise ValueError(
            f"zorder_keys: mode={mode!r} is not a thing ('rank' or "
            f"'minmax'); a typo must not silently hand back the "
            f"skew-collapsing minmax layout"
        )
    if mode == "rank":
        scale = F.lit(float((1 << bits) - 1))
        zx = F.floor(
            F.percent_rank().over(Window.orderBy(col_x)) * scale + F.lit(0.5)
        ).cast("long")
        zy = F.floor(
            F.percent_rank().over(Window.orderBy(col_y)) * scale + F.lit(0.5)
        ).cast("long")
        return (
            df.withColumn("zx", zx)
            .withColumn("zy", zy)
            .withColumn("zkey", zorder_key(F.col("zx"), F.col("zy"), bits))
        )
    frame = df.agg(
        F.min(col_x).alias("__xlo"),
        F.max(col_x).alias("__xhi"),
        F.min(col_y).alias("__ylo"),
        F.max(col_y).alias("__yhi"),
    )
    withf = df.crossJoin(F.broadcast(frame))
    zx = _normalize(F.col(col_x), F.col("__xlo"), F.col("__xhi"), bits)
    zy = _normalize(F.col(col_y), F.col("__ylo"), F.col("__yhi"), bits)
    return (
        withf.withColumn("zx", zx)
        .withColumn("zy", zy)
        .withColumn("zkey", zorder_key(F.col("zx"), F.col("zy"), bits))
        .drop("__xlo", "__xhi", "__ylo", "__yhi")
    )


def cluster_by_zorder(
    df: DataFrame,
    col_x: str,
    col_y: str,
    n_partitions: int = 16,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Range-partition df by its Morton key — the OPTIMIZE ZORDER BY
    write layout. Each output partition covers a compact z-curve
    segment, i.e. a small hyper-rectangle of (col_x, col_y) space, so
    parquet min/max zones prune on BOTH columns. The locality and
    pruning wins are asserted quantitatively in tests (per-partition
    span vs global span; files touched by a range predicate)."""
    keyed = zorder_keys(df, col_x, col_y, bits)
    return keyed.repartitionByRange(n_partitions, "zkey").drop(
        "zx", "zy", "zkey"
    )
