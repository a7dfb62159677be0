"""Deterministic sketch operators.

HyperLogLog (Flajolet et al. 2007) built from first principles on md5
hashes so the DuckDB oracle reproduces the REGISTERS bit-for-bit — the
"novel sketch as a custom operator" case: Spark's own
approx_count_distinct and DuckDB's approx functions use different
hash families, so their estimates can never cross-validate; this one's
can. The register build is the real distributed story — a single
groupBy(bucket) max aggregate, mergeable across any partitioning, which
is WHY sketches work at 100 TB: registers from per-partition partial
aggregation merge by max, and the final estimate reads 2^p tiny rows.

Determinism notes pinned for the oracle:
  - hash domain: md5_hash64 is a 60-BIT positive value (15 hex chars),
    so the rank word after the p bucket bits is 60 - p bits wide — the
    width must match the hash domain or every rank is shifted by a
    constant and the estimate is off by that power of two;
  - bucket = low p bits; rank ρ = leading zeros of the remaining word
    + 1, computed EXACTLY via the binary-string length (no float log2
    anywhere);
  - the 2^-M_j sum is a cumulative windowed sum ORDERED BY bucket —
    both engines add the same 2^p doubles in the same order, so the
    float result is bit-identical (a plain aggregate sum would be
    partition-order-dependent).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64

HLL_P = 8  # 2^8 = 256 registers
HASH_BITS = 60  # md5_hash64 = 15 hex chars


def hll_registers(
    df: DataFrame, key_col: str, p: int = HLL_P
) -> DataFrame:
    """(bucket, register) — the 2^p HyperLogLog registers of key_col's
    distinct values. Buckets with no hash land are ABSENT (the caller
    treats them as register 0)."""
    m = 1 << p
    word_bits = HASH_BITS - p
    v = md5_hash64(F.col(key_col).cast("string"))
    h = df.select(v.alias("v")).select(
        (F.col("v") % m).alias("bucket"),
        F.expr(f"v div {m}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(word_bits + 1)).otherwise(
        F.lit(word_bits + 1) - F.length(F.conv(F.col("w"), 10, 2))
    )
    return (
        h.withColumn("rho", rho)
        .groupBy("bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    df: DataFrame, key_col: str, p: int = HLL_P
) -> DataFrame:
    """(m, n_nonzero, hll_estimate, exact_distinct) — one row: the HLL
    cardinality estimate of key_col with the standard small-range
    correction (E <= 2.5m and empty registers -> linear counting), next
    to the exact distinct count for accuracy inspection. The estimate
    sum runs as an ordered cumulative window over the bounded register
    table so the oracle's float arithmetic is bit-identical."""
    from pyspark.sql.window import Window

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = hll_registers(df, key_col, p)
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    summed = (
        regs.withColumn("term", F.pow(F.lit(2.0), -F.col("register")))
        .withColumn("s_run", F.sum("term").over(w))
        .agg(
            F.max("s_run").alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
    )
    exact = df.agg(
        F.count_distinct(F.col(key_col)).alias("exact_distinct")
    )
    est = summed.crossJoin(exact).select(
        F.lit(m).alias("m"),
        F.col("n_present").cast("int").alias("n_nonzero"),
        "s_present",
        "n_present",
        "exact_distinct",
    )
    # absent buckets contribute 2^-0 = 1 each; zeros = m - n_present
    s_total = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    zeros = F.lit(m) - F.col("n_present")
    raw = F.lit(alpha * m * m) / s_total
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return est.select(
        "m",
        "n_nonzero",
        F.round(corrected, 6).alias("hll_estimate"),
        "exact_distinct",
    )


def hll_error_bound(p: int = HLL_P) -> float:
    """The theoretical relative standard error 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)
