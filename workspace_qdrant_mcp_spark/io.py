"""Table loading for the driver-generated synthetic testdata.

Tables (one parquet each, see /root/repo/TESTDATA.md):
  region nation customer supplier part orders lineitem events
  documents embeddings
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as a nanos-since-epoch long and derive a
        # usable timestamp column alongside the exact raw value (kept for
        # deterministic ordering parity with ns-precision engines).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return ev.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the cluster has cores. Small benchmark parquet files (single row group)
    arrive as 1-3 input splits, which serializes every CPU-heavy explode /
    hash / self-join downstream; at real scale (thousands of file splits)
    the partition count already exceeds parallelism and this is a no-op —
    no shuffle is ever added to a well-partitioned 100 TB scan."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
