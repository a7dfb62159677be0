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


def _events_ts_is_nanos(sf_dir: str, name: str) -> bool:
    """Sniff the parquet footer (cheap, no data read) for the events table's
    ts physical type. Fixture generators have shipped both TIMESTAMP(NANOS)
    (which Spark's vectorized reader rejects unless read as a long) and plain
    timestamp[us]; the loader must handle either without a conf flip-flop."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_schema(f"{sf_dir}/{name}.parquet").field("ts").type
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        from pyspark.sql import functions as F

        if _events_ts_is_nanos(sf_dir, name):
            # Legacy fixtures: parquet TIMESTAMP(NANOS). Read the raw nanos
            # as a long and derive a usable timestamp alongside the exact
            # value (kept for deterministic ordering parity with
            # ns-precision engines).
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            ev = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            return ev.withColumn("ts_ns", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        # Current fixtures: timestamp[us], which Spark reads as
        # TIMESTAMP_NTZ. Derive ts_ns from the wall-clock value — the cast
        # to TIMESTAMP interprets the NTZ wall clock in the session
        # timezone, which session.get_spark pins to UTC, matching DuckDB's
        # epoch_ns(ts) on the same naive column exactly. Keep ts as a
        # session-tz TIMESTAMP so date_trunc/window queries agree with the
        # oracle too.
        ev = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return ev.withColumn(
            "ts_ns", F.expr("unix_micros(cast(ts as timestamp)) * 1000")
        ).withColumn("ts", F.col("ts").cast("timestamp"))
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
