"""Vector math as JVM-side column expressions (no Python UDFs).

Dense vectors are ArrayType(FloatType) columns. All arithmetic is done in
double precision via an ordered fold (`aggregate`), which is deterministic
and bit-reproducible — the same discipline the reference enforces for its
analytics (DOM-01, graph/algorithms/mod.rs:1-9).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity — the reference's distance metric for all dense
    collections (multi_tenant.rs:54)."""
    return dot(a, b) / (norm(a) * norm(b))


def duckdb_dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def duckdb_norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def duckdb_cosine_sql(a: str, b: str) -> str:
    return f"({duckdb_dot_sql(a, b)} / ({duckdb_norm_sql(a)} * {duckdb_norm_sql(b)}))"
