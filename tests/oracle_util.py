"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle on the same sf dir, compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb

from workspace_qdrant_mcp_spark.io import TABLES


# DuckDB output types the driver's Arrow/pandas hash path coerces away from
# Spark's (HUGEINT/int128 ≠ LONG; DECIMAL ≠ DOUBLE). fetchall() collapses
# them to Python int so value-compare can NEVER catch the class — the r8/r9
# hash-red root cause. Assert the TYPES here instead.
FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def assert_driver_safe_types(con, sql: str, name: str = "") -> None:
    """Plan-only check that an oracle emits no type the driver's hash path
    distinguishes from Spark's emission (uncast integer sum() → HUGEINT)."""
    rel = con.sql(sql)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(k in str(t).upper() for k in FORBIDDEN_ORACLE_TYPES)
    ]
    assert not bad, (
        f"oracle {name or '<inline>'} emits driver-unsafe DuckDB types "
        f"{bad}: CAST(... AS BIGINT/DOUBLE) at the emission site "
        f"(HUGEINT vs Spark LONG was the r8/r9 hash-red root cause)"
    )


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        assert_driver_safe_types(con, sql)
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        return cols, cur.fetchall()
    finally:
        con.close()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def compare(spark_df, oracle_query: str, sf_dir: str) -> None:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_query, sf_dir)

    sc, sr = _canon(s_cols, s_rows)
    oc, orr = _canon(o_cols, o_rows)
    assert sc == oc, f"schema mismatch: spark={sc} oracle={oc}"
    assert len(sr) == len(orr), f"row count mismatch: spark={len(sr)} oracle={len(orr)}"
    for i, (a, b) in enumerate(zip(sr, orr)):
        assert a == b, f"value mismatch at sorted row {i}: spark={a} oracle={b}"
