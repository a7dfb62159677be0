"""Local replica of the driver's correctness gate: run a Spark query and its
DuckDB oracle on the same sf dir, compare row count, schema width, and
order-insensitive values (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math

import duckdb

from workspace_qdrant_mcp_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
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
