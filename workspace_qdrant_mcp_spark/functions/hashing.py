"""Deterministic 60-bit hashes from md5 — the shared primitive for MinHash,
SimHash, and LSH banding.

Why md5-prefix instead of Spark's xxhash64: the correctness oracle (DuckDB)
must compute bit-identical hashes, and md5 is the one keyed hash both
engines implement identically. 15 hex chars = 60 bits, always positive in
an int64. The cost difference is irrelevant next to the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(s: Column, salt: str = "") -> Column:
    """Deterministic 60-bit hash of (salt || s)."""
    keyed = F.concat(F.lit(salt), s) if salt else s
    return F.conv(F.substring(F.md5(keyed.cast("binary")), 1, 15), 16, 10).cast("long")


def duckdb_md5_hash64_sql(expr: str, salt: str = "") -> str:
    keyed = f"'{salt}' || {expr}" if salt else expr
    return f"CAST(concat('0x', substr(md5({keyed}), 1, 15)) AS BIGINT)"
