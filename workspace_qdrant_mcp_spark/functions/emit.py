"""Environment-proof float emission for oracle-compared report queries.

Float report columns (entropies, Gini, PSI, means of rounded values)
computed independently by Spark and DuckDB can disagree by one ulp when
the two engines' libm / build differ — enough to flip `round(x, 6)`
across a rounding boundary and break a value-hash compare even though
every displayed decimal agrees.  The proof-safe discipline (pioneered by
dedup.cross_source_overlap, driver-green since r7) is INTEGER MICROUNIT
emission on BOTH sides:

    value = CAST(round(x * 1e6) AS BIGINT) / 1e6

The integer absorbs ulp noise (two doubles a few ulps apart round to the
same integer unless x*1e6 sits within an ulp of a .5 boundary — the same
exposure `round(x, 6)` already had, minus the engine-specific decimal-
rounding implementation), and BIGINT / 1e6 is a single IEEE-754 double
division: identical longs give bit-identical doubles in every engine.
"Engine-identical floats" becomes a theorem instead of a hope.

Use `micro6` in the Spark plan and `micro6_sql` in the DuckDB oracle for
every float column of a hash-compared report query."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def micro6(col: Column) -> Column:
    """Round-to-6-decimals via exact integer microunits (see module doc).

    Drop-in replacement for ``F.round(col, 6)`` on hash-compared float
    report columns; pair with :func:`micro6_sql` on the oracle side."""
    return F.round(col * F.lit(1e6)).cast("long") / F.lit(1e6)


def micro6_sql(expr: str) -> str:
    """The DuckDB twin of :func:`micro6` for oracle SQL strings."""
    return f"(CAST(round(({expr}) * 1000000) AS BIGINT) / 1000000.0)"
