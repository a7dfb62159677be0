"""Per-group ranking operators.

The scale story for "top-k rows per group" is NOT the aggregation
surface (collect_list per group is unbounded for hot keys) and NOT a
driver loop — it is a rank window plus a rank filter, which Spark 3.5+
compiles to a two-phase `WindowGroupLimit` physical plan:

  Sort -> WindowGroupLimit(Partial) -> Exchange -> Sort ->
  WindowGroupLimit(Final) -> Window -> Filter

The PARTIAL limit runs BEFORE the shuffle: every map task keeps at most
k rows per group it has seen, so the exchange carries
O(k * groups * map_tasks) rows instead of the whole table — for a
100 TB events table with a handful of event types, the difference
between shuffling terabytes and shuffling kilobytes. A plan test
(tests/test_plans.py) asserts the Partial operator is present so a
regression (e.g. an expression that defeats the RewriteWindowGroupLimit
rule) fails loudly rather than silently re-shuffling the world.

The same pattern is what the reference's per-collection top-k response
assembly does per tenant (reference: rust-engine search paths returning
bounded result sets per collection); here it is one declarative window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int = 3,
    tiebreak_col: str | None = None,
    descending: bool = True,
) -> DataFrame:
    """The top-k rows of every group by `order_col`, deterministic via
    `tiebreak_col` (ascending) among equal order values. Emits the
    original columns plus `rnk` (1-based dense position by row_number).

    row_number (not rank/dense_rank) so |output| == k * |groups| exactly
    — the contract a downstream LIMIT-per-tenant consumer wants — and so
    the WindowGroupLimit rewrite applies (it fires for row_number/rank/
    dense_rank rank-limit filters)."""
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    ]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
