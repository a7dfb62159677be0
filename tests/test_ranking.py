"""topk_per_group: correctness, determinism, and the WindowGroupLimit
plan contract (the map-side partial top-k that keeps the shuffle at
O(k·groups·tasks) instead of table-sized)."""

from __future__ import annotations

from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.io import load_table
from workspace_qdrant_mcp_spark.operators.ranking import topk_per_group
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.test_plans import _plan


def test_topk_exact_counts_and_order(spark):
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_id", "event_type", "value"
    )
    out = topk_per_group(
        ev, "event_type", "value", k=3, tiebreak_col="event_id"
    ).collect()
    by_group: dict[str, list] = {}
    for r in out:
        by_group.setdefault(r.event_type, []).append(r)
    n_types = ev.select("event_type").distinct().count()
    assert len(by_group) == n_types
    for g, rows in by_group.items():
        assert len(rows) == 3  # every sf0.01 type has >= 3 events
        assert sorted(r.rnk for r in rows) == [1, 2, 3]
        ordered = sorted(rows, key=lambda r: r.rnk)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.value, -a.event_id) >= (b.value, -b.event_id)
        # rnk-1 really is the group max
        top = max(r.value for r in ev.filter(F.col("event_type") == g).collect())
        assert ordered[0].value == top


def test_topk_deterministic_tiebreak(spark):
    # all-equal order values: selection must fall back to id asc
    df = spark.createDataFrame(
        [(i, "g", 1.0) for i in range(10)], "event_id long, g string, v double"
    )
    out = topk_per_group(df, "g", "v", k=3, tiebreak_col="event_id")
    assert [r.event_id for r in out.orderBy("rnk").collect()] == [0, 1, 2]


def test_topk_plan_has_partial_window_group_limit(spark):
    """The rank-limit rewrite must hold: a Partial WindowGroupLimit
    BEFORE the exchange. If a future expression defeats the rewrite the
    full table shuffles — this is the regression this test exists for."""
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "value"
    )
    plan = _plan(
        topk_per_group(ev, "event_type", "value", k=3, tiebreak_col="event_id")
    )
    # two-phase: a Partial limit (map side, pre-exchange) and a Final
    # one (reduce side). The detail section prints the mode as the last
    # WindowGroupLimit argument.
    assert plan.count("WindowGroupLimit") >= 2
    assert ", Partial" in plan
    assert ", Final" in plan
