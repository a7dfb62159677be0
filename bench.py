"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from workspace_qdrant_mcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wqm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest SF so per-query numbers measure the
    # plan, not first-run initialization.
    try:
        entrymod.entry(spark).collect()
    except Exception:
        pass

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.perf_counter()
        try:
            counts[name] = len(fn(spark, sf_dir).collect())
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # a failing query should not hide the rest
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Amortized interactive graph point-queries: per-seed ms for the
    # batched impact analysis (reference budget: 100 ms per impact query).
    per_seed_ms: dict[str, float] = {}
    for q in ("graph_batch_impact", "graph_batch_2hop"):
        try:
            n_seeds = (
                entrymod.queries()[q](spark, sf_dir)
                .select("seed")
                .distinct()
                .count()
            )
            if n_seeds and timings.get(q, -1) >= 0:
                per_seed_ms[q] = round(1000.0 * timings[q] / n_seeds, 2)
        except Exception as exc:
            print(f"# bench per-seed error ({q}): {exc}", file=sys.stderr)

    # BASELINE.md-mapped numbers so the per-round bench is directly
    # comparable to the reference's published targets (graph_bench.rs /
    # queue_processor_bench.rs):
    #   edge insertion >= 10k edges/sec; community detection < 5 s;
    #   impact analysis < 100 ms (amortized per seed);
    #   queue throughput >= 1000 docs/min.
    baseline_mapped: dict[str, float] = {}
    try:
        if timings.get("graph_extract_calls", 0) > 0:
            baseline_mapped["edge_build_per_sec"] = round(
                counts["graph_extract_calls"] / timings["graph_extract_calls"]
            )
        if timings.get("leiden_communities", 0) > 0:
            baseline_mapped["community_detection_sec"] = timings[
                "leiden_communities"
            ]
        if per_seed_ms.get("graph_batch_impact"):
            baseline_mapped["impact_ms_per_seed"] = per_seed_ms[
                "graph_batch_impact"
            ]
        if per_seed_ms.get("graph_batch_2hop"):
            # the 2-hop per-seed cost is output-volume-bound (hub seeds
            # return thousands of rows each); report rows/seed alongside
            # so the ms/seed number reads against the actual result size
            n_seeds_2h = max(
                1,
                round(
                    1000.0
                    * timings["graph_batch_2hop"]
                    / per_seed_ms["graph_batch_2hop"]
                ),
            )
            baseline_mapped["two_hop_ms_per_seed"] = per_seed_ms[
                "graph_batch_2hop"
            ]
            baseline_mapped["two_hop_rows_per_seed"] = round(
                counts.get("graph_batch_2hop", 0) / n_seeds_2h
            )
        if timings.get("ingest_apply_events", 0) > 0:
            n_events = (
                spark.read.parquet(f"{sf_dir}/events.parquet").count()
            )
            baseline_mapped["queue_events_per_min"] = round(
                60.0 * n_events / timings["ingest_apply_events"]
            )
    except Exception as exc:
        print(f"# bench baseline-map error: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "query_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "per_seed_ms": per_seed_ms,
                "baseline_mapped": baseline_mapped,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
