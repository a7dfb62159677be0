"""r14 optimization-round measurement harness.

Times each named query in isolation (one shared session, same
methodology as bench.py: .collect() wall) and splits out PLANNING time
(force queryExecution.executedPlan before the action) so plan-depth
costs are visible; writes plans/r13/<query>_<tag>.txt with the
formatted explain. Usage:

  python plans/r13/capture.py <tag> q1,q2,...   # or 'all'
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", ".."))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from workspace_qdrant_mcp_spark import ckpt  # noqa: E402
from workspace_qdrant_mcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("CAPTURE_REPS", "1"))
    spark = get_spark("r14-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    keep = list(qs) if names == "all" else [n.strip() for n in names.split(",")]
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def _group_counts(group: str) -> tuple[int, int, int]:
        """(n_jobs, n_stages, n_tasks) run under a job group — a
        noise-free structural cost metric (wall seconds on this host
        swing 2-6x run-to-run)."""
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        return len(jobs), n_stages, n_tasks

    out = {}
    for name in keep:
        fn = qs[name]
        try:
            rows = []
            for rep in range(reps):
                group = f"cap-{name}-{rep}"
                sc.setJobGroup(group, name)
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                # force analysis+optimization+physical planning only
                df._jdf.queryExecution().executedPlan()
                t1 = time.perf_counter()
                n = len(df.collect())
                t2 = time.perf_counter()
                jst = _group_counts(group)
                rows.append(
                    (round(t1 - t0, 3), round(t2 - t1, 3), n) + jst
                )
                ckpt.clear_unpinned(spark)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(HERE, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
            best = min(rows, key=lambda r: r[0] + r[1])
            out[name] = {
                "plan_s": best[0],
                "exec_s": best[1],
                "rows": best[2],
                "jobs": best[3],
                "stages": best[4],
                "tasks": best[5],
                "all": rows,
                "n_exchange": plan.count("Exchange"),
                "n_python": plan.count("EvalPython")
                + plan.count("MapInPandas")
                + plan.count("MapInArrow")
                + plan.count("FlatMapGroupsInPandas"),
            }
            print(
                f"{name}: plan={best[0]}s exec={best[1]}s rows={best[2]} "
                f"jobs={best[3]} stages={best[4]} tasks={best[5]} "
                f"exch={out[name]['n_exchange']} py={out[name]['n_python']}",
                file=sys.stderr,
                flush=True,
            )
        except Exception as exc:
            out[name] = {"error": str(exc)}
            print(f"{name}: ERROR {exc}", file=sys.stderr, flush=True)
            ckpt.clear_unpinned(spark)
    with open(os.path.join(HERE, f"capture_{tag}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
