"""Unit tests for bench.py's measurement protocol: the paired
interleaved regression adjudication (VERDICT r11 #3 — a reported
regression must carry method="interleaved"; host_factor_only may only
settle flags that normalization clears) and the r13 timeout-proofing
(VERDICT r12 #1 — phased artifact flushes, history upsert by run ts,
and a SIGTERM handler that leaves a parseable summary line)."""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import bench


def test_artifacts_upsert_keeps_one_row_per_run(tmp_path):
    art = bench._Artifacts(str(tmp_path))
    full = {"metric": "query_suite_total", "value": 1.0, "phase": "timed",
            "queries": {"q": 1.0}, "env": {}}
    art.flush(full)
    full["value"] = 2.0
    full["phase"] = "complete"
    art.flush(full)
    rows = [
        json.loads(l)
        for l in open(tmp_path / "bench_history.jsonl")
        if l.strip()
    ]
    assert len(rows) == 1  # upserted, not appended twice
    assert rows[0]["phase"] == "complete" and rows[0]["value"] == 2.0
    assert rows[0]["ts"] == art.ts
    out = json.load(open(tmp_path / "bench_out.json"))
    assert out["phase"] == "complete"
    # a second run (different ts) appends a second row
    art2 = bench._Artifacts(str(tmp_path))
    art2.ts = art.ts + 1
    art2.flush({"metric": "query_suite_total", "value": 3.0, "phase": "timed"})
    rows = [
        json.loads(l)
        for l in open(tmp_path / "bench_history.jsonl")
        if l.strip()
    ]
    assert len(rows) == 2


def test_reference_record_excludes_own_run(tmp_path):
    """The phased flush upserts THIS run's history row right after the
    timed pass, so the paired phase must never pick it as the reference
    — a run adjudicated against itself reads every ratio as 1.0 and the
    regression gate goes blind (caught in the r13 before-run: 0 raw
    flags on a host 2-4x slower than the previous record)."""
    hist = tmp_path / "bench_history.jsonl"
    qmap = {f"q{i}": 1.0 for i in range(60)}
    prev = {"ts": 100, "sf": "0.1", "queries": qmap}
    own = {"ts": 200, "sf": "0.1", "queries": {q: 9.9 for q in qmap}}
    hist.write_text(
        json.dumps(prev) + "\n" + json.dumps(own) + "\n"
    )
    ref = bench._load_reference_record(str(tmp_path), "0.1", self_ts=200)
    assert ref is not None and ref["ts"] == 100
    # without the exclusion the last (own) row would have been picked
    ref_unguarded = bench._load_reference_record(str(tmp_path), "0.1")
    assert ref_unguarded["ts"] == 200


def test_summary_keeps_heavy_maps_out_but_carries_topn_queries():
    """r14 (VERDICT r13 #1): the stdout line must carry a per-query map
    (the driver's PERF per_query/scaling blocks were empty because r13's
    line had no `queries` key at all) — but the recorder keeps only the
    last 2000 bytes, so the line carries the TOP-N-by-wall subset under
    a hard byte budget, heaviest first, with the omission count
    explicit. Other per-query maps (counts/paired/...) stay disk-only."""
    full = {
        "metric": "query_suite_total", "value": 1.0, "unit": "sec",
        "sf": "0.1", "n_queries": 2, "n_errors": 0, "phase": "complete",
        "queries": {"a": 1.0, "b": 3.0}, "counts": {"a": 5},
        "paired": {"x": 1},
        "per_seed_ms": {}, "stress10x": None, "env": {},
        "baseline_mapped": {},
    }
    s = bench._summary_of(full)
    for heavy in ("counts", "paired", "per_seed_ms", "stress10x"):
        assert heavy not in s
    assert s["phase"] == "complete" and s["n_queries"] == 2
    # both tiny queries fit; heaviest-first map, nothing omitted
    assert s["queries"] == {"a": 1.0, "b": 3.0}
    assert s["n_queries_omitted"] == 0


def test_summary_line_respects_recorder_tail_budget():
    """198 realistic-width query names cannot all fit: the line must
    stay under the 2000-byte recorder tail, keep the HEAVIEST queries,
    and report how many were dropped."""
    names = [f"some_realistic_query_name_{i:03d}" for i in range(198)]
    full = {
        "metric": "query_suite_total", "value": 345.8, "unit": "sec",
        "sf": "0.1", "n_queries": 198, "n_errors": 0, "phase": "complete",
        "queries": {n: round(0.3 + (i % 40) * 0.37, 2)
                    for i, n in enumerate(names)},
        "env": {"cpus": "32", "timed_sec": 346.3, "paired_sec": 100.0},
        "baseline_mapped": {f"gate_{i}": 1234.5 for i in range(18)},
    }
    s = bench._summary_of(full)
    line = json.dumps(s, separators=(",", ":"))
    assert len(line) <= bench._STDOUT_LINE_BUDGET
    assert 0 < len(s["queries"]) < 198
    assert s["n_queries_omitted"] == 198 - len(s["queries"])
    # the kept entries are exactly the heaviest ones
    kept_min = min(s["queries"].values())
    dropped_max = max(
        v for n, v in full["queries"].items() if n not in s["queries"]
    )
    assert kept_min >= dropped_max


def test_sigterm_leaves_parseable_line_and_artifacts(tmp_path):
    """The driver kills an over-budget bench with SIGTERM (rc=124 came
    from `timeout`); the handler must flush artifacts and print a
    summary line whose phase marks the truncation — `parsed: null` must
    be impossible after the timed pass."""
    script = textwrap.dedent(
        f"""
        import sys, time
        sys.path.insert(0, {os.path.dirname(os.path.abspath(bench.__file__))!r})
        import bench
        art = bench._Artifacts({str(tmp_path)!r})
        full = {{"metric": "query_suite_total", "value": 9.9, "unit": "sec",
                 "sf": "0.01", "n_queries": 3, "n_errors": 0,
                 "baseline_mapped": {{}}, "env": {{"timed_sec": 9.9}},
                 "phase": "stress10x", "queries": {{"q": 9.9}}}}
        bench._install_sigterm_flush(art, full)
        print("READY", file=sys.stderr, flush=True)
        time.sleep(60)
        """
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    # wait for the handler to be installed before terminating
    assert proc.stderr.readline().strip() == "READY"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    assert proc.returncode == 143
    line = out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert parsed["phase"] == "truncated:stress10x"
    assert parsed["value"] == 9.9
    # r14: the summary projection now carries the top-N queries map
    assert parsed["queries"] == {"q": 9.9}
    assert len(line) <= bench._STDOUT_LINE_BUDGET
    rows = [
        json.loads(l)
        for l in open(tmp_path / "bench_history.jsonl")
        if l.strip()
    ]
    assert len(rows) == 1 and rows[0]["phase"] == "truncated:stress10x"


def test_paired_recheck_interleaves_all_still_hot_flags(spark):
    def thunk(s, _sf):
        return s.range(5).toDF("id")

    names = [f"q{i}" for i in range(12)]
    queries = {n: thunk for n in names}
    # global host drift 1.25x on the 9 baseline queries (unflagged);
    # q0 raw 4.0 (worst, capped-interleave), q1 raw 2.0 (beyond the cap
    # but still 1.6x after normalization -> MUST interleave), q2 raw 1.5
    # (1.2x after normalization -> cleared, host_factor_only is fine)
    ref = {"ts": 1, "queries": {n: 1.0 for n in names}}
    timings = {n: 1.25 for n in names}
    timings["q0"], timings["q1"], timings["q2"] = 4.0, 2.0, 1.5

    out = bench._paired_recheck(
        spark, "/root/testdata/sf0.001", queries, timings, ref,
        threshold=1.3, max_flagged=1, reps=1, n_anchors=2,
    )
    assert out["status"] == "ok"
    assert out["flagged"]["q0"]["method"] == "interleaved"
    assert out["flagged"]["q1"]["method"] == "interleaved"
    assert out["flagged"]["q2"]["method"] == "host_factor_only"
    # the core invariant: nothing above threshold settles un-interleaved
    for q, v in out["flagged"].items():
        if v["method"] == "host_factor_only":
            assert v["paired_ratio"] <= 1.3, (q, v)
