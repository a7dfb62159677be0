"""Benchmark harness: runs every queries() entry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints a
compact JSON summary line to stdout — the LAST stdout line is always a
complete, parseable summary:
  {"metric": ..., "value": N, "unit": "sec", "sf": ..., "n_queries": N,
   "n_errors": N, "baseline_mapped": {...}, "env": {...}, "phase": ...}.

Timeout-proofing (VERDICT r12 #1 — the r12 driver run hit its wall-clock
budget mid-stress-tier and, because every artifact was written only at
the very end, produced NO numbers at all):
  - the run is PHASED (warmup -> timed -> baseline gates -> paired
    recheck -> stress10x) and bench_out.json + this run's
    bench_history.jsonl row are (re)written at every phase boundary, so
    a kill at any point leaves the completed phases on disk;
  - a summary line is printed right after the timed pass (phase
    "timed") and again, enriched, at the end (phase "complete") — the
    recorder keeps a bounded stdout TAIL, so the last complete line is
    the one that parses;
  - SIGTERM (what `timeout` sends at the budget) triggers a handler that
    flushes the current state to disk and prints a summary line with
    phase "truncated:<phase>" before exiting — a timeout can no longer
    produce `parsed: null`;
  - per-phase wall clocks land in env (warmup_sec/timed_sec/
    baseline_sec/paired_sec/stress_sec) so budget arithmetic next round
    is measured, not inferred (VERDICT r12 #6).

Contract hardening (the per-round recorder keeps a bounded stdout tail —
measured at exactly 2000 bytes in BENCH_r09..r13 — and has clipped the
front of the JSON line in every past round):
  - stdout carries NOTHING but summary JSON lines (progress -> stderr);
  - the driver contract wants a per-query `queries` map on the line, but
    the full 198-entry map is ~5 KB and the recorder keeps only the last
    2000 bytes — a full map would clip the line's FRONT and parse as
    nothing (the r7 failure: 148 of 163 timings lost, `parsed: null`).
    r14 fix (VERDICT r13 #1 — PERF per_query/scaling blocks were empty
    because the line had NO queries key at all): the line now carries
    the TOP-N-by-wall subset of the per-query map, added greedily
    while the whole line stays under _STDOUT_LINE_BUDGET bytes, plus
    `n_queries_omitted` so a partial map is explicit. The heavy queries
    are exactly the ones whose low-core/high-core scaling ratio the
    driver needs; the c32 and c8 runs' top sets overlap so the
    intersection is populated.
  - the full result (per-query timings, row counts, per-seed ms, env pin)
    is written to bench_out.json next to this file, so the complete map is
    always recoverable from disk.

Warm-up (VERDICT r12 #1: the old full-registry untimed pass was 58% of
wall): the default is now a TARGETED pass that primes exactly the
session-lifetime stores the warmup exists for (_doc_terms postings, the
co-occurrence graph store, the symbol graph, the maintained index
stores, the engine chunk/line stores) plus a handful of representative
queries. SPARK_GRAFT_BENCH_WARMUP=full restores the legacy every-query
pass; =0 disables warmup entirely.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from workspace_qdrant_mcp_spark import ckpt  # noqa: E402
from workspace_qdrant_mcp_spark.session import get_spark  # noqa: E402


def _log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


class _Artifacts:
    """Incremental artifact writer (VERDICT r12 #1). One instance per run;
    every flush() rewrites bench_out.json and UPSERTS this run's row in
    bench_history.jsonl (keyed by the run's fixed ts), so the history
    keeps exactly one row per run no matter how many phases flushed, and
    a kill between flushes loses only the in-flight phase."""

    def __init__(self, here: str) -> None:
        self.here = here
        self.ts = round(time.time())

    def flush(self, full: dict, print_line: bool = False) -> None:
        try:
            with open(os.path.join(self.here, "bench_out.json"), "w") as f:
                json.dump(full, f, indent=1)
                f.write("\n")
        except Exception as exc:
            _log(f"# bench_out.json write error: {exc}")
        hist = os.path.join(self.here, "bench_history.jsonl")
        try:
            lines = []
            if os.path.exists(hist):
                with open(hist) as f:
                    for line in f:
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            if json.loads(line).get("ts") == self.ts:
                                continue  # replaced by this flush
                        except Exception:
                            pass
                        lines.append(line)
            lines.append(
                json.dumps({"ts": self.ts, **full}, separators=(",", ":"))
            )
            tmp = hist + ".tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(tmp, hist)
        except Exception as exc:
            _log(f"# bench_history.jsonl write error: {exc}")
        if print_line:
            line = json.dumps(_summary_of(full), separators=(",", ":"))
            _log(f"# stdout line is {len(line)} bytes (phase={full.get('phase')})")
            print(line, flush=True)


_SUMMARY_KEYS = (
    "metric", "value", "unit", "sf", "n_queries", "n_errors",
    "baseline_mapped", "env", "paired_status", "n_flagged_raw",
    "n_paired_regressions", "phase",
)

# The recorder keeps the last 2000 bytes of output; the summary line must
# survive IN FULL at the very end of it. Leave headroom for a trailing
# newline and minor recorder framing.
_STDOUT_LINE_BUDGET = 1850


def _summary_of(full: dict) -> dict:
    """The stdout projection of the full artifact: every scalar summary
    field, plus as many per-query timings (heaviest first) as fit in the
    recorder's 2000-byte tail. The complete map lives in bench_out.json."""
    out = {k: full[k] for k in _SUMMARY_KEYS if k in full}
    timings = full.get("queries")
    if not timings:
        return out
    base_len = len(json.dumps(out, separators=(",", ":")))
    # greedy fill, heaviest queries first (deterministic name tiebreak):
    # these are the scaling-relevant entries; +24 covers the wrapper keys
    # `"queries":{},"n_queries_omitted":NNN`
    budget = _STDOUT_LINE_BUDGET - base_len - 44
    picked: dict[str, float] = {}
    used = 0
    for name in sorted(timings, key=lambda n: (-timings[n], n)):
        cost = len(name) + len(json.dumps(timings[name])) + 4
        if used + cost > budget:
            break
        picked[name] = timings[name]
        used += cost
    out["queries"] = picked
    out["n_queries_omitted"] = len(timings) - len(picked)
    return out


def _install_sigterm_flush(art: _Artifacts, full: dict) -> None:
    """`timeout` sends SIGTERM at the driver's budget; flush whatever is
    complete and print a parseable summary line before dying, so a
    budget overrun degrades to a partial record instead of `parsed:
    null` (VERDICT r12 #1). The handler touches no Spark/JVM state."""
    import signal

    def _on_term(signum, frame):
        full["phase"] = f"truncated:{full.get('phase', '?')}"
        try:
            art.flush(full, print_line=True)
        finally:
            os._exit(143)

    signal.signal(signal.SIGTERM, _on_term)


# Representative queries for the targeted warmup: one per heavy family,
# enough to warm the shared codegen/session paths without re-running the
# whole registry untimed (the legacy full warmup was 58% of wall).
_WARM_QUERIES = (
    "hybrid_search_rrf",
    "grep_indexed_lines",
    "graph_degree_stats",
    "corpus_stats",
    "scroll_retrieve",
)


def _targeted_warmup(spark, sf_dir: str, queries: dict) -> None:
    """Prime exactly the session-lifetime pinned stores the untimed
    warmup pass existed for — _doc_terms postings, the co-occurrence
    edge store, the extracted symbol graph, the maintained index stores
    (postings/IVF/gram parquet), and the engine chunk/line stores — then
    run a handful of representative queries so shared plan/codegen paths
    are warm. Each step is individually fault-isolated: a warmup error
    must never kill the bench."""
    steps = [
        ("doc_terms", lambda: entrymod._doc_terms(spark, sf_dir).count()),
        ("edges", lambda: entrymod._edges(spark, sf_dir).count()),
        ("symbol_graph", lambda: [d.count() for d in entrymod._symbol_graph(spark, sf_dir)]),
        ("indexed_stores", lambda: entrymod._indexed_stores(spark, sf_dir)),
        ("engine_chunks", lambda: entrymod._engine(spark, sf_dir).chunks.count()),
        ("engine_lines", lambda: entrymod._engine(spark, sf_dir).lines.count()),
    ]
    for sname, step in steps:
        try:
            step()
        except Exception as exc:
            _log(f"# targeted warmup error ({sname}): {exc}")
        ckpt.clear_unpinned(spark)
    for name in _WARM_QUERIES:
        fn = queries.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir).collect()
        except Exception as exc:
            _log(f"# targeted warmup error ({name}): {exc}")
        ckpt.clear_unpinned(spark)


def _full_store_ingest_docs_per_min(
    spark, sf_dir: str, n_docs: int = 512, per_file: int = 16
) -> float:
    """Time run_ingestion_stream with every maintained sink enabled over
    n_docs real corpus documents fed as watcher-event JSON files; return
    docs/min. The event feed (driver-side JSON writes) happens BEFORE the
    clock starts — only the stream's own work is timed."""
    import shutil
    import tempfile

    from workspace_qdrant_mcp_spark.streaming import ingest

    base = tempfile.mkdtemp(prefix="wqm_bench_ingest_")
    events_dir = os.path.join(base, "events")
    os.makedirs(events_dir)
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(f"doc_id < {n_docs}")
        .collect()
    )
    for i in range(0, len(rows), per_file):
        with open(os.path.join(events_dir, f"b{i // per_file:04d}.json"), "w") as f:
            for r in rows[i : i + per_file]:
                f.write(
                    json.dumps(
                        {
                            "path": f"doc_{r['doc_id']}.txt",
                            "event_type": "create",
                            "content": r["text"],
                            "ts": "2026-01-01T00:00:00",
                        }
                    )
                    + "\n"
                )
    t0 = time.perf_counter()
    ingest.run_ingestion_stream(
        spark,
        events_dir,
        os.path.join(base, "store"),
        os.path.join(base, "dlq"),
        os.path.join(base, "ckpt"),
        postings_path=os.path.join(base, "postings"),
        graph_store_dir=os.path.join(base, "graph"),
        signature_store_path=os.path.join(base, "sigs"),
        feature_store_path=os.path.join(base, "features"),
        gram_index_path=os.path.join(base, "grams"),
    )
    elapsed = time.perf_counter() - t0
    n_ingested = (
        spark.read.parquet(os.path.join(base, "store"))
        .select("path")
        .distinct()
        .count()
    )
    shutil.rmtree(base, ignore_errors=True)
    if n_ingested < len(rows):
        _log(
            f"# full-store ingest: only {n_ingested}/{len(rows)} docs "
            "landed — rate reflects the landed count"
        )
    return round(60.0 * n_ingested / elapsed)


def _serving_latency_ms(spark, sf_dir: str, n_reps: int = 9) -> dict[str, float]:
    """p50 per-query latency of the api serving paths, indexed vs scan
    (VERDICT r8 #4): the reference publishes QUERY-side numbers (FTS5
    candidate fetch ~15 ms @5k docs, grep_search/mod.rs:2-26; graph
    2-hop <10 ms) but the repo's gates were all build/ingest throughput.
    Store build + engine cache warm-up happen BEFORE the clock; each
    sample times one .collect() of the served plan. The scan twin runs
    the same queries on an engine without store serving, so the pair
    reads as 'what did the index buy at this corpus size'."""
    import statistics
    import tempfile

    from workspace_qdrant_mcp_spark.api import WqmEngine

    scan = WqmEngine(spark, sf_dir)
    served = WqmEngine(spark, sf_dir)
    served.enable_store_serving(tempfile.mkdtemp(prefix="wqm_bench_serve_"))

    cases = {
        "search": lambda e: e.search("dup spark vector", mode="hybrid", limit=10),
        "grep": lambda e: e.grep("dup"),
    }
    out: dict[str, float] = {}
    for cname, run in cases.items():
        for ename, eng in (("indexed", served), ("scan", scan)):
            run(eng).collect()  # warm (plan + session caches)
            samples = []
            for _ in range(n_reps):
                t0 = time.perf_counter()
                run(eng).collect()
                samples.append(1000.0 * (time.perf_counter() - t0))
            out[f"{ename}_{cname}_ms"] = round(statistics.median(samples), 1)

    # COLD-corpus grep tier — the regime the index exists for. The warm
    # pair above serves a corpus that fits in executor memory, where a
    # full instr scan is a single in-memory stage and a 2-job index path
    # cannot beat it; at 100 TB the corpus does NOT sit in memory and the
    # scan arm pays the full parquet read + line split every query. This
    # pair measures exactly that deployment shape: the gram index HELD
    # OPEN (the engine's pinned snapshot — the daemon keeps FTS5 open),
    # the corpus read fresh from parquet each sample; indexed arm =
    # open-index candidates + bounded id-pushdown pruning the cold
    # explode+verify (the reference's fetch-by-rowid shape) vs the full
    # cold scan.
    from workspace_qdrant_mcp_spark.operators import grep as grep_ops
    from workspace_qdrant_mcp_spark.sources.documents import code_lines

    def cold_lines():
        return code_lines(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        )

    open_grams = served._grams_df
    for ename, runq in (
        (
            "indexed",
            lambda: grep_ops.grep_exact_indexed(
                cold_lines(),
                open_grams,
                "dup",
                id_pushdown=10_000,
            ),
        ),
        ("scan", lambda: grep_ops.grep_exact(cold_lines(), "dup")),
    ):
        runq().collect()  # plan/codegen warm; data path stays cold
        samples = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            runq().collect()
            samples.append(1000.0 * (time.perf_counter() - t0))
        out[f"{ename}_grep_cold_ms"] = round(statistics.median(samples), 1)

    # COLD-corpus SEARCH tier (VERDICT r9 #7) — the dense leg's twin of
    # the cold grep pair: the IVF store HELD OPEN (pinned snapshot) vs a
    # brute-force cosine that must re-read the embeddings parquet every
    # query. The warm search pair above is nearly a tie (open indexes vs
    # an in-memory corpus); this pair measures the regime the index
    # exists for — at 100 TB the corpus never sits in memory.
    from pyspark.sql import functions as F

    from workspace_qdrant_mcp_spark.operators import ann as ann_ops

    emb_path = f"{sf_dir}/embeddings.parquet"
    cents = (
        spark.read.parquet(emb_path)
        .filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").cast("int").alias("cell_id"), "embedding")
        .localCheckpoint()
    )
    import os as _os

    ann_base = _os.path.join(
        tempfile.mkdtemp(prefix="wqm_bench_ann_"), "ann_cells"
    )
    ann_ops.update_ann_store(
        spark, ann_base, cents,
        changed_vecs=spark.read.parquet(emb_path),
    )
    open_store = ann_ops.read_ann_store(spark, ann_base).localCheckpoint()
    qvec = spark.read.parquet(emb_path).filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).localCheckpoint()
    for ename, runq in (
        (
            "indexed",
            lambda: ann_ops.ann_store_topk(
                spark, ann_base, cents, qvec, k=10, n_probe=3,
                assigned=open_store,
            ),
        ),
        (
            "scan",
            lambda: ann_ops.bruteforce_topk(
                spark.read.parquet(emb_path), qvec, k=10
            ),
        ),
    ):
        runq().collect()  # plan/codegen warm; data path stays cold
        samples = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            runq().collect()
            samples.append(1000.0 * (time.perf_counter() - t0))
        out[f"{ename}_search_cold_ms"] = round(statistics.median(samples), 1)

    # serving REFRESH cost (VERDICT r9 #5): one full rebuild + snapshot
    # swap — what a drift alarm costs the engine end-to-end.
    t0 = time.perf_counter()
    served.enable_store_serving(tempfile.mkdtemp(prefix="wqm_bench_rf_"))
    out["serving_refresh_ms"] = round(1000.0 * (time.perf_counter() - t0), 1)
    ckpt.clear_unpinned(spark)
    return out


def _load_reference_record(
    here: str, sf: str, self_ts: int | None = None
) -> dict | None:
    """Most recent bench_history.jsonl entry at the same SF with a full
    per-query map (>= 50 queries — skips SPARK_GRAFT_BENCH_ONLY subset
    runs). This is the 'reference row' the paired regression check
    compares against; override with SPARK_GRAFT_BENCH_REF_TS=<ts> to pin
    a specific entry. `self_ts` excludes the CURRENT run's own row:
    since the r13 phased flush, this run's row is upserted into the
    history right after the timed pass, so without the exclusion the
    paired phase would adjudicate the run against itself (every ratio
    exactly 1.0 — the r13 before-run measured n_flagged_raw=0 on a host
    2-4x slower than the reference, which is how this was caught)."""
    path = os.path.join(here, "bench_history.jsonl")
    if not os.path.exists(path):
        return None
    pin = os.environ.get("SPARK_GRAFT_BENCH_REF_TS")
    ref = None
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except Exception:
                continue
            if self_ts is not None and rec.get("ts") == self_ts:
                continue  # never adjudicate a run against itself
            if str(rec.get("sf")) != str(sf):
                continue
            if len(rec.get("queries", {})) < 50:
                continue
            if pin and str(rec.get("ts")) != pin:
                continue
            ref = rec  # keep the LAST matching entry
    if pin and ref is None:
        # ADVICE r11: a typo'd pin must be distinguishable from an empty
        # history — without this, the run silently reports no_reference
        _log(
            f"# bench: SPARK_GRAFT_BENCH_REF_TS={pin} matched no "
            f"full-registry (>=50-query) record at sf={sf} in "
            f"bench_history.jsonl — check the pinned ts"
        )
    return ref


def _paired_recheck(
    spark,
    sf_dir: str,
    queries: dict,
    timings: dict[str, float],
    ref: dict,
    threshold: float = 1.3,
    max_flagged: int = 12,
    reps: int = 2,
    n_anchors: int = 4,
    budget_sec: float | None = None,
) -> dict:
    """Host-drift-proof regression adjudication (VERDICT r10 #2).

    Problem: absolute seconds on this host swing ±25% run-to-run with
    byte-identical code (r10 measured 292→351→403 s for three same-day
    runs), so `now/ref > 1.3` flags dozens of false regressions. A real
    regression is LOCAL to a query; host drift is GLOBAL — so normalize
    each flagged query by contemporaneous anchor measurements taken in
    the SAME session, interleaved run-for-run with the flagged query so
    both see the same instantaneous host state.

    Protocol:
      1. raw ratio r_q = now_q / ref_q for every query timed in both
         runs; host_factor = median(r_q) (the global drift estimate).
      2. flagged = r_q > threshold, worst-first, capped at max_flagged.
      3. anchors = the n_anchors queries with r_q closest to the median
         (pure-drift exemplars; ref time >= 0.5 s so timer noise is
         small relative to the measurement).
      4. interleave: for each rep, run [anchor_1, flagged_q, anchor_2,
         flagged_q, ...] alternating in one session; per-rep
         anchor_factor = median(anchor_now / anchor_ref).
      5. paired_ratio_q = median over reps of
         (flagged_now / ref_q) / anchor_factor_rep.
    paired_ratio ≈ 1 ⇒ the raw flag was host drift; paired_ratio >
    threshold ⇒ a genuine plan/code regression worth bisecting.

    r14 phase-budget bound (VERDICT r13 #3: the r13 paired phase cost
    1.6x the timed pass itself — 683.68 s vs 416.16 s — because every
    flag paid reps x (2 x n_anchors) full query runs against anchors
    chosen purely by ratio-closeness, i.e. sometimes 5-second queries):
      - anchors prefer drift exemplars with SMALL reference walls
        (0.5 s <= ref < 2.5 s) so an interleave rep costs seconds, not
        tens of seconds; falls back to the >= 0.5 s pool when thin;
      - a flag whose first rep comes back clearly-drift (paired ratio
        <= early_exit) skips its remaining reps — most flags are drift,
        so this halves the common case;
      - `budget_sec` (wired to 0.5 x timed_sec in main) bounds the whole
        phase: flags are adjudicated worst-raw-ratio-first and any flag
        the budget cannot reach is reported method
        "interleave_skipped_budget" with paired_ratio None (visibly
        unadjudicated — never silently counted as regression or pass)."""
    import statistics

    t_phase0 = time.perf_counter()
    early_exit = 1.15

    ref_t = ref.get("queries", {})
    ratios = {
        q: timings[q] / ref_t[q]
        for q in timings
        if q in ref_t and timings[q] > 0 and ref_t[q] > 0
    }
    if len(ratios) < 10:
        return {"status": "insufficient_overlap", "n_common": len(ratios)}
    host_factor = statistics.median(ratios.values())
    flagged = sorted(
        (q for q, r in ratios.items() if r > threshold),
        key=lambda q: -ratios[q],
    )
    out = {
        "status": "ok",
        "ref_ts": ref.get("ts"),
        "host_factor_raw": round(host_factor, 3),
        "threshold": threshold,
        "n_flagged_raw": len(flagged),
        "flagged": {},
    }
    if not flagged:
        return out
    # drift exemplars with CHEAP walls first (r14): a 0.5-2.5 s anchor
    # carries the same instantaneous-host-state signal as a 5 s one at a
    # fraction of the phase cost
    cheap_pool = [
        q
        for q, r in ratios.items()
        if 0.5 <= ref_t[q] < 2.5 and q not in flagged
    ]
    pool = cheap_pool if len(cheap_pool) >= n_anchors else [
        q for q, r in ratios.items() if ref_t[q] >= 0.5 and q not in flagged
    ]
    anchors = sorted(pool, key=lambda q: abs(ratios[q] - host_factor))[
        :n_anchors
    ]
    if not anchors:
        out["status"] = "no_anchors"
        return out
    out["anchors"] = anchors
    # VERDICT r11 #3: a REPORTED regression must carry
    # method="interleaved" — beyond the worst-max_flagged cap, any flag
    # whose host-factor-normalized ratio is STILL above threshold gets
    # interleave-adjudicated too; only flags that normalization already
    # clears (<= threshold after dividing by host_factor) may settle as
    # host_factor_only.
    rest = flagged[max_flagged:]
    still_hot = [q for q in rest if ratios[q] / host_factor > threshold]
    cleared = [q for q in rest if ratios[q] / host_factor <= threshold]
    to_interleave = flagged[:max_flagged] + still_hot
    if rest:
        _log(
            f"# paired recheck: {len(flagged)} raw flags; interleaving "
            f"worst {min(len(flagged), max_flagged)} + {len(still_hot)} "
            f"still-hot after host-factor normalization; "
            f"{len(cleared)} cleared by normalization"
        )
    for q in cleared:
        out["flagged"][q] = {
            "raw_ratio": round(ratios[q], 3),
            "paired_ratio": round(ratios[q] / host_factor, 3),
            "method": "host_factor_only",
        }
    for qi, q in enumerate(to_interleave):
        if (
            budget_sec is not None
            and time.perf_counter() - t_phase0 > budget_sec
        ):
            skipped = to_interleave[qi:]
            _log(
                f"# paired recheck: phase budget {budget_sec:.0f}s "
                f"exhausted — {len(skipped)} flags left unadjudicated "
                f"({', '.join(skipped)})"
            )
            for sq in skipped:
                out["flagged"][sq] = {
                    "raw_ratio": round(ratios[sq], 3),
                    "paired_ratio": None,
                    "method": "interleave_skipped_budget",
                }
            break
        per_rep = []
        for _rep in range(reps):
            seq = []
            for a in anchors:
                seq.append(a)
                seq.append(q)
            t_by: dict[str, list[float]] = {}
            for name in seq:
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf_dir).collect()
                except Exception as exc:
                    _log(f"# paired recheck error in {name}: {exc}")
                    continue
                t_by.setdefault(name, []).append(time.perf_counter() - t0)
                ckpt.clear_unpinned(spark)
            if q not in t_by or not any(a in t_by for a in anchors):
                continue
            anchor_factor = statistics.median(
                statistics.median(t_by[a]) / ref_t[a] for a in anchors if a in t_by
            )
            flag_now = statistics.median(t_by[q])
            per_rep.append((flag_now / ref_t[q]) / anchor_factor)
            # clear-drift early exit (r14): one rep that lands well under
            # threshold settles the flag — further reps only refine a
            # number that cannot cross back over 1.3
            if per_rep[-1] <= early_exit:
                break
        if per_rep:
            pr = statistics.median(per_rep)
            out["flagged"][q] = {
                "raw_ratio": round(ratios[q], 3),
                "paired_ratio": round(pr, 3),
                "method": "interleaved",
                "reps": len(per_rep),
            }
            verdict = "REGRESSION" if pr > threshold else "host drift"
            _log(
                f"# paired {q}: raw {ratios[q]:.2f}x -> paired {pr:.2f}x "
                f"({verdict})"
            )
        else:
            out["flagged"][q] = {
                "raw_ratio": round(ratios[q], 3),
                "paired_ratio": None,
                "method": "interleaved_failed",
            }
    out["n_paired_regressions"] = sum(
        1
        for v in out["flagged"].values()
        if v.get("paired_ratio") is not None and v["paired_ratio"] > threshold
    )
    return out


def _write_perf_notes_stress_table(here: str, stress: dict | None, sf) -> None:
    """Regenerate the stress10x table in PERF_NOTES.md from the measured
    dict (VERDICT r11 #4: the table is generated from the artifact, not
    maintained by hand). Replaces the block between the
    STRESS10X_TABLE_BEGIN/END markers; no-op (logged) if the markers are
    missing or the measurement errored — a bench run never fails on a
    docs write."""
    if not stress or "error" in stress:
        return
    path = os.path.join(here, "PERF_NOTES.md")
    begin, end = "<!-- STRESS10X_TABLE_BEGIN -->", "<!-- STRESS10X_TABLE_END -->"
    try:
        with open(path) as f:
            text = f.read()
        if begin not in text or end not in text:
            _log("# stress10x: PERF_NOTES markers missing, table not written")
            return
        lines = [
            f"Auto-generated by bench.py from the latest stress10x run "
            f"(base sf={sf}, factor=10; ratio = wall(10x)/wall(base), "
            f"ok = ratio <= ceiling):",
            "",
            "| query | base_s | 10x_s | ratio | ceiling | ok |",
            "|---|---|---|---|---|---|",
        ]
        for qn, r in stress.items():
            lines.append(
                f"| {qn} | {r['base_sec']} | {r['stress_sec']} | "
                f"{r['ratio']} | {r['ceiling']} | "
                f"{'OK' if r['ok'] else 'REGRESSION'} |"
            )
        head, rest = text.split(begin, 1)
        _, tail = rest.split(end, 1)
        with open(path, "w") as f:
            f.write(head + begin + "\n" + "\n".join(lines) + "\n" + end + tail)
        _log("# stress10x: PERF_NOTES table regenerated")
    except Exception as exc:
        _log(f"# stress10x PERF_NOTES write error: {exc}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # "1" (default) = targeted store-priming warmup; "full" = legacy
    # every-query untimed pass; "0" = off
    warmup_mode = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")
    warmup = warmup_mode != "0"
    spark = get_spark("wqm-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = dict(sorted(entrymod.queries().items()))
    # Bisect support (the r5/r7 drift-diagnosis discipline): run only a
    # named subset so round-over-round gate numbers can be compared
    # without suite-crowding effects. Comma-separated names, or @file
    # with one name per line.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        if only.startswith("@"):
            with open(only[1:]) as f:
                keep = {ln.strip() for ln in f if ln.strip()}
        else:
            keep = {n.strip() for n in only.split(",") if n.strip()}
        unknown = keep - queries.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown: {sorted(unknown)}")
        queries = {n: fn for n, fn in queries.items() if n in keep}
        _log(f"# bench subset: {len(queries)} queries")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    here = os.path.dirname(os.path.abspath(__file__))
    art = _Artifacts(here)
    # the live artifact dict — every phase mutates it and flushes; the
    # SIGTERM handler snapshots whatever is in it at kill time
    full: dict = {
        "metric": "query_suite_total",
        "value": None,
        "unit": "sec",
        "sf": sf,
        "n_queries": 0,
        "n_errors": 0,
        "baseline_mapped": {},
        "env": {"cpus": cpus, "warmup": warmup_mode},
        "phase": "warmup",
    }
    _install_sigterm_flush(art, full)

    # Phase 1 — warmup. JVM/codegen smoke on the smallest SF, then prime
    # the session-lifetime stores: the TARGETED pass by default (the
    # legacy full-registry untimed pass was 58% of wall, VERDICT r12 #1);
    # SPARK_GRAFT_BENCH_WARMUP=full restores the per-query pass so every
    # query's own codegen is also warm.
    t_warm0 = time.perf_counter()
    try:
        entrymod.entry(spark).collect()
    except Exception as exc:
        _log(f"# bench warmup entry error: {exc}")
    if warmup_mode == "full":
        for name, fn in queries.items():
            try:
                fn(spark, sf_dir).collect()
            except Exception as exc:
                _log(f"# bench warmup error in {name}: {exc}")
            # release the query's checkpoint blocks (pinned session stores
            # survive) — without this, superseded localCheckpoints pile up
            # across the session and later queries run with shrinking
            # execution memory (the r5 graph-family regression)
            ckpt.clear_unpinned(spark)
    elif warmup:
        _targeted_warmup(spark, sf_dir, queries)
    warmup_sec = round(time.perf_counter() - t_warm0, 2)
    full["env"]["warmup_sec"] = warmup_sec
    _log(f"# warmup done in {warmup_sec}s (mode={warmup_mode})")

    full["phase"] = "timed"
    t_timed0 = time.perf_counter()
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            counts[name] = len(fn(spark, sf_dir).collect())
            timings[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # a failing query should not hide the rest
            timings[name] = -1.0
            _log(f"# bench error in {name}: {exc}")
        else:
            _log(f"# {name}: {timings[name]}s ({counts[name]} rows)")
        ckpt.clear_unpinned(spark)

    total = round(sum(t for t in timings.values() if t >= 0), 2)
    full.update(
        value=total,
        n_queries=len(timings),
        n_errors=sum(1 for t in timings.values() if t < 0),
        queries=timings,
        counts=counts,
    )
    full["env"]["timed_sec"] = round(time.perf_counter() - t_timed0, 2)
    # FLUSH + FIRST summary line: from here on, a kill can only lose the
    # phases that have not yet run (VERDICT r12 #1)
    art.flush(full, print_line=True)

    # Phase 3 — BASELINE.md-mapped gates + per-seed amortization.
    full["phase"] = "baseline"
    t_base0 = time.perf_counter()

    # Amortized interactive graph point-queries: per-seed ms for the
    # batched impact analysis (reference budget: 100 ms per impact query).
    per_seed_ms: dict[str, float] = {}
    n_seeds_by_q: dict[str, int] = {}
    for q in ("graph_batch_impact", "graph_batch_2hop", "two_hop_chain"):
        try:
            n_seeds = (
                queries[q](spark, sf_dir).select("seed").distinct().count()
            )
            if n_seeds and timings.get(q, -1) >= 0:
                n_seeds_by_q[q] = n_seeds
                per_seed_ms[q] = round(1000.0 * timings[q] / n_seeds, 2)
        except Exception as exc:
            _log(f"# bench per-seed error ({q}): {exc}")

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
            # the leiden_communities QUERY carries the per-node
            # membership-invariant audit on top of the clustering since
            # r7 (it became oracle-backed); the reference gate times the
            # CLUSTERING (<5 s @10k: leiden/mod.rs bench), so time the
            # raw all-phases run on the same capped subgraph separately
            # rather than charging the audit joins to the gate.
            try:
                from pyspark.sql import functions as F

                from workspace_qdrant_mcp_spark.operators.leiden import (
                    leiden,
                )

                e = entrymod._edges(spark, sf_dir).filter(
                    (F.col("src") < entrymod.LEIDEN_CAP)
                    & (F.col("dst") < entrymod.LEIDEN_CAP)
                )
                leiden(e).collect()  # warm
                ckpt.clear_unpinned(spark)
                t0 = time.perf_counter()
                leiden(e).collect()
                baseline_mapped["community_detection_sec"] = round(
                    time.perf_counter() - t0, 2
                )
                ckpt.clear_unpinned(spark)
            except Exception as exc:
                # Loud fallback: the audit-inclusive query timing is the
                # number the comment above says is WRONG for the gate,
                # so say so when it is all we have.
                print(
                    "bench: dedicated clustering timing failed "
                    f"({exc}); community_detection_sec falls back to "
                    "the audit-inclusive leiden_communities timing",
                    file=sys.stderr,
                )
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
            baseline_mapped["two_hop_ms_per_seed"] = per_seed_ms[
                "graph_batch_2hop"
            ]
            baseline_mapped["two_hop_rows_per_seed"] = round(
                counts.get("graph_batch_2hop", 0)
                / max(1, n_seeds_by_q.get("graph_batch_2hop", 1))
            )
        if per_seed_ms.get("two_hop_chain"):
            # like-for-like against the reference's <10 ms 2-hop gate:
            # same graph shape (20-func call chains) and the same 2-rows-
            # per-seed result cardinality as graph_bench.rs:209-230, batch-
            # amortized (500 seeds, one job)
            baseline_mapped["two_hop_refshape_ms_per_seed"] = per_seed_ms[
                "two_hop_chain"
            ]
        if timings.get("ingest_apply_events", 0) > 0:
            n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
            baseline_mapped["queue_events_per_min"] = round(
                60.0 * n_events / timings["ingest_apply_events"]
            )
        # Embedding cost per chunk vs BASELINE.md's dominant ingest cost
        # (16.6-36.3 ms/chunk for the reference's real MiniLM-class
        # provider, >98% of its ingest time). HONEST LABEL: this measures
        # the deterministic mock provider (a JVM column expression) +
        # the embed_unique distinct-text discipline end-to-end — the
        # Spark-side pipeline cost around the provider; the real-model
        # slot is env-blocked in this container (probe-and-skip,
        # functions/embedder.py). A real Pandas-UDF provider swaps in
        # behind the same embed_unique signature.
        try:
            from workspace_qdrant_mcp_spark.functions.embedder import (
                embed_unique,
            )
            from workspace_qdrant_mcp_spark.sources.documents import (
                chunk_text,
            )

            docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
            chunks = chunk_text(docs).localCheckpoint()
            n_chunks = chunks.count()
            t0 = time.perf_counter()
            embed_unique(chunks).select("embedding").write.format(
                "noop"
            ).mode("overwrite").save()
            baseline_mapped["embed_ms_per_chunk_mock"] = round(
                1000.0 * (time.perf_counter() - t0) / max(1, n_chunks), 3
            )
            ckpt.clear_unpinned(spark)
        except Exception as exc:
            _log(f"# bench embed-cost error: {exc}")
        # Full maintained-store streaming ingestion (VERDICT r7 #6): the
        # configuration a real deployment runs — the watcher-event stream
        # with ALL SIX incremental sinks enabled (chunk store + postings
        # + symbol graph + minhash signatures + doc features + trigram
        # gram index), measured
        # as docs/min against the reference's 1000+ docs/min queue gate
        # (queue_processor_bench.rs). 512 real corpus docs over two
        # availableNow micro-batches (maxFilesPerTrigger=16 × 16/file).
        try:
            baseline_mapped["full_store_ingest_docs_per_min"] = (
                _full_store_ingest_docs_per_min(spark, sf_dir)
            )
        except Exception as exc:
            _log(f"# bench full-store ingest error: {exc}")
        # Serving latency off the maintained stores (VERDICT r8 #4):
        # p50 ms for indexed hybrid search + indexed grep vs their scan
        # twins — the query-side numbers the reference publishes.
        try:
            baseline_mapped.update(_serving_latency_ms(spark, sf_dir))
            ckpt.clear_unpinned(spark)
        except Exception as exc:
            _log(f"# bench serving-latency error: {exc}")
    except Exception as exc:
        _log(f"# bench baseline-map error: {exc}")
    full["baseline_mapped"] = baseline_mapped
    full["per_seed_ms"] = per_seed_ms
    full["env"]["baseline_sec"] = round(time.perf_counter() - t_base0, 2)
    art.flush(full)

    # Phase 4 — paired interleaved regression adjudication (VERDICT r10
    # #2): raw round-over-round seconds are ±25% host noise, so any query
    # flagged >1.3x vs the reference record is re-run interleaved with
    # drift-anchor queries in this same session and judged on its
    # anchor-normalized paired_ratio instead. Skipped for subset runs
    # (no stable anchor pool); disable with SPARK_GRAFT_BENCH_PAIRED=0.
    full["phase"] = "paired"
    t_pair0 = time.perf_counter()
    paired: dict = {"status": "skipped"}
    if (
        os.environ.get("SPARK_GRAFT_BENCH_PAIRED", "1") != "0"
        and not only
    ):
        ref = _load_reference_record(here, sf, self_ts=art.ts)
        if ref is None:
            paired = {"status": "no_reference"}
        else:
            try:
                paired = _paired_recheck(
                    spark, sf_dir, queries, timings, ref,
                    # VERDICT r13 #3: the adjudication phase must not
                    # outweigh the measurement it de-noises
                    budget_sec=0.5 * full["env"]["timed_sec"],
                )
            except Exception as exc:
                paired = {"status": f"error: {exc}"}
                _log(f"# paired recheck error: {exc}")
        ckpt.clear_unpinned(spark)
    full["paired"] = paired
    full["paired_status"] = paired.get("status")
    full["n_flagged_raw"] = paired.get("n_flagged_raw")
    full["n_paired_regressions"] = paired.get("n_paired_regressions")
    full["env"]["paired_sec"] = round(time.perf_counter() - t_pair0, 2)
    art.flush(full)

    # Phase 5 — 10x stress tier (VERDICT r10 #5, default-ON since r12 per VERDICT
    # r11 #4 — every registry bench run persists the scale-shape ratios
    # as data in bench_history.jsonl): re-measure the four heaviest
    # families' scale shapes (trainer FLAT / LM + frozen-serving
    # SUBLINEAR / LSH pair-linear) on the committed near-dup-heavy
    # stress corpus, same-session base-vs-10x ratios. Adds ~2-3 min;
    # disable with SPARK_GRAFT_BENCH_STRESS10X=0. Skipped automatically
    # for subset (SPARK_GRAFT_BENCH_ONLY) runs.
    full["phase"] = "stress10x"
    t_stress0 = time.perf_counter()
    stress: dict | None = None
    if os.environ.get("SPARK_GRAFT_BENCH_STRESS10X", "1") == "1" and not only:
        from workspace_qdrant_mcp_spark import stress as stressmod

        try:
            stress = stressmod.run_stress10x(
                spark, sf_dir, entrymod.queries()
            )
            _log("# stress10x | query | base_s | 10x_s | ratio | ceiling | ok")
            for qn, r in stress.items():
                _log(
                    f"# stress10x | {qn} | {r['base_sec']} | "
                    f"{r['stress_sec']} | {r['ratio']} | {r['ceiling']} | "
                    f"{'OK' if r['ok'] else 'REGRESSION'}"
                )
        except Exception as exc:
            stress = {"error": str(exc)}
            _log(f"# stress10x error: {exc}")
        ckpt.clear_unpinned(spark)
        _write_perf_notes_stress_table(here, stress, sf)
    # None unless the stress tier ran — the tracked scale-shape ratios
    # land in bench_history.jsonl so a scale regression is caught by
    # diffing history, not re-measured by hand
    full["stress10x"] = stress
    full["env"]["stress_sec"] = round(time.perf_counter() - t_stress0, 2)

    # Final flush + the authoritative summary line. bench_out.json is
    # COMMITTED (un-gitignored in r8, VERDICT r7 #3): the per-round
    # recorder keeps only a ~2 KB stdout tail, which lost 148 of r7's 163
    # per-query timings; the disk artifact is the durable record.
    # bench_history.jsonl keeps exactly one row per run (upserted by ts).
    full["phase"] = "complete"
    sys.stdout.flush()
    art.flush(full, print_line=True)


if __name__ == "__main__":
    main()
