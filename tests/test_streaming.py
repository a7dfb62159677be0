"""Streaming ingestion pipeline: debounce, content dedup, delete, DLQ-free
happy path, checkpointed exactly-once effect, reconciliation (SURVEY §2.8)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from workspace_qdrant_mcp_spark.streaming import ingest


def _write_events(events_dir: str, name: str, rows: list[dict]) -> None:
    os.makedirs(events_dir, exist_ok=True)
    with open(os.path.join(events_dir, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return {
        "events": str(tmp_path / "events"),
        "store": str(tmp_path / "store"),
        "dlq": str(tmp_path / "dlq"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run(spark, d):
    ingest.run_ingestion_stream(
        spark, d["events"], d["store"], d["dlq"], d["ckpt"]
    )


def _store(spark, d):
    return spark.read.parquet(d["store"])


def test_ingest_update_delete_dedup(spark, dirs):
    d = dirs
    # batch 1: two files
    _write_events(d["events"], "b1.json", [
        {"path": "a.txt", "event_type": "create", "content": "alpha " * 50,
         "ts": "2026-01-01T00:00:00"},
        {"path": "b.txt", "event_type": "create", "content": "bravo " * 50,
         "ts": "2026-01-01T00:00:01"},
    ])
    _run(spark, d)
    s1 = _store(spark, d)
    assert s1.select("path").distinct().count() == 2
    assert s1.filter(F.col("embedding").isNull()).count() == 0

    # batch 2: burst of modifies to a.txt (debounce keeps the LAST), delete b
    _write_events(d["events"], "b2.json", [
        {"path": "a.txt", "event_type": "modify", "content": "stale version",
         "ts": "2026-01-01T00:01:00"},
        {"path": "a.txt", "event_type": "modify", "content": "final version",
         "ts": "2026-01-01T00:01:02"},
        {"path": "b.txt", "event_type": "remove", "content": "",
         "ts": "2026-01-01T00:01:03"},
    ])
    _run(spark, d)
    s2 = _store(spark, d)
    paths = {r["path"] for r in s2.select("path").distinct().collect()}
    assert paths == {"a.txt"}
    contents = [r["content"] for r in s2.collect()]
    assert contents == ["final version"]  # debounce: last event won

    # batch 3: re-send identical content → W5 dedup (store byte-identical)
    before = sorted(map(tuple, s2.drop("embedding").collect()))
    _write_events(d["events"], "b3.json", [
        {"path": "a.txt", "event_type": "modify", "content": "final version",
         "ts": "2026-01-01T00:02:00"},
    ])
    _run(spark, d)
    after = sorted(map(tuple, _store(spark, d).drop("embedding").collect()))
    assert before == after

    # rerun with nothing new: checkpoint makes it a no-op (exactly-once effect)
    _run(spark, d)
    again = sorted(map(tuple, _store(spark, d).drop("embedding").collect()))
    assert before == again


def test_apply_events_statuses(spark):
    """Batch S10/W1/W5: every status branch of apply_events, including the
    debounce (later event wins) and the hash-equal W5 skip."""
    base = spark.createDataFrame(
        [("a", "old"), ("b", "same"), ("c", "gone"), ("d", "untouched")],
        ["path", "content"],
    )
    events = spark.createDataFrame(
        [
            ("a", "upsert", "v1", 1),   # superseded by ts=2
            ("a", "upsert", "v2", 2),   # wins → updated
            ("b", "upsert", "same", 1), # hash-equal → kept (W5 skip)
            ("c", "remove", None, 1),   # → absent
            ("e", "upsert", "new", 1),  # → inserted
            ("f", "remove", None, 1),   # remove of absent path → no-op
        ],
        "path STRING, event_type STRING, content STRING, ts LONG",
    )
    out = {r["path"]: r["status"] for r in ingest.apply_events(base, events).collect()}
    assert out == {"a": "updated", "b": "kept", "d": "kept", "e": "inserted"}


def test_watcher_path_filters(spark):
    from workspace_qdrant_mcp_spark.streaming.ingest import filter_watched_paths

    batch = spark.createDataFrame(
        [("src/a.py", "create"), ("target/b.o", "create"),
         ("docs/c.md", "create"), ("src/d.rs", "create")],
        ["path", "event_type"],
    )
    kept = filter_watched_paths(
        batch, ignore_globs=["target/**"], allow_globs=["src/**", "docs/**"]
    )
    assert {r["path"] for r in kept.collect()} == {
        "src/a.py", "docs/c.md", "src/d.rs"
    }


def test_reconciliation_diff(spark, dirs):
    d = dirs
    _write_events(d["events"], "b1.json", [
        {"path": "x.txt", "event_type": "create", "content": "xray",
         "ts": "2026-01-01T00:00:00"},
        {"path": "y.txt", "event_type": "create", "content": "yankee",
         "ts": "2026-01-01T00:00:01"},
    ])
    _run(spark, d)
    # FS truth: x changed, y gone, z new
    fs = spark.createDataFrame(
        [("x.txt", "xray CHANGED"), ("z.txt", "zulu")], ["path", "content"]
    )
    diff = {
        r["path"]: r["status"]
        for r in ingest.reconcile(spark, fs, d["store"]).collect()
    }
    assert diff == {
        "x.txt": "hash_mismatch",
        "y.txt": "stale_in_store",
        "z.txt": "missing_in_store",
    }


def test_watchdog_escalation_and_oneshot_diagnostic():
    wd = ingest.EmbeddingWatchdog(max_attempts=3)
    assert wd.available and wd.next_retry_delay() == 600  # healthy backstop
    delays = [wd.record_failure() for _ in range(7)]
    assert delays == [30, 60, 120, 300, 600, 600, 600]  # holds at backstop
    assert not wd.available
    d = wd.take_diagnostic()
    assert d is not None and d["consecutive_failures"] == 7
    assert wd.take_diagnostic() is None  # one-shot
    wd.record_success()
    assert wd.available and wd.consecutive_failures == 0
    assert wd.take_diagnostic() is None


def test_provider_down_parks_embeds_but_applies_deletes(spark, dirs):
    park = dirs["dlq"] + "_park"
    # seed the store with one path so the delete has a target
    seed = spark.createDataFrame(
        [("a", "h", 0, "x", [0.0])],
        "path STRING, file_hash STRING, chunk_index INT, content STRING, embedding ARRAY<DOUBLE>",
    )
    seed.write.mode("overwrite").parquet(dirs["store"])
    wd = ingest.EmbeddingWatchdog()
    wd.record_failure()  # provider already known-down
    batch = spark.createDataFrame(
        [("b", "create", "new content", "2024-01-01T00:00:00"),
         ("a", "remove", None, "2024-01-01T00:00:01")],
        "path STRING, event_type STRING, content STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ingest.process_batch(
        spark, batch, dirs["store"], dirs["dlq"], watchdog=wd, park_path=park
    )
    store = {r["path"] for r in _store(spark, dirs).collect()}
    assert "a" not in store            # delete applied while degraded
    assert "b" not in store            # embed work did NOT reach the store
    parked = ingest.read_parked(spark, park)
    assert [r["path"] for r in parked.collect()] == ["b"]


def test_embed_failure_flips_flag_parks_then_recovers(spark, dirs):
    park = dirs["dlq"] + "_park"

    def broken_embed(col):
        raise RuntimeError("provider down")

    wd = ingest.EmbeddingWatchdog()
    batch = spark.createDataFrame(
        [("p", "create", "some text", "2024-01-01T00:00:00")],
        "path STRING, event_type STRING, content STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ingest.process_batch(
        spark, batch, dirs["store"], dirs["dlq"],
        watchdog=wd, park_path=park, embed_fn=broken_embed,
    )
    assert not wd.available and wd.consecutive_failures == 1
    import os
    assert not os.path.exists(dirs["store"])  # nothing upserted
    assert not os.path.exists(dirs["dlq"])    # outage is NOT dead-lettered
    # recovery: reprocess the parked events with a healthy provider
    wd.record_success()
    ingest.process_batch(
        spark, ingest.read_parked(spark, park), dirs["store"], dirs["dlq"],
        watchdog=wd, park_path=park,
    )
    assert wd.available
    assert {r["path"] for r in _store(spark, dirs).collect()} == {"p"}


def test_quality_gate_routes_low_quality_to_dlq(spark, dirs):
    good = " ".join(f"word{i:02d}" for i in range(60))  # passes Gopher gates
    batch = spark.createDataFrame(
        [
            ("good", "create", good, "2024-01-01T00:00:00"),
            ("tiny", "create", "too short", "2024-01-01T00:00:01"),
        ],
        "path STRING, event_type STRING, content STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ingest.process_batch(
        spark, batch, dirs["store"], dirs["dlq"], quality_gate=True
    )
    store = {r["path"] for r in _store(spark, dirs).collect()}
    assert store == {"good"}
    dlq = spark.read.parquet(dirs["dlq"])
    rows = {(r["path"], r["error"]) for r in dlq.collect()}
    assert rows == {("tiny", "quality_gate")}


def test_quality_gate_default_off_keeps_everything(spark, dirs):
    batch = spark.createDataFrame(
        [("tiny", "create", "too short", "2024-01-01T00:00:00")],
        "path STRING, event_type STRING, content STRING, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ingest.process_batch(spark, batch, dirs["store"], dirs["dlq"])
    assert {r["path"] for r in _store(spark, dirs).collect()} == {"tiny"}
    import os

    assert not os.path.exists(dirs["dlq"])


# ---------------------------------------------------------------------------
# W9 event-time windows: watermarked tumbling rollup (streaming/windows.py)
# ---------------------------------------------------------------------------

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double"
)


def _run_windowed(spark, events_dir, out_dir, ckpt):
    from workspace_qdrant_mcp_spark.streaming import windows

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    flat = windows.flat_rollup(
        windows.windowed_rollup(stream, "1 hour", watermark="30 minutes")
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _ev(eid, ts, uid, etype, value):
    return {
        "event_id": eid, "ts": ts, "user_id": uid,
        "event_type": etype, "value": value,
    }


def test_windowed_rollup_emits_once_and_drops_late(spark, tmp_path):
    events_dir = str(tmp_path / "wev")
    out_dir = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")

    # hour-00 on-time events + an hour-03 event that advances the
    # watermark (30 min lag) past hour-00's window end
    _write_events(events_dir, "b1.json", [
        _ev(1, "2024-01-01T00:05:00Z", 1, "create", 1.0),
        _ev(2, "2024-01-01T00:10:00Z", 2, "create", 2.0),
        _ev(3, "2024-01-01T00:20:00Z", 3, "modify", 3.0),
        _ev(4, "2024-01-01T03:00:00Z", 4, "create", 4.0),
    ])
    _run_windowed(spark, events_dir, out_dir, ckpt)
    _write_events(events_dir, "b2.json", [
        _ev(5, "2024-01-01T03:10:00Z", 5, "create", 5.0),
    ])
    _run_windowed(spark, events_dir, out_dir, ckpt)

    out = {
        (str(r["window_start"]), r["event_type"]): r
        for r in spark.read.parquet(out_dir).collect()
    }
    h0c = out[("2024-01-01 00:00:00", "create")]
    assert h0c["n_events"] == 2 and h0c["u_lo"] == 1 and h0c["u_hi"] == 2
    assert h0c["sum_value"] == 3.0
    h0m = out[("2024-01-01 00:00:00", "modify")]
    assert h0m["n_events"] == 1 and h0m["sum_value"] == 3.0

    # a LATE hour-00 event (watermark is already 02:40) must be dropped;
    # hour-05/07 events advance + close the later windows
    _write_events(events_dir, "b3.json", [
        _ev(6, "2024-01-01T00:45:00Z", 9, "create", 100.0),
        _ev(7, "2024-01-01T05:00:00Z", 6, "create", 6.0),
    ])
    _run_windowed(spark, events_dir, out_dir, ckpt)
    _write_events(events_dir, "b4.json", [
        _ev(8, "2024-01-01T07:00:00Z", 7, "create", 7.0),
    ])
    _run_windowed(spark, events_dir, out_dir, ckpt)

    rows = spark.read.parquet(out_dir).collect()
    h0_creates = [
        r for r in rows
        if str(r["window_start"]) == "2024-01-01 00:00:00"
        and r["event_type"] == "create"
    ]
    # exactly the original emission: the late event neither re-opened the
    # window (no second append row) nor mutated the counts
    assert len(h0_creates) == 1
    assert h0_creates[0]["n_events"] == 2
    assert h0_creates[0]["sum_value"] == 3.0
    # the hour-03 window closed with BOTH its events (cross-restart state)
    h3 = [
        r for r in rows
        if str(r["window_start"]) == "2024-01-01 03:00:00"
    ]
    assert len(h3) == 1 and h3[0]["n_events"] == 2
    # hour-05 closed once the hour-07 event pushed the watermark past it
    h5 = [
        r for r in rows
        if str(r["window_start"]) == "2024-01-01 05:00:00"
    ]
    assert len(h5) == 1 and h5[0]["n_events"] == 1


def test_windowed_rollup_batch_equals_manual_groupby(spark):
    from workspace_qdrant_mcp_spark.streaming import windows

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:05:00", 1, "create", 1.5),
            (2, "2024-01-01 00:55:00", 2, "create", 2.5),
            (3, "2024-01-01 01:05:00", 1, "modify", 3.0),
        ],
        "event_id long, ts string, user_id long, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (str(r["window_start"]), r["event_type"]): (
            r["n_events"], r["u_lo"], r["u_hi"], r["sum_value"]
        )
        for r in windows.flat_rollup(
            windows.windowed_rollup(df, "1 hour")
        ).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "create"): (2, 1, 2, 4.0),
        ("2024-01-01 01:00:00", "modify"): (1, 1, 1, 3.0),
    }


# ---------------------------------------------------------------------------
# Cross-batch stateful debounce (applyInPandasWithState, streaming/stateful)
# ---------------------------------------------------------------------------

_DEB_SCHEMA = "path string, ts timestamp, event_type string, event_id long"


def _run_debounce(spark, events_dir, out_dir, ckpt):
    from workspace_qdrant_mcp_spark.streaming import stateful

    stream = (
        spark.readStream.schema(_DEB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    deb = stateful.stateful_debounce(
        stream, gap_secs=5, watermark="10 seconds"
    )
    q = (
        deb.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _pev(path, ts, etype, eid):
    return {"path": path, "ts": ts, "event_type": etype, "event_id": eid}


def test_stateful_debounce_emits_last_event_per_quiet_period(spark, tmp_path):
    events_dir = str(tmp_path / "dev")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    # /a gets a 2-event burst (2s apart, inside the 5s gap); /b one event;
    # /c's far-future event drives the watermark past both timeouts
    _write_events(events_dir, "b1.json", [
        _pev("/a", "2024-01-01T00:00:01Z", "create", 1),
        _pev("/a", "2024-01-01T00:00:03Z", "modify", 2),
        _pev("/b", "2024-01-01T00:00:02Z", "create", 3),
        _pev("/c", "2024-01-01T00:01:40Z", "create", 4),
    ])
    _run_debounce(spark, events_dir, out_dir, ckpt)
    _write_events(events_dir, "b2.json", [
        _pev("/c", "2024-01-01T00:03:20Z", "create", 5),
    ])
    _run_debounce(spark, events_dir, out_dir, ckpt)

    rows = {r["path"]: r for r in spark.read.parquet(out_dir).collect()}
    # trailing-edge semantics: the burst collapses to its LAST event
    assert rows["/a"]["event_id"] == 2
    assert rows["/a"]["event_type"] == "modify"
    assert rows["/b"]["event_id"] == 3
    assert "/c" not in rows or rows["/c"]["event_id"] in (4, 5)

    # a NEW /a burst after the flush starts a second debounce period
    _write_events(events_dir, "b3.json", [
        _pev("/a", "2024-01-01T00:04:00Z", "create", 6),
    ])
    _run_debounce(spark, events_dir, out_dir, ckpt)
    _write_events(events_dir, "b4.json", [
        _pev("/c", "2024-01-01T00:10:00Z", "create", 7),
    ])
    _run_debounce(spark, events_dir, out_dir, ckpt)

    a_rows = sorted(
        (
            r["event_id"]
            for r in spark.read.parquet(out_dir).collect()
            if r["path"] == "/a"
        )
    )
    assert a_rows == [2, 6]


def test_repair_converges_reconcile_to_empty(spark, dirs):
    d = dirs
    # seed the store with files a and b
    _write_events(d["events"], "b1.json", [
        {"path": "/w/a", "event_type": "create", "content": "alpha " * 30,
         "ts": "2024-01-01T00:00:01Z"},
        {"path": "/w/b", "event_type": "create", "content": "beta " * 30,
         "ts": "2024-01-01T00:00:02Z"},
    ])
    _run(spark, d)
    # drift: a changed on disk, b vanished, c appeared
    snapshot = spark.createDataFrame(
        [("/w/a", "alpha2 " * 30), ("/w/c", "gamma " * 30)],
        "path string, content string",
    )
    diff = ingest.repair(spark, snapshot, d["store"], d["dlq"])
    got = {r["path"]: r["status"] for r in diff.collect()}
    assert got == {
        "/w/a": "hash_mismatch",
        "/w/b": "stale_in_store",
        "/w/c": "missing_in_store",
    }
    # convergence: nothing left to reconcile, store matches the snapshot
    assert ingest.reconcile(spark, snapshot, d["store"]).count() == 0
    paths = {
        r["path"] for r in _store(spark, d).select("path").distinct().collect()
    }
    assert paths == {"/w/a", "/w/c"}
    # idempotent: a second repair is a no-op diff
    assert ingest.repair(spark, snapshot, d["store"], d["dlq"]).count() == 0


def test_compact_store_shrinks_files_preserves_rows(spark, dirs):
    d = dirs
    # several micro-batches -> several store rewrites; fragment the store
    for i in range(3):
        _write_events(d["events"], f"c{i}.json", [
            {"path": f"/w/f{i}", "event_type": "create",
             "content": f"word{i} " * 40,
             "ts": f"2024-01-01T00:00:0{i + 1}Z"},
        ])
        _run(spark, d)
    before = {
        tuple(r) for r in _store(spark, d)
        .select("path", "chunk_index", "content").collect()
    }
    stats = ingest.compact_store(spark, d["store"], target_rows_per_file=10**6)
    after = {
        tuple(r) for r in _store(spark, d)
        .select("path", "chunk_index", "content").collect()
    }
    assert after == before and len(after) > 0
    assert stats["files_after"] == 1
    assert stats["rows"] == len(before)


class TestFairnessScheduler:
    """W7 anti-starvation alternation (fairness_scheduler.rs:114-290,
    ordering dequeue.rs:320-410)."""

    def _queue(self, spark, n_active=20, n_inactive=20):
        # 2-tenant burst: tenant A is an active project, tenant B
        # inactive — both enqueue file adds at t=0..n
        rows = [
            (f"a{i}", "A", "file", "add", "projects", 1, i)
            for i in range(n_active)
        ] + [
            (f"b{i}", "B", "file", "add", "projects", 0, i)
            for i in range(n_inactive)
        ]
        return spark.createDataFrame(
            rows,
            "queue_id string, tenant_id string, item_type string, "
            "op string, collection string, is_active int, created_ts long",
        )

    def test_two_tenant_burst_interleaves(self, spark):
        from workspace_qdrant_mcp_spark.streaming import fairness as fs

        sched = fs.FairnessScheduler()
        batches = fs.drain_fairly(
            sched, self._queue(spark), max_batch_size=10, now_ts=0
        )
        order = [r["tenant_id"] for b in batches for r in b]
        assert len(order) == 40
        # high pass: 10 active items; flip; low pass: inactive get a turn
        assert order[:10] == ["A"] * 10
        assert order[10] == "B"
        # the inactive tenant makes progress long before the active
        # burst drains (anti-starvation), and both fully drain
        assert "B" in set(order[:15])
        assert order.count("A") == 20 and order.count("B") == 20
        assert sched.metrics.direction_flips_total >= 2
        assert sched.metrics.high_priority_first_items > 0
        assert sched.metrics.low_priority_first_items > 0

    def test_disabled_is_pure_priority_desc(self, spark):
        from workspace_qdrant_mcp_spark.streaming import fairness as fs

        sched = fs.FairnessScheduler(fs.FairnessConfig(enabled=False))
        batches = fs.drain_fairly(
            sched, self._queue(spark), max_batch_size=10, now_ts=0
        )
        order = [r["tenant_id"] for b in batches for r in b]
        # active tenant monopolizes until fully drained
        assert order[:20] == ["A"] * 20 and order[20:] == ["B"] * 20

    def test_delete_and_age_promotions_are_direction_invariant(self, spark):
        from workspace_qdrant_mcp_spark.streaming import fairness as fs

        rows = [
            # old inactive add: age 1000s -> +2 promotion
            ("old", "B", "file", "add", "projects", 0, 0),
            # active delete: always first
            ("del", "A", "file", "delete", "projects", 1, 990),
            # fresh active adds
            *[(f"a{i}", "A", "file", "add", "projects", 1, 995) for i in range(5)],
            # tenant registration line-jump
            ("reg", "C", "tenant", "add", "projects", 0, 999),
        ]
        q = spark.createDataFrame(
            rows,
            "queue_id string, tenant_id string, item_type string, "
            "op string, collection string, is_active int, created_ts long",
        )
        sched = fs.FairnessScheduler()
        batch = sched.dequeue_next_batch(q, max_batch_size=8, now_ts=1000)
        ids = [r["queue_id"] for r in batch]
        # delete first, then the registration line-jump, then the aged
        # item (promoted above fresh active work), then fresh adds
        assert ids[0] == "del"
        assert ids[1] == "reg"
        assert ids[2] == "old"
        assert set(ids[3:]) == {f"a{i}" for i in range(5)}


def test_session_rollup_stream_equals_batch(spark, tmp_path):
    """The session_window expression runs identically in batch and as a
    watermarked stream (Structured Streaming's unification contract):
    drain a file-source stream with availableNow and compare against the
    batch run over the same events."""
    from workspace_qdrant_mcp_spark.streaming import windows

    events_dir = str(tmp_path / "sev")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    # user 1: two sessions (gap 10 min, events 30 min apart); user 2:
    # one session of 3 events incl. an exactly-gap extension
    evs = [
        _ev(1, "2024-01-01T00:00:00Z", 1, "create", 1.0),
        _ev(2, "2024-01-01T00:05:00Z", 1, "modify", 2.0),
        _ev(3, "2024-01-01T00:35:00Z", 1, "create", 3.0),
        _ev(4, "2024-01-01T00:00:00Z", 2, "create", 4.0),
        _ev(5, "2024-01-01T00:10:00Z", 2, "modify", 5.0),
        _ev(6, "2024-01-01T00:20:00Z", 2, "modify", 6.0),
        # far-future event to push the watermark past every session end
        _ev(7, "2024-01-02T00:00:00Z", 9, "create", 0.0),
    ]
    _write_events(events_dir, "b1.json", evs)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    flat = windows.flat_session_rollup(
        windows.session_rollup(stream, "10 minutes", watermark="5 minutes")
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import datetime as _dt

    batch_df = spark.createDataFrame(
        [
            (
                e["event_id"],
                _dt.datetime.strptime(e["ts"], "%Y-%m-%dT%H:%M:%SZ"),
                e["user_id"],
                e["event_type"],
                e["value"],
            )
            for e in evs
        ],
        _EV_SCHEMA,
    )
    batch = windows.flat_session_rollup(
        windows.session_rollup(batch_df, "10 minutes")
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }
    # user 9 is the watermark-advancing sentinel: its own session's end
    # is never passed by the watermark, so append mode correctly holds
    # it back — compare the CLOSED sessions
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
        if r["user_id"] != 9
    }
    assert got == want
    # structure sanity: user 1 split in two, user 2's exactly-gap event
    # merged into one 3-event session
    by_user = {}
    for u, *_rest, n in [(r[0], r[1], r[2], r[3]) for r in want]:
        by_user.setdefault(u, []).append(n)
    assert sorted(by_user[1]) == [1, 2]
    assert by_user[2] == [3]


def test_graph_store_lockstep_with_stream(spark, tmp_path):
    """S8 maintained graph sink through the real micro-batch path:
    create/modify/remove events drive update_graph_store, and after each
    batch the store equals a full extract_symbols rebuild over the
    surviving corpus (incl. cross-file call rewiring)."""
    from workspace_qdrant_mcp_spark.operators import graph_extract as gx
    from workspace_qdrant_mcp_spark.operators import graph_store as gs
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    gdir = str(tmp_path / "graph")

    def batch(rows):
        return spark.createDataFrame(rows, ingest.EVENT_SCHEMA)

    def check(corpus_rows):
        corpus = spark.createDataFrame(
            [("default", p, c) for p, c in corpus_rows],
            "tenant_id string, file_path string, content string",
        )
        nodes, tokens, edges = gs.read_graph_store(spark, gdir)
        rn, re_ = gx.extract_symbols(corpus)

        def canon(df):
            cols = sorted(df.columns)
            return sorted(tuple(r) for r in df.select(*cols).collect())

        assert canon(nodes) == canon(rn)
        assert canon(edges) == canon(re_)

    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    a = "def alpha():\n    beta()\n"
    b = "def beta():\n    pass\n"
    ingest.process_batch(
        spark,
        batch([("a.py", "create", a, t), ("b.py", "create", b, t)]),
        store, dlq, graph_store_dir=gdir,
    )
    check([("a.py", a), ("b.py", b)])

    # modify b.py: beta -> beta2 (a.py's call edge must unresolve)
    b2 = "def beta2():\n    pass\n"
    ingest.process_batch(
        spark,
        batch([("b.py", "modify", b2, t)]),
        store, dlq, graph_store_dir=gdir,
    )
    check([("a.py", a), ("b.py", b2)])

    # remove b.py entirely
    ingest.process_batch(
        spark,
        batch([("b.py", "remove", None, t)]),
        store, dlq, graph_store_dir=gdir,
    )
    check([("a.py", a)])


def test_signature_store_lockstep_with_stream(spark, tmp_path):
    """Third maintained sink through the micro-batch path: the minhash
    signature store tracks create/modify/remove and always equals a full
    re-sign of the surviving corpus."""
    from workspace_qdrant_mcp_spark.functions.hashing import md5_hash64
    from workspace_qdrant_mcp_spark.operators import dedup
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    sigp = str(tmp_path / "sigs")

    import datetime as dt

    t = dt.datetime(2024, 1, 1)

    def batch(rows):
        return spark.createDataFrame(rows, ingest.EVENT_SCHEMA)

    def check(corpus_rows):
        corpus = spark.createDataFrame(
            corpus_rows, "path string, text string"
        ).select(md5_hash64(F.col("path")).alias("doc_id"), "text")
        want = sorted(
            tuple(r) for r in dedup.minhash_signatures(corpus).collect()
        )
        got = sorted(
            tuple(r)
            for r in dedup.read_signature_store(spark, sigp).collect()
        )
        assert got == want

    ingest.process_batch(
        spark,
        batch([("a.txt", "create", "alpha text " * 10, t),
               ("b.txt", "create", "bravo text " * 10, t)]),
        store, dlq, signature_store_path=sigp,
    )
    check([("a.txt", "alpha text " * 10), ("b.txt", "bravo text " * 10)])

    ingest.process_batch(
        spark,
        batch([("a.txt", "modify", "changed body " * 10, t),
               ("b.txt", "remove", None, t)]),
        store, dlq, signature_store_path=sigp,
    )
    check([("a.txt", "changed body " * 10)])


def test_static_drain_equals_live_drain(spark):
    """drain_fairly_static (two materialized orderings + driver replay)
    must produce byte-identical batches and final metrics to the live
    per-round-sort drain on a static queue."""
    from workspace_qdrant_mcp_spark.streaming import fairness as fs

    rows = (
        [(f"a{i}", "A", "file", "add", "projects", 1, i) for i in range(17)]
        + [(f"b{i}", "B", "file", "scan", "projects", 0, i) for i in range(14)]
        + [("d0", "A", "file", "delete", "projects", 1, 3)]
    )
    q = spark.createDataFrame(
        rows,
        "queue_id string, tenant_id string, item_type string, "
        "op string, collection string, is_active int, created_ts long",
    )
    live = fs.FairnessScheduler()
    static = fs.FairnessScheduler()
    lb = fs.drain_fairly(live, q, max_batch_size=10, now_ts=100)
    sb = fs.drain_fairly_static(static, q, max_batch_size=10, now_ts=100)
    assert [[r["queue_id"] for r in b] for b in lb] == [
        [r["queue_id"] for r in b] for b in sb
    ]
    assert live.metrics == static.metrics


def test_streaming_hll_registers_equal_batch_prefix(spark, tmp_path):
    """Cross-batch streaming HLL (applyInPandasWithState): after
    draining two micro-batches, each key's state registers — and the
    emitted estimate — equal a BATCH hll build over everything seen.
    The max-merge law is what makes the sketch streamable."""
    import math

    from workspace_qdrant_mcp_spark.operators import sketches
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "hev")
    out_dir = str(tmp_path / "hout")
    ckpt = str(tmp_path / "hckpt")
    b1 = [
        {"event_id": i, "ts": f"2024-01-01T00:00:{i:02d}Z",
         "user_id": 100 + (i % 7), "event_type": "view", "value": 0.0}
        for i in range(20)
    ]
    b2 = [
        {"event_id": 100 + i, "ts": f"2024-01-01T01:00:{i:02d}Z",
         "user_id": 100 + (i % 13), "event_type": "view", "value": 0.0}
        for i in range(20)
    ] + [
        {"event_id": 200, "ts": "2024-01-01T01:30:00Z",
         "user_id": 999, "event_type": "click", "value": 0.0}
    ]
    _write_events(events_dir, "b1.json", b1)
    _write_events(events_dir, "b2.json", b2)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stateful.streaming_hll(stream)
        .writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir).collect()
    # 'view' touched in both batches -> two emissions; the LAST (max
    # n_seen) reflects the full prefix
    view_rows = sorted(
        (r for r in out if r["key"] == "view"), key=lambda r: r["n_seen"]
    )
    assert [r["n_seen"] for r in view_rows] == [20, 40]
    final_est = view_rows[-1]["estimate"]

    all_events = spark.createDataFrame(
        [(e["user_id"],) for e in b1 + b2 if e["event_type"] == "view"],
        ["user_id"],
    )
    batch = sketches.hll_estimate(all_events, "user_id").collect()[0]
    assert abs(final_est - batch["hll_estimate"]) < 1e-6
    # exactness sanity: 13 distinct users, estimate within HLL error
    assert abs(final_est - 13) / 13 < 3 * 1.04 / math.sqrt(256) + 0.2

    click = [r for r in out if r["key"] == "click"]
    assert len(click) == 1 and click[0]["n_seen"] == 1


def test_op_weight_direction_invariant(spark):
    """ADVICE r6: op weight is ALWAYS DESC — on the anti-starvation
    (ASC) pass, heavier ops still dequeue before lighter ones within the
    same priority band (dequeue.rs:76-79 pins op_order on BOTH passes)."""
    from workspace_qdrant_mcp_spark.streaming import fairness as fs

    # all inactive (priority 0) so the ASC pass reaches them first; ops
    # span the weight ladder at identical timestamps
    rows = [
        ("u1", "B", "file", "uplift", "projects", 0, 0),
        ("a1", "B", "file", "add", "projects", 0, 0),
        ("r1", "B", "file", "rename", "projects", 0, 0),
        ("s1", "B", "file", "scan", "projects", 0, 0),
        ("up1", "B", "file", "update", "projects", 0, 0),
    ]
    q = spark.createDataFrame(
        rows,
        "queue_id string, tenant_id string, item_type string, "
        "op string, collection string, is_active int, created_ts long",
    )
    expected = ["a1", "up1", "r1", "u1", "s1"]  # add>update>rename>uplift>scan
    for descending in (True, False):
        cols = fs.dequeue_sort_cols(descending, F.lit(0), 300, 900)
        got = [r["queue_id"] for r in q.orderBy(*cols).collect()]
        assert got == expected, (descending, got)


def test_fair_ingestion_stream_interleaves_tenants(spark, tmp_path):
    """VERDICT r6 #5 — W7 end-to-end: the FairnessScheduler runs as the
    dequeue layer INSIDE the ingestion stream's foreachBatch. A 2-tenant
    burst (active tenant A floods 20 files, inactive tenant B enqueues
    12) must process in scheduler order: 10 A (high pass), then B gets a
    turn (low pass) long before A's burst drains, with everything
    ingested exactly once."""
    d = {
        "events": str(tmp_path / "events"),
        "store": str(tmp_path / "store"),
        "dlq": str(tmp_path / "dlq"),
        "ckpt": str(tmp_path / "ckpt"),
        "log": str(tmp_path / "plog"),
    }
    evs = [
        {"path": f"A/f{i}.txt", "event_type": "create",
         "content": f"alpha {i} " * 30, "ts": f"2026-01-01T00:00:{i:02d}"}
        for i in range(20)
    ] + [
        {"path": f"B/g{i}.txt", "event_type": "create",
         "content": f"bravo {i} " * 30, "ts": f"2026-01-01T00:00:{i:02d}"}
        for i in range(12)
    ]
    _write_events(d["events"], "b1.json", evs)
    ingest.run_fair_ingestion_stream(
        spark, d["events"], d["store"], d["dlq"], d["ckpt"],
        active_tenants=["A"], processing_log_path=d["log"],
    )
    log = (
        spark.read.parquet(d["log"])
        .orderBy("seq")
        .select("tenant_id")
        .collect()
    )
    order = [r["tenant_id"] for r in log]
    assert len(order) == 32
    # high-priority pass: the active tenant's first 10; then the
    # anti-starvation flip gives B a turn before A's burst drains
    assert order[:10] == ["A"] * 10
    assert order[10] == "B"
    assert "B" in set(order[:15])
    assert order.count("A") == 20 and order.count("B") == 12
    # every file ingested exactly once, both tenants present
    store = spark.read.parquet(d["store"])
    paths = [r["path"] for r in store.select("path").collect()]
    assert len(paths) == len(set(paths)) == 32
    assert {p.split("/")[0] for p in paths} == {"A", "B"}


def test_process_batch_releases_its_checkpoints(spark, tmp_path):
    """ADVICE r6: process_batch must not leak localCheckpoint storage —
    every block created during the call (debounce, store staging, delta
    pins) is released on exit, so a long-running stream's storage
    footprint is flat across micro-batches."""
    from workspace_qdrant_mcp_spark import ckpt

    store = str(tmp_path / "store")
    dlq = str(tmp_path / "dlq")
    batch = spark.createDataFrame(
        [("x.txt", "create", "hello " * 40, "2026-01-01T00:00:00")],
        "path string, event_type string, content string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    before = ckpt.persistent_ids(spark)
    ingest.process_batch(spark, batch, store, dlq)
    after = ckpt.persistent_ids(spark)
    leaked = after - before
    assert not leaked, f"leaked persistent blocks: {leaked}"
    assert spark.read.parquet(store).count() > 0


def test_streaming_heavy_hitters_candidates_survive(spark, tmp_path):
    """Cross-batch streaming Misra-Gries: after two micro-batches, every
    key whose TOTAL count exceeds its hash-group's n/(capacity+1) bound
    must appear in the group's latest summary — the candidate guarantee
    the batch heavy_hitters verify phase relies on (here the grouping is
    BY KEY HASH, so a key's occurrences all accumulate in one group's
    state and the bound is group-local)."""
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "mgev")
    out_dir = str(tmp_path / "mgout")
    ck = str(tmp_path / "mgckpt")
    # 'hot' appears 30x per batch; tail keys once each
    def mk(eid0, batch_tag):
        rows = [
            {"event_id": eid0 + i, "ts": f"2024-01-01T00:00:{i % 60:02d}Z",
             "user_id": 777, "event_type": "view", "value": 0.0}
            for i in range(30)
        ] + [
            {"event_id": eid0 + 100 + i, "ts": f"2024-01-01T00:01:{i % 60:02d}Z",
             "user_id": 1000 * batch_tag + i, "event_type": "view", "value": 0.0}
            for i in range(40)
        ]
        return rows

    _write_events(events_dir, "b1.json", mk(0, 1))
    _write_events(events_dir, "b2.json", mk(1000, 2))
    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stateful.streaming_heavy_hitters(stream, capacity=8, n_groups=4)
        .writeStream.foreachBatch(
            lambda b, bid: b.withColumn("bid", F.lit(bid))
            .write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    last = out.filter(F.col("bid") == out.agg(F.max("bid")).first()[0])
    rows = last.collect()
    hot = [r for r in rows if r["key"] == "777"]
    assert hot, "heavy key must survive in its group's summary"
    # MG undercount bound: est >= true_count - n_group/(capacity+1)
    r = hot[0]
    assert r["est"] >= 60 - r["n_group"] // 9
    # state is bounded: no group tracks more than capacity keys
    per_grp = last.groupBy("grp").count().collect()
    assert all(x["count"] <= 8 for x in per_grp)


def test_streaming_decayed_counts_equal_batch_prefix(spark, tmp_path):
    """Cross-batch streaming decayed counters: after draining two
    micro-batches, each key's (ref_epoch, decayed_count) — rescaled to
    the global reference for keys the last batch never touched — equals
    the BATCH decayed_popularity over everything seen. The rescale law
    is the whole point: state is two numbers per key, history is never
    re-read."""
    from workspace_qdrant_mcp_spark.operators import temporal
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "dev")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    # batch 1: views and clicks at hour 0; batch 2: views only, 24h later
    # (clicks' final state keeps the OLD reference -> the test exercises
    # the snapshot rescale explicitly)
    b1 = [
        {"event_id": i, "ts": f"2024-01-01T00:00:{i:02d}Z",
         "user_id": i, "event_type": "view", "value": 0.0}
        for i in range(10)
    ] + [
        {"event_id": 100 + i, "ts": f"2024-01-01T00:10:{i:02d}Z",
         "user_id": i, "event_type": "click", "value": 0.0}
        for i in range(5)
    ]
    b2 = [
        {"event_id": 200 + i, "ts": f"2024-01-02T00:00:{i:02d}Z",
         "user_id": i, "event_type": "view", "value": 0.0}
        for i in range(10)
    ]
    _write_events(events_dir, "b1.json", b1)
    _write_events(events_dir, "b2.json", b2)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stateful.streaming_decayed_counts(stream, half_life_hours=24.0)
        .writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # newest emission per key = the carried state
    final = {}
    for r in spark.read.parquet(out_dir).collect():
        if r.key not in final or r.raw_count > final[r.key].raw_count:
            final[r.key] = r

    all_ev = spark.createDataFrame(
        [tuple(d.values()) for d in b1 + b2],
        "event_id long, ts string, user_id long, event_type string, "
        "value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    batch = {
        r.event_type: r for r in temporal.decayed_popularity(all_ev).collect()
    }
    t_global = max(r.ref_epoch for r in final.values())
    for key, b in batch.items():
        s = final[key]
        assert s.raw_count == b.raw_count, key
        rescaled = s.decayed_count * 0.5 ** (
            (t_global - s.ref_epoch) / 3600.0 / 24.0
        )
        assert abs(rescaled - b.decayed_count) < 1e-6, (
            key, rescaled, b.decayed_count)
    # the untouched key really did keep its old reference
    assert final["click"].ref_epoch < t_global


def test_sliding_rollup_stream_equals_batch(spark, tmp_path):
    """The hopping-window expression (2 windows per event: 20 min length,
    10 min hop) runs identically in batch and as a watermarked stream —
    the same unification contract the tumbling and session rollups pin."""
    from workspace_qdrant_mcp_spark.streaming import windows

    events_dir = str(tmp_path / "hev")
    out_dir = str(tmp_path / "hout")
    ckpt = str(tmp_path / "hckpt")
    evs = [
        _ev(1, "2024-01-01T00:00:00Z", 1, "create", 1.0),
        _ev(2, "2024-01-01T00:05:00Z", 1, "create", 2.0),
        _ev(3, "2024-01-01T00:12:00Z", 1, "modify", 3.0),
        _ev(4, "2024-01-01T00:25:00Z", 2, "create", 4.0),
        # far-future event to push the watermark past every window end
        _ev(5, "2024-01-02T00:00:00Z", 9, "sentinel", 0.0),
    ]
    _write_events(events_dir, "b1.json", evs)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    flat = windows.flat_sliding_rollup(
        windows.sliding_rollup(
            stream, "20 minutes", "10 minutes", watermark="5 minutes"
        )
    )
    q = (
        flat.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import datetime as _dt

    batch_df = spark.createDataFrame(
        [
            (
                e["event_id"],
                _dt.datetime.strptime(e["ts"], "%Y-%m-%dT%H:%M:%SZ"),
                e["user_id"],
                e["event_type"],
                e["value"],
            )
            for e in evs
        ],
        _EV_SCHEMA,
    )
    batch = windows.flat_sliding_rollup(
        windows.sliding_rollup(batch_df, "20 minutes", "10 minutes")
    )
    got = {
        (r["window_start"], r["window_end"], r["event_type"],
         r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        (r["window_start"], r["window_end"], r["event_type"],
         r["n_events"], r["sum_value"])
        for r in batch.collect()
        if r["event_type"] != "sentinel"
    }
    assert got == want
    # overlap sanity: every event appears in exactly len/slide = 2
    # windows, so total n_events across windows (sentinel excluded) = 2x4
    assert sum(n for *_x, n, _s in want) == 8


def test_streaming_bottomk_sample_equals_batch_prefix(spark, tmp_path):
    """Cross-batch consistent bottom-k sample (applyInPandasWithState):
    after draining two micro-batches, each key's latest emitted sample
    equals the BATCH bottomk_sample over everything seen — the
    bottom-k-of-union merge law is what makes the sample maintainable
    with k-pair state."""
    from workspace_qdrant_mcp_spark.operators import sketches
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "sev")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    b1 = [
        {"event_id": i, "ts": f"2024-01-01T00:00:{i:02d}Z",
         "user_id": 100 + (i % 7), "event_type": "view", "value": 0.0}
        for i in range(20)
    ]
    b2 = [
        {"event_id": 100 + i, "ts": f"2024-01-01T01:00:{i:02d}Z",
         "user_id": 100 + (i % 13), "event_type": "view", "value": 0.0}
        for i in range(20)
    ] + [
        {"event_id": 200, "ts": "2024-01-01T01:30:00Z",
         "user_id": 999, "event_type": "click", "value": 0.0}
    ]
    _write_events(events_dir, "b1.json", b1)
    _write_events(events_dir, "b2.json", b2)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stateful.streaming_bottomk_sample(stream, k=5)
        .writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir).collect()
    # final 'view' emission = rows carrying the max n_seen (full prefix)
    final = sorted(
        ((r["rnk"], r["value"]) for r in out
         if r["key"] == "view" and r["n_seen"] == 40)
    )
    assert len(final) == 5
    all_events = spark.createDataFrame(
        [("view", e["user_id"]) for e in b1 + b2 if e["event_type"] == "view"],
        ["event_type", "user_id"],
    )
    want = sorted(
        ((r["rnk"], r["value"])
         for r in sketches.bottomk_sample(
             all_events, "event_type", "user_id", k=5
         ).collect())
    )
    assert final == want
    # under-full key: click has 1 distinct value -> 1-row sample
    click = [r for r in out if r["key"] == "click"]
    assert len(click) == 1 and click[0]["rnk"] == 1 and click[0]["value"] == "999"
    # the first 'view' emission (prefix=b1) equals the batch over b1 alone
    first = sorted(
        ((r["rnk"], r["value"]) for r in out
         if r["key"] == "view" and r["n_seen"] == 20)
    )
    b1_events = spark.createDataFrame(
        [("view", e["user_id"]) for e in b1], ["event_type", "user_id"]
    )
    want1 = sorted(
        ((r["rnk"], r["value"])
         for r in sketches.bottomk_sample(
             b1_events, "event_type", "user_id", k=5
         ).collect())
    )
    assert first == want1


def test_feature_store_lockstep_with_stream(spark, tmp_path):
    """Fourth maintained sink through the micro-batch path: the per-doc
    feature store tracks create/modify/remove and always equals a fresh
    doc_features build over the surviving corpus — so the corpus data
    card read off the store is exact without touching document text."""
    from workspace_qdrant_mcp_spark.functions.hashing import md5_hash64
    from workspace_qdrant_mcp_spark.operators import feature_store as fsx
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    featp = str(tmp_path / "feats")

    import datetime as dt

    t = dt.datetime(2024, 1, 1)

    def batch(rows):
        return spark.createDataFrame(rows, ingest.EVENT_SCHEMA)

    def check(corpus_rows):
        corpus = spark.createDataFrame(
            corpus_rows, "path string, text string"
        ).select(md5_hash64(F.col("path")).alias("doc_id"), "text")
        want = sorted(
            tuple(r) for r in fsx.doc_features(corpus).collect()
        )
        got = sorted(
            tuple(r)
            for r in fsx.read_feature_store(spark, featp).collect()
        )
        assert got == want
        # the card off the store equals the card off a fresh build
        want_card = sorted(
            tuple(r)
            for r in fsx.corpus_card(fsx.doc_features(corpus)).collect()
        )
        got_card = sorted(
            tuple(r)
            for r in fsx.corpus_card(
                fsx.read_feature_store(spark, featp)
            ).collect()
        )
        assert got_card == want_card

    ingest.process_batch(
        spark,
        batch([("a.txt", "create", "the quick brown fox " * 8, t),
               ("b.txt", "create", "le chat et le chien " * 8, t)]),
        store, dlq, feature_store_path=featp,
    )
    check([("a.txt", "the quick brown fox " * 8),
           ("b.txt", "le chat et le chien " * 8)])

    ingest.process_batch(
        spark,
        batch([("a.txt", "modify", "short!!", t),
               ("b.txt", "remove", None, t)]),
        store, dlq, feature_store_path=featp,
    )
    check([("a.txt", "short!!")])


def test_ppl_store_lockstep_with_stream(spark, tmp_path):
    """Eighth maintained sink through the micro-batch path: per-doc
    perplexity scores under a FROZEN Kneser-Ney bigram model track
    create/modify/remove and always equal a fresh kn_score_with() over
    the surviving corpus — quality gates read the store, never re-score
    (and the model is never retrained at ingest)."""
    from workspace_qdrant_mcp_spark.operators import textstats
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    pplp = str(tmp_path / "ppl")

    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the slow brown cat")],
        "doc_id long, text string",
    )
    model = textstats.kn_bigram_model(ref).localCheckpoint()

    import datetime as dt

    t = dt.datetime(2024, 1, 1)

    def batch(rows):
        return spark.createDataFrame(rows, ingest.EVENT_SCHEMA)

    def check(corpus_rows):
        corpus = spark.createDataFrame(
            corpus_rows, "doc_id string, text string"
        )
        want = sorted(
            tuple(r) for r in textstats.kn_score_with(corpus, model).collect()
        )
        got = sorted(
            tuple(r)
            for r in textstats.read_ppl_store(
                spark, pplp, id_type="string"
            ).collect()
        )
        assert got == want

    ingest.process_batch(
        spark,
        batch([("a.txt", "create", "the quick brown fox ran", t),
               ("b.txt", "create", "wholly novel words here", t)]),
        store, dlq, ppl_store_path=pplp, lm_model=model,
    )
    check([("a.txt", "the quick brown fox ran"),
           ("b.txt", "wholly novel words here")])

    ingest.process_batch(
        spark,
        batch([("a.txt", "modify", "the slow brown fox", t),
               ("b.txt", "remove", None, t)]),
        store, dlq, ppl_store_path=pplp, lm_model=model,
    )
    check([("a.txt", "the slow brown fox")])


def test_ppl_gate_routes_high_perplexity_to_dlq(spark, tmp_path):
    """CCNet-at-ingest: with a frozen KN model and ppl_gate set, the
    out-of-domain doc dead-letters with reason 'ppl_gate', the
    in-domain doc ingests, and a doc too short to score passes (no
    evidence, no rejection)."""
    from workspace_qdrant_mcp_spark.operators import textstats
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")

    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    model = textstats.kn_bigram_model(ref).localCheckpoint()

    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [("good.txt", "create", "the quick brown fox jumps", t),
         ("alien.txt", "create", "zzq glorp xyzzy wub fnord blart", t),
         ("short.txt", "create", "solo", t)],
        ingest.EVENT_SCHEMA,
    )
    # pick the threshold between the two scored docs so the split is real
    scores = {
        r["doc_id"]: r["logppl"]
        for r in textstats.kn_score_with(
            spark.createDataFrame(
                [(1, "the quick brown fox jumps"),
                 (2, "zzq glorp xyzzy wub fnord blart")],
                "doc_id long, text string",
            ),
            model,
        ).collect()
    }
    assert scores[1] < scores[2]
    gate = (scores[1] + scores[2]) / 2
    ingest.process_batch(
        spark, batch, store, dlq, lm_model=model, ppl_gate=gate
    )
    stored = {
        r["path"]
        for r in spark.read.parquet(store).select("path").distinct().collect()
    }
    assert stored == {"good.txt", "short.txt"}
    dlq_rows = spark.read.parquet(dlq).collect()
    assert [(r["path"], r["error"]) for r in dlq_rows] == [
        ("alien.txt", "ppl_gate")
    ]


def test_ppl_gate_and_store_together_stay_lockstep(spark, tmp_path):
    """Gate + sink in one batch: the sink reuses the gate's scored rows
    (no second scoring pass) and the store still equals a fresh
    kn_score_with over the SURVIVING corpus — rejected docs are in
    neither the chunk store nor the scores store."""
    from workspace_qdrant_mcp_spark.operators import textstats
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    pplp = str(tmp_path / "ppl")
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog")
         for i in range(4)],
        "doc_id long, text string",
    )
    model = textstats.kn_bigram_model(ref).localCheckpoint()
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [("good.txt", "create", "the quick brown fox", t),
         ("alien.txt", "create", "zzq glorp xyzzy wub fnord", t),
         ("short.txt", "create", "solo", t)],
        ingest.EVENT_SCHEMA,
    )
    sc = {
        r["doc_id"]: r["logppl"]
        for r in textstats.kn_score_with(
            spark.createDataFrame(
                [(1, "the quick brown fox"),
                 (2, "zzq glorp xyzzy wub fnord")],
                "doc_id long, text string",
            ),
            model,
        ).collect()
    }
    gate = (sc[1] + sc[2]) / 2
    ingest.process_batch(
        spark, batch, store, dlq,
        lm_model=model, ppl_gate=gate, ppl_store_path=pplp,
    )
    surviving = spark.createDataFrame(
        [("good.txt", "the quick brown fox"),
         ("short.txt", "solo")],
        "doc_id string, text string",
    )
    want = sorted(
        tuple(r) for r in textstats.kn_score_with(surviving, model).collect()
    )
    got = sorted(
        tuple(r)
        for r in textstats.read_ppl_store(
            spark, pplp, id_type="string"
        ).collect()
    )
    assert got == want
    assert [r["path"] for r in spark.read.parquet(dlq).collect()] == [
        "alien.txt"
    ]


def test_ppl_gate_accepts_trigram_model(spark, tmp_path):
    """lm_order=3: the ingest gate + maintained scores store run off a
    frozen kn_trigram_model with kn3_score_with (VERDICT r10 #4) — the
    out-of-domain doc dead-letters, the store equals a fresh
    kn3_score_with over the surviving corpus, and the count column is
    the order-3 one."""
    from workspace_qdrant_mcp_spark.operators import textstats
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    pplp = str(tmp_path / "ppl3")
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog")
         for i in range(4)],
        "doc_id long, text string",
    )
    model = textstats.kn_trigram_model(ref).localCheckpoint()
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [("good.txt", "create", "the quick brown fox jumps", t),
         ("alien.txt", "create", "zzq glorp xyzzy wub fnord blart", t),
         ("short.txt", "create", "two words", t)],  # < 3 tokens: passes
        ingest.EVENT_SCHEMA,
    )
    sc = {
        r["doc_id"]: r["logppl"]
        for r in textstats.kn3_score_with(
            spark.createDataFrame(
                [(1, "the quick brown fox jumps"),
                 (2, "zzq glorp xyzzy wub fnord blart")],
                "doc_id long, text string",
            ),
            model,
        ).collect()
    }
    assert sc[1] < sc[2]
    gate = (sc[1] + sc[2]) / 2
    ingest.process_batch(
        spark, batch, store, dlq,
        lm_model=model, ppl_gate=gate, ppl_store_path=pplp, lm_order=3,
    )
    stored = {
        r["path"]
        for r in spark.read.parquet(store).select("path").distinct()
        .collect()
    }
    assert stored == {"good.txt", "short.txt"}
    assert [(r["path"], r["error"])
            for r in spark.read.parquet(dlq).collect()] == [
        ("alien.txt", "ppl_gate")
    ]
    surviving = spark.createDataFrame(
        [("good.txt", "the quick brown fox jumps"),
         ("short.txt", "two words")],
        "doc_id string, text string",
    )
    got = sorted(
        tuple(r)
        for r in textstats.read_ppl_store(
            spark, pplp, id_type="string", order=3
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in textstats.kn3_score_with(surviving, model).collect()
    )
    assert got == want
    assert "n_trigrams" in textstats.read_ppl_store(
        spark, pplp, id_type="string", order=3
    ).columns


def test_qc_gate_routes_low_score_to_dlq(spark, tmp_path):
    """GPT-3-style trained-filter gate at ingest: with frozen classifier
    weights and qc_gate set, the punctuation-soup doc dead-letters with
    reason 'qc_gate', the prose doc ingests; stacked WITH the ppl gate,
    the two reasons land separately and the surviving store holds only
    docs both gates passed."""
    from workspace_qdrant_mcp_spark.operators import quality_classifier as qc
    from workspace_qdrant_mcp_spark.operators import textstats
    from workspace_qdrant_mcp_spark.streaming import ingest

    store = str(tmp_path / "chunks")
    dlq = str(tmp_path / "dlq")
    pos = "the and of to in is that it for with " * 4
    neg = ")(*& ^%$# @!?! ;;;; #### $$$$ %%%% ^^^^ &&&& **** " * 4
    train = spark.createDataFrame(
        [(i, pos if i % 2 == 0 else neg + f"x{i}") for i in range(40)],
        "doc_id long, text string",
    )
    w = qc.train_quality_classifier(
        qc.qc_features(train), qc.qc_labels(train), lr=10.0
    ).localCheckpoint()
    # threshold between the two classes' scores on the train corpus
    p = qc._margins(qc.qc_features(train), w, "doc_id")
    sc = {
        r["doc_id"]: r["p6"] / 1e6
        for r in p.collect()
    }
    lo = max(v for d, v in sc.items() if d % 2 == 1)
    hi = min(v for d, v in sc.items() if d % 2 == 0)
    assert lo < hi
    gate = (lo + hi) / 2
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    batch = spark.createDataFrame(
        [("good.txt", "create", pos, t),
         ("soup.txt", "create", neg + "xq", t)],
        ingest.EVENT_SCHEMA,
    )
    ingest.process_batch(
        spark, batch, store, dlq, qc_weights=w, qc_gate=gate
    )
    stored = {
        r["path"]
        for r in spark.read.parquet(store).select("path").distinct()
        .collect()
    }
    assert stored == {"good.txt"}
    assert [(r["path"], r["error"])
            for r in spark.read.parquet(dlq).collect()] == [
        ("soup.txt", "qc_gate")
    ]
    # ---- stacked gates: ppl rejects the OOV-alien doc first, qc the
    # soup doc; the fluent prose doc survives both
    store2 = str(tmp_path / "chunks2")
    dlq2 = str(tmp_path / "dlq2")
    # the LM reference contains BOTH registers, so the soup doc is
    # fluent to the LM (low ppl, passes the ppl gate) and only the
    # trained classifier rejects it — the two gates separate cleanly
    lm = textstats.kn_bigram_model(
        spark.createDataFrame(
            [(0, pos), (1, pos), (2, neg + "xq"), (3, neg + "xq")],
            "doc_id long, text string",
        )
    ).localCheckpoint()
    ppl = {
        r["doc_id"]: r["logppl"]
        for r in textstats.kn_score_with(
            spark.createDataFrame(
                [(1, pos), (2, "zzq glorp xyzzy wub fnord blart"),
                 (3, neg + "xq")],
                "doc_id long, text string",
            ),
            lm,
        ).collect()
    }
    assert max(ppl[1], ppl[3]) < ppl[2]
    pgate = (max(ppl[1], ppl[3]) + ppl[2]) / 2
    batch2 = spark.createDataFrame(
        [("good.txt", "create", pos, t),
         ("alien.txt", "create", "zzq glorp xyzzy wub fnord blart", t),
         ("soup.txt", "create", neg + "xq", t)],
        ingest.EVENT_SCHEMA,
    )
    ingest.process_batch(
        spark, batch2, store2, dlq2,
        lm_model=lm, ppl_gate=pgate, qc_weights=w, qc_gate=gate,
    )
    stored2 = {
        r["path"]
        for r in spark.read.parquet(store2).select("path").distinct()
        .collect()
    }
    assert stored2 == {"good.txt"}
    reasons = sorted(
        (r["path"], r["error"])
        for r in spark.read.parquet(dlq2).collect()
    )
    assert reasons == [("alien.txt", "ppl_gate"), ("soup.txt", "qc_gate")]


def test_qc_gate_without_weights_fails_loudly(spark, tmp_path):
    import datetime as dt

    import pytest as _pytest

    from workspace_qdrant_mcp_spark.streaming import ingest

    batch = spark.createDataFrame(
        [("a.txt", "create", "x y z", dt.datetime(2024, 1, 1))],
        ingest.EVENT_SCHEMA,
    )
    with _pytest.raises(ValueError, match="qc_weights"):
        ingest.process_batch(
            spark, batch, str(tmp_path / "c"), str(tmp_path / "d"),
            qc_gate=0.5,
        )


def test_ppl_config_without_model_fails_loudly(spark, tmp_path):
    """ppl_gate / ppl_store_path without lm_model must raise at entry —
    not surface as a fake provider outage through the watchdog branch."""
    import datetime as dt

    import pytest as _pytest

    from workspace_qdrant_mcp_spark.streaming import ingest

    batch = spark.createDataFrame(
        [("a.txt", "create", "x y z", dt.datetime(2024, 1, 1))],
        ingest.EVENT_SCHEMA,
    )
    for kw in ({"ppl_gate": 5.0}, {"ppl_store_path": str(tmp_path / "p")}):
        with _pytest.raises(ValueError, match="lm_model"):
            ingest.process_batch(
                spark, batch, str(tmp_path / "c"), str(tmp_path / "d"), **kw
            )


def test_interval_join_stream_equals_batch(spark, tmp_path):
    """Stream-stream interval join: two watermarked branches of a
    file-source stream (clicks, errors) joined on user within a 30-min
    lookback emit exactly the batch range-join pairs — inner joins emit
    on match; the watermark + time bound only bound the buffered
    state."""
    from workspace_qdrant_mcp_spark.streaming.joins import interval_join

    events_dir = str(tmp_path / "jev")
    out_dir = str(tmp_path / "jout")
    ckpt = str(tmp_path / "jckpt")
    evs = [
        _ev(1, "2024-01-01T00:00:00Z", 1, "click", 0.0),
        _ev(2, "2024-01-01T00:10:00Z", 1, "error", 0.0),   # pairs with 1
        _ev(3, "2024-01-01T00:50:00Z", 1, "error", 0.0),   # outside 30m of 1
        _ev(4, "2024-01-01T00:45:00Z", 1, "click", 0.0),   # pairs with 3
        _ev(5, "2024-01-01T00:05:00Z", 2, "click", 0.0),
        _ev(6, "2024-01-01T00:06:00Z", 3, "error", 0.0),   # other users: no pair
        _ev(7, "2024-01-02T00:00:00Z", 9, "noise", 0.0),   # watermark push
    ]
    _write_events(events_dir, "b1.json", evs)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    errors = stream.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = stream.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    j = interval_join(
        errors, clicks, "user_id", "30 minutes",
        left_watermark="10 minutes", right_watermark="10 minutes",
    ).select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("event_id_r").alias("click_id"),
    )
    q = (
        j.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["error_id"], r["user_id"], r["click_id"])
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {(2, 1, 1), (3, 1, 4)}

    import datetime as _dt

    batch_df = spark.createDataFrame(
        [
            (
                e["event_id"],
                _dt.datetime.strptime(e["ts"], "%Y-%m-%dT%H:%M:%SZ"),
                e["user_id"],
                e["event_type"],
                e["value"],
            )
            for e in evs
        ],
        _EV_SCHEMA,
    )
    be = batch_df.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    bc = batch_df.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    want = {
        (r["event_id"], r["user_id"], r["event_id_r"])
        for r in interval_join(be, bc, "user_id", "30 minutes").collect()
    }
    assert got == want


def test_dedup_within_watermark_stream_equals_batch_keys(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates across micro-batches
    inside the watermark horizon collapse to one emission per key; the
    emitted key set equals batch dropDuplicates over the same events."""
    from workspace_qdrant_mcp_spark.streaming import windows

    events_dir = str(tmp_path / "dev")
    out_dir = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")
    b1 = [
        _ev(1, "2024-01-01T00:00:00Z", 1, "click", 0.0),
        _ev(2, "2024-01-01T00:01:00Z", 1, "click", 0.0),  # dup key (1,click)
        _ev(3, "2024-01-01T00:02:00Z", 2, "view", 0.0),
    ]
    b2 = [
        _ev(4, "2024-01-01T00:05:00Z", 1, "click", 0.0),  # dup across batches
        _ev(5, "2024-01-01T00:06:00Z", 2, "click", 0.0),  # new key
        _ev(6, "2024-01-02T00:00:00Z", 9, "noise", 0.0),  # watermark push
    ]
    _write_events(events_dir, "b1.json", b1)
    _write_events(events_dir, "b2.json", b2)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    d = windows.dedup_within_watermark(
        stream, ["user_id", "event_type"], "30 minutes"
    ).select("user_id", "event_type")
    q = (
        d.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["user_id"], r["event_type"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(1, "click"), (2, "click"), (2, "view"), (9, "noise")]
    # equals the batch key projection
    import datetime as _dt

    batch_df = spark.createDataFrame(
        [
            (
                e["event_id"],
                _dt.datetime.strptime(e["ts"], "%Y-%m-%dT%H:%M:%SZ"),
                e["user_id"],
                e["event_type"],
                e["value"],
            )
            for e in b1 + b2
        ],
        _EV_SCHEMA,
    )
    want = sorted(
        (r["user_id"], r["event_type"])
        for r in batch_df.dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
        .collect()
    )
    assert got == want


def test_streaming_kmv_overlap_equals_batch_prefix(spark, tmp_path):
    """Cross-batch KMV set-overlap sketch: after draining two
    micro-batches, the latest emitted union/Jaccard/intersection
    estimates equal sketches.kmv_set_estimates' estimate columns over
    everything seen — the bottom-k merge law applied to BOTH sides'
    sketches inside one state row."""
    from workspace_qdrant_mcp_spark.operators import sketches
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "kev")
    out_dir = str(tmp_path / "kout")
    ckpt = str(tmp_path / "kckpt")
    # 'click' users 0..59 even-ish, 'view' users 30..89 -> real overlap
    b1 = [
        {"event_id": i, "ts": f"2024-01-01T00:00:{i % 60:02d}Z",
         "user_id": i % 60, "event_type": "click", "value": 0.0}
        for i in range(60)
    ] + [
        {"event_id": 100 + i, "ts": f"2024-01-01T00:10:{i % 60:02d}Z",
         "user_id": 30 + (i % 60), "event_type": "view", "value": 0.0}
        for i in range(60)
    ]
    b2 = [
        {"event_id": 300 + i, "ts": f"2024-01-01T01:00:{i % 60:02d}Z",
         "user_id": 60 + i, "event_type": "click", "value": 0.0}
        for i in range(30)
    ]
    _write_events(events_dir, "b1.json", b1)
    _write_events(events_dir, "b2.json", b2)

    stream = (
        spark.readStream.schema(_EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    q = (
        stateful.streaming_kmv_overlap(stream, k=32)
        .writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir).collect()
    assert out, "stream emitted nothing"
    last = max(out, key=lambda r: r["n_seen"])
    assert last["n_seen"] == 150

    all_ev = b1 + b2
    ka = spark.createDataFrame(
        [(e["user_id"],) for e in all_ev if e["event_type"] == "click"],
        "key long",
    )
    kb = spark.createDataFrame(
        [(e["user_id"],) for e in all_ev if e["event_type"] == "view"],
        "key long",
    )
    want = sketches.kmv_set_estimates(ka, kb, k=32).collect()[0]
    assert last["union_kth_hash"] == want["union_kth_hash"]
    for c in ("union_estimate", "jaccard_estimate", "intersection_estimate"):
        assert abs(last[c] - want[c]) < 1e-6, (c, last[c], want[c])
    # the b1-prefix emission equals the batch over b1 alone
    first = min(out, key=lambda r: r["n_seen"])
    ka1 = spark.createDataFrame(
        [(e["user_id"],) for e in b1 if e["event_type"] == "click"], "key long"
    )
    kb1 = spark.createDataFrame(
        [(e["user_id"],) for e in b1 if e["event_type"] == "view"], "key long"
    )
    want1 = sketches.kmv_set_estimates(ka1, kb1, k=32).collect()[0]
    assert first["union_kth_hash"] == want1["union_kth_hash"]
    assert abs(first["jaccard_estimate"] - want1["jaccard_estimate"]) < 1e-6


def test_streaming_weighted_sample_equals_batch_prefix(spark, tmp_path):
    """Cross-batch E-S weighted reservoir: after draining two
    micro-batches the latest emission equals curation.weighted_sample
    over everything seen — the E-S key is a pure (id, weight) function,
    so the reservoir is just top-k-merge state like every sketch twin."""
    import json as _json
    import os

    from workspace_qdrant_mcp_spark.operators import curation
    from workspace_qdrant_mcp_spark.streaming import stateful

    rows_dir = str(tmp_path / "wrows")
    out_dir = str(tmp_path / "wout")
    ckpt = str(tmp_path / "wckpt")
    os.makedirs(rows_dir, exist_ok=True)
    b1 = [{"doc_id": i, "weight": float(1 + (i % 5))} for i in range(30)]
    b2 = [{"doc_id": 100 + i, "weight": float(1 + (i % 3))} for i in range(20)]
    for name, batch in (("b1.json", b1), ("b2.json", b2)):
        with open(os.path.join(rows_dir, name), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in batch))

    stream = (
        spark.readStream.schema("doc_id long, weight double")
        .option("maxFilesPerTrigger", 1)
        .json(rows_dir)
    )
    q = (
        stateful.streaming_weighted_sample(stream, k=7)
        .writeStream.foreachBatch(
            lambda b, _id: b.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.read.parquet(out_dir).collect()
    for prefix, n in ((b1, 30), (b1 + b2, 50)):
        emitted = sorted(
            (r["rnk"], r["id"], r["sample_key"])
            for r in out if r["n_seen"] == n
        )
        assert len(emitted) == 7, f"prefix {n}: {len(emitted)} rows"
        batch_df = spark.createDataFrame(prefix)
        want_rows = curation.weighted_sample(
            batch_df, k=7, weight_col="weight"
        ).collect()
        want = sorted(
            (i + 1, str(r["doc_id"]), r["sample_key"])
            for i, r in enumerate(want_rows)
        )
        for (gr, gi, gk), (wr, wi, wk) in zip(emitted, want):
            assert (gr, gi) == (wr, wi)
            assert abs(gk - wk) < 1e-6


def test_stateful_family_state_rows_bounded_in_progress(spark, tmp_path):
    """VERDICT r7 stretch #8: the cross-batch sketches' constant-size
    state claims, asserted from the engine's own accounting rather than
    by construction — StreamingQueryProgress.stateOperators reports the
    state store's TOTAL ROW COUNT after each trigger; a state leak
    (e.g. a per-event instead of per-group key) shows up here as
    numRowsTotal tracking the input volume instead of the group count.
    Three family members with three different structural bounds:
      - streaming_heavy_hitters(n_groups=4): <= 4 state rows,
      - streaming_hll over event_type: <= distinct types,
      - streaming_kmv_overlap: exactly 1 state row (both sketches live
        in the one aggregate-key row).
    Each drains two micro-batches of 200 events (400 inputs vs <= 5
    state rows — the gap IS the assertion)."""
    from workspace_qdrant_mcp_spark.streaming import stateful

    def mk(eid0):
        return [
            {"event_id": eid0 + i, "ts": f"2024-01-01T00:00:{i % 60:02d}Z",
             "user_id": i % 37, "event_type": ("click", "view", "scroll")[i % 3],
             "value": float(i % 7)}
            for i in range(200)
        ]

    cases = {
        "hh": (lambda s: stateful.streaming_heavy_hitters(
            s, capacity=8, n_groups=4), 4),
        "hll": (lambda s: stateful.streaming_hll(s), 3),
        "kmv": (lambda s: stateful.streaming_kmv_overlap(s, k=16), 1),
    }
    for tag, (build, bound) in cases.items():
        events_dir = str(tmp_path / f"{tag}_ev")
        _write_events(events_dir, "b1.json", mk(0))
        _write_events(events_dir, "b2.json", mk(1000))
        stream = (
            spark.readStream.schema(_EV_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(events_dir)
        )
        q = (
            build(stream)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / f"{tag}_ck"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p["stateOperators"]]
        assert progresses, f"{tag}: no stateOperators progress recorded"
        last = progresses[-1]["stateOperators"][0]
        assert last["numRowsTotal"] <= bound, (tag, last["numRowsTotal"])


def test_streaming_drift_psi_equals_batch_over_prefix(spark, tmp_path):
    """Cross-batch streaming PSI vs a frozen reference profile: after
    draining each micro-batch, the latest emission per group equals
    quality.psi_vs_reference run over everything seen so far with the
    SAME reference — counters add across batches, the smoothing formula
    replays identically (1e-6, float associativity). The reference
    profile is a tiny blessed-corpus dimension collected once."""
    from workspace_qdrant_mcp_spark.operators import quality
    from workspace_qdrant_mcp_spark.streaming import stateful

    # reference: 'click' values centred low, 'view' bimodal
    ref_rows = [
        (i, "2023-12-01T00:00:00Z", "click", float(i % 10))
        for i in range(40)
    ] + [
        (100 + i, "2023-12-01T00:00:00Z", "view", float((i % 2) * 40))
        for i in range(40)
    ]
    ref_df = spark.createDataFrame(
        ref_rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ref = quality.drift_reference(ref_df)

    def mk(eid0, shift):
        return [
            {"event_id": eid0 + i, "ts": f"2024-01-01T00:00:{i % 60:02d}Z",
             "user_id": i, "event_type": "click", "value": float(i % 10 + shift)}
            for i in range(30)
        ] + [
            {"event_id": eid0 + 500 + i, "ts": f"2024-01-01T00:01:{i % 60:02d}Z",
             "user_id": i, "event_type": "view", "value": float((i % 2) * 40)}
            for i in range(20)
        ]

    events_dir = str(tmp_path / "psiev")
    out_dir = str(tmp_path / "psiout")
    ck = str(tmp_path / "psick")
    batches = [mk(0, 0), mk(1000, 25)]  # batch 2 shifts 'click' hard
    seen: list[dict] = []
    for i, rows in enumerate(batches):
        _write_events(events_dir, f"b{i}.json", rows)
        seen.extend(rows)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .json(events_dir)
        )
        q = (
            stateful.streaming_drift_psi(stream, ref)
            .writeStream.foreachBatch(
                lambda b, bid: b.withColumn("bid", F.lit(bid))
                .write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(out_dir)
        last_bid = out.agg(F.max("bid")).first()[0]
        got = {
            r["grp"]: r
            for r in out.filter(F.col("bid") == last_bid).collect()
        }
        prefix = spark.createDataFrame(
            [(e["event_id"], e["ts"], e["event_type"], e["value"])
             for e in seen],
            "event_id long, ts string, event_type string, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        want = {
            r["event_type"]: r
            for r in quality.psi_vs_reference(prefix, ref).collect()
        }
        assert set(got) == set(want)
        for g in want:
            assert got[g]["psi"] == pytest.approx(want[g]["psi"], abs=1e-6), (i, g)
            assert got[g]["n_cur"] == want[g]["n_cur"]
            assert got[g]["n_ref"] == want[g]["n_ref"]
            assert got[g]["drifted"] == want[g]["drifted"]
    # the hard shift in batch 2 must flag 'click' and spare 'view'
    assert got["click"]["drifted"] is True
    assert got["view"]["drifted"] is False


def test_streaming_mixture_equals_batch_over_prefix(spark, tmp_path):
    """Cross-batch streaming mixture monitor: after draining each
    micro-batch, the emitted per-source table equals
    curation.temperature_mixture over everything seen so far (1e-6) —
    counters add in one aggregate state row; the temperature arithmetic
    replays on exact integers."""
    import json
    import os

    from workspace_qdrant_mcp_spark.operators import curation
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "mixev")
    out_dir = str(tmp_path / "mixout")
    ck = str(tmp_path / "mixck")
    os.makedirs(events_dir)

    def write(name, rows):
        with open(os.path.join(events_dir, name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    b1 = [{"doc_id": i, "source": "web", "text": "w " * 20} for i in range(6)] + [
        {"doc_id": 100 + i, "source": "books", "text": "w " * 80} for i in range(2)
    ]
    b2 = [{"doc_id": 200 + i, "source": "code", "text": "w " * 10} for i in range(4)] + [
        {"doc_id": 300, "source": "web", "text": "w " * 40}
    ]
    seen = []
    for i, rows in enumerate([b1, b2]):
        write(f"b{i}.json", rows)
        seen.extend(rows)
        stream = (
            spark.readStream.schema("doc_id long, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .json(events_dir)
        )
        q = (
            stateful.streaming_mixture(stream, alpha=0.3)
            .writeStream.foreachBatch(
                lambda b, bid: b.withColumn("bid", F.lit(bid))
                .write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.read.parquet(out_dir)
        last = out.filter(F.col("bid") == out.agg(F.max("bid")).first()[0])
        got = {r["source"]: r for r in last.collect()}
        prefix = spark.createDataFrame(
            [(r["doc_id"], r["text"].strip(), r["source"]) for r in seen],
            "doc_id long, text string, source string",
        )
        want = {
            r["source"]: r
            for r in curation.temperature_mixture(prefix, alpha=0.3).collect()
        }
        assert set(got) == set(want), i
        for s in want:
            for c in ("n_docs", "n_tokens"):
                assert got[s][c] == want[s][c], (i, s, c)
            for c in ("observed_share", "sampled_share", "boost"):
                assert got[s][c] == pytest.approx(want[s][c], abs=1e-6), (i, s, c)
    # the emission covers ALL sources each batch, not just touched ones
    assert set(got) == {"web", "books", "code"}


def test_streaming_mixture_zero_token_prefix_emits_nothing(spark, tmp_path):
    """r8 ADVICE: a prefix whose documents all tokenize to zero
    whitespace tokens used to raise ZeroDivisionError inside
    applyInPandasWithState and kill the streaming query. Now: no
    emission for the zero-token batch (the batch twin returns zero
    rows), and the doc counts still carry into the next batch when
    real tokens arrive."""
    import json
    import os

    from workspace_qdrant_mcp_spark.operators import curation
    from workspace_qdrant_mcp_spark.streaming import stateful

    events_dir = str(tmp_path / "zmixev")
    out_dir = str(tmp_path / "zmixout")
    ck = str(tmp_path / "zmixck")
    os.makedirs(events_dir)

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, source string, text string")
            .option("maxFilesPerTrigger", 1)
            .json(events_dir)
        )
        q = (
            stateful.streaming_mixture(stream, alpha=0.3)
            .writeStream.foreachBatch(
                lambda b, bid: b.withColumn("bid", F.lit(bid))
                .write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ck)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    b1 = [{"doc_id": i, "source": "web", "text": ""} for i in range(3)]
    with open(os.path.join(events_dir, "b0.json"), "w") as f:
        for r in b1:
            f.write(json.dumps(r) + "\n")
    drain()
    # the query survived and emitted nothing (out_dir may not even exist)
    emitted = (
        spark.read.parquet(out_dir).count()
        if os.path.exists(out_dir) and os.listdir(out_dir)
        else 0
    )
    assert emitted == 0
    # batch twin agrees: zero rows on the zero-token corpus
    prefix = spark.createDataFrame(
        [(r["doc_id"], r["text"], r["source"]) for r in b1],
        "doc_id long, text string, source string",
    )
    assert curation.temperature_mixture(prefix, alpha=0.3).count() == 0

    b2 = [{"doc_id": 10, "source": "web", "text": "w w w"},
          {"doc_id": 11, "source": "books", "text": "w w"}]
    with open(os.path.join(events_dir, "b1.json"), "w") as f:
        for r in b2:
            f.write(json.dumps(r) + "\n")
    drain()
    got = {r["source"]: r for r in spark.read.parquet(out_dir).collect()}
    # the zero-token docs from batch 1 still count as documents
    assert got["web"]["n_docs"] == 4 and got["web"]["n_tokens"] == 3
    assert got["books"]["n_docs"] == 1 and got["books"]["n_tokens"] == 2


def test_stream_maintains_gram_index_in_lockstep(spark, tmp_path):
    """End-to-end r8 T3 sink: the ingest stream with gram_index_path
    keeps the trigram candidate index equal to build_gram_index over the
    LIVE (path, latest-content) set — through create, modify, remove —
    and indexed grep over the live chunk store equals the scan."""
    from workspace_qdrant_mcp_spark.operators import grep as g
    from workspace_qdrant_mcp_spark.streaming import ingest

    events_dir = str(tmp_path / "gev")
    store = str(tmp_path / "gstore")
    dlq = str(tmp_path / "gdlq")
    ck = str(tmp_path / "gckpt")
    grams = str(tmp_path / "grams")

    def run(name, rows):
        _write_events(events_dir, name, rows)
        ingest.run_ingestion_stream(
            spark, events_dir, store, dlq, ck, gram_index_path=grams
        )

    run("b1.json", [
        {"path": "/w/a", "event_type": "create", "content": "alpha dup x",
         "ts": "2024-01-01T00:00:01Z"},
        {"path": "/w/b", "event_type": "create", "content": "beta dup y",
         "ts": "2024-01-01T00:00:02Z"},
    ])
    run("b2.json", [
        {"path": "/w/a", "event_type": "modify", "content": "gamma only",
         "ts": "2024-01-01T00:01:00Z"},
        {"path": "/w/b", "event_type": "remove", "content": None,
         "ts": "2024-01-01T00:01:01Z"},
    ])

    live = spark.createDataFrame(
        [("/w/a", "gamma only")], "path string, content string"
    )
    got = {
        tuple(r)
        for r in g.read_gram_index(
            spark, grams, id_col="path", id_type="string"
        ).collect()
    }
    want = {
        tuple(r)
        for r in g.build_gram_index(live, id_col="path").collect()
    }
    assert got == want and got
    # serving: indexed grep over the live chunk store == scan; the
    # removed/modified 'dup' grams are gone, so the pattern now misses
    lines = (
        spark.read.parquet(store)
        .select("path", F.col("chunk_index").alias("line_number"), "content")
    )
    idx = g.read_gram_index(spark, grams, id_col="path", id_type="string")
    assert sorted(map(tuple, g.grep_exact_indexed(
        lines, idx, "dup", id_col="path").collect())) == sorted(
        map(tuple, g.grep_exact(lines, "dup", id_col="path").collect())) == []
    assert sorted(map(tuple, g.grep_exact_indexed(
        lines, idx, "gamma", id_col="path").collect())) == sorted(
        map(tuple, g.grep_exact(lines, "gamma", id_col="path").collect()))


def test_stream_construction_failure_releases_model_pins(spark, tmp_path):
    """ADVICE r11: an exception while BUILDING or STARTING the stream
    (here: nonexistent events source path) must release the lm/qc model
    pins too — the try/finally covers construction, not just the drain."""
    from workspace_qdrant_mcp_spark import ckpt

    model = spark.createDataFrame([("a", -1.0)], "term string, lp double")
    before = ckpt.persistent_ids(spark)
    with pytest.raises(Exception):
        ingest.run_ingestion_stream(
            spark,
            str(tmp_path / "no_such_events_dir"),
            str(tmp_path / "store"),
            str(tmp_path / "dlq"),
            str(tmp_path / "ckpt"),
            lm_model=model,
            ppl_gate=5.0,
        )
    leaked = ckpt.persistent_ids(spark) - before
    assert leaked == set(), f"leaked pinned blocks: {leaked}"
