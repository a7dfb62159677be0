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
