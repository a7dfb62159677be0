"""Checkpoint lifecycle management.

`localCheckpoint()` is the repo's standard lineage-truncation device for
iterative operators (pagerank, min-label CC, LPA, BFS) — but its blocks
are pinned in executor storage and, because the lineage is truncated,
can never be recomputed: Spark itself will not evict them, and nothing
unpersists them when an operator returns. Across a long session (the
119-query bench, or a real long-running service) superseded iteration
states accumulate, storage memory grows monotonically, and execution
memory shrinks — the round-5 bench measured the graph family 1.5-2.9x
slower with byte-identical operator code purely from this accumulation.
At 100 TB / 1000 executors the same leak kills the job outright.

Two disciplines fix it:

  - RollingCheckpoint — for iterative loops: checkpoint iteration t,
    then unpersist iteration t-1 (safe: t is already materialized, and
    min-label/pagerank/BFS states never read older than t-1). Constant
    storage footprint regardless of iteration count.
  - pin() / clear_unpinned() — for session-lifetime stores (the
    materialized edge/postings/chunk caches that mirror the reference's
    ingest-time sinks): register their block ids as pinned, then a
    between-queries sweep releases every *unpinned* persistent RDD.
    Unpersisting a truncated-lineage checkpoint is destructive (the
    data cannot come back), so the sweep must never touch the pins.

Both work by diffing `sc._jsc.getPersistentRDDs()` ids around the
eager `localCheckpoint()` call — no private DataFrame internals, and
the same JVM map drives the release, so ids always match.
"""

from __future__ import annotations

from typing import Callable, TypeVar

from pyspark.sql import DataFrame, SparkSession

T = TypeVar("T")

# Block ids backing session-lifetime materialized stores (see pin()).
# Never released by clear_unpinned().
_PINNED: set[int] = set()


def persistent_ids(spark: SparkSession) -> set[int]:
    """Ids of every currently-persisted RDD in the JVM (cached DataFrames
    and localCheckpoint blocks both appear here)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release(spark: SparkSession, ids: set[int]) -> None:
    """Unpersist the given persistent-RDD ids (non-blocking). Missing ids
    are ignored — a block may already be gone after a context restart."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rid in ids:
        jrdd = jmap.get(rid)
        if jrdd is not None:
            jrdd.unpersist(False)


def pin(spark: SparkSession, build: Callable[[], T]) -> T:
    """Run `build()` (which is expected to localCheckpoint/persist one or
    more DataFrames) and mark every block it persisted as session-pinned,
    exempt from clear_unpinned(). Used for the materialized-store caches
    (edges/postings/chunks/symbols) that are the Spark analog of the
    reference's ingest-time sinks — shared across queries by design."""
    out, _ = pin_tracked(spark, build)
    return out


def pin_tracked(spark: SparkSession, build: Callable[[], T]) -> tuple[T, set[int]]:
    """pin() that also returns the block ids it pinned, so the owner can
    later release_pins() them — the lifecycle a REFRESHABLE pinned store
    needs (api.enable_store_serving re-snapshots after a store rebuild;
    without the handle the superseded snapshot stays pinned forever).

    Still diff-based (a builder may persist several frames), so under
    CONCURRENT driver threads it can over-pin blocks another thread
    persisted in the window — benign (they stay resident until session
    end) but worth knowing; the destructive mis-attribution path was in
    RollingCheckpoint, which now uses exact ids (checkpoint_rdd_id)."""
    before = persistent_ids(spark)
    out = build()
    created = persistent_ids(spark) - before
    _PINNED.update(created)
    return out, created


def release_pins(spark: SparkSession, ids: set[int]) -> None:
    """Un-pin AND unpersist blocks previously pinned via pin_tracked —
    only safe once nothing still serves off them (the caller swaps in
    the replacement snapshot first, exactly like RollingCheckpoint's
    materialize-then-release order)."""
    _PINNED.difference_update(ids)
    release(spark, ids)


def clear_unpinned(spark: SparkSession) -> int:
    """Release every persistent RDD not pinned via pin(). Call between
    independent queries (bench.py does) so one query's checkpoints never
    tax the next query's execution memory. Returns the number released."""
    stale = persistent_ids(spark) - _PINNED
    release(spark, stale)
    return len(stale)


def checkpoint_rdd_id(df: DataFrame) -> int:
    """The EXACT persistent-RDD id backing a localCheckpoint()ed
    DataFrame, read off its LogicalRDD plan (r14). The former
    before/after diff of getPersistentRDDs() could adopt a block some
    OTHER driver thread persisted in the same window — releasing it
    later destroys that thread's truncated-lineage state. Concurrent
    queries in one session (tokenizer_compare's trainer pool, the
    thread-batched parity tests) need the attribution to be exact."""
    return int(df._jdf.queryExecution().analyzed().rdd().id())


def checkpoint_with(df: DataFrame, action):
    """localCheckpoint `df` and run `action(checkpointed_df)` as ONE job
    (r14, guide §2.4) — the non-rolling twin of
    RollingCheckpoint.with_action for bounded tables whose first use is
    an immediate probe (an emptiness count, a size probe): the lazy mark
    lets the probe job materialize the checkpoint, so the separate
    eager-materialization job disappears. `action` must touch every
    partition (aggregate/count without limit). Returns
    (checkpointed_df, action_result)."""
    out = df.localCheckpoint(eager=False)
    return out, action(out)


class RollingCheckpoint:
    """Checkpoint successive iteration states, releasing the superseded
    one — constant storage footprint for iterative loops.

        roll = RollingCheckpoint(spark)
        for _ in range(n_iters):
            state = roll(compute_next(state))   # t materialized, t-1 freed

    Safe because localCheckpoint is EAGER: iteration t's blocks exist
    before t-1 is unpersisted, and these loops never read states older
    than the immediately-previous one. The final state's blocks stay
    persisted for the caller (released later by clear_unpinned()).
    keep_last=2 retains one extra generation for loops where state t+1
    reads both t and t-1."""

    def __init__(self, spark: SparkSession, keep_last: int = 1):
        self.spark = spark
        self.keep_last = keep_last
        self._gens: list[set[int]] = []

    def __call__(self, df: DataFrame) -> DataFrame:
        out = df.localCheckpoint()
        # exact-id attribution (r14): never adopt blocks persisted by a
        # concurrent driver thread — see checkpoint_rdd_id
        created = {checkpoint_rdd_id(out)}
        self._gens.append(created)
        while len(self._gens) > self.keep_last:
            old = self._gens.pop(0)
            release(self.spark, old - created)
        return out

    def with_action(self, df: DataFrame, action):
        """Checkpoint `df` and run `action(checkpointed_df)` as ONE job
        (r14, guide §2.4): the fixpoint loops all follow their per-round
        eager checkpoint with a probe/model-state action over the fresh
        state (pagerank's dangling-mass sum, SCC's change-flag probe,
        k-core's survivor count) — two full passes over the round state
        where one suffices. Marking the checkpoint LAZY and letting the
        probe job materialize it fuses the passes: Spark's local
        checkpointer persists every partition the probe job computes and
        recomputes any it missed at job end, so the truncation semantics
        are identical to the eager form.

        Ordering safety is unchanged: the superseded generation is only
        released AFTER the action returns, i.e. after generation t is
        fully materialized (the eager form's invariant, kept explicit
        here). `action` should touch every partition (an aggregate/count
        without limit) so materialization rides the probe job instead of
        a follow-up cleanup job.

        Returns (checkpointed_df, action_result)."""
        out = df.localCheckpoint(eager=False)
        created = {checkpoint_rdd_id(out)}
        result = action(out)
        self._gens.append(created)
        while len(self._gens) > self.keep_last:
            old = self._gens.pop(0)
            release(self.spark, old - created)
        return out, result
