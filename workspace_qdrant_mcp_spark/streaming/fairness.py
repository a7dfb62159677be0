"""W7 per-tenant fairness scheduling — the reference's anti-starvation
dequeue alternation (fairness_scheduler.rs:114-290, ordering contract
queue_operations/dequeue.rs:320-410) re-expressed over a queue DataFrame.

Semantics replicated exactly:
  - asymmetric alternation: high_priority_batch items dequeued with the
    priority CASE DESC (active projects first, FIFO tiebreak), then the
    direction flips and low_priority_batch items dequeue ASC (inactive
    projects get a turn, LIFO tiebreak), then back — the spec's 10/3
    split (~77% high / ~23% low) so large low-priority files cannot
    neutralize the priority advantage (fairness_scheduler.rs:116-118);
  - delete/reset precedence: always first regardless of direction
    (correctness, not priority — dequeue.rs:77);
  - (tenant, add|scan) line-jump: project registrations and their
    follow-up scans outrank file ingestion in BOTH directions
    (dequeue.rs "#70/#112" promotion);
  - age promotion: +1 above warning age, +2 above critical age, ALWAYS
    DESC — inverting it on the ASC pass would bury exactly the items it
    rescues (dequeue.rs:374-383);
  - priority CASE: memory collection and active-project items rank 1,
    libraries and inactive projects rank 0 (dequeue.rs:384-389);
  - op weight: delete 10, reset 8, add 5, update 4, rename 3, uplift 2,
    scan 1 (dequeue.rs:390-398), ALWAYS DESC on both passes
    (dequeue.rs:76-79 pins op_order regardless of priority direction);
  - disabled ⇒ always priority DESC (fairness_scheduler.rs:224-228).

The control loop is driver-side state (direction + items-since-flip),
exactly like the reference's AlternationState behind its SQLite queue;
each dequeue is a pure DataFrame sort+limit over the pending set, so the
queue itself can be any size — only the returned batch is bounded."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

COLLECTION_RULES = "rules"
COLLECTION_LIBRARIES = "libraries"


@dataclass
class FairnessConfig:
    """Defaults mirror FairnessSchedulerConfig::default()
    (fairness_scheduler.rs:60-71)."""

    enabled: bool = True
    high_priority_batch: int = 10
    low_priority_batch: int = 3
    age_promotion_warning_seconds: int = 300
    age_promotion_critical_seconds: int = 900


@dataclass
class FairnessMetrics:
    direction_flips_total: int = 0
    high_priority_first_items: int = 0
    low_priority_first_items: int = 0
    total_items_dequeued: int = 0
    current_priority_descending: bool = True
    items_since_flip: int = 0


def _op_weight() -> Column:
    return (
        F.when(F.col("op") == "delete", 10)
        .when(F.col("op") == "reset", 8)
        .when(F.col("op") == "add", 5)
        .when(F.col("op") == "update", 4)
        .when(F.col("op") == "rename", 3)
        .when(F.col("op") == "uplift", 2)
        .otherwise(1)
    )


def dequeue_sort_cols(
    descending: bool,
    now_ts: Column,
    warning_secs: int,
    critical_secs: int,
    key_col: str = "queue_id",
) -> list[Column]:
    """The full ORDER BY of the reference dequeue query over a queue
    frame with columns (op, item_type, collection, is_active,
    created_ts). Direction flips only the priority CASE and the
    created_ts tiebreak (FIFO on DESC, LIFO on ASC); the delete/reset,
    line-jump, age promotions AND the op weight are direction-invariant
    — the reference pins op_order DESC on BOTH passes (dequeue.rs:76-79
    'delete always takes precedence ... regardless of which priority
    pass'), so heavier ops (add > update > rename > uplift > scan) keep
    their relative order even on the anti-starvation pass.
    key_col is the final total-order tiebreak (same direction as
    created_ts) — the reference leans on SQLite's scan order for equal
    timestamps; a distributed engine must pin it explicitly so reruns
    and the oracle replay are bit-identical."""
    age = now_ts - F.col("created_ts")
    delete_first = F.when(F.col("op").isin("delete", "reset"), 1).otherwise(0)
    line_jump = F.when(
        (F.col("item_type") == "tenant") & F.col("op").isin("add", "scan"), 1
    ).otherwise(0)
    age_promo = (
        F.when(age >= critical_secs, 2)
        .when(age >= warning_secs, 1)
        .otherwise(0)
    )
    priority = (
        F.when(F.col("collection") == COLLECTION_RULES, 1)
        .when(F.col("collection") == COLLECTION_LIBRARIES, 0)
        .when(F.col("is_active") > 0, 1)
        .otherwise(0)
    )
    opw = _op_weight()
    directed = (
        [priority.desc(), opw.desc(), F.col("created_ts").asc(), F.col(key_col).asc()]
        if descending
        else [priority.asc(), opw.desc(), F.col("created_ts").desc(), F.col(key_col).desc()]
    )
    return [delete_first.desc(), line_jump.desc(), age_promo.desc(), *directed]


class FairnessScheduler:
    """Anti-starvation alternating dequeuer over a pending-items frame.

    dequeue_next_batch(queue) returns the next batch as a list of Rows
    (the reference returns Vec<UnifiedQueueItem>) ordered by the active
    direction, and advances the alternation state by the number of items
    actually returned — flipping direction once the per-direction batch
    budget (10 high / 3 low) is consumed."""

    def __init__(self, config: FairnessConfig | None = None):
        self.config = config or FairnessConfig()
        self.metrics = FairnessMetrics()
        self._descending = True
        self._items_since_flip = 0

    def _order(self, queue: DataFrame, descending: bool, now_ts) -> DataFrame:
        cols = dequeue_sort_cols(
            descending,
            F.lit(now_ts).cast("long"),
            self.config.age_promotion_warning_seconds,
            self.config.age_promotion_critical_seconds,
        )
        return queue.orderBy(*cols)

    def dequeue_next_batch(
        self, queue: DataFrame, max_batch_size: int, now_ts: int
    ) -> list:
        """now_ts is the scheduler's clock (epoch seconds) — passed in,
        never sampled here, so runs are replayable."""
        if not self.config.enabled:
            return self._order(queue, True, now_ts).limit(max_batch_size).collect()
        # the reference dequeues the caller's full max_batch_size every
        # call and flips once the running count crosses the
        # direction-appropriate budget (fairness_scheduler.rs:230-280)
        limit = (
            self.config.high_priority_batch
            if self._descending
            else self.config.low_priority_batch
        )
        items = (
            self._order(queue, self._descending, now_ts)
            .limit(max_batch_size)
            .collect()
        )
        self._advance(len(items), limit)
        return items

    def _advance(self, n: int, limit: int) -> None:
        """State/metrics update after dequeuing n items under the
        current direction's batch budget — shared by the live and the
        static-ordering drain paths (fairness_scheduler.rs:255-280)."""
        if not n:
            return
        self._items_since_flip += n
        self.metrics.total_items_dequeued += n
        self.metrics.items_since_flip = self._items_since_flip
        if self._descending:
            self.metrics.high_priority_first_items += n
        else:
            self.metrics.low_priority_first_items += n
        if self._items_since_flip >= limit:
            self._descending = not self._descending
            self._items_since_flip = 0
            self.metrics.direction_flips_total += 1
            self.metrics.current_priority_descending = self._descending
            self.metrics.items_since_flip = 0


def drain_fairly_static(
    scheduler: FairnessScheduler,
    queue: DataFrame,
    max_batch_size: int = 10,
    now_ts: int = 0,
    key_col: str = "queue_id",
) -> list[list]:
    """Drain a STATIC pending frame — semantically identical to
    drain_fairly (sort-remaining-then-take == scan a precomputed total
    order skipping taken ids, because nothing but removals changes
    between rounds), but the two direction orderings are materialized
    ONCE (two Spark jobs total) and the rounds replay driver-side
    through the same scheduler state machine. The general drain_fairly
    re-sorts per round because a live queue mutates between batches
    (new arrivals, lease expiries); use this one for bounded snapshots
    (the driver query / reporting path)."""
    desc_order = scheduler._order(queue, True, now_ts).collect()
    asc_order = scheduler._order(queue, False, now_ts).collect()
    taken: set = set()
    batches: list[list] = []
    while len(taken) < len(desc_order):
        if scheduler.config.enabled:
            descending = scheduler._descending
            limit = (
                scheduler.config.high_priority_batch
                if descending
                else scheduler.config.low_priority_batch
            )
        else:
            descending, limit = True, max_batch_size
        order = desc_order if descending else asc_order
        batch = []
        for r in order:
            if r[key_col] not in taken:
                batch.append(r)
                if len(batch) == max_batch_size:
                    break
        if not batch:
            break
        taken.update(r[key_col] for r in batch)
        if scheduler.config.enabled:
            scheduler._advance(len(batch), limit)
        batches.append(batch)
    return batches


def drain_fairly(
    scheduler: FairnessScheduler,
    queue: DataFrame,
    max_batch_size: int = 10,
    now_ts: int = 0,
    key_cols: tuple[str, ...] = ("queue_id",),
) -> list[list]:
    """Drain the whole pending frame through the scheduler, returning the
    sequence of dequeued batches (the processing order a 2-tenant burst
    test can assert interleaving on). Each round removes the dequeued
    keys from the pending frame — the foreachBatch consumption analog."""
    batches: list[list] = []
    pending = queue
    while True:
        batch = scheduler.dequeue_next_batch(pending, max_batch_size, now_ts)
        if not batch:
            break
        batches.append(batch)
        spark = queue.sparkSession
        taken = spark.createDataFrame(
            [tuple(r[k] for k in key_cols) for r in batch], list(key_cols)
        )
        pending = pending.join(taken, list(key_cols), "left_anti")
    return batches
