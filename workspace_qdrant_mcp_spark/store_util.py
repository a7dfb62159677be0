"""The maintained-store update skeleton, defined once.

Four single-table incremental stores share the exact same update shape
(BM25 postings, minhash signatures, per-doc features, IVF assignments):
read-or-empty → anti-join out the keys being replaced or deleted →
append freshly computed rows for the delta → localCheckpoint → overwrite
the store path. The skeleton encodes two invariants that are easy to
get subtly wrong and must hold in every store:

- the localCheckpoint BEFORE the overwrite: the output plan READS the
  same path it is about to overwrite, so it must be fully materialized
  first or the write truncates its own input;
- change-wins on change+delete in one batch: the gone set is the UNION
  of changed and deleted keys, and the fresh rows re-add the changed
  ones — a doc that is both modified and deleted in one batch ends up
  deleted only if the caller ordered it so, never duplicated.

Each store keeps its own read_* (schema + the missing-vs-corrupt
distinction: only a MISSING path reads as empty, an unreadable one
raises) and its own fresh-row computation; the lifecycle lives here.
The graph store stays separate — it maintains multiple mutually
consistent tables per update, not one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def overwrite_store(
    store_path: str,
    existing: DataFrame,
    key: str,
    gone: DataFrame | None = None,
    fresh: DataFrame | None = None,
) -> None:
    """kept = existing ⟕̸ gone (anti-join on `key`); write kept ∪ fresh
    over store_path, materializing first (see module docstring)."""
    kept = (
        existing
        if gone is None
        else existing.join(gone.distinct(), key, "left_anti")
    )
    out = kept if fresh is None else kept.unionByName(fresh)
    out.localCheckpoint().write.mode("overwrite").parquet(store_path)


def union_keys(
    key: str,
    changed: DataFrame | None = None,
    deleted: DataFrame | None = None,
) -> DataFrame | None:
    """The gone set: keys of changed rows ∪ explicitly deleted keys
    (each may be None). Both frames must already expose `key`."""
    gone = None
    if changed is not None:
        gone = changed.select(key)
    if deleted is not None:
        d = deleted.select(key)
        gone = d if gone is None else gone.unionByName(d)
    return gone
