"""Sequence packing for training-batch construction (training-data
extension, beyond the reference): greedily pack documents into
fixed-token-budget bins in a deterministic order — the standard step
that turns a filtered corpus into fixed-length training sequences.

Semantics (sequential first-fit, the common streaming packer):
  - docs are walked per group (source) in ascending doc_id order;
  - a doc joins the current bin unless it would push the bin's token
    total past the budget, in which case it OPENS a new bin (a doc
    larger than the budget sits alone in its own bin);
  - bin ids are dense per group starting at 0.

Scale shape: token counting is a JVM regexp pass over the scan; the
walk itself is order-defined — sequential WITHIN a group (that is the
semantics), parallel ACROSS groups/shards, which is exactly how
production packers shard at 100 TB (pack per input shard, never
globally). Per-group state is two ints. The walk runs as a JVM
higher-order `aggregate` fold over the group's collected (doc_id,
tokens) array (r13, optimization guide §4.1: built-ins over the Python
boundary) — the former `applyInPandas` walk materialized the same
whole group in a pandas frame, so the per-group memory contract is
unchanged while the ArrowEvalPython round-trip and per-task Python
worker disappear from the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import BPE_TOKEN_RE

PACK_BUDGET = 512


def pack_documents(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(source, doc_id, tokens, bin_id, bin_fill) — bin_fill is the bin's
    running token total AFTER this doc (the oracle's walk state, kept so
    the gate checks the packer's internals, not just the bin labels)."""
    counted = docs.select(
        F.col(group_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
        .cast("int")
        .alias("tokens"),
    )
    return _pack_counted(counted, budget)


def pack_documents_bpe(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    n_merges: int = 8,
    id_col: str = "doc_id",
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """pack_documents with token counts from the LEARNED BPE vocabulary
    (bpe.bpe_doc_tokens over the same corpus) instead of the regex
    pre-tokenizer — the packer a real pipeline runs once a tokenizer is
    trained: bin budgets are model token budgets, so the counts must
    come from the model's vocab. Docs whose words all fall outside the
    trained vocabulary (zero tokenizable words) count 0 tokens, exactly
    as the trainer would pad-skip them."""
    from .bpe import bpe_doc_tokens

    toks = bpe_doc_tokens(docs, n_merges, text_col, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col("n_bpe_tokens").cast("int").alias("tokens"),
    )
    counted = (
        docs.select(
            F.col(group_col).alias("source"), F.col(id_col).alias("doc_id")
        )
        .join(toks, "doc_id", "left")
        .select(
            "source",
            "doc_id",
            F.coalesce("tokens", F.lit(0)).cast("int").alias("tokens"),
        )
    )
    return _pack_counted(counted, budget)


def _pack_counted(counted: DataFrame, budget: int) -> DataFrame:
    """The sequential first-fit walk as a JVM fold: per group, collect
    and sort the (doc_id, tokens) structs (doc_id is unique per group,
    so struct order == doc_id order) and run the two-int recurrence with
    F.aggregate, emitting one (doc_id, tokens, bin_id, bin_fill) struct
    per doc. Exact integer arithmetic — value-identical to the former
    pandas walk, with no Python evaluation node in the plan.

    COST BOUND (ADVICE r13): the fold appends to the accumulator with
    concat(acc.out, array(row)), which copies the accumulated array on
    every step — O(n²) element copies per group (the pandas walk was
    O(n) but paid the Python boundary). Fine for this engine's group
    sizes (sources are bounded, and both sides hold the whole group in
    memory either way); a deployment packing millions of docs per group
    should pre-shard groups (pack per input shard — the natural 100 TB
    shape, since bins never span shards a packer emits independently)
    or fall back to the iterator-form mapInArrow walk, which keeps the
    O(n) recurrence at the cost of the Arrow round-trip."""
    ds = counted.groupBy("source").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "tokens"))).alias(
            "ds"
        )
    )
    zero = F.struct(
        F.lit(0).cast("int").alias("bin_id"),
        F.lit(0).cast("int").alias("fill"),
        F.array()
        .cast(
            "array<struct<doc_id:bigint,tokens:int,bin_id:int,"
            "bin_fill:int>>"
        )
        .alias("out"),
    )

    def step(acc, d):
        first = F.size(acc["out"]) == 0
        overflow = (acc["fill"] + d["tokens"]) > F.lit(budget)
        new_bin = (
            F.when(first, F.lit(0).cast("int"))
            .when(overflow, acc["bin_id"] + F.lit(1))
            .otherwise(acc["bin_id"])
        )
        new_fill = F.when(first | overflow, d["tokens"]).otherwise(
            acc["fill"] + d["tokens"]
        )
        row = F.struct(
            d["doc_id"].alias("doc_id"),
            d["tokens"].alias("tokens"),
            new_bin.alias("bin_id"),
            new_fill.alias("bin_fill"),
        )
        return F.struct(
            new_bin.alias("bin_id"),
            new_fill.alias("fill"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    packed = F.aggregate(F.col("ds"), zero, step)["out"]
    return ds.select("source", F.explode(packed).alias("r")).select(
        "source",
        F.col("r.doc_id").alias("doc_id"),
        F.col("r.tokens").alias("tokens"),
        F.col("r.bin_id").alias("bin_id"),
        F.col("r.bin_fill").alias("bin_fill"),
    )
