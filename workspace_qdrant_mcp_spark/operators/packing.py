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
walk itself is order-defined, so it runs as `applyInPandas` per group —
sequential WITHIN a group (that is the semantics), parallel ACROSS
groups/shards, which is exactly how production packers shard at 100 TB
(pack per input shard, never globally). Per-group state is two ints.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import BPE_TOKEN_RE

PACK_BUDGET = 512

PACK_SCHEMA = (
    "source STRING, doc_id BIGINT, tokens INT, bin_id INT, bin_fill INT"
)


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
    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        bin_id, fill = 0, 0
        for i, t in enumerate(pdf["tokens"]):
            t = int(t)
            if i == 0:
                fill = t
            elif fill + t > budget:
                bin_id += 1
                fill = t
            else:
                fill += t
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = pd.Series(bins, dtype="int32")
        pdf["bin_fill"] = pd.Series(fills, dtype="int32")
        return pdf

    return counted.groupBy("source").applyInPandas(walk, PACK_SCHEMA)
