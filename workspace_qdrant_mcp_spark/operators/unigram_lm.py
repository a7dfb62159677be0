"""Unigram-LM (SentencePiece-style) tokenizer training — BPE's twin.

The second of the two standard subword tokenizers (Kudo 2018,
"Subword Regularization"; the SentencePiece unigram trainer): start
from a large candidate piece inventory, then alternate
  E: Viterbi-segment the corpus under current piece scores,
  M: re-estimate piece frequencies from the segmentations and PRUNE
     the lowest-utility pieces,
for a FIXED number of rounds (the lloyd_kmeans / bpe discipline — no
convergence probe, a DuckDB oracle unrolls the identical chain).

Simplifications vs full SentencePiece, on purpose (deterministic +
oracle-replayable): hard-EM (Viterbi counts, not forward-backward
expectations), count-ratio scores instead of EM likelihoods, add-one
smoothing, and rank-based pruning (drop PRUNE_K lowest-usage multi-char
pieces per round; single characters are never pruned — they guarantee
every word stays segmentable).

ENGINE-EXACT ARITHMETIC: piece costs are integer microunits
(round(ln(tot/cnt) * 1e6) — ln is the single libm call, its output
immediately quantized), so the Viterbi DP — sums and comparisons of
int64 — is exact in every engine; ties break to the LONGER piece
(struct-min on (cost, -j)). Usage counts are exact integer aggregates.
The emitted table is float-free (strings + int64 only).

DISTRIBUTION SHAPE (how production tokenizer trainers actually run,
and the same shape as the reference shipping its vocab to every search
node): the corpus is touched ONCE (word-frequency aggregate — shared
with bpe._word_counts' contract); each E-step is one pass over the
BOUNDED word table with the piece model broadcast as a map literal
(the model is ≤ SEED_MULTI + |alphabet| rows BY CONSTRUCTION, so the
per-round collect is bounded model state, not data — the documented
bounded-driver-action class). The Viterbi DP itself is a JVM-side
higher-order fold (F.aggregate over the position sequence): no UDF, no
per-row Python.

Words longer than MAX_WORD chars are excluded from training (bounds
the DP unroll; mirrored in the oracle — at real scale these are URLs
and hashes a tokenizer trainer drops anyway).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..io import fan_out
from .textstats import _ws_tokens

MAX_PIECE = 4       # max candidate piece length (chars)
MAX_WORD = 16       # words longer than this are excluded from training
SEED_MULTI = 64     # multi-char candidates seeded (top by substring count)
PRUNE_K = 16        # multi-char pieces dropped per EM round
ROUNDS = 2
BIG = 10**15        # infeasible-piece sentinel (sums stay < int64 max)


def ulm_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) — whitespace-token vocabulary with frequencies, words
    over MAX_WORD chars excluded. The single corpus pass."""
    return (
        fan_out(docs)
        .select(F.explode(_ws_tokens(F.col(text_col))).alias("word"))
        .filter(F.length("word") <= MAX_WORD)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ulm_seed_counts(words: DataFrame) -> DataFrame:
    """(piece, cnt) — frequency-weighted counts of every substring of
    length 1..MAX_PIECE, restricted to ALL single chars + the top
    SEED_MULTI multi-char candidates by (cnt DESC, piece ASC)."""
    idx = F.expr(
        f"flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(1, least({MAX_PIECE}, length(word) - i + 1)), "
        f"j -> substr(word, i, j))))"
    )
    sub = (
        words.select(F.explode(idx).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.length("piece") > 1).orderBy(
        F.desc("cnt"), F.asc("piece")
    )
    return (
        sub.withColumn("__r", F.row_number().over(w))
        .filter((F.length("piece") == 1) | (F.col("__r") <= SEED_MULTI))
        .drop("__r")
    )


def _cost_map(pieces: list[tuple[str, int]]) -> dict[str, int]:
    """piece -> integer-microunit cost: round(ln(tot/cnt) * 1e6). The
    single libm call of the trainer; its quantized output is what every
    engine's DP consumes."""
    tot = sum(c for _, c in pieces)
    return {p: round(math.log(tot / c) * 1e6) for p, c in pieces}


def ulm_viterbi_pieces(
    words: DataFrame, cost6: dict[str, int]
) -> DataFrame:
    """(word, n, pieces) — Viterbi segmentation of every vocabulary word
    under the broadcast cost map: exact int64 DP via a JVM-side fold,
    ties to the longer piece."""
    mp = F.create_map(
        *[F.lit(x) for kv in sorted(cost6.items()) for x in kv]
    )
    L = F.length("word")

    def lookup(piece):
        return F.coalesce(F.element_at(mp, piece), F.lit(BIG))

    def step(acc, i):
        cands = F.array(*[
            F.when(
                F.lit(j) <= i,
                F.struct(
                    (
                        F.element_at(
                            acc["best"], (i - F.lit(j) + 1).cast("int")
                        )
                        + lookup(
                            F.col("word").substr(i - F.lit(j) + 1, F.lit(j))
                        )
                    ).alias("tot"),
                    F.lit(-j).alias("negj"),
                    F.lit(j).alias("j"),
                ),
            )
            for j in range(1, MAX_PIECE + 1)
        ])
        best = F.array_min(F.filter(cands, lambda c: c.isNotNull()))
        return F.struct(
            F.concat(acc["best"], F.array(best["tot"])).alias("best"),
            F.concat(acc["back"], F.array(best["j"])).alias("back"),
        )

    zero = F.struct(
        F.array(F.lit(0).cast("long")).alias("best"),
        F.array(F.lit(0)).alias("back"),
    )
    dp = words.select(
        "word", "n", F.aggregate(F.sequence(F.lit(1), L), zero, step).alias("dp")
    )

    def btstep(acc, _):
        i = acc["i"]
        j = F.element_at(F.col("dp.back"), (i + 1).cast("int"))
        return F.when(
            i > 0,
            F.struct(
                (i - j).alias("i"),
                F.concat(
                    acc["ps"], F.array(F.col("word").substr(i - j + 1, j))
                ).alias("ps"),
            ),
        ).otherwise(acc)

    bz = F.struct(
        L.cast("int").alias("i"), F.array().cast("array<string>").alias("ps")
    )
    bt = F.aggregate(F.sequence(F.lit(1), F.lit(MAX_WORD)), bz, btstep)
    return dp.select("word", "n", bt["ps"].alias("pieces"))


def ulm_usage(words: DataFrame, cost6: dict[str, int]) -> DataFrame:
    """(piece, usage) — frequency-weighted Viterbi piece usage over the
    word table: the E-step's sufficient statistics, one bounded-table
    pass."""
    return (
        ulm_viterbi_pieces(words, cost6)
        .select(F.explode("pieces").alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").alias("usage"))
    )


def unigram_lm_pieces(
    docs: DataFrame, rounds: int = ROUNDS, text_col: str = "text"
) -> DataFrame:
    """(piece, piece_len, cnt, cost_micro) — the trained unigram-LM
    piece table after `rounds` hard-EM rounds (see module doc): cnt =
    smoothed final usage, cost_micro = round(ln(tot/cnt)*1e6). Float-
    free emission, ordered by piece."""
    spark = docs.sparkSession
    words = ulm_word_counts(docs, text_col).localCheckpoint()
    seed = ulm_seed_counts(words).collect()          # bounded: model state
    kept = {r["piece"]: int(r["cnt"]) for r in seed}
    chars = {p for p in kept if len(p) == 1}
    for _ in range(rounds):
        cost6 = _cost_map(sorted(kept.items()))
        usage = {
            r["piece"]: int(r["usage"])
            for r in ulm_usage(words, cost6).collect()  # bounded: model
        }
        multi = [p for p in kept if len(p) > 1]
        keep_multi = sorted(
            multi, key=lambda p: (-usage.get(p, 0), p)
        )[: max(len(multi) - PRUNE_K, 0)]
        kept = {p: usage.get(p, 0) + 1 for p in chars | set(keep_multi)}
    cost6 = _cost_map(sorted(kept.items()))
    rows = [
        (p, len(p), kept[p], cost6[p]) for p in sorted(kept)
    ]
    return spark.createDataFrame(
        rows, "piece string, piece_len int, cnt long, cost_micro long"
    )


def ulm_doc_tokens(
    docs: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """(doc_id[, source], n_words, n_pieces) — re-tokenization under the
    trained piece table: a JOIN against the word table's Viterbi piece
    counts, never a per-doc DP replay (bpe_doc_tokens' contract). Words
    over MAX_WORD chars fall back to one piece per char.

    One corpus pass (r13 second pass, guide §2.3): the Viterbi word
    table is DERIVED from the occ aggregate (same explode, summed
    per-doc counts — identical (word, n) rows to ulm_word_counts, and
    the Viterbi segmentation never reads n anyway). occ has two real
    consumers (the words derivation and the per-word join), and exchange
    reuse cannot deduplicate them — Catalyst pushes the MAX_WORD filter
    through the derivation's aggregate, making the subtrees canonically
    different — so occ is localCheckpointed: one tokenize+explode+agg
    pass materialized, instead of the former two full corpus scans.
    When group_col is given, the source label rides the occ key — the
    fertility rollup then needs no third corpus scan + doc_id join."""
    cost6 = {
        r["piece"]: int(r["cost_micro"]) for r in pieces.collect()
    }  # bounded: the model artifact
    cols = [F.col(id_col)]
    keys = [id_col]
    if group_col is not None:
        cols.append(F.col(group_col).alias("source"))
        keys.append("source")
    # LAZY mark (r14, ADVICE r13): occ is corpus-vocabulary-sized, so an
    # eager checkpoint here made merely CONSTRUCTING this plan run a full
    # tokenize+explode+agg job even if the caller never executed the
    # result; eager=False defers materialization to the first consumer
    # action, which persists it for the second consumer exactly as
    # before. Known trade-off of localCheckpoint at any eagerness: the
    # blocks are executor-local and non-replicated, so an executor loss
    # mid-job fails the downstream stages unrecoverably — acceptable
    # here because the table is derived state inside one query, and the
    # retry is the query itself.
    occ = (
        fan_out(docs)
        .select(*cols, F.explode(_ws_tokens(F.col(text_col))).alias("word"))
        .groupBy(*keys, "word")
        .agg(F.count(F.lit(1)).alias("occ"))
    ).localCheckpoint(eager=False)
    words = (
        occ.filter(F.length("word") <= MAX_WORD)
        .groupBy("word")
        .agg(F.sum("occ").alias("n"))
    )
    seg = ulm_viterbi_pieces(words, cost6).select(
        "word", F.size("pieces").alias("n_pieces_word")
    )
    per_word = occ.join(seg, "word", "left").select(
        *keys,
        "occ",
        F.coalesce(F.col("n_pieces_word"), F.length("word")).alias("npw"),
    )
    return (
        per_word.groupBy(*keys)
        .agg(
            F.sum("occ").alias("n_words"),
            F.sum(F.col("occ") * F.col("npw")).alias("n_pieces"),
        )
        .orderBy(id_col)
    )


def unigram_fertility(
    docs: DataFrame,
    rounds: int = ROUNDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_words, n_pieces, fertility) — per-source
    tokenizer fertility under the TRAINED unigram-LM piece table:
    bpe_fertility's twin, the direct BPE-vs-unigram data-card contrast
    (same corpus, same rollup, different vocabulary learner). Microunit
    float emission (functions/emit.py); source rides the occ pass (r13
    second pass, guide §2.3 — formerly a third corpus scan joined back
    by doc_id)."""
    from ..functions.emit import micro6

    pieces = unigram_lm_pieces(docs, rounds, text_col)
    per_doc = ulm_doc_tokens(docs, pieces, id_col, text_col, group_col)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            micro6(
                F.sum("n_pieces").cast("double") / F.sum("n_words")
            ).alias("fertility"),
        )
        .orderBy("source")
    )
