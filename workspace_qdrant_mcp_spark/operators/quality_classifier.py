"""Trained quality classifier — the CCNet / GPT-3-style learned filter.

Every published large-scale pretraining pipeline runs a TRAINED quality
filter next to the heuristic one: GPT-3 scored CommonCrawl with a
logistic-regression head over hashed text features against a WebText
positive set (Brown et al. 2020, appendix A); CCNet ranks by a
reference-corpus language model (Wenzek et al. 2020). The reference
daemon (a retrieval engine) has no analog — this extends the repo's
curation family (heuristic quality_score / gopher_quality / DSIR) with
the missing standard stage.

Seed labels are BOOTSTRAPPED from the in-corpus heuristic — label 1 iff
textstats.quality_col(text) >= QC_TAU — the standard move when no
external reference corpus ships with the data (the heuristic picks the
seed; the trained head generalizes it over a feature space the
heuristic never saw). The label threshold compares RAW doubles: the
heuristic is pure count arithmetic (+ * /), bit-identical across
engines, so the cut needs no rounding guard.
The CIRCULARITY of evaluating that head against its own seeds is broken
by quality_classifier_indep_scores (r11): train WITHOUT a held-out
source, score everything frozen — the held-out source's PR/AUC then
measures cross-source generalization, and quality_classifier_pr_card
publishes both operating curves side by side.

Model: logistic regression over hashed-unigram term-frequency shares
(functions/hashing.md5_hash64 % QC_DIM — the engine-parity hash) plus
an intercept. Training = QC_ROUNDS unrolled full-batch gradient-descent
rounds (the lloyd_kmeans fixed-round discipline: no convergence probe,
no RNG, no early exit — a DuckDB oracle unrolls the identical chain).

ENGINE-EXACT ARITHMETIC (functions/emit.py discipline, taken to its
conclusion): features, margins, residuals, and gradient numerators are
int64 MICROUNITS — x6 = round(1e6 * tf), margin numerator =
sum(x6 * w6) (exact integer, ORDER-INDEPENDENT — float-sum drift is
impossible by construction, not by luck), residual = y*1e6 - p6. The
single libm call per doc per round is exp() inside the sigmoid, applied
to a bit-identical double and immediately re-quantized to p6 integer
microunits. Weights live as exact 6-decimal doubles (BIGINT/1e6).

Int64 bounds: |x6 * resid6| <= 1e12 per doc, so gradient numerators are
exact to ~9.2e6 docs (int64) and convert losslessly to double to ~9e3
docs per 2^53... per gradient SUM of ~9e15, i.e. ~9000 average docs per
feature bucket at full magnitude — in practice tf shares spread mass so
sf0.1 (5k docs) stays well inside; at 100 TB the numerator switches to
double partial sums (ulp-tolerant, no oracle twin) — the integer path
is the oracle-replayable correctness twin, same output contract.

100 TB shape (re-shaped r13, optimization guide §2.4/§8): the corpus is
aggregated ONCE into a per-doc feature array (doc_id, y, fx) and
localCheckpoint'ed; each GD round is then ONE narrow pass over that
table — the margin is an integer aggregate() over the fx array under a
LITERAL weight array (weights are dim+1 bounded model values carried
driver-side between rounds, exactly like the reference engine's
in-memory head), and the gradient is an explode + feat_id partial
aggregate whose single exchange moves <= (dim+1) x n_tasks partial
rows. The former shape paid a doc_id exchange for the margin groupBy,
a doc_id join for the residual, and a doc_id join for the gradient
EVERY round (~5 exchanges + a 33-row checkpoint action per round); now
a round is one job with one model-sized exchange. The weight update
w' = micro6(w + lr*g/(1e12*n)) runs driver-side with arithmetic that
replicates Spark bit-for-bit (Decimal-HALF_UP round on the shortest
repr; IEEE +,*,/); sigmoid's exp() stays IN Spark so no libm boundary
moves.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_hash64
from ..io import fan_out
from .textstats import _ws_tokens, quality_col

QC_DIM = 32          # hashed-unigram buckets
QC_BIAS = QC_DIM     # intercept feature id
QC_SALT = "qc|"
QC_TAU = 0.512       # seed-label cut on the heuristic quality score
QC_LR = 2.0
QC_ROUNDS = 4


def qc_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, feat_id, x6) — hashed-unigram term-frequency shares in
    integer microunits, plus the intercept row (feat_id=QC_BIAS,
    x6=1e6). Empty documents contribute only their intercept."""
    words = fan_out(docs).select(
        F.col(id_col), F.explode(_ws_tokens(F.col(text_col))).alias("w")
    )
    cnts = words.groupBy(
        id_col,
        (md5_hash64(F.col("w"), QC_SALT) % QC_DIM).alias("feat_id"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnts.groupBy(id_col).agg(F.sum("cnt").alias("nw"))
    tf = cnts.join(tot, id_col).select(
        F.col(id_col),
        "feat_id",
        F.round(
            F.col("cnt").cast("double")
            / F.col("nw").cast("double")
            * F.lit(1e6)
        )
        .cast("long")
        .alias("x6"),
    )
    bias = docs.select(
        F.col(id_col),
        F.lit(QC_BIAS).cast("long").alias("feat_id"),
        F.lit(1_000_000).cast("long").alias("x6"),
    )
    return tf.unionByName(bias)


def qc_labels(
    docs: DataFrame,
    tau: float = QC_TAU,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, y) — bootstrapped seed label: 1 iff the heuristic quality
    score clears tau (raw-double compare; the score is pure count
    arithmetic, bit-identical across engines)."""
    return fan_out(docs).select(
        F.col(id_col),
        F.when(quality_col(F.col(text_col)) >= F.lit(tau), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("y"),
    )


def _rnd(x: float) -> int:
    """Exact replica of Spark's round(double) → long: BigDecimal of the
    double's shortest decimal repr, scale 0, HALF_UP (away from zero)."""
    return int(
        Decimal(repr(float(x))).quantize(Decimal(1), rounding=ROUND_HALF_UP)
    )


def _w6_literal(w: DataFrame) -> "F.Column":
    """Bounded weight table (dim+1 rows) → literal long array of
    quantized weights, indexable by feat_id+1. w6 = round(weight*1e6)
    is exact (weights are 6-decimal by construction). Feat_ids absent
    from w map to 0 — value-identical to the former inner-join shape
    (a dropped row contributed nothing to the integer margin sum)."""
    w6 = {int(r["feat_id"]): _rnd(r["weight"] * 1e6) for r in w.collect()}
    top = max(w6) if w6 else 0
    return F.array(
        *[F.lit(w6.get(k, 0)).cast("long") for k in range(top + 1)]
    )


def _p6_col(m6: "F.Column") -> "F.Column":
    """Exact-integer margin (microunits^2) → sigmoid re-quantized to
    integer microunits; the single libm call stays in Spark."""
    m = m6.cast("double") / F.lit(1e12)
    return F.round(F.lit(1e6) / (F.lit(1.0) + F.exp(-m))).cast("long")


def _margins(feats: DataFrame, w: DataFrame, id_col: str) -> DataFrame:
    """(doc_id, p6) — sigmoid of the exact-integer margin, re-quantized
    to integer microunits. The bounded weight table becomes a literal
    array (no broadcast-join job); one map-side-combinable doc_id
    aggregate remains."""
    w6_arr = _w6_literal(w)
    m = (
        feats.filter(
            (F.col("feat_id") >= 0) & (F.col("feat_id") < F.size(w6_arr))
        )
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("x6")
                * F.element_at(w6_arr, F.col("feat_id").cast("int") + F.lit(1))
            ).alias("m6")
        )
    )
    return m.select(F.col(id_col), _p6_col(F.col("m6")).alias("p6"))


def train_quality_classifier(
    feats: DataFrame,
    labels: DataFrame,
    lr: float = QC_LR,
    rounds: int = QC_ROUNDS,
    dim: int = QC_DIM,
    id_col: str = "doc_id",
) -> DataFrame:
    """(feat_id, weight) — dim+1 rows after `rounds` unrolled full-batch
    GD steps from w=0: w' = micro6(w + lr * sum((y - p) x) / N), every
    sum an exact int64 microunit aggregate (see module doc).

    The returned frame is a dim+1-row LOCAL relation (the weights live
    driver-side during training) — safe to hold across any
    ckpt.clear_unpinned() sweep; nothing to re-materialize.

    Plan shape per round (guide §2.4/§8): one narrow pass over the
    checkpointed per-doc feature-array table — integer aggregate() over
    the fx array under the literal weight array gives the margin with
    NO doc_id exchange; explode + feat_id partial aggregate gives the
    gradient with one model-sized exchange; the dim+1 gradient rows are
    collected and the micro6 weight update replays Spark's arithmetic
    exactly on the driver."""
    spark = feats.sparkSession
    per_doc = _fx_agg(feats, id_col).join(labels, id_col).localCheckpoint()
    weights = _train_rounds(per_doc, labels.count(), lr, rounds, dim)
    return spark.createDataFrame(
        sorted(weights.items()), "feat_id long, weight double"
    )


def _fx_agg(feats: DataFrame, id_col: str) -> DataFrame:
    """(doc_id, fx) — the per-doc feature array (collect_list order is
    nondeterministic; every consumer is an order-free integer sum)."""
    return feats.groupBy(id_col).agg(
        F.collect_list(F.struct("feat_id", "x6")).alias("fx")
    )


def _fx_p6(weights: dict, dim: int) -> "F.Column":
    """p6 scoring expression over the per-doc fx array under a LITERAL
    quantized-weight array — no join, no groupBy. Out-of-range feat_ids
    are filtered exactly as the former weight inner join dropped them;
    every doc carries its intercept row, so no doc loses all rows."""
    w6 = {fid: _rnd(wt * 1e6) for fid, wt in weights.items()}
    w6_arr = F.array(
        *[F.lit(w6.get(k, 0)).cast("long") for k in range(dim + 1)]
    )
    m6 = F.aggregate(
        F.filter(
            F.col("fx"),
            lambda s: (s["feat_id"] >= 0) & (s["feat_id"] <= F.lit(dim)),
        ),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + s["x6"]
        * F.element_at(w6_arr, s["feat_id"].cast("int") + F.lit(1)),
    )
    return _p6_col(m6)


def _train_rounds(
    per_doc: DataFrame, nd: int, lr: float, rounds: int, dim: int
) -> dict:
    """The unrolled GD rounds over a (doc_id, fx, y) table; returns the
    final {feat_id: weight} dict (exact 6-decimal doubles)."""
    if nd == 0 and rounds > 0:
        raise ValueError("train_quality_classifier: zero labeled documents")
    weights = {fid: 0.0 for fid in range(dim + 1)}
    for _ in range(rounds):
        grad_rows = (
            per_doc.select(
                (
                    F.col("y") * F.lit(1_000_000) - _fx_p6(weights, dim)
                ).alias("r6"),
                F.explode("fx").alias("s"),
            )
            .groupBy(F.col("s.feat_id").alias("feat_id"))
            .agg(F.sum(F.col("s.x6") * F.col("r6")).alias("g"))
            .collect()
        )
        g = {int(r["feat_id"]): int(r["g"]) for r in grad_rows}
        weights = {
            fid: _rnd(
                (wt + lr * float(g.get(fid, 0)) / (1e12 * float(nd))) * 1e6
            )
            / 1e6
            for fid, wt in weights.items()
        }
    return weights


def quality_classifier_weights(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(feat_id, weight) — the trained artifact, ordered by feature."""
    w = train_quality_classifier(
        qc_features(docs, id_col, text_col),
        qc_labels(docs, id_col=id_col, text_col=text_col),
        id_col=id_col,
    )
    return w.orderBy("feat_id")


def quality_classifier_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, label, score, pred) — every document scored by the
    trained head: score = sigmoid(w·x) in exact 6-decimal form, pred on
    the INTEGER microunit threshold (>= 0.5 — no float-boundary
    exposure), label = the bootstrap seed for filter-audit reporting.
    The production filter keeps pred=1 (or thresholds score by stratum);
    this emission is the data-card view of the same decision.

    Plan shape (re-shaped r13, guide §2.4): ONE corpus pass builds the
    checkpointed per-doc feature-array table; training runs its rounds
    over it driver-side; scoring is then a narrow exchange-free
    projection of the SAME table under the literal trained weights —
    the former shape rebuilt qc_features a second time and paid a
    doc_id margin aggregate + two doc_id joins to score."""
    feats = qc_features(docs, id_col, text_col)
    labels = qc_labels(docs, id_col=id_col, text_col=text_col)
    per_doc = _fx_agg(feats, id_col).join(labels, id_col).localCheckpoint()
    weights = _train_rounds(per_doc, per_doc.count(), QC_LR, QC_ROUNDS, QC_DIM)
    return (
        per_doc.select(
            F.col(id_col),
            F.col("y").alias("label"),
            _fx_p6(weights, QC_DIM).alias("p6"),
        )
        .select(
            F.col(id_col),
            "label",
            (F.col("p6").cast("double") / F.lit(1e6)).alias("score"),
            F.when(F.col("p6") >= F.lit(500_000), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("pred"),
        )
        .orderBy(id_col)
    )


def quality_classifier_indep_scores(
    docs: DataFrame,
    holdout_source: str = "src1",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, is_holdout, label, score, pred) — the
    CIRCULARITY-BREAKING variant of quality_classifier_scores
    (VERDICT r10 #3): the head trains ONLY on documents from sources
    other than `holdout_source` (their heuristic seed labels), then
    scores EVERY document under the frozen weights. For the held-out
    source the scores are out-of-sample by construction — the model
    never saw any of its documents or labels — so its PR/AUC against
    the held-out heuristic labels measures GENERALIZATION of the
    learned quality signal across sources, not memorization of the
    seed rule on the same rows (the GPT-3 appendix-A protocol: train
    the filter on one distribution, deploy it on another).

    label = the heuristic seed on ALL docs (the audit/validation
    signal — for held-out rows it was never used in training).
    Plan shape identical to quality_classifier_scores (re-shaped r13):
    ONE corpus pass builds the checkpointed per-doc table carrying
    is_holdout; training runs driver-side over its is_holdout=0 subset
    (value-identical to the former inner join against the train-source
    label set); scoring is a narrow projection of the full table under
    the frozen literal weights."""
    if source_col not in docs.columns:
        raise ValueError(
            f"quality_classifier_indep_scores: docs has no "
            f"'{source_col}' column (columns: {docs.columns}) — pass "
            f"source_col= to name the split column"
        )
    # fail loud at entry (house discipline): an absent holdout source
    # would silently emit an empty held-out curve; an all-holdout corpus
    # would train on zero labels. One tiny probe job, trainer-path only.
    n_hold, n_train = docs.agg(
        F.sum(
            (F.col(source_col) == F.lit(holdout_source)).cast("long")
        ),
        F.sum(
            (F.col(source_col) != F.lit(holdout_source)).cast("long")
        ),
    ).first()
    if not n_hold:
        raise ValueError(
            f"quality_classifier_indep_scores: holdout_source "
            f"'{holdout_source}' matches no {source_col} value — the "
            f"held-out curve would be empty"
        )
    if not n_train:
        raise ValueError(
            f"quality_classifier_indep_scores: every row is in holdout "
            f"source '{holdout_source}' — no training labels remain"
        )
    feats = qc_features(docs, id_col, text_col)
    all_labels = qc_labels(docs, id_col=id_col, text_col=text_col)
    flags = docs.select(
        F.col(id_col),
        (F.col(source_col) == F.lit(holdout_source))
        .cast("long")
        .alias("is_holdout"),
    )
    per_doc = (
        _fx_agg(feats, id_col)
        .join(all_labels, id_col)
        .join(flags, id_col)
        .localCheckpoint()
    )
    weights = _train_rounds(
        per_doc.filter(F.col("is_holdout") == 0),
        int(n_train),
        QC_LR,
        QC_ROUNDS,
        QC_DIM,
    )
    return (
        per_doc.select(
            F.col(id_col),
            "is_holdout",
            F.col("y").alias("label"),
            _fx_p6(weights, QC_DIM).alias("p6"),
        )
        .select(
            F.col(id_col),
            "is_holdout",
            "label",
            (F.col("p6").cast("double") / F.lit(1e6)).alias("score"),
            F.when(F.col("p6") >= F.lit(500_000), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("pred"),
        )
        .orderBy(id_col)
    )


def _pr_curve(
    s: DataFrame, thresholds: tuple[int, ...], variant: str
) -> DataFrame:
    """(variant, threshold, n_kept, n_pos_kept, precision, recall,
    keep_rate) from a (label, p6) scored table — the shared PR/keep-rate
    rollup of the calibration card. Thresholding is EXACT (integer
    microunit compares); only the three final ratios are (micro6)
    doubles. precision is NULL where nothing is kept; recall is NULL
    when no positives exist (Spark and DuckDB disagree on x/0 — NULL
    vs inf/nan — so both sides guard explicitly)."""
    from ..functions.emit import micro6

    tot = s.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("label").alias("n_pos"),
    )
    kept = (
        s.select(
            "label",
            "p6",
            F.explode(
                F.array(*[F.lit(int(t)) for t in thresholds])
            ).alias("t6"),
        )
        .groupBy("t6")
        .agg(
            F.sum(
                F.when(F.col("p6") >= F.col("t6"), 1).otherwise(0)
            ).alias("n_kept"),
            F.sum(
                F.when(
                    (F.col("p6") >= F.col("t6")) & (F.col("label") == 1), 1
                ).otherwise(0)
            ).alias("n_pos_kept"),
        )
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        F.lit(variant).alias("variant"),
        (F.col("t6").cast("double") / F.lit(1e6)).alias("threshold"),
        "n_kept",
        "n_pos_kept",
        F.when(
            F.col("n_kept") > 0,
            micro6(F.col("n_pos_kept").cast("double") / F.col("n_kept")),
        ).alias("precision"),
        F.when(
            F.col("n_pos") > 0,
            micro6(F.col("n_pos_kept").cast("double") / F.col("n_pos")),
        ).alias("recall"),
        micro6(
            F.col("n_kept").cast("double") / F.col("n_total")
        ).alias("keep_rate"),
    )


def quality_classifier_pr_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    thresholds: tuple[int, ...] = tuple(range(100_000, 1_000_000, 100_000)),
    holdout_source: str = "src1",
) -> DataFrame:
    """(variant, threshold, n_kept, n_pos_kept, precision, recall,
    keep_rate) — the CALIBRATION CARD of the trained quality filter
    at each score threshold (0.1 .. 0.9 by default), now with BOTH
    operating curves at the same thresholds (VERDICT r10 #3):

      variant='self'     the original in-sample card: head trained on
                         the whole corpus's heuristic seeds, PR against
                         those same seeds (the circular audit view —
                         how faithfully the hash-feature head encodes
                         the seed rule);
      variant='heldout'  the independent card: head trained WITHOUT
                         `holdout_source`, evaluated ONLY on that
                         source's docs against heuristic labels it
                         never saw (the generalization view — what a
                         deployment on new data would actually get).

    This is the table a filter deployment publishes to pick its
    operating point (GPT-3's appendix-A Pareto trade: keep-rate vs
    quality); comparing the two curves at a threshold shows how much
    of the in-sample precision survives distribution transfer.

    Plan: two scored tables (each training chain runs once), a bounded
    x|thresholds| explode per curve, one groupBy(threshold) each with
    map-side combine, and 1-row broadcast totals."""
    s_self = quality_classifier_scores(docs, id_col, text_col).select(
        F.col("label"),
        F.round(F.col("score") * F.lit(1e6)).cast("long").alias("p6"),
    )
    s_held = (
        quality_classifier_indep_scores(
            docs, holdout_source, id_col, text_col
        )
        .filter(F.col("is_holdout") == 1)
        .select(
            F.col("label"),
            F.round(F.col("score") * F.lit(1e6)).cast("long").alias("p6"),
        )
    )
    return (
        _pr_curve(s_self, thresholds, "self")
        .unionByName(_pr_curve(s_held, thresholds, "heldout"))
        .orderBy("variant", "threshold")
    )
