"""Spectral embedding analysis: the top principal component of the
corpus embedding cloud by FIXED-ROUND power iteration — the missing
linear-algebra stage of the vector pipeline (PCA/whitening before ANN is
the standard recall-per-byte move: Jegou et al. 2012 use it ahead of PQ;
FAISS ships OPQ/PCA pretransforms). The reference engine stores vectors
as-is (storage/collections/multi_tenant.rs) — this is the analysis its
collection-optimizer stage would run offline.

Engine-exact discipline (the lloyd_kmeans / quality_classifier ladder):
inputs quantize to int64 microunits ONCE; the covariance entries are
EXACT integer sums of per-row quantized products (float-sum order drift
is impossible by construction); each power-iteration matvec re-quantizes
its terms so the per-i sums are exact integers; the only libm call per
round is sqrt() on a bit-identical double, immediately divided back into
quantized components. A DuckDB oracle unrolls the identical chain, so
the whole spectral computation is hash-compared, not trusted.

Scale shape: the corpus is touched ONCE (explode + quantize); the
covariance build is a vec_id self-equi-join emitting dim^2 keys with
map-side combine (dim^2 = 4096 keys at dim 64 — the shuffle is
model-sized, not corpus-sized); every round thereafter runs on the
bounded dim^2 / dim tables with RollingCheckpoint lineage control.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.emit import micro6
from ..io import fan_out

PCA_ROUNDS = 8


def _pca_fit(
    vecs: DataFrame,
    rounds: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> dict:
    """Shared fit: quantized inputs, exact-integer covariance, unrolled
    power iteration. Returns the tables both public ops compose:
    ex (quantized inputs, corpus-sized), st (per-dim sums), v (final
    component), sg (sign), tr (trace), ei (eigenvalue) — everything but
    ex is bounded model state."""
    spark = vecs.sparkSession
    from ..ckpt import RollingCheckpoint

    v06 = round(1e6 / math.sqrt(dim))
    ex = fan_out(vecs).select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(vec_col).alias("pos", "x"),
    ).select(
        "vec_id",
        (F.col("pos") + F.lit(1)).cast("int").alias("i"),
        F.round(F.col("x").cast("double") * F.lit(1e6)).cast("long").alias(
            "x6"
        ),
    )
    st = ex.groupBy("i").agg(
        F.sum("x6").alias("s6"), F.count(F.lit(1)).alias("n")
    )
    mu = (F.col("s6").cast("double") / F.lit(1e6)) / F.col("n")
    ce = ex.join(st, "i").select(
        "vec_id",
        "i",
        ((F.col("x6").cast("double") / F.lit(1e6)) - mu).alias("c"),
    )
    a, b = ce.alias("a"), ce.alias("b")
    cv = (
        a.join(b, "vec_id")
        .select(
            F.col("a.i").alias("i"),
            F.col("b.i").alias("j"),
            F.round(F.col("a.c") * F.col("b.c") * F.lit(1e6))
            .cast("long")
            .alias("p6"),
        )
        .groupBy("i", "j")
        .agg(F.sum("p6").alias("c6"))
    )
    nn = vecs.agg(F.count(F.lit(1)).alias("n"))
    cd = cv.crossJoin(F.broadcast(nn)).select(
        "i",
        "j",
        ((F.col("c6").cast("double") / F.lit(1e6)) / F.col("n")).alias("cd"),
    ).localCheckpoint()

    # keep_last=2: the final eigenvalue read (q_last) lazily references
    # the SECOND-to-last v through its matvec — one extra generation
    # must stay materialized past the loop
    roll = RollingCheckpoint(spark, keep_last=2)
    v = st.select(
        F.col("i").alias("j"), F.lit(int(v06)).cast("long").alias("v6")
    )
    q_last = None
    for _ in range(rounds):
        u = (
            cd.join(v, "j")
            .select(
                "i",
                F.round(
                    F.col("cd")
                    * (F.col("v6").cast("double") / F.lit(1e6))
                    * F.lit(1e6)
                )
                .cast("long")
                .alias("t6"),
            )
            .groupBy("i")
            .agg(F.sum("t6").alias("u6"))
        )
        q = u.agg(
            F.sum(
                F.round(
                    (F.col("u6").cast("double") / F.lit(1e6))
                    * (F.col("u6").cast("double") / F.lit(1e6))
                    * F.lit(1e6)
                ).cast("long")
            ).alias("q6")
        )
        v = roll(
            u.crossJoin(F.broadcast(q)).select(
                F.col("i").alias("j"),
                F.when(
                    F.col("q6") > 0,
                    F.round(
                        (F.col("u6").cast("double") / F.lit(1e6))
                        / F.sqrt(F.col("q6").cast("double") / F.lit(1e6))
                        * F.lit(1e6)
                    ).cast("long"),
                )
                .otherwise(F.lit(int(v06)).cast("long"))
                .alias("v6"),
            )
        )
        q_last = q
    from pyspark.sql import Window

    w = Window.orderBy(F.abs(F.col("v6")).desc(), F.col("j").asc())
    sg = (
        v.select("v6", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            F.when(F.col("v6") < 0, F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("sgn")
        )
    )
    tr = cd.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.round(F.col("cd") * F.lit(1e6)).cast("long")).alias("t6")
    )
    ei = q_last.select(
        F.when(
            F.col("q6") > 0,
            F.sqrt(F.col("q6").cast("double") / F.lit(1e6)),
        )
        .otherwise(F.lit(0.0))
        .alias("eig")
    )
    return {"ex": ex, "st": st, "v": v, "sg": sg, "tr": tr, "ei": ei,
            "mu": mu}


def embedding_pca(
    vecs: DataFrame,
    rounds: int = PCA_ROUNDS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(i, mean, pc1, eigval, explained_var) — per-dimension corpus mean
    and the top principal component (power iteration, `rounds` unrolled
    rounds from the uniform 1/sqrt(dim) start), plus the eigenvalue
    estimate ||C v_{R-1}|| and its share of the covariance trace. Sign
    convention: the component with the largest |value| (ties: lowest i)
    is made positive, so the emitted vector is unique.

    `dim` only sets the deterministic INIT constant round(1e6/sqrt(dim));
    the actual dimensionality comes from the data. Degenerate zero
    covariance (single repeated vector) falls back to the init vector
    with eigval 0 rather than dividing by zero."""
    m = _pca_fit(vecs, rounds, dim, id_col, vec_col)
    st, v = m["st"], m["v"]
    return (
        st.join(v, st["i"] == v["j"])
        .crossJoin(F.broadcast(m["sg"]))
        .crossJoin(F.broadcast(m["tr"]))
        .crossJoin(F.broadcast(m["ei"]))
        .select(
            "i",
            micro6(m["mu"]).alias("mean"),
            (
                (F.col("sgn") * F.col("v6")).cast("double") / F.lit(1e6)
            ).alias("pc1"),
            micro6(F.col("eig")).alias("eigval"),
            F.when(
                F.col("t6") > 0,
                micro6(
                    F.col("eig")
                    / (F.col("t6").cast("double") / F.lit(1e6))
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("explained_var"),
        )
        .orderBy("i")
    )


def embedding_pca_scores(
    vecs: DataFrame,
    rounds: int = PCA_ROUNDS,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, score) — every vector PROJECTED onto the learned top
    component: score = (x - mean) . (sign * pc1), the 1-D whitening /
    ordering coordinate the fitted model serves (the kn_score_with move
    for the spectral family: fit once, score the stream). Each product
    term quantizes to int64 microunits, so the per-vector dot product
    is an exact integer sum — engine-identical by construction.

    Plan: the projection joins the corpus-sized exploded table against
    the dim-sized (mean, component) model — one narrow join + one
    groupBy(vec_id) with map-side combine; no corpus self-join."""
    m = _pca_fit(vecs, rounds, dim, id_col, vec_col)
    st, v = m["st"], m["v"]
    model = (
        st.join(v, st["i"] == v["j"])
        .crossJoin(F.broadcast(m["sg"]))
        .select(
            "i",
            m["mu"].alias("mu"),
            (
                (F.col("sgn") * F.col("v6")).cast("double") / F.lit(1e6)
            ).alias("pc"),
        )
    )
    return (
        m["ex"]
        .join(F.broadcast(model), "i")
        .select(
            "vec_id",
            F.round(
                ((F.col("x6").cast("double") / F.lit(1e6)) - F.col("mu"))
                * F.col("pc")
                * F.lit(1e6)
            )
            .cast("long")
            .alias("t6"),
        )
        .groupBy("vec_id")
        .agg(F.sum("t6").alias("s6"))
        .select(
            "vec_id",
            (F.col("s6").cast("double") / F.lit(1e6)).alias("score"),
        )
        .orderBy("vec_id")
    )
