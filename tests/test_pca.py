"""embedding_pca: the quantized power iteration vs an independent pure
Python/NumPy replica (same microunit quantization, half-away-from-zero),
plus the mathematical property on a constructed anisotropic cloud."""

from __future__ import annotations

import math

import numpy as np

from workspace_qdrant_mcp_spark.operators import pca


def _vecs(spark, arrs):
    return spark.createDataFrame(
        [(i, [float(x) for x in a]) for i, a in enumerate(arrs)],
        "vec_id long, embedding array<float>",
    )


def _rhalf(x):
    return math.copysign(math.floor(abs(x) + 0.5), x)


def _ref_pca(arrs, rounds=8, dim=None):
    dim = dim if dim is not None else len(arrs[0])
    v06 = round(1e6 / math.sqrt(dim))
    # float32 ingestion first — the parquet column is FLOAT[]
    x = np.array(arrs, dtype=np.float32).astype(np.float64)
    n, d = x.shape
    x6 = np.array([[_rhalf(v * 1e6) for v in row] for row in x])
    s6 = x6.sum(axis=0)
    mu = (s6 / 1e6) / n
    c = x6 / 1e6 - mu
    c6 = np.zeros((d, d))
    for i in range(d):
        for j in range(d):
            c6[i, j] = sum(_rhalf(c[r, i] * c[r, j] * 1e6) for r in range(n))
    cd = (c6 / 1e6) / n
    v6 = np.full(d, float(v06))
    q6 = 0.0
    for _ in range(rounds):
        u6 = np.array(
            [
                sum(_rhalf(cd[i, j] * (v6[j] / 1e6) * 1e6) for j in range(d))
                for i in range(d)
            ]
        )
        q6 = sum(_rhalf((u / 1e6) * (u / 1e6) * 1e6) for u in u6)
        if q6 > 0:
            nrm = math.sqrt(q6 / 1e6)
            v6 = np.array([_rhalf((u / 1e6) / nrm * 1e6) for u in u6])
        else:
            v6 = np.full(d, float(v06))
    top = max(range(d), key=lambda i: (abs(v6[i]), -i))
    sgn = -1 if v6[top] < 0 else 1
    eig = math.sqrt(q6 / 1e6) if q6 > 0 else 0.0
    tr = sum(_rhalf(cd[i, i] * 1e6) for i in range(d)) / 1e6
    ev = _rhalf(eig / tr * 1e6) / 1e6 if tr > 0 else 0.0
    out = {}
    for i in range(d):
        out[i + 1] = (
            _rhalf(mu[i] * 1e6) / 1e6,
            sgn * v6[i] / 1e6,
            _rhalf(eig * 1e6) / 1e6,
            ev,
        )
    return out


def test_matches_python_replica(spark):
    rng = np.random.RandomState(7)
    arrs = rng.normal(size=(20, 6)) * np.array([3.0, 1, 1, 0.5, 0.2, 0.1])
    got = {
        r["i"]: (r["mean"], r["pc1"], r["eigval"], r["explained_var"])
        for r in pca.embedding_pca(_vecs(spark, arrs), dim=6).collect()
    }
    assert got == _ref_pca([list(a) for a in arrs], dim=6)


def test_finds_dominant_axis(spark):
    # cloud stretched 10x along a known direction: pc1 must align
    rng = np.random.RandomState(3)
    axis = np.zeros(8)
    axis[2] = 1.0
    arrs = rng.normal(size=(60, 8)) * 0.3 + np.outer(
        rng.normal(size=60) * 10.0, axis
    )
    rows = pca.embedding_pca(_vecs(spark, arrs), dim=8).collect()
    v = np.array([r["pc1"] for r in sorted(rows, key=lambda r: r["i"])])
    cos = abs(v @ axis) / (np.linalg.norm(v) * np.linalg.norm(axis))
    assert cos > 0.99
    ev = rows[0]["explained_var"]
    assert 0.9 < ev <= 1.0 + 1e-9   # one axis dominates the trace
    # sign convention: the largest-|value| component is positive
    top = max(v, key=abs)
    assert top > 0


def test_degenerate_single_repeated_vector(spark):
    arrs = [[1.0, 2.0, 3.0, 4.0]] * 5   # zero covariance everywhere
    rows = pca.embedding_pca(_vecs(spark, arrs), dim=4).collect()
    v06 = round(1e6 / math.sqrt(4))
    for r in rows:
        assert r["eigval"] == 0.0
        assert r["pc1"] == v06 / 1e6    # the documented init fallback


def test_scores_are_the_projection(spark):
    # scores must equal the quantized (x - mean) . pc1 computed from the
    # card itself — and order the anisotropic cloud by its true axis
    rng = np.random.RandomState(5)
    axis = np.zeros(6)
    axis[1] = 1.0
    t = rng.normal(size=40) * 8.0
    arrs = rng.normal(size=(40, 6)) * 0.2 + np.outer(t, axis)
    vecs = _vecs(spark, arrs)
    card = {r["i"]: r for r in pca.embedding_pca(vecs, dim=6).collect()}
    got = {
        r["vec_id"]: r["score"]
        for r in pca.embedding_pca_scores(vecs, dim=6).collect()
    }
    x = np.array(arrs, dtype=np.float32).astype(np.float64)
    x6 = np.vectorize(_rhalf)(x * 1e6)
    # the operator projects with the UNROUNDED mean (the card's `mean`
    # column is the micro6 display form) — recompute it exactly
    mu = (x6.sum(axis=0) / 1e6) / len(arrs)
    want = {}
    for vid in range(len(arrs)):
        s6 = sum(
            _rhalf(
                ((x6[vid, i - 1] / 1e6) - mu[i - 1])
                * card[i]["pc1"]
                * 1e6
            )
            for i in range(1, 7)
        )
        want[vid] = s6 / 1e6
    assert got == want
    v = np.array([got[i] for i in range(len(arrs))])
    corr = abs(np.corrcoef(v, t)[0, 1])
    assert corr > 0.99
