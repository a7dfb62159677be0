"""The committed 10x stress tier (VERDICT r10 #5): the generator is
unit-tested on every run; the full scale-shape measurement is opt-in
(`SPARK_GRAFT_STRESS10X=1 pytest -m stress10x`, or the bench.py flag
`SPARK_GRAFT_BENCH_STRESS10X=1`)."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from workspace_qdrant_mcp_spark import stress


def test_stress_corpus_generator(spark, tmp_path):
    """documents gains factor copies per doc under the doc_id*16+k
    scheme (copy 0 byte-identical, copies k>0 suffixed ' c<k>'),
    n_chars tracks the mutated text, every other table is symlinked,
    and regeneration is idempotent."""
    src = "/root/testdata/sf0.001"
    out = str(tmp_path / "stress")
    stress.build_stress_corpus(spark, src, out, factor=4)
    base = spark.read.parquet(f"{src}/documents.parquet")
    got = spark.read.parquet(f"{out}/documents.parquet")
    n = base.count()
    assert got.count() == 4 * n
    b = {r["doc_id"]: r["text"] for r in base.collect()}
    g = {r["doc_id"]: (r["text"], r["n_chars"]) for r in got.collect()}
    assert set(g) == {d * 16 + k for d in b for k in range(4)}
    for d, t in list(b.items())[:50]:
        assert g[d * 16][0] == t
        for k in (1, 2, 3):
            assert g[d * 16 + k][0] == t + f" c{k}"
            assert g[d * 16 + k][1] == len(t + f" c{k}")
    for name in os.listdir(src):
        if name != "documents.parquet":
            assert os.path.islink(os.path.join(out, name))
    # idempotent: a second call reuses the output (mtime unchanged)
    m0 = os.path.getmtime(f"{out}/documents.parquet")
    stress.build_stress_corpus(spark, src, out, factor=4)
    assert os.path.getmtime(f"{out}/documents.parquet") == m0


@pytest.mark.stress10x
@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS10X") != "1",
    reason="opt-in stress tier: set SPARK_GRAFT_STRESS10X=1",
)
def test_stress10x_scale_shapes(spark):
    """The four heaviest families hold their documented scale shapes
    on the 10x near-dup-heavy corpus: trainer FLAT, LM ladder + frozen
    heldout serving SUBLINEAR, LSH linear in discovered pairs — each
    wall ratio under its ceiling
    (stress.STRESS_CEILINGS; ~2x headroom over the r10 measurements so
    host drift passes but a quadratic blow-up cannot)."""
    out = stress.run_stress10x(
        spark, "/root/testdata/sf0.1", entrymod.queries()
    )
    for name, row in out.items():
        assert row["ok"], (name, row)
