"""Every queries() entry must hash-match its oracle_sql() at sf0.001 and
sf0.01 — the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_util import compare

QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf0001(spark, name):
    df = entrymod.queries()[name](spark, SF_SMOKE)
    compare(df, entrymod.oracle_sql()[name], SF_SMOKE)


@pytest.mark.parametrize("name", QUERIES)
def test_parity_sf001(spark, name):
    df = entrymod.queries()[name](spark, SF_CORRECT)
    compare(df, entrymod.oracle_sql()[name], SF_CORRECT)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
