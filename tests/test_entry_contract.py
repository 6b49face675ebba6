"""Driver-contract conformance: every queries() entry with an oracle_sql()
twin must pass the row-count/schema/value comparison (the same check the
driver records in CORRECTNESS_r{N}.json), plus the entry() smoke."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from .harness import compare


def _pairs():
    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    return [(name, fn, sqls.get(name)) for name, fn in sorted(qs.items())]


@pytest.mark.parametrize("name,fn,sql", _pairs(),
                         ids=[n for n, _, _ in _pairs()])
def test_query_vs_oracle(spark, testdata_sf01, name, fn, sql):
    df = fn(spark, testdata_sf01)
    if sql is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    ok, msg = compare(df, sql, testdata_sf01)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "conv_id", "turn_idx", "subj", "pred", "obj", "obj_type"}
