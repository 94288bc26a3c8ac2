"""Every queries() entry must plan and execute at sf0.001, and the
__spark_entry__ driver contract must hold (entry smoke + name parity
between queries() and oracle_sql())."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# streaming drains pay multi-second query start/stop; exercised by the
# oracle checker instead (j5/x10/embed were once here too — their plan
# blowups are fixed and they now smoke-test like everything else)
SLOW = {"stream_window_counts", "stream_stateful_sessions"}


def _registry():
    from deepseek_ocr_vllm_spark.plans import REGISTRY

    return REGISTRY


@pytest.mark.parametrize("name", sorted(_registry().keys()))
def test_query_executes(spark, name):
    if name in SLOW:
        pytest.skip("covered by tools/check_oracle.py and dedicated tests")
    fn, _sql = _registry()[name]
    df = fn(spark, SF)
    rows = df.limit(5000).collect()
    assert rows is not None
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o).issubset(set(q))
    assert len(q) >= 40
