"""Every queries() entry must plan and execute at sf0.001, and the
__spark_entry__ driver contract must hold (entry smoke + name parity
between queries() and oracle_sql())."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# heavy Catalyst-analysis DAGs exercised separately (oracle checker + their
# own tests); excluded here to keep `pytest -x -q` fast
SLOW = {"j5_reconciliation_diff", "x10_rules_clean", "dd_embed_cosine",
        "stream_window_counts"}


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
