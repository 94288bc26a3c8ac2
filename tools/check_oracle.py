"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names), TYPE CLASS per column, and order-insensitive canonicalized
values.

The type-class check is what makes this replica type-faithful: the driver's
value hash is type-sensitive, so e.g. DuckDB `SUM(int)` returning HUGEINT
(arrow decimal128(38,0)) vs Spark BIGINT hash-mismatches on the driver even
though `str(v)` is identical. We map both sides' column types to a coarse
shared tag (int/float/dec/str/bool/date/ts/bin/list<>/struct<>) and FAIL on
tag mismatch — catching that class locally before the driver sees it.

Usage: python tools/check_oracle.py [query_name ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.12g}"
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.12g}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def arrow_type_tag(t) -> str:
    """Coarse type class of an Arrow type, shared across engines."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "dec"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "ts"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{arrow_type_tag(t.value_type)}>"
    if pa.types.is_struct(t):
        return ("struct<"
                + ",".join(f"{f.name}:{arrow_type_tag(f.type)}" for f in t)
                + ">")
    return str(t)


def spark_type_tag(t) -> str:
    """Same coarse type class, from a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.DecimalType):
        return "dec"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BinaryType):
        return "bin"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(t, T.ArrayType):
        return f"list<{spark_type_tag(t.elementType)}>"
    if isinstance(t, T.StructType):
        return ("struct<"
                + ",".join(f"{f.name}:{spark_type_tag(f.dataType)}"
                           for f in t.fields)
                + ">")
    return t.simpleString()


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    from deepseek_ocr_vllm_spark.plans import REGISTRY, TABLES
    from deepseek_ocr_vllm_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{name}.parquet')"
        )

    names = args.names or list(REGISTRY)
    n_fail = 0
    from deepseek_ocr_vllm_spark.plans.queries import resolve_oracle

    for name in names:
        fn, sql = REGISTRY[name]
        sql = resolve_oracle(sql)
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            s_cols = list(sdf.columns)
            s_tags = {f.name: spark_type_tag(f.dataType)
                      for f in sdf.schema.fields}
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(s_rows)}")
            continue
        try:
            cur = con.execute(sql)
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
            d_schema = con.execute(sql).fetch_arrow_table().schema
            d_tags = {f.name: arrow_type_tag(f.type) for f in d_schema}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = canon_rows(s_cols, s_rows)
        dc, dr = canon_rows(d_cols, d_rows)
        ok = True
        tag_diffs = [
            (c, s_tags.get(c), d_tags.get(c))
            for c in sc
            if c in d_tags and s_tags.get(c) != d_tags.get(c)
        ]
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duck={dc}")
            ok = False
        elif tag_diffs:
            print(f"FAIL {name}: column TYPE CLASS differs "
                  f"(col, spark, duck): {tag_diffs}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL {name}: values differ at sorted rows {diffs}")
            for i in diffs:
                print(f"  spark: {sr[i]}")
                print(f"  duck : {dr[i]}")
            ok = False
        if ok:
            print(f"OK   {name}: rows={len(sr)} ({time.time()-t0:.1f}s)")
        else:
            n_fail += 1
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
