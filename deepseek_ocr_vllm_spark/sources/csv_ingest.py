"""CSV/registry ingestion (SURVEY §2.1 S3 + §2.9 X11 + §2.8 F1).

Reference semantics:
  * lazy quotes, trimmed leading space, header = row 0, short rows padded
    (apps/csv-ingestion-worker/parser.go:37-80)
  * line-level repair of broken `",` quoting before parsing
    (scripts/legacy-pandas-cleaners/country/clean_esp_robust.py:11-80)
  * dynamic header canonicalization + alias map
    (parser.go:165-190; phase_b_diff.py:310-321)

Spark-first: the repair is regexp_replace over spark.read.text lines (JVM
vectorized), the parse is from_csv with a derived schema, the header
canonicalization is driver-side on one tiny list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.strings import dedupe_canon_names
from .tableio import hadoop_fs


def _assert_single_file(spark: SparkSession, path: str) -> None:
    """Header discovery below relies on limit(1) returning THE first
    physical line, which only holds for a single file — a directory/glob
    would silently elect whichever file lands in partition 0 as 'the
    header'. Fail loudly instead (parse per-file with input_file_name()
    if multi-file registry drops ever become real)."""
    fs, p = hadoop_fs(spark, path)
    matches = fs.globStatus(p)
    if matches is None:
        return  # let spark.read.text raise its own missing-path error
    files = []
    for st in matches:
        if st.isDirectory():
            for sub in fs.listStatus(st.getPath()):
                name = sub.getPath().getName()
                if sub.isFile() and not name.startswith(("_", ".")):
                    files.append(name)
        else:
            files.append(st.getPath().getName())
    if len(files) != 1:
        raise ValueError(
            f"read_registry_csv needs exactly one CSV file, got "
            f"{len(files)} under {path!r}: {sorted(files)[:5]}"
        )


def _repair_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """X11: fix the legacy `",` artifacts — a quote glued to a comma with a
    missing opener/closer — before the CSV parser sees the line."""
    c = F.col(col)
    # `,"abc,` where abc has no closing quote before next comma → drop quote
    c = F.regexp_replace(c, r',"([^",]*),', r',$1,')
    # stray doubled quotes around a bare token `""abc""` → `"abc"`
    c = F.regexp_replace(c, r'""([^"]*)""', r'"$1"')
    return lines.withColumn(col, c)


def read_registry_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    repair: bool = True,
) -> DataFrame:
    """Parse a registry CSV: header row canonicalized (F1), short rows
    padded with '' (parser.go:74-78), values trimmed of leading space.
    Single-file inputs only (asserted) — see _assert_single_file."""
    _assert_single_file(spark, path)
    lines = spark.read.text(path)
    if repair:
        lines = _repair_lines(lines)
    header_line = lines.limit(1).collect()[0]["value"]
    raw_cols = [h.strip().strip('"') for h in header_line.split(sep)]
    canon = dedupe_canon_names(raw_cols)

    schema = ", ".join(f"`{c}` string" for c in canon)
    body = lines.withColumn("__rn", F.monotonically_increasing_id())
    # drop the header row (first line of the single file)
    first = body.limit(1).select("__rn").collect()[0][0]
    parsed = (
        body.filter(F.col("__rn") != first)
        .select(
            F.from_csv(
                F.col("value"), schema,
                {"sep": sep, "ignoreLeadingWhiteSpace": "true", "mode": "PERMISSIVE"},
            ).alias("r")
        )
        .select([F.coalesce(F.col(f"r.`{c}`"), F.lit("")).alias(c) for c in canon])
    )
    return parsed
