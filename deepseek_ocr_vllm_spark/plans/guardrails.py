"""P5 SQL guardrails (reference: apps/md-query-proxy/src/server.js:40-69,
151-158): DDL/keyword blocklist, read-only mode, auto-LIMIT injection,
query timeout via job-group cancel.
"""

from __future__ import annotations

import re
import threading

from pyspark.sql import DataFrame, SparkSession

MAX_ROWS = 10_000  # server.js:7
MAX_MS = 15_000  # server.js:8

_DANGEROUS = re.compile(
    r"\b(drop|delete|truncate|alter|create|insert|update|grant|revoke|attach)\b",
    re.IGNORECASE,
)
_READONLY_OK = re.compile(r"^\s*(select|show|describe|with|explain)\b", re.IGNORECASE)


class GuardrailError(ValueError):
    pass


def check_sql(sql: str, readonly: bool = True) -> None:
    """isDangerous + RO enforcement (server.js:49-61)."""
    if _DANGEROUS.search(sql):
        raise GuardrailError("dangerous keyword blocked")
    if readonly and not _READONLY_OK.match(sql):
        raise GuardrailError("read-only mode: only SELECT/SHOW/DESCRIBE/WITH")


def _has_limit(sql: str) -> bool:
    return re.search(r"\blimit\s+\d+\b", sql, re.IGNORECASE) is not None


def guarded_sql(spark: SparkSession, sql: str, readonly: bool = True,
                max_rows: int = MAX_ROWS, max_ms: int = MAX_MS) -> DataFrame:
    """Validate, auto-inject LIMIT (server.js:63-69), and arm a timeout
    that cancels the job group (server.js:151-158 → cancelJobGroup)."""
    check_sql(sql, readonly=readonly)
    df = spark.sql(sql)
    if not _has_limit(sql):
        df = df.limit(max_rows)

    group = f"guarded-{abs(hash(sql)) % 10**9}"

    class _Runner:
        def collect(self):
            sc = spark.sparkContext
            sc.setJobGroup(group, sql[:100], interruptOnCancel=True)
            timer = threading.Timer(max_ms / 1000.0, sc.cancelJobGroup, [group])
            timer.start()
            try:
                return df.collect()
            finally:
                timer.cancel()
                sc.setJobGroup("", "")

        @property
        def dataframe(self):
            return df

    return _Runner()
