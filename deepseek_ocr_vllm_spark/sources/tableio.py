"""Thin table IO layer: Iceberg when the runtime has the jars, Parquet
directory layout otherwise (this sandbox has no Iceberg runtime jar, so the
Parquet path is what tests exercise — the call sites are written against
this API so swapping in Iceberg is a config change, not a rewrite).

Semantics reproduced from the reference:
  * idempotent append  — INSERT … ON CONFLICT DO NOTHING
    (apps/annotations-sink/outbox.go:75-87) → anti-join on key before append
    (Iceberg: MERGE INTO … WHEN NOT MATCHED THEN INSERT)
  * run-versioned latest-wins read — raw_pages PK (doc_id, run_id); view
    selects max run (sql/motherduck/views_raw.sql:4-16) → window rank
  * partitioned ZSTD parquet layout (parquet-writer.ts:81-128)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) via the Hadoop FS API — works for local paths AND
    for hdfs://-s3a:// URIs on a cluster (os.path.exists would silently
    treat 's3a://…' as a weird local directory and report False, making
    every checkpoint invisible on resume)."""
    jvm = spark._jvm  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath  # noqa: SLF001


def read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    # Heal the _swap crash window for READERS too: a crash between
    # rename-away and rename-in leaves `path` absent until the next upsert
    # runs _recover_swap — without this, read-only consumers see 'no table'
    # and never trigger healing. RESTORE-ONLY here: rename _old back but
    # never touch _v2 — a reader must not delete a fresh uncommitted
    # snapshot; _v2 cleanup stays writer-side, at the next upsert's
    # _recover_swap. The rename is race-guarded (two readers healing
    # concurrently: the loser's source is gone — treat as healed). NOTE:
    # healing is for CRASHED writers; the emulation's documented contract
    # remains no-reader-races-an-IN-FLIGHT-writer (a reader restoring the
    # old snapshot inside a live swap window would still collide with the
    # writer's commit rename — Iceberg's snapshot isolation is the real
    # fix at that concurrency level).
    if "://" not in path and not os.path.exists(path):
        old = path + "_old"
        if os.path.exists(old):
            try:
                os.rename(old, path)
            except OSError:
                pass  # concurrent healer won the rename
    fs, p = hadoop_fs(spark, path)
    if not fs.exists(p):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def append(df: DataFrame, path: str) -> None:
    df.write.mode("append").parquet(path)


def idempotent_append(spark: SparkSession, df: DataFrame, path: str,
                      keys: list[str]) -> None:
    """Append only rows whose key is not already present (S12/outbox)."""
    existing = read_or_none(spark, path)
    if existing is not None:
        df = df.join(existing.select(*keys).distinct(), keys, "left_anti")
    df.write.mode("append").parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Dynamic-partition overwrite: re-running a bucket replaces exactly that
    bucket's files (idempotent per-partition commit — the Parquet stand-in for
    an Iceberg overwrite of matching partitions)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def latest_wins(df: DataFrame, keys: list[str], version_col: str) -> DataFrame:
    """Keep the highest-version row per key (views_raw.sql:4-16)."""
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_with_history(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    compare_cols: list[str],
    history_path: str | None = None,
    run_id: int = 1,
) -> dict:
    """J6/T4/A14: insert-or-update current snapshot + change-history append
    (sql/ebisu_transform.sql:98-165: match by key, update current row, emit
    a typed history row for each changed attribute).

    Parquet emulation of Iceberg MERGE INTO: read current, classify rows
    into insert / changed / unchanged via a keyed join, rewrite the
    snapshot, append history rows for changes.

    LOCAL-PATH emulation only (commit = directory rename): on a cluster
    the real path is Iceberg MERGE INTO, whose snapshot commit is atomic —
    URI paths are rejected loudly rather than mis-handled. History is
    appended BEFORE the snapshot commit, so a crash in between can leave a
    history row whose change never committed (at-least-once, like the
    reference's outbox); the snapshot itself is never lost (_swap).
    """
    if "://" in path:
        raise NotImplementedError(
            "upsert_with_history's parquet emulation commits via local "
            "directory rename; use the Iceberg MERGE INTO path for "
            f"remote storage (got {path!r})"
        )
    _recover_swap(path)
    current = read_or_none(spark, path)
    if current is None:
        new_df.write.mode("overwrite").parquet(path + "_v2")
        n_new = new_df.count()
        _swap(path)
        return {"inserted": n_new, "updated": 0, "unchanged": 0}

    cur = current.select(*(keys + compare_cols)).withColumn("__exists", F.lit(True))
    joined = new_df.alias("n").join(cur.alias("c"), keys, "left")
    any_diff = None
    for col in compare_cols:
        d = ~F.col(f"n.{col}").eqNullSafe(F.col(f"c.{col}"))
        any_diff = d if any_diff is None else (any_diff | d)
    is_insert = F.col("__exists").isNull()
    # rows in current absent from new stay as-is
    keep = current.join(new_df.select(*keys), keys, "left_anti")
    merged = keep.unionByName(new_df)
    merged.write.mode("overwrite").parquet(path + "_v2")

    changed = (
        joined.filter(any_diff & ~is_insert)
        .select(
            *[F.col(f"n.{k}") for k in keys],
            F.lit(run_id).cast("long").alias("run_id"),
            F.to_json(F.struct(*[F.col(f"c.{c}").alias(c) for c in compare_cols]))
            .alias("old_values"),
            F.to_json(F.struct(*[F.col(f"n.{c}").alias(c) for c in compare_cols]))
            .alias("new_values"),
            F.lit("ATTRIBUTE_CHANGE").alias("change_type"),
            F.current_timestamp().alias("changed_at"),
        )
    )
    # all three counts from ONE aggregation (the join used to re-execute
    # once per count() — three times)
    stats = joined.agg(
        F.sum(F.when(is_insert, 1).otherwise(0)).alias("n_insert"),
        F.sum(F.when(any_diff & ~is_insert, 1).otherwise(0)).alias("n_changed"),
        F.count(F.lit(1)).alias("n_total"),
    ).collect()[0]
    n_insert = int(stats.n_insert or 0)
    n_changed = int(stats.n_changed or 0)
    if history_path and n_changed:
        changed.write.mode("append").parquet(history_path)
    _swap(path)
    return {
        "inserted": n_insert,
        "updated": n_changed,
        "unchanged": int(stats.n_total) - n_changed - n_insert,
    }


def iceberg_merge_sql(table: str, keys: list[str], compare_cols: list[str],
                      source_view: str = "updates",
                      delete_predicate: str | None = None,
                      insert_only: bool = False) -> str:
    """The cluster-path MERGE for upsert_with_history (one ATOMIC snapshot
    commit — the semantics the reference gets from its transactional sinks,
    sql/ebisu_transform.sql:98-165 / outbox.go:75-87).

    ``delete_predicate`` (e.g. ``s.is_deleted``) adds a WHEN MATCHED ...
    THEN DELETE clause BEFORE the update arm, so tombstone rows delete even
    when their payload also differs (clause order is first-match-wins).
    ``insert_only=True`` emits the idempotent-outbox shape — WHEN NOT
    MATCHED THEN INSERT only, the MERGE equivalent of
    INSERT ... ON CONFLICT DO NOTHING (outbox.go:75-87 / S12)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    clauses = []
    if not insert_only:
        if delete_predicate:
            clauses.append(
                f"WHEN MATCHED AND ({delete_predicate}) THEN DELETE")
        diff = " OR ".join(f"NOT (t.{c} <=> s.{c})" for c in compare_cols)
        sets = ", ".join(f"t.{c} = s.{c}" for c in compare_cols)
        clauses.append(f"WHEN MATCHED AND ({diff}) THEN UPDATE SET {sets}")
    clauses.append("WHEN NOT MATCHED THEN INSERT *")
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on}\n"
        + "\n".join(clauses)
    )


def iceberg_history_sql(table: str, history_table: str, keys: list[str],
                        compare_cols: list[str], run_id: int,
                        source_view: str = "updates",
                        delete_predicate: str | None = None) -> str:
    """Change-history append (T4) as one INSERT ... SELECT over the same
    matched-and-different predicate the MERGE updates — issued BEFORE the
    MERGE so old values are still readable (at-least-once like the
    reference outbox; the MERGE itself is atomic).

    With ``delete_predicate`` (must match the MERGE's DELETE arm), rows
    the MERGE deletes get change_type='DELETE' with NULL new_values — not
    an ATTRIBUTE_CHANGE recording values that never land in the table."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    diff = " OR ".join(f"NOT (t.{c} <=> s.{c})" for c in compare_cols)
    key_cols = ", ".join(f"s.{k}" for k in keys)
    old_j = ", ".join(f"'{c}', t.{c}" for c in compare_cols)
    new_j = ", ".join(f"'{c}', s.{c}" for c in compare_cols)
    new_json = f"to_json(named_struct({new_j}))"
    change = "'ATTRIBUTE_CHANGE'"
    where = diff
    if delete_predicate:
        new_json = (f"CASE WHEN ({delete_predicate}) THEN NULL "
                    f"ELSE {new_json} END")
        change = (f"CASE WHEN ({delete_predicate}) THEN 'DELETE' "
                  f"ELSE 'ATTRIBUTE_CHANGE' END")
        where = f"({delete_predicate}) OR ({diff})"
    return (
        f"INSERT INTO {history_table}\n"
        f"SELECT {key_cols}, CAST({run_id} AS BIGINT) AS run_id,\n"
        f"       to_json(named_struct({old_j})) AS old_values,\n"
        f"       {new_json} AS new_values,\n"
        f"       {change} AS change_type,\n"
        f"       current_timestamp() AS changed_at\n"
        f"FROM {source_view} s JOIN {table} t ON {on}\n"
        f"WHERE {where}"
    )


def iceberg_upsert_with_history(
    spark: SparkSession,
    new_df: DataFrame,
    table: str,
    keys: list[str],
    compare_cols: list[str],
    history_table: str | None = None,
    run_id: int = 1,
    delete_predicate: str | None = None,
    insert_only: bool = False,
) -> None:
    """Cluster path for upsert_with_history: one atomic Iceberg MERGE INTO
    (no directory renames, no no-snapshot window). Requires the Iceberg
    runtime jar — absent in this container, so the path is jar-gated like
    the parquet emulation's URI guard is path-gated; the generated SQL is
    unit-tested either way. ``delete_predicate`` / ``insert_only`` flow to
    both statements (insert-only has no update arm, hence no history)."""
    if not iceberg_available(spark):
        raise NotImplementedError(
            "Iceberg runtime jar not on the classpath; use "
            "upsert_with_history's parquet emulation or submit with "
            "--packages org.apache.iceberg:iceberg-spark-runtime-*"
        )
    new_df.createOrReplaceTempView("updates")
    if history_table and not insert_only:
        spark.sql(iceberg_history_sql(
            table, history_table, keys, compare_cols, run_id,
            delete_predicate=delete_predicate))
    spark.sql(iceberg_merge_sql(table, keys, compare_cols,
                                delete_predicate=delete_predicate,
                                insert_only=insert_only))


def _recover_swap(path: str) -> None:
    """Heal a crash inside _swap before touching the table. States:
      * ``path`` present + leftovers → a swap finished but cleanup didn't:
        drop the leftovers.
      * ``path`` missing + ``path_old`` present → crashed between
        rename-away and rename-in: restore the prior snapshot and discard
        the never-committed ``path_v2`` (commit == rename-in)."""
    import shutil

    old, v2 = path + "_old", path + "_v2"
    if os.path.exists(path):
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(v2):
            shutil.rmtree(v2)
    elif os.path.exists(old):
        os.rename(old, path)
        if os.path.exists(v2):
            shutil.rmtree(v2)


def _swap(path: str) -> None:
    """Snapshot swap with a single-rename no-snapshot window: rename the
    current snapshot AWAY (not rmtree — the data survives any crash),
    rename the new snapshot IN (the commit point), then delete the old.
    A crash at any step is healed by _recover_swap at the next upsert's
    entry (NOT here — by _swap time ``path_v2`` holds the fresh snapshot
    and must not be discarded)."""
    import shutil

    old = path + "_old"
    if os.path.exists(old) and os.path.exists(path):
        shutil.rmtree(old)  # window-B leftover; ``path`` is committed
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(path + "_v2", path)
    if os.path.exists(old):
        shutil.rmtree(old)
