"""Operator inventory as (Spark plan, DuckDB oracle SQL) pairs.

Every entry implements one operator family from SURVEY.md §2 over the
driver's star schema (/root/repo/TESTDATA.md). Spark side = DataFrame API
(Catalyst plans it); oracle side = ANSI SQL for DuckDB.

Determinism/hash-stability rules (driver compares value hashes):
  * money math in DECIMAL (exact, order-independent) → cast to DOUBLE last
  * every ORDER BY ... LIMIT has a total order (unique tiebreak column)
  * timestamps/dates surfaced as formatted strings
  * every computed column aliased identically on both sides
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# name -> (spark_fn, oracle_sql | oracle_sql_builder | None). A CALLABLE
# oracle is rebuilt at oracle_sql() call time — queries whose SQL embeds an
# env knob (SPARK_GRAFT_MINHASH_*, *_DF caps) register a builder so flipping
# the env in-process changes BOTH the Spark plan and the oracle, not just
# one side (knobs frozen at import time were a round-2 defect).
REGISTRY: dict[
    str,
    tuple[Callable[[SparkSession, str], DataFrame], str | Callable[[], str] | None],
] = {}


def q(name: str, sql: str | Callable[[], str] | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def resolve_oracle(sql) -> str | None:
    return sql() if callable(sql) else sql


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dec(c, scale: int = 6):
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal(18,{scale})")


# =============================================================== aggregates

@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H-Q1-shaped scan+agg (SURVEY §2.4 A-family; partial/final agg
    free in Spark — reference A11 processor.go:42-101). Decimal math keeps
    the sums order-independent so the plan can shuffle freely."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@q(
    "a1_group_max_latest",
    """
    SELECT o_custkey, MAX(o_orderkey) AS latest_orderkey,
           COUNT(*) AS n_orders,
           MAX(strftime(o_orderdate, '%Y-%m-%d')) AS last_date
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def a1_group_max_latest(spark, sf_dir):
    """A1 latest-run-per-key (views_raw.sql:4-7): group-by max."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderkey").alias("latest_orderkey"),
            F.count("*").alias("n_orders"),
            F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("last_date"),
        )
        .orderBy("o_custkey")
    )


@q(
    "a2_duplicate_detection",
    """
    SELECT prefix_hash, COUNT(*) AS n_dups
    FROM (SELECT md5(substr(text, 1, 8)) AS prefix_hash FROM documents)
    GROUP BY prefix_hash HAVING COUNT(*) > 1
    ORDER BY n_dups DESC, prefix_hash
    """,
)
def a2_duplicate_detection(spark, sf_dir):
    """A2 duplicate detection by content hash HAVING COUNT>1
    (V2__views_freshness_duplicates.sql:4-28; sha recompute F16)."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.md5(F.substring("text", 1, 8)).alias("prefix_hash"))
        .groupBy("prefix_hash")
        .count()
        .withColumnRenamed("count", "n_dups")
        .filter(F.col("n_dups") > 1)
        .orderBy(F.desc("n_dups"), "prefix_hash")
    )


@q(
    "a3_collision_agg",
    """
    SELECT user_id, COUNT(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id HAVING COUNT(DISTINCT event_type) > 3
    ORDER BY user_id
    """,
)
def a3_collision_agg(spark, sf_dir):
    """A3 collision agg GROUP BY key HAVING COUNT(DISTINCT ...) > n
    (mvp_entity_resolution.sql:37-53)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_types"))
        .filter(F.col("n_types") > 3)
        .orderBy("user_id")
    )


@q(
    "a5_time_bucketed",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def a5_time_bucketed(spark, sf_dir):
    """A5 time-bucketed counts per day (grafana_panels.sql:5-11,51-59)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


@q(
    "a6_label_distribution",
    """
    SELECT event_type, COUNT(*) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type LIMIT 50
    """,
)
def a6_label_distribution(spark, sf_dir):
    """A6 label distribution top-k (grafana_panels.sql:62-66); unique
    tiebreak keeps the LIMIT deterministic across engines."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(50)
    )


@q(
    "a4_ordered_list_agg",
    """
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS lines,
           CAST(AVG(l_quantity) AS DOUBLE) AS avg_qty,
           COUNT(*) AS n
    FROM lineitem WHERE l_orderkey < 1000
    GROUP BY l_orderkey ORDER BY l_orderkey
    """,
)
def a4_ordered_list_agg(spark, sf_dir):
    """A4 ordered list-of-struct agg (merge_suggestions_for_argilla.sql:46-56
    LIST(STRUCT_PACK(... ORDER BY ...))) — surfaced as an ordered string so
    both engines hash identically."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col("l_linenumber"))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("lines"),
            F.avg("l_quantity").cast("double").alias("avg_qty"),
            F.count("*").alias("n"),
        )
        .orderBy("l_orderkey")
    )


# ==================================================================== joins

@q(
    "j1_inner_equi_join",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def j1_inner_equi_join(spark, sf_dir):
    """J1 equi inner join + agg (checks_integrity.sql:24-28)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@q(
    "j2_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def j2_left_anti(spark, sf_dir):
    """J2 docs-without-pages anti-join (checks_integrity.sql:8-11)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter("o_totalprice > 100000")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@q(
    "j3_latest_run_rows",
    """
    SELECT o_custkey, o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1 ORDER BY o_custkey
    """,
)
def j3_latest_run_rows(spark, sf_dir):
    """J3 latest-run rows per key — window-rank formulation of the
    agg+join view (views_raw.sql:4-16)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "o_custkey", "o_orderkey", "o_orderstatus",
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
        .orderBy("o_custkey")
    )


@q(
    "j4_left_outer_coalesce",
    """
    SELECT n.n_name,
           COALESCE(x.n_cust, 0) AS n_cust
    FROM nation n LEFT JOIN (
      SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
    ) x ON n.n_nationkey = x.c_nationkey
    ORDER BY n.n_name
    """,
)
def j4_left_outer_coalesce(spark, sf_dir):
    """J4 left outer + COALESCE default (merge_suggestions_for_argilla.sql:82-88)."""
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer").groupBy("c_nationkey").agg(
        F.count("*").alias("cnt")
    )
    return (
        n.join(c, n.n_nationkey == c.c_nationkey, "left")
        .select("n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_cust"))
        .orderBy("n_name")
    )


@q(
    "j6_broadcast_dim_join",
    """
    SELECT p.p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def j6_broadcast_dim_join(spark, sf_dir):
    """Fact ⋈ small dim with an explicit broadcast hint — at 100 TB the
    part dim stays far below the fact table; broadcasting avoids shuffling
    the fact side (SURVEY §2.3 note on broadcast)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("p_brand")
    )


@q(
    "j8_expected_columns_anti",
    """
    WITH expected(column_name) AS (
      VALUES ('o_orderkey'), ('o_custkey'), ('o_missing_col'), ('o_totalprice')
    ),
    actual(column_name) AS (
      VALUES ('o_orderkey'), ('o_custkey'), ('o_orderstatus'),
             ('o_totalprice'), ('o_orderdate'), ('o_orderpriority')
    )
    SELECT e.column_name FROM expected e
    LEFT JOIN actual a USING (column_name)
    WHERE a.column_name IS NULL ORDER BY e.column_name
    """,
)
def j8_expected_columns_anti(spark, sf_dir):
    """J8 expected-vs-actual schema anti-join
    (checks_integrity.sql:197-228): literal expected set against the real
    columns of the orders table."""
    expected = spark.createDataFrame(
        [("o_orderkey",), ("o_custkey",), ("o_missing_col",), ("o_totalprice",)],
        ["column_name"],
    )
    actual = spark.createDataFrame(
        [(c,) for c in t(spark, sf_dir, "orders").columns], ["column_name"]
    )
    return (
        expected.join(actual, "column_name", "left_anti")
        .orderBy("column_name")
    )


@q(
    "j9_semi_excluding_collisions",
    """
    SELECT s.s_suppkey, s.s_name FROM supplier s
    WHERE s.s_nationkey NOT IN (
      SELECT c_nationkey FROM customer
      GROUP BY c_nationkey HAVING COUNT(*) > 65
    )
    ORDER BY s.s_suppkey
    """,
)
def j9_semi_excluding_collisions(spark, sf_dir):
    """J9 anti-join against a HAVING-derived collision set
    (mvp_entity_resolution.sql:60-71)."""
    s = t(spark, sf_dir, "supplier")
    crowded = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .count()
        .filter("count > 65")
        .select("c_nationkey")
    )
    return (
        s.join(
            F.broadcast(crowded), s.s_nationkey == crowded.c_nationkey, "left_anti"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@q(
    "j10_disjunctive_identity_lookup",
    """
    WITH stage AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer WHERE c_custkey <= 200
    ),
    matches AS (
      SELECT st.c_custkey, s.s_suppkey, 1 AS pref
      FROM stage st JOIN supplier s ON st.c_nationkey = s.s_nationkey
      UNION ALL
      SELECT st.c_custkey, s.s_suppkey, 2 AS pref
      FROM stage st JOIN supplier s
        -- TRUNC, not bare CAST: DuckDB CAST(decimal AS INTEGER) ROUNDS
        -- while Spark's int cast TRUNCATES (bit at sf0.001 where the
        -- pref-2 branch decides; invisible at sf0.01)
        ON CAST(TRUNC(st.c_acctbal) AS INTEGER) % 100 = s.s_suppkey % 100
    )
    SELECT c_custkey, s_suppkey AS matched_suppkey FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                   ORDER BY pref, s_suppkey) AS rn
      FROM matches
    ) WHERE rn = 1 ORDER BY c_custkey
    """,
)
def j10_disjunctive_identity_lookup(spark, sf_dir):
    """J10 disjunctive OR-key lookup (V12:127-134 imo OR mmsi OR ircs):
    OR-joins don't hash-join, so union the per-key equi-joins and pick one
    deterministic winner by rank — each branch stays a hash join."""
    stage = (
        t(spark, sf_dir, "customer")
        .filter("c_custkey <= 200")
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    s = t(spark, sf_dir, "supplier")
    m1 = (
        stage.join(s, stage.c_nationkey == s.s_nationkey)
        .select("c_custkey", "s_suppkey", F.lit(1).alias("pref"))
    )
    m2 = (
        stage.join(
            s,
            (F.col("c_acctbal").cast("int") % 100) == (s.s_suppkey % 100),
        )
        .select("c_custkey", "s_suppkey", F.lit(2).alias("pref"))
    )
    w = Window.partitionBy("c_custkey").orderBy("pref", "s_suppkey")
    return (
        m1.unionByName(m2)
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("c_custkey", F.col("s_suppkey").alias("matched_suppkey"))
        .orderBy("c_custkey")
    )


# ================================================================== windows

@q(
    "w1_distinct_on_first_per_key",
    """
    SELECT c_nationkey, c_custkey, c_name,
           CAST(c_acctbal AS DOUBLE) AS acctbal
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_nationkey
        ORDER BY c_acctbal DESC NULLS LAST, c_custkey) AS rn
      FROM customer
    ) WHERE rn = 1 ORDER BY c_nationkey
    """,
)
def w1_distinct_on_first_per_key(spark, sf_dir):
    """W1 DISTINCT ON canonical-row-per-key (mvp_entity_resolution.sql:57-75)."""
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey")
    )
    return (
        t(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "c_nationkey", "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy("c_nationkey")
    )


@q(
    "w5_confidence_ranked_best",
    """
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS best_price
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey
        ORDER BY o_totalprice DESC NULLS LAST,
                 o_orderdate DESC NULLS LAST, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1 ORDER BY o_custkey
    """,
)
def w5_confidence_ranked_best(spark, sf_dir):
    """W5 multi-key tiebreak rank-1 dedup (V12__...:81-99: confidence DESC
    NULLS LAST, updated_at DESC NULLS LAST, id).

    r6 (guide §2.4): the rank-1 row is a max(struct) hash aggregate —
    (price, date, −orderkey) struct max IS the (price DESC, date DESC,
    orderkey ASC) first row (orders carries no NULLs in these columns;
    −orderkey is exact BIGINT negation) — with map-side partial combine,
    where the r5 row_number window shuffled AND per-partition-sorted the
    full orders table to keep one row per customer."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.max(F.struct(
            F.col("o_totalprice"), F.col("o_orderdate"),
            (-F.col("o_orderkey")).alias("nk"))).alias("m"))
        .select(
            "o_custkey",
            (-F.col("m.nk")).alias("o_orderkey"),
            F.col("m.o_totalprice").cast("double").alias("best_price"),
        )
        .orderBy("o_custkey")
    )


@q(
    "w_running_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def w_running_total(spark, sf_dir):
    """Running total with an explicit frame (Spark window frame coverage;
    decimal keeps the cumulative sum exact)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .filter("o_custkey <= 100")
        .select(
            "o_custkey", "o_orderkey",
            F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@q(
    "t1_overlap_validation",
    """
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           strftime(prev_ts, '%Y-%m-%d %H:%M:%S') AS prev_ts_s
    FROM (
      SELECT user_id, ts,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ) WHERE prev_ts IS NOT NULL AND ts < prev_ts + INTERVAL 60 SECOND
    ORDER BY user_id, ts_s LIMIT 100
    """,
)
def t1_overlap_validation(spark, sf_dir):
    """T1 temporal non-overlap validation via lag()
    (V5__curated_temporal_events.sql:59-61 EXCLUDE-constraint analog):
    flag events closer than 60s to the previous event per user."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .filter(
            F.col("prev_ts").isNotNull()
            & (F.col("ts") < F.col("prev_ts") + F.expr("INTERVAL 60 SECOND"))
        )
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.date_format("prev_ts", "yyyy-MM-dd HH:mm:ss").alias("prev_ts_s"),
        )
        .orderBy("user_id", "ts_s")
        .limit(100)
    )


# ============================================================ sort / limit

@q(
    "topk_orders",
    """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_orders(spark, sf_dir):
    """§2.6 top-k (TakeOrderedAndProject — no global sort materialized)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"))
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# ================================================================= set ops

@q(
    "set_union_distinct",
    """
    SELECT nationkey, src FROM (
      SELECT DISTINCT c_nationkey AS nationkey, 'customer' AS src FROM customer
      UNION ALL
      SELECT DISTINCT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    ) ORDER BY nationkey, src
    """,
)
def set_union_distinct(spark, sf_dir):
    """§2.7 UNION ALL of keyed dedup sets (mvp_entity_resolution.sql:96-100)."""
    c = (
        t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("src", F.lit("customer"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
        .withColumn("src", F.lit("supplier"))
    )
    return c.unionByName(s).orderBy("nationkey", "src")


# ============================================================ pivot / melt

@q(
    "pv1_pivot_long_to_wide",
    """
    SELECT o_custkey,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
    FROM orders WHERE o_custkey <= 300
    GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def pv1_pivot_long_to_wide(spark, sf_dir):
    """PV1 long→wide pivot (V12:100-114 MAX(CASE WHEN ...) GROUP BY)."""
    df = (
        t(spark, sf_dir, "orders")
        .filter("o_custkey <= 300")
        .groupBy("o_custkey")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return (
        df.select(
            "o_custkey",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
        )
        .orderBy("o_custkey")
    )


@q(
    "pv2_melt_wide_to_long",
    """
    SELECT c_custkey, col_name, val FROM (
      SELECT c_custkey, 'acctbal' AS col_name,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'mktsegment', c_mktsegment FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
    ) WHERE c_custkey <= 300
    ORDER BY c_custkey, col_name
    """,
)
def pv2_melt_wide_to_long(spark, sf_dir):
    """PV2 wide→long melt (phase_b_diff.py:324-388 baseline_to_long) via
    stack(); values stringified as the EAV cell model does
    (processor.go:113-123)."""
    c = t(spark, sf_dir, "customer").filter("c_custkey <= 300")
    return (
        c.select(
            "c_custkey",
            F.expr(
                "stack(3, 'acctbal', cast(cast(c_acctbal as decimal(18,2)) as string), "
                "'mktsegment', c_mktsegment, "
                "'nationkey', cast(c_nationkey as string)) AS (col_name, val)"
            ),
        )
        .orderBy("c_custkey", "col_name")
    )


@q(
    "a12_monotonic_id_allocation",
    """
    WITH existing AS (
      SELECT CAST(o_orderkey % 7 AS INTEGER) AS export_run_id FROM orders
      WHERE o_orderkey <= 50
    ),
    next_id AS (
      SELECT COALESCE(MAX(export_run_id), 0) + 1 AS run_id FROM existing
    )
    SELECT c_custkey, n.run_id AS export_run_id
    FROM customer CROSS JOIN next_id n
    WHERE c_custkey <= 100 ORDER BY c_custkey
    """,
)
def a12_monotonic_id_allocation(spark, sf_dir):
    """A12 monotonic id allocation: COALESCE(MAX(id),0)+1 cross-joined onto
    every inserted row (argilla_export_loader_from_staged.sql:10-22,40-42).
    The scalar is a 1-row broadcast — no shuffle of the fact side."""
    existing = (
        t(spark, sf_dir, "orders")
        .filter("o_orderkey <= 50")
        .select((F.col("o_orderkey") % 7).cast("int").alias("export_run_id"))
    )
    next_id = existing.agg(
        (F.coalesce(F.max("export_run_id"), F.lit(0)) + 1).alias("run_id")
    )
    return (
        t(spark, sf_dir, "customer")
        .filter("c_custkey <= 100")
        .crossJoin(F.broadcast(next_id))
        .select("c_custkey", F.col("run_id").alias("export_run_id"))
        .orderBy("c_custkey")
    )


@q(
    "w_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                   OR LAG(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id <= 100
    ),
    sess AS (
      SELECT user_id, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def w_sessionize(spark, sf_dir):
    """Sessionization (training-pipeline staple): lag-gap flag + running
    sum as session id, then per-session rollup — two windows over the same
    partitioning, one shuffle."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = t(spark, sf_dir, "events").filter("user_id <= 100")
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wrun))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy("user_id", "session_id")
    )


@q(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
             AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-06-15' AND l_shipdate > DATE '1997-06-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 20
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-shaped 3-way join + agg + top-k: selective predicates on
    all three scans (pushdown), customer side broadcastable, revenue in
    exact decimal, TakeOrderedAndProject for the limit."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-15")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double").alias("revenue"),
        )
        .select(
            "l_orderkey", "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(20)
    )


@q(
    "q5_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE)
             AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-shaped 6-way join: region/nation/supplier dims broadcast,
    the customer-nation == supplier-nation 'local' predicate rides the
    supplier join, Catalyst/AQE pick the join order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )
