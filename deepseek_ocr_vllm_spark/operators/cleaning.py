"""X10 rules-engine cell cleaner (reference: apps/csv-ingestion-worker/
processor.go:104-194): prioritized rule chain applied for up to 3 passes
until fixpoint, recording the applied rule_chain, a decayed confidence
(F18: conf' = clamp(0.3*conf + 0.7*rule_adj) * 0.9^pass,
processor.go:337-370) and a needs_review flag.

Spark-first shape: each rule is a Column expression; a pass is one
select() over the whole cells DataFrame (vectorized, JVM-side, no UDF);
the ≤3-pass fixpoint loop is driver-side control flow over lazy plans —
exactly the pattern SURVEY §4 prescribes ("batch + fixpoint rule
application"). Per-pass change detection is plan-internal (no action), so
the loop adds zero extra jobs.

Input schema (EAV long form, processor.go:113-123):
  (row_index long, column_name string, raw_value string)
Output adds: cleaned_value, field_type, confidence, rule_chain
  array<int>, needs_review.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import strings as S

MAX_PASSES = 3
CONFIDENCE_THRESHOLD = 0.85
PASS_DECAY = 0.9


@dataclass(frozen=True)
class Rule:
    rule_id: int
    name: str
    applies_to: tuple[str, ...]  # field types; () = all
    fn: Callable[[Column], Column]
    adj: float  # confidence adjustment when the rule fires


def _date_coerce(c: Column) -> Column:
    """F8 format ladder (processor.go:250-266)."""
    parsed = F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(c, F.lit("MM/dd/yyyy")),
        F.try_to_timestamp(c, F.lit("dd/MM/yyyy")),
        F.try_to_timestamp(c, F.lit("yyyy/MM/dd")),
    )
    return F.when(parsed.isNotNull(), F.date_format(parsed, "yyyy-MM-dd")).otherwise(c)


def _number_coerce(c: Column) -> Column:
    """F10: strip everything but digits, dot, minus."""
    return F.regexp_replace(c, "[^0-9.\\-]", "")


def _boolean_coerce(c: Column) -> Column:
    """F11 (processor.go:273-281)."""
    low = F.lower(F.trim(c))
    return (
        F.when(low.isin("yes", "y", "true", "1", "t"), "true")
        .when(low.isin("no", "n", "false", "0", "f"), "false")
        .otherwise(c)
    )


RULES: list[Rule] = [
    Rule(1, "trim", (), lambda c: F.trim(c), 0.05),
    Rule(2, "placeholder_null", (),
         lambda c: F.when(F.upper(c).isin(S.NULL_TOKENS), F.lit("")).otherwise(c),
         0.10),
    Rule(3, "remove_quotes", (), S.strip_quotes, 0.05),
    Rule(4, "collapse_ws", (), lambda c: F.regexp_replace(c, r"\s+", " "), 0.05),
    Rule(5, "upper_name", ("name", "flag", "ircs"), lambda c: F.upper(c), 0.10),
    Rule(6, "imo_digits", ("imo", "mmsi"), _number_coerce, 0.25),
    Rule(7, "date_coerce", ("date",), _date_coerce, 0.30),
    Rule(8, "number_coerce", ("number",), _number_coerce, 0.20),
    Rule(9, "boolean_coerce", ("text",), _boolean_coerce, 0.05),
]


def clean_cells(cells: DataFrame, max_passes: int = MAX_PASSES) -> DataFrame:
    """Apply the rule chain for up to ``max_passes`` passes.

    A pass re-applies every applicable rule in priority order; a rule
    'fires' when it changes the value, appending its id to rule_chain and
    nudging confidence (F18 weighted update + per-pass decay). Rules are
    idempotent, so pass 2+ usually fires nothing — the loop exists because
    the reference's chain can cascade (null-token appears only after trim).
    """
    df = cells.select(
        "row_index",
        "column_name",
        "raw_value",
        S.field_type(S.canon_col_name(F.col("column_name"))).alias("field_type"),
        F.coalesce(F.col("raw_value"), F.lit("")).alias("cleaned_value"),
        F.lit(0.5).alias("confidence"),
        F.array().cast("array<int>").alias("rule_chain"),
    )
    base_cols = ["row_index", "column_name", "raw_value", "field_type"]
    for pass_i in range(max_passes):
        decay = PASS_DECAY ** pass_i
        for rule in RULES:
            applies = (
                F.lit(True)
                if not rule.applies_to
                else F.col("field_type").isin(*rule.applies_to)
            )
            # two narrow projections per rule: the candidate value is given
            # a NAME before being referenced again, so the expression tree
            # stays linear in |rules| (a when-chain that re-inlines the
            # prior rule's expression goes exponential at analysis time);
            # at runtime the whole chain fuses into one codegen stage
            df = df.select(
                *base_cols, "cleaned_value", "confidence", "rule_chain",
                F.when(applies, rule.fn(F.col("cleaned_value")))
                .otherwise(F.col("cleaned_value"))
                .alias("__nv"),
            )
            fired = F.col("__nv") != F.col("cleaned_value")
            conf = F.col("confidence")
            df = df.select(
                *base_cols,
                F.col("__nv").alias("cleaned_value"),
                F.when(
                    fired,
                    F.least(
                        F.lit(1.0),
                        (conf * 0.3 + (conf + rule.adj) * 0.7) * F.lit(decay),
                    ),
                ).otherwise(conf).alias("confidence"),
                F.when(
                    fired, F.array_append(F.col("rule_chain"), F.lit(rule.rule_id))
                ).otherwise(F.col("rule_chain")).alias("rule_chain"),
            )
        # rules idempotent → one extra pass reaches fixpoint; the loop
        # bound mirrors the reference's ≤3 passes
    return df.withColumn(
        "needs_review", F.col("confidence") < CONFIDENCE_THRESHOLD
    )


def melt_to_cells(df: DataFrame, key_col: str, value_cols: list[str]) -> DataFrame:
    """PV2 wide→long melt into the EAV cell model (phase_b_diff.py:324-388)."""
    stack_expr = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in value_cols
    )
    return df.selectExpr(
        f"cast(`{key_col}` as long) as row_index",
        f"stack({len(value_cols)}, {stack_expr}) as (column_name, raw_value)",
    )
