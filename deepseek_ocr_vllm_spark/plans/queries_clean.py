"""X10 rules-engine cleaner as a queries()/oracle pair.

The Spark side runs the REAL operator (operators/cleaning.clean_cells) over
an EAV cells table derived from customer with deterministically injected
mess (padding, quotes, null tokens, comma-grouped numbers, multi-format
dates). The oracle is an independently GENERATED DuckDB SQL chain — one CTE
per (pass, rule) step mirroring processor.go's ≤3-pass prioritized chain —
so the two implementations share no code, only the rule spec.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import q, t

_NULLS = "('N/A','NA','NONE','NULL','','-','NAN','UNK','UNKNOWN')"

# mess injection (keyed on row_index % 5) — identical text both engines
_CELLS_SQL = """
      SELECT row_index, column_name,
             CASE CAST(row_index % 5 AS INTEGER)
               WHEN 0 THEN '  ' || val || '  '
               WHEN 1 THEN '"' || val || '"'
               WHEN 2 THEN 'N/A'
               WHEN 3 THEN ' " ' || val || ' " '
               ELSE val END AS raw_value
      FROM (
        SELECT c_custkey AS row_index, 'Vessel Name' AS column_name,
               c_name AS val FROM customer
        UNION ALL
        SELECT c_custkey, 'Gross Tonnage',
               CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) || ' t'
        FROM customer
        UNION ALL
        SELECT c_custkey, 'Notes',
               CASE WHEN c_custkey % 7 = 0 THEN 'yes' ELSE c_mktsegment END
        FROM customer
      ) WHERE row_index <= 400
"""


def _duck_rule_steps() -> str:
    """One CTE per rule application, 2 passes (fixpoint for this chain)."""

    def step(expr: str) -> str:
        return expr

    field_type = (
        "CASE WHEN upper(column_name) LIKE '%IMO%' THEN 'imo' "
        "WHEN upper(column_name) LIKE '%NAME%' THEN 'name' "
        "WHEN upper(column_name) LIKE '%DATE%' THEN 'date' "
        "WHEN upper(column_name) LIKE '%TONNAGE%' OR upper(column_name) LIKE '%NUMBER%' "
        "  OR upper(column_name) LIKE '%BAL%' OR upper(column_name) LIKE '%PRICE%' "
        "THEN 'number' ELSE 'text' END"
    )
    rules = [
        ("trim", "trim(v)", None),
        ("nulltok", f"CASE WHEN upper(v) IN {_NULLS} THEN '' ELSE v END", None),
        ("quotes", "regexp_replace(v, '[\"'']', '', 'g')", None),
        ("ws", "regexp_replace(v, '\\s+', ' ', 'g')", None),
        ("upper_name", "upper(v)", "('name','flag','ircs')"),
        ("imo_digits", "regexp_replace(v, '[^0-9.\\-]', '', 'g')", "('imo','mmsi')"),
        ("date", "COALESCE(strftime(COALESCE(try_strptime(v, '%Y-%m-%d'),"
                 " try_strptime(v, '%m/%d/%Y'), try_strptime(v, '%d/%m/%Y'),"
                 " try_strptime(v, '%Y/%m/%d')), '%Y-%m-%d'), v)", "('date')"),
        ("number", "regexp_replace(v, '[^0-9.\\-]', '', 'g')", "('number')"),
        ("bool", "CASE WHEN lower(trim(v)) IN ('yes','y','true','1','t') THEN 'true' "
                 "WHEN lower(trim(v)) IN ('no','n','false','0','f') THEN 'false' "
                 "ELSE v END", "('text')"),
    ]
    ctes = [f"c0 AS (SELECT row_index, column_name, {field_type} AS field_type, "
            f"COALESCE(raw_value, '') AS v FROM cells)"]
    i = 0
    for _pass in range(2):
        for name, expr, gate in rules:
            guarded = (
                expr if gate is None
                else f"CASE WHEN field_type IN {gate} THEN {expr} ELSE v END"
            )
            ctes.append(
                f"c{i+1} AS (SELECT row_index, column_name, field_type, "
                f"{step(guarded)} AS v FROM c{i})"
            )
            i += 1
    return ",\n    ".join(ctes), i


_STEPS, _LAST = _duck_rule_steps()

_X10_DUCK = f"""
    WITH cells AS ({_CELLS_SQL}),
    {_STEPS}
    SELECT row_index, column_name, field_type, v AS cleaned_value
    FROM c{_LAST}
    ORDER BY row_index, column_name
"""


@q("x10_rules_clean", _X10_DUCK)
def x10_rules_clean(spark, sf_dir):
    """X10 rules-engine cell cleaner over messy EAV cells (the reference's
    CSV cleaning core, processor.go:104-194). Spark side = the real
    clean_cells operator; oracle = independently generated per-rule CTE
    chain."""
    from ..operators.cleaning import clean_cells

    c = t(spark, sf_dir, "customer").filter("c_custkey <= 400")
    mess = F.col("row_index") % 5
    val = F.col("val")
    cells = (
        c.select(F.col("c_custkey").alias("row_index"),
                 F.lit("Vessel Name").alias("column_name"),
                 F.col("c_name").alias("val"))
        .unionByName(
            c.select(
                F.col("c_custkey").alias("row_index"),
                F.lit("Gross Tonnage").alias("column_name"),
                F.concat(
                    F.col("c_acctbal").cast("decimal(18,2)").cast("string"),
                    F.lit(" t"),
                ).alias("val"),
            )
        )
        .unionByName(
            c.select(
                F.col("c_custkey").alias("row_index"),
                F.lit("Notes").alias("column_name"),
                F.when(F.col("c_custkey") % 7 == 0, F.lit("yes"))
                .otherwise(F.col("c_mktsegment"))
                .alias("val"),
            )
        )
        .select(
            "row_index", "column_name",
            F.when(mess == 0, F.concat(F.lit("  "), val, F.lit("  ")))
            .when(mess == 1, F.concat(F.lit('"'), val, F.lit('"')))
            .when(mess == 2, F.lit("N/A"))
            .when(mess == 3, F.concat(F.lit(' " '), val, F.lit(' " ')))
            .otherwise(val)
            .alias("raw_value"),
        )
    )
    return (
        clean_cells(cells, max_passes=2)
        .select("row_index", "column_name", "field_type", "cleaned_value")
        .orderBy("row_index", "column_name")
    )
