"""String scalar functions (SURVEY §2.8): every one a JVM-side Column
expression — no Python UDFs. Python twins exist only where the driver needs
them (header canonicalization happens driver-side on tiny header lists).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# F1 alias map (phase_b_diff.py:316-320; parser.go:178-188)
CANON_ALIASES = {
    "IMO_NUMBER": "IMO",
    "IMO_NO": "IMO",
    "CALLSIGN": "CALL_SIGN",
    "FLAG_STATE": "FLAG",
    "GT": "GROSS_TONNAGE",
    "VESSEL": "VESSEL_NAME",
}

# F2/F3 null-token set (phase_b_diff.py:288-307; processor.go:171-180)
NULL_TOKENS = ["N/A", "NA", "NONE", "NULL", "", "-", "—", "NAN", "UNK", "UNKNOWN"]


def canon_col_name_py(name: str) -> str:
    """F1 canon_col_name, driver-side twin (headers are a tiny list)."""
    c = re.sub(r"[^A-Z0-9]+", "_", name.upper()).strip("_")
    return CANON_ALIASES.get(c, c)


def dedupe_canon_names(raw_names) -> list[str]:
    """Canonicalize a header row and de-dup repeats deterministically.

    The suffix probes until genuinely unused: naive `base_{count}` renames
    collide when a header literally named 'A_1' coexists with two 'A's
    (['A','A_1','A'] must become ['A','A_1','A_2'], not a duplicate 'A_1'
    that silently shadows a column)."""
    used: set[str] = set()
    out: list[str] = []
    for h in raw_names:
        base = canon_col_name_py("" if h is None else str(h)) or "COL"
        c, k = base, 0
        while c in used:
            k += 1
            c = f"{base}_{k}"
        used.add(c)
        out.append(c)
    return out


def canon_col_name(col: Column) -> Column:
    """F1 as a Column expr (upper → non-alnum→_ → strip _ → alias map)."""
    c = F.regexp_replace(F.upper(col), "[^A-Z0-9]+", "_")
    c = F.regexp_replace(c, "^_+|_+$", "")
    mapping = F.create_map(
        *[F.lit(x) for kv in CANON_ALIASES.items() for x in kv]
    )
    return F.coalesce(F.element_at(mapping, c), c)


def canonicalize_null(col: Column, marker: str | None = None) -> Column:
    """F2/F3: null-token set → NULL (or an explicit '<NULL>' marker)."""
    hit = F.upper(F.trim(col)).isin(NULL_TOKENS) | col.isNull()
    repl = F.lit(marker) if marker is not None else F.lit(None).cast("string")
    return F.when(hit, repl).otherwise(col)


def strip_quotes(col: Column) -> Column:
    """F12 remove_quotes (processor.go:308-312)."""
    return F.regexp_replace(col, "[\"']", "")


def normalize_composite_part(col: Column) -> Column:
    """F20 composite-key part normalization (phase_b_diff.py:250-268):
    strip quotes/apostrophes, & → ' AND ', compress whitespace, upper."""
    c = strip_quotes(col)
    c = F.regexp_replace(c, "&", " AND ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return F.upper(c)


def composite_key(*cols: Column) -> Column:
    """F20: first-complete-set composite key joined with '||'."""
    return F.concat_ws("||", *[normalize_composite_part(c) for c in cols])


def slugify(col: Column) -> Column:
    """F24 (storage.py:180-188): alnum-or-dash, lowered."""
    return F.lower(F.trim(F.regexp_replace(col, "[^a-zA-Z0-9]+", "-")))


def storage_key(prefix: Column, ts: Column, task_id: Column, name: Column) -> Column:
    """S14 storage key builder (storage.py:174-188):
    prefix/Y/m/d/HMS-taskid-slug."""
    return F.concat_ws(
        "/",
        prefix,
        F.date_format(ts, "yyyy"),
        F.date_format(ts, "MM"),
        F.date_format(ts, "dd"),
        F.concat_ws("-", F.date_format(ts, "HHmmss"), task_id, slugify(name)),
    )


# F5 accent strip, JVM-side (translate is codegen'd — no UDF). The table
# covers Latin diacritics (what the reference's `unaccent` dictionary
# effectively handles for vessel names); the general-Unicode NFD→drop-Mn
# strip lives in extraction/spec.py:strip_accents for the Python batch path.
_ACCENTED = ("àáâãäåāăąèéêëēĕėęěìíîïĩīĭįòóôõöøōŏőùúûüũūŭůçćĉċčñńņň"
             "ÀÁÂÃÄÅĀĂĄÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÒÓÔÕÖØŌŎŐÙÚÛÜŨŪŬŮÇĆĈĊČÑŃŅŇ"
             "ýÿŷÝŸŶšśŠŚžźżŽŹŻ")
_PLAIN = ("aaaaaaaaaeeeeeeeeeiiiiiiiiooooooooouuuuuuuucccccnnnn"
          "AAAAAAAAAEEEEEEEEEIIIIIIIIOOOOOOOOOUUUUUUUUCCCCCNNNN"
          "yyyYYYssSSzzzZZZ")
assert len(_ACCENTED) == len(_PLAIN)


def strip_accents_sql(col: Column) -> Column:
    """F5 for SQL plans: fold Latin diacritics to ASCII via translate()."""
    return F.translate(col, _ACCENTED, _PLAIN)


def levenshtein_similarity(a: Column, b: Column) -> Column:
    """F17 (processor.go:426-482): 1 - dist/maxlen, lowercase compare."""
    la, lb = F.lower(a), F.lower(b)
    return F.lit(1.0) - F.levenshtein(la, lb).cast("double") / F.greatest(
        F.length(la), F.length(lb), F.lit(1)
    )


def field_type(col_name: Column) -> Column:
    """F19 field-type classifier (processor.go:373-401): substring rules
    on the canonicalized column name."""
    c = F.upper(col_name)
    return (
        F.when(c.contains("IMO"), "imo")
        .when(c.contains("MMSI"), "mmsi")
        .when(c.contains("IRCS") | c.contains("CALL_SIGN"), "ircs")
        .when(c.contains("NAME"), "name")
        .when(c.contains("FLAG"), "flag")
        .when(c.contains("DATE"), "date")
        .when(
            c.contains("TONNAGE") | c.contains("LENGTH") | c.contains("NUMBER")
            | c.contains("BAL") | c.contains("PRICE"),
            "number",
        )
        .otherwise("text")
    )
