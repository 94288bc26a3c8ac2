"""Executed semantics for the generated Iceberg MERGE/history SQL
(VERDICT r4 #2): run the statements tableio generates against a REAL SQL
engine and compare with the parquet-emulation upsert.

The sandbox DuckDB (1.0.0) predates ``MERGE INTO`` (DuckDB grew it in
1.4), so the GENERATED statement text — not a re-derivation from the
arguments — is adapted by syntax-only, test-pinned rewrites into an
equivalent DuckDB statement sequence and executed:

* ``MERGE`` becomes snapshot-keys + DELETE/UPDATE/INSERT statements that
  reproduce Spark/Iceberg MERGE semantics exactly: every arm evaluates
  matched-ness against the ORIGINAL target state (a matched-and-deleted
  source row is NOT re-inserted), and clause order is first-match-wins
  (the DELETE arm shadows the UPDATE arm when both predicates hold).
* dialect spelling: Spark ``a <=> b`` → ``a IS NOT DISTINCT FROM b``
  (and ``NOT (a <=> b)`` → ``a IS DISTINCT FROM b``),
  ``named_struct('k', v, …)`` → ``struct_pack(k := v, …)``; everything
  else (INSERT … SELECT, to_json, current_timestamp) parses as-is.

Reference analog: sql/ebisu_transform.sql:98-165 executes its MERGE
against a live engine; this closes the "golden strings pin syntax, not
semantics" gap for the five golden shapes in tests/golden_iceberg/.
"""

from __future__ import annotations

import re

_MERGE_RE = re.compile(
    r"MERGE INTO (?P<target>\S+) t USING (?P<source>\S+) s ON (?P<on>.+)")
_DELETE_RE = re.compile(r"WHEN MATCHED AND \((?P<pred>.+)\) THEN DELETE$")
_UPDATE_RE = re.compile(
    r"WHEN MATCHED AND \((?P<pred>.+)\) THEN UPDATE SET (?P<sets>.+)$")
_INSERT_RE = re.compile(r"WHEN NOT MATCHED THEN INSERT \*$")


def adapt_expr(expr: str) -> str:
    """Spark → DuckDB expression spelling, syntax only (test-pinned)."""
    out = re.sub(r"NOT \((\S+) <=> (\S+)\)", r"\1 IS DISTINCT FROM \2", expr)
    out = re.sub(r"(\S+) <=> (\S+)", r"\1 IS NOT DISTINCT FROM \2", out)
    return out


def adapt_history_sql(sql: str) -> str:
    """The generated history INSERT…SELECT is ANSI apart from three Spark
    spellings: ``named_struct('k', v, …)``, ``<=>``, and the parenthesized
    ``current_timestamp()`` (DuckDB takes the bare keyword form)."""

    def _ns(m: re.Match) -> str:
        args = [a.strip() for a in m.group(1).split(",")]
        pairs = [
            f"{args[i][1:-1]} := {args[i + 1]}" for i in range(0, len(args), 2)
        ]
        return "struct_pack(" + ", ".join(pairs) + ")"

    out = re.sub(r"named_struct\(([^()]*)\)", _ns, sql)
    out = out.replace("current_timestamp()", "current_timestamp")
    return adapt_expr(out)


def parse_merge(sql: str) -> dict:
    """Parse the generated MERGE shape (the only shapes tableio emits)
    into target/source/on + arms. Raises on anything unrecognized so a
    generator change breaks the harness loudly instead of skipping arms.
    ``order`` records the CLAUSE ORDER as written — first-match-wins is
    the semantic contract, so the executor refuses any ordering it does
    not implement rather than silently inverting it (review r5)."""
    lines = [ln.strip() for ln in sql.strip().splitlines() if ln.strip()]
    head = _MERGE_RE.match(lines[0])
    if not head:
        raise ValueError(f"unrecognized MERGE head: {lines[0]!r}")
    out = {**head.groupdict(), "delete": None, "update": None,
           "insert": False, "order": []}
    for ln in lines[1:]:
        if m := _DELETE_RE.match(ln):
            out["delete"] = m.group("pred")
            out["order"].append("delete")
        elif m := _UPDATE_RE.match(ln):
            out["update"] = (m.group("pred"), m.group("sets"))
            out["order"].append("update")
        elif _INSERT_RE.match(ln):
            out["insert"] = True
            out["order"].append("insert")
        else:
            raise ValueError(f"unrecognized MERGE clause: {ln!r}")
    return out


def run_merge_duckdb(con, sql: str) -> None:
    """Execute the generated MERGE's semantics in DuckDB. ``con`` must
    already hold the target table and the source view/table under the
    names the statement references."""
    m = parse_merge(sql)
    # the executor implements exactly delete→update→insert; any other
    # written order would mean different first-match-wins semantics, so
    # refuse it loudly instead of silently reordering (review r5)
    expected = [a for a, present in
                (("delete", m["delete"]), ("update", m["update"]),
                 ("insert", m["insert"])) if present]
    if m["order"] != expected:
        raise ValueError(
            f"unsupported MERGE clause order {m['order']} (executor "
            f"implements {expected})")
    target, source, on = m["target"], m["source"], adapt_expr(m["on"])
    # matched-ness is defined by the ORIGINAL target state for every arm
    keys = [c.split(".")[1] for c in re.findall(r"t\.\w+", m["on"])]
    key_list = ", ".join(keys)
    con.execute("DROP TABLE IF EXISTS __merge_t0")
    con.execute(
        f"CREATE TEMP TABLE __merge_t0 AS SELECT {key_list} FROM {target}")
    if m["delete"]:
        con.execute(
            f"DELETE FROM {target} t USING {source} s "
            f"WHERE {on} AND ({adapt_expr(m['delete'])})")
    if m["update"]:
        pred, sets = m["update"]
        # SET targets lose the t. prefix in UPDATE…FROM form
        set_clause = re.sub(r"(^|, )t\.", r"\1", sets)
        con.execute(
            f"UPDATE {target} t SET {set_clause} FROM {source} s "
            f"WHERE {on} AND ({adapt_expr(pred)})")
    if m["insert"]:
        # INSERT * maps by name onto the target's columns (Iceberg
        # semantics); the source may carry extra columns (tombstones).
        # Matched-ness uses plain '=' like the generated ON clause does
        # (NULL keys never match → a NULL-keyed source row INSERTS, the
        # real Spark/Iceberg behavior) — IS NOT DISTINCT FROM here would
        # wrongly suppress NULL-key inserts (review r5).
        tcols = [r[1] for r in
                 con.execute(f"PRAGMA table_info('{target}')").fetchall()]
        col_list = ", ".join(f"s.{c}" for c in tcols)
        anti = " AND ".join(f"s.{k} = o.{k}" for k in keys)
        con.execute(
            f"INSERT INTO {target} SELECT {col_list} FROM {source} s "
            f"WHERE NOT EXISTS (SELECT 1 FROM __merge_t0 o WHERE {anti})")
    con.execute("DROP TABLE IF EXISTS __merge_t0")


def run_history_duckdb(con, sql: str) -> None:
    con.execute(adapt_history_sql(sql))
