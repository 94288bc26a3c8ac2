"""Excel registry ingestion (SURVEY §2.1 S4).

Reference semantics (apps/csv-ingestion-worker/parser.go:83-162):
  * pick the first sheet whose name is not documentation boilerplate
    (info / metadata / about / readme / notes);
  * header = the sheet's first non-empty row; short rows padded with '',
    long rows truncated to the header width;
  * header canonicalization + alias map shared with the CSV path (F1).

Spark-first shape: Spark has no native Excel source, so files come in via
the binaryFile reader and each workbook is parsed inside ``mapInPandas``
(one Python call per Arrow batch of files, never per row). The parser
prefers openpyxl when installed and otherwise uses a dependency-free
stdlib zip+XML reader (an xlsx IS a zip of XML) covering the tabular
registry subset — S4 runs end-to-end in this container either way.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

from ..functions.strings import dedupe_canon_names

SKIP_SHEETS = frozenset(["info", "metadata", "about", "readme", "notes"])


def select_sheet(sheet_names: list[str]) -> str | None:
    """First sheet whose lowercase name isn't documentation boilerplate;
    falls back to the first sheet (parser.go:90-101)."""
    for name in sheet_names:
        if name.strip().lower() not in SKIP_SHEETS:
            return name
    return sheet_names[0] if sheet_names else None


def normalize_rows(rows: list[list]) -> tuple[list[str], list[list[str]]]:
    """Header from the first non-empty row; canonicalized + de-duped names;
    body rows padded/truncated to the header width, cells stringified with
    None → '' (parser.go:104-162)."""
    it = iter(rows)
    header_raw: list | None = None
    for r in it:
        if any(c is not None and str(c).strip() for c in r):
            header_raw = r
            break
    if header_raw is None:
        return [], []
    canon = dedupe_canon_names(header_raw)
    width = len(canon)
    body = []
    for r in it:
        cells = ["" if c is None else str(c).strip() for c in r[:width]]
        cells += [""] * (width - len(cells))
        body.append(cells)
    return canon, body


_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _cell_col(ref: str) -> int:
    """'BC12' → 54 (0-based column index); -1 when no letters."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _parse_workbook_stdlib(content: bytes) -> list[list]:
    """Dependency-free .xlsx parse (an xlsx is a zip of XML): workbook.xml
    sheet order + rels → the selected sheet's XML; sharedStrings / inline
    strings / numeric and boolean cells; column gaps padded with None.
    Covers the registry-workbook subset the reference's parser.go handles
    (tabular sheets of strings and numbers); no date/style decoding —
    date cells surface as raw Excel serial numbers."""
    import io
    import re
    import xml.etree.ElementTree as ET
    import zipfile

    z = zipfile.ZipFile(io.BytesIO(content))
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    sheets = [(sh.get("name"), sh.get(_RNS + "id"))
              for sh in wb.iter(_NS + "sheet")]
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        r.get("Id"): r.get("Target")
        for r in rels.iter(_PKG_RNS + "Relationship")
    }
    name = select_sheet([n for n, _rid in sheets])
    if name is None:
        return []
    target = rid_to_target[dict(sheets)[name]].lstrip("/")
    if not target.startswith("xl/"):
        target = "xl/" + target

    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
        shared = [
            "".join(t.text or "" for t in si.iter(_NS + "t"))
            for si in sst.iter(_NS + "si")
        ]

    int_re = re.compile(r"-?\d+")
    rows: list[list] = []
    for row in ET.fromstring(z.read(target)).iter(_NS + "row"):
        cells: list = []
        for c in row.iter(_NS + "c"):
            col = _cell_col(c.get("r", ""))
            if col < 0:
                col = len(cells)
            while len(cells) <= col:
                cells.append(None)
            t = c.get("t", "n")
            v = c.find(_NS + "v")
            if t == "s":
                cells[col] = shared[int(v.text)] if v is not None else None
            elif t == "inlineStr":
                is_el = c.find(_NS + "is")
                cells[col] = (
                    "".join(tt.text or "" for tt in is_el.iter(_NS + "t"))
                    if is_el is not None else None
                )
            elif t == "b":
                cells[col] = None if v is None else v.text == "1"
            elif v is None or v.text is None:
                cells[col] = None
            elif t == "str":  # cached formula string
                cells[col] = v.text
            elif int_re.fullmatch(v.text):
                cells[col] = int(v.text)
            else:
                try:
                    cells[col] = float(v.text)
                except ValueError:
                    cells[col] = v.text
        rows.append(cells)
    return rows


def _parse_workbook(content: bytes) -> list[list]:
    """Workbook → rows of the selected sheet. openpyxl when installed
    (full fidelity: dates, formula results); otherwise the stdlib zip+XML
    parser above — S4 runs end-to-end either way."""
    try:
        import io

        from openpyxl import load_workbook  # noqa: PLC0415
    except ImportError:
        return _parse_workbook_stdlib(content)
    wb = load_workbook(io.BytesIO(content), read_only=True, data_only=True)
    sheet = select_sheet(wb.sheetnames)
    ws = wb[sheet]
    return [list(r) for r in ws.iter_rows(values_only=True)]


def read_registry_excel(spark: SparkSession, path: str,
                        columns: list[str]) -> DataFrame:
    """Distributed Excel ingestion: binaryFile scan → mapInPandas workbook
    parse → long rows (one per sheet row) with the canonical header applied.

    ``columns`` is the expected canonical header (schema must be declared
    up front — Spark needs the output schema before any workbook is open;
    the J8 expected-columns anti-join is the validation that canon headers
    match it).
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xlsx")
        .load(path)
        .select("path", "content")
    )
    out_schema = ", ".join(
        ["`__path` string"] + [f"`{c}` string" for c in columns])

    # the CORRUPTION exception surface of both parser backends (stdlib
    # zip+XML and openpyxl): truncated/garbled zip, malformed XML, bad
    # sharedString index, out-of-range cell refs. Deliberately NOT a bare
    # Exception — a programming regression in normalize_rows must fail the
    # ingest loudly, not silently drop every workbook (ADVICE r4).
    import xml.etree.ElementTree as _ET
    import zipfile as _zipfile

    _CORRUPT = (_zipfile.BadZipFile, _ET.ParseError, KeyError, IndexError,
                ValueError, TypeError, OSError)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out: dict[str, list] = {c: [] for c in ["__path", *columns]}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                try:
                    canon, body = normalize_rows(
                        _parse_workbook(bytes(content)))
                except _CORRUPT:
                    # damaged workbook: contribute no rows instead of
                    # killing the task — at corpus scale one corrupt file
                    # must not fail the ingest; a production deployment
                    # side-outputs these paths (the S8 manifest pattern)
                    continue
                idx = {c: i for i, c in enumerate(canon)}
                for r in body:
                    rows_out["__path"].append(fpath)
                    for c in columns:
                        i = idx.get(c)
                        rows_out[c].append("" if i is None else r[i])
            yield pd.DataFrame(rows_out)

    return files.mapInPandas(parse, out_schema)
