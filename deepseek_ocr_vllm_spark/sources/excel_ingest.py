"""Excel registry ingestion (SURVEY §2.1 S4).

Reference semantics (apps/csv-ingestion-worker/parser.go:83-162):
  * pick the first sheet whose name is not documentation boilerplate
    (info / metadata / about / readme / notes);
  * header = the sheet's first non-empty row; short rows padded with '',
    long rows truncated to the header width;
  * header canonicalization + alias map shared with the CSV path (F1).

Spark-first shape: Spark has no native Excel source, so files come in via
the binaryFile reader and each workbook is parsed inside ``mapInPandas``
(one Python call per Arrow batch of files, never per row). The workbook
parser itself needs openpyxl, which this container does not ship — that
import is gated and raises a clear NotImplementedError at RUN time, while
the sheet-selection / pad / canonicalization logic is pure Python and
fully tested (test_cleaning_sources.py).
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


def _parse_workbook(content: bytes) -> list[list]:
    """openpyxl-gated workbook → list of rows of the selected sheet."""
    try:
        import io

        from openpyxl import load_workbook  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - container has no openpyxl
        raise NotImplementedError(
            "Excel parsing needs openpyxl (not in this container); the "
            "Spark plumbing and row-normalization logic are real and "
            "tested — install openpyxl to enable the IO step"
        ) from e
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

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_out: dict[str, list] = {c: [] for c in ["__path", *columns]}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                canon, body = normalize_rows(_parse_workbook(bytes(content)))
                idx = {c: i for i, c in enumerate(canon)}
                for r in body:
                    rows_out["__path"].append(fpath)
                    for c in columns:
                        i = idx.get(c)
                        rows_out[c].append("" if i is None else r[i])
            yield pd.DataFrame(rows_out)

    return files.mapInPandas(parse, out_schema)
