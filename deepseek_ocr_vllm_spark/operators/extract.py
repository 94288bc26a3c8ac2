"""The flagship extraction operator: whole-Arrow-batch mapInArrow.

Spark-first shape (north rule):
  * never per-row Python — one Python call per Arrow batch
    (spark.sql.execution.arrow.maxRecordsPerBatch controls batch size)
  * input columns pass through; extraction appends
    (clean_text, spans, n_nodes, n_spans, n_bytes, kind)
  * spans: array<struct<start:int32,end:int32,label:string>>, char offsets
    into clean_text, end exclusive (PREANNOTATION_SCHEMA.md:9-12)

Replaces the reference's executor-side per-file Python map
(apps/spark-jobs/pdf-extract/job.py:142-150) with a declarative
DataFrame transform Catalyst can plan around.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType(), False),
            T.StructField("end", T.IntegerType(), False),
            T.StructField("label", T.StringType(), False),
        ]
    )
)

_SPAN_PA = pa.list_(
    pa.struct([("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())])
)

# X2 word layout boxes (scripts/pdf_extract.py:58-73 contract)
WORD_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("text", T.StringType(), False),
            T.StructField("x0", T.DoubleType(), False),
            T.StructField("y0", T.DoubleType(), False),
            T.StructField("x1", T.DoubleType(), False),
            T.StructField("y1", T.DoubleType(), False),
        ]
    )
)

_WORD_PA = pa.list_(
    pa.struct(
        [
            ("text", pa.string()),
            ("x0", pa.float64()),
            ("y0", pa.float64()),
            ("x1", pa.float64()),
            ("y1", pa.float64()),
        ]
    )
)

# X3 table cell grids: tables → rows → cells (pdf_extract.py:74-81)
TABLE_TYPE = T.ArrayType(T.ArrayType(T.ArrayType(T.StringType())))
_TABLE_PA = pa.list_(pa.list_(pa.list_(pa.string())))

EXTRACT_FIELDS = [
    ("clean_text", T.StringType(), pa.string()),
    ("spans", SPAN_TYPE, _SPAN_PA),
    ("words", WORD_TYPE, _WORD_PA),
    ("tables", TABLE_TYPE, _TABLE_PA),
    ("n_nodes", T.IntegerType(), pa.int32()),
    ("n_spans", T.IntegerType(), pa.int32()),
    ("n_bytes", T.LongType(), pa.int64()),
    ("kind", T.StringType(), pa.string()),
]


def extracted_schema(input_schema: T.StructType) -> T.StructType:
    fields = list(input_schema.fields)
    return T.StructType(fields + [T.StructField(n, t, True) for n, t, _ in EXTRACT_FIELDS])


def _out_arrow_fields(in_schema: pa.Schema) -> list:
    return list(in_schema) + [pa.field(n, patype) for n, _, patype in EXTRACT_FIELDS]


def extract_map_in_arrow(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append extraction columns via one vectorized pass per Arrow batch."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # import inside the task so only the worker pays it
        from deepseek_ocr_vllm_spark.extraction import vectorized

        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            res = vectorized.extract_batch_flat(texts)
            struct_arr = pa.StructArray.from_arrays(
                [
                    pa.array(res["span_starts"], type=pa.int32()),
                    pa.array(res["span_ends"], type=pa.int32()),
                    pa.array(res["span_labels"], type=pa.string()),
                ],
                names=["start", "end", "label"],
            )
            spans_arr = pa.ListArray.from_arrays(
                pa.array(res["span_offsets"], type=pa.int32()), struct_arr
            ).cast(_SPAN_PA)
            word_struct = pa.StructArray.from_arrays(
                [
                    pa.array(res["word_texts"], type=pa.string()),
                    pa.array(res["word_x0"], type=pa.float64()),
                    pa.array(res["word_y0"], type=pa.float64()),
                    pa.array(res["word_x1"], type=pa.float64()),
                    pa.array(res["word_y1"], type=pa.float64()),
                ],
                names=["text", "x0", "y0", "x1", "y1"],
            )
            words_arr = pa.ListArray.from_arrays(
                pa.array(res["word_offsets"], type=pa.int32()), word_struct
            ).cast(_WORD_PA)
            tables_arr = pa.array(res["tables"], type=_TABLE_PA)
            arrays = list(batch.columns) + [
                pa.array(res["clean_text"], type=pa.string()),
                spans_arr,
                words_arr,
                tables_arr,
                pa.array(res["n_nodes"], type=pa.int32()),
                pa.array(res["n_spans"], type=pa.int32()),
                pa.array(res["n_bytes"], type=pa.int64()),
                pa.array(res["kind"], type=pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(
                arrays, schema=pa.schema(_out_arrow_fields(batch.schema))
            )

    return df.mapInArrow(run, schema=extracted_schema(df.schema))
