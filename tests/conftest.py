from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from deepseek_ocr_vllm_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """~3k-turn deterministic transcripts as a pandas DataFrame."""
    from deepseek_ocr_vllm_spark.fixtures import gen_transcripts

    return gen_transcripts(3000, seed=42, max_conv_turns=400)


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory, transcripts_pdf):
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path_factory.mktemp("data") / "transcripts.parquet")
    schema = pa.schema(
        [
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(transcripts_pdf, schema=schema, preserve_index=False),
        path,
    )
    return path
