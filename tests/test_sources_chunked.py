"""read_json_chunked parity + parallelism pins (VERDICT r6 ask #7).

The multiline JSON array is the one ingest shape that serializes onto
a single partition; the chunked reader must produce the SAME rows
while actually splitting the file across tasks.
"""

from __future__ import annotations

import json

import pytest

from big_data_tools_spark.io.sources import read_json, read_json_chunked


@pytest.fixture(scope="module")
def big_array_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("chunked") / "events.json"
    rows = []
    for i in range(5000):
        rows.append(
            {
                "id": i,
                # adversarial content for the boundary scanner: commas,
                # braces/brackets, escaped quotes and backslashes
                "name": f'row "{i}", with, commas }}]{{[ and \\ escapes',
                "nested": {"a": [i, i + 1], "b": {"deep": [{"x": i}]}},
                "amount": i * 1.25,
                "flag": i % 3 == 0,
                "maybe": None if i % 7 == 0 else f"v{i}",
            }
        )
    path.write_text(json.dumps(rows, indent=1))
    return str(path)


def _rowset(df):
    return sorted(repr(sorted(r.asDict().items())) for r in df.collect())


def test_same_rows_as_multiline(spark, big_array_file):
    multi = read_json(spark, big_array_file, multiline=True)
    chunked = read_json_chunked(
        spark, big_array_file, target_chunk_bytes=64 << 10
    )
    assert sorted(multi.columns) == sorted(chunked.columns)
    assert _rowset(multi.select(*sorted(multi.columns))) == _rowset(
        chunked.select(*sorted(multi.columns))
    )


def test_multiline_is_single_partition_but_chunked_is_not(
    spark, big_array_file
):
    multi = read_json(spark, big_array_file, multiline=True)
    assert multi.rdd.getNumPartitions() == 1  # the shape being fixed
    chunked = read_json_chunked(
        spark, big_array_file, target_chunk_bytes=64 << 10
    )
    assert chunked.rdd.getNumPartitions() > 1


def test_explicit_schema_and_tiny_file(spark, tmp_path):
    p = tmp_path / "small.json"
    p.write_text('[{"a": 1, "b": "x"}, {"a": 2, "b": "y,]}"}]')
    df = read_json_chunked(spark, str(p), schema="a long, b string")
    got = sorted((r.a, r.b) for r in df.collect())
    assert got == [(1, "x"), (2, "y,]}")]


def test_scalar_array(spark, tmp_path):
    p = tmp_path / "scalars.json"
    p.write_text("[1, 2, 3, 4]")
    df = read_json_chunked(spark, str(p), schema="value long")
    # spark.read.json on bare scalars puts them in a single column
    assert df.count() == 4
