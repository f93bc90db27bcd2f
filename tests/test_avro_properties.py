"""Property-based tests for the hand-written Avro OCF encoder
(sinks/avro_ocf.py): arbitrary records must round-trip bit-exactly through
write_ocf → read_ocf.  Zigzag varints, [null, X] unions, nested
arrays/maps, and unicode strings are the classic hand-rolled-encoder
failure points; hypothesis hits the boundaries fixed examples miss
(int64 extremes, empty containers, astral-plane codepoints)."""

from __future__ import annotations

import os

from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse_loader_spark.sinks.avro_ocf import (
    read_datum,
    read_long,
    write_datum,
    write_long,
    read_ocf,
    write_ocf,
)

INT64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(INT64)
def test_zigzag_varint_roundtrip(n):
    import io

    buf = io.BytesIO()
    write_long(buf, n)
    buf.seek(0)
    assert read_long(buf) == n


RECORD_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "long"], "default": None},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {
            "name": "nested",
            "type": {
                "type": "record",
                "name": "inner",
                "fields": [
                    {"name": "x", "type": "int"},
                    {"name": "ys", "type": {"type": "array", "items": "string"}},
                ],
            },
        },
    ],
}

record_strategy = st.fixed_dictionaries(
    {
        "i": INT64,
        "s": st.text(max_size=40),
        "o": st.one_of(st.none(), INT64),
        "b": st.booleans(),
        # NaN breaks equality; use finite floats (Avro encodes bits either way)
        "d": st.floats(allow_nan=False, allow_infinity=True),
        "arr": st.lists(INT64, max_size=8),
        "m": st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=6),
        "nested": st.fixed_dictionaries(
            {
                "x": st.integers(min_value=-(2**31), max_value=2**31 - 1),
                "ys": st.lists(st.text(max_size=10), max_size=5),
            }
        ),
    }
)


@given(record_strategy)
def test_datum_roundtrip(rec):
    import io

    buf = io.BytesIO()
    write_datum(buf, RECORD_SCHEMA, rec)
    buf.seek(0)
    assert read_datum(buf, RECORD_SCHEMA) == rec


@settings(max_examples=25, deadline=None)
@given(st.lists(record_strategy, max_size=20))
def test_ocf_file_roundtrip(tmp_path_factory_records):
    import tempfile

    records = tmp_path_factory_records
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "prop.avro")
        write_ocf(p, RECORD_SCHEMA, records, metadata={"k": "v"})
        schema, meta, back = read_ocf(p)
        assert back == records
        assert meta["k"] == "v"
