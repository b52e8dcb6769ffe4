"""Hypothesis property test for the pure-Python Avro codec: arbitrary
values drawn against a fixed rich schema must survive
write_ocf → independent read_ocf bit-exactly (strings/bytes/ints) or
IEEE-exactly (doubles), across both codecs and block boundaries.
"""

from __future__ import annotations

import math
import os

from hypothesis import given, settings, strategies as st

from de_gcp_lakehouse_iceberg_spark.lakehouse import avro

SCHEMA = {
    "type": "record",
    "name": "doc",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "score", "type": "double"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "payload", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "counts", "type": {"type": "map", "values": "long"}},
        {
            "name": "inner",
            "type": [
                "null",
                {
                    "type": "record",
                    "name": "pair",
                    "fields": [
                        {"name": "key", "type": "int"},
                        {
                            "name": "vals",
                            "type": {"type": "array", "items": "long"},
                        },
                    ],
                },
            ],
        },
    ],
}

_longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_ints = st.integers(min_value=-(2**31), max_value=2**31 - 1)
_text = st.text(max_size=40)
_doubles = st.floats(allow_nan=False)  # NaN != NaN breaks equality

_records = st.fixed_dictionaries(
    {
        "id": _longs,
        "flag": st.booleans(),
        "score": _doubles,
        "name": st.none() | _text,
        "payload": st.binary(max_size=40),
        "tags": st.lists(_text, max_size=5),
        "counts": st.dictionaries(_text, _longs, max_size=5),
        "inner": st.none()
        | st.fixed_dictionaries(
            {"key": _ints, "vals": st.lists(_longs, max_size=5)}
        ),
    }
)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(_records, max_size=12),
    codec=st.sampled_from(["null", "deflate"]),
    block=st.sampled_from([64, 4 * 1024 * 1024]),
)
def test_avro_roundtrip_arbitrary_values(tmp_path_factory, recs, codec, block):
    path = os.path.join(
        str(tmp_path_factory.mktemp("avro")), "prop.avro"
    )
    avro.write_ocf(
        path, SCHEMA, recs, codec=codec, block_bytes=block
    )
    schema, meta, got = avro.read_ocf(path)
    assert schema == SCHEMA
    assert meta["avro.codec"] == codec
    assert len(got) == len(recs)
    for g, w in zip(got, recs):
        for k, v in w.items():
            if isinstance(v, float):
                assert (
                    g[k] == v
                    or (math.isinf(v) and g[k] == v)
                ), k
            else:
                assert g[k] == v, k
