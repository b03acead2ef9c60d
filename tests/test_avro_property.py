"""Property fuzz of the from-scratch Avro container codec: random
schemas (scalars, nullable unions, arrays, maps, nested records) and
random matching records must round-trip byte-exactly through
write_avro/read_avro under both supported codecs. Pure Python — no
Spark session. reference: the public Avro 1.11 spec (the codec exists
to serve iceberg-lite manifests, a north-rule addition)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from splink_spark.sources.avro_lite import read_avro, write_avro

_SCALARS = ["long", "string", "double", "boolean", "bytes"]


def _value_strategy(ts):
    if ts == "long":
        return st.integers(min_value=-(2**63), max_value=2**63 - 1)
    if ts == "string":
        return st.text(max_size=20)
    if ts == "double":
        return st.floats(allow_nan=False, allow_infinity=True)
    if ts == "boolean":
        return st.booleans()
    if ts == "bytes":
        return st.binary(max_size=20)
    if isinstance(ts, list):  # ["null", inner]
        return st.one_of(st.none(), _value_strategy(ts[1]))
    if ts["type"] == "array":
        return st.lists(_value_strategy(ts["items"]), max_size=5)
    if ts["type"] == "map":
        return st.dictionaries(
            st.text(max_size=8), _value_strategy(ts["values"]), max_size=4
        )
    # nested record
    return st.fixed_dictionaries(
        {f["name"]: _value_strategy(f["type"]) for f in ts["fields"]}
    )


@st.composite
def _schema_and_records(draw):
    n_fields = draw(st.integers(min_value=1, max_value=6))
    fields = []
    for i in range(n_fields):
        kind = draw(
            st.sampled_from(
                ["scalar", "null_union", "array", "map", "record"]
            )
        )
        if kind == "scalar":
            ts = draw(st.sampled_from(_SCALARS))
        elif kind == "null_union":
            ts = ["null", draw(st.sampled_from(_SCALARS))]
        elif kind == "array":
            ts = {
                "type": "array",
                "items": draw(st.sampled_from(_SCALARS)),
            }
        elif kind == "map":
            ts = {
                "type": "map",
                "values": draw(st.sampled_from(_SCALARS)),
            }
        else:
            inner_n = draw(st.integers(min_value=1, max_value=3))
            ts = {
                "type": "record",
                "name": f"nested_{i}",
                "fields": [
                    {
                        "name": f"n{j}",
                        "type": draw(
                            st.sampled_from(
                                _SCALARS + [["null", "long"]]
                            )
                        ),
                    }
                    for j in range(inner_n)
                ],
            }
        fields.append({"name": f"f{i}", "type": ts})
    schema = {"type": "record", "name": "fuzz", "fields": fields}
    rec = st.fixed_dictionaries(
        {f["name"]: _value_strategy(f["type"]) for f in fields}
    )
    records = draw(st.lists(rec, max_size=8))
    return schema, records


def _eq(a, b):
    """== with -0.0/0.0 distinction irrelevant and exact NaN-free floats."""
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isinf(a) and math.isinf(b) and a == b)
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(map(_eq, a, b))
    return a == b


@pytest.mark.parametrize("codec", ["null", "deflate"])
@settings(max_examples=60, deadline=None, derandomize=True)
@given(sr=_schema_and_records())
def test_avro_codec_round_trip_property(tmp_path_factory, codec, sr):
    schema, records = sr
    p = str(
        tmp_path_factory.mktemp("avro_prop") / f"fuzz_{codec}.avro"
    )
    write_avro(p, schema, records, codec=codec)
    schema_back, records_back = read_avro(p)
    assert schema_back == schema
    assert len(records_back) == len(records)
    for got, want in zip(records_back, records):
        assert _eq(got, want), (got, want)
