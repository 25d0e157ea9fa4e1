"""Avro wire-format validation for the S2 decode cascade's top tier.

The container has neither spark-avro nor fastavro, so the Avro branch of
``decode_kafka_records`` cannot execute here (``_avro_usable`` -> False).
What CAN be validated without either (VERDICT r1 next-#3, ADVICE r1):

1. the reconstructed writer schema (``_dead_letter_avro_schema``) is valid
   Avro whose binary encoding round-trips golden DeadLetter records through
   a minimal pure-Python codec implementing the Avro 1.11 binary spec
   (zigzag varints, length-prefixed utf8, union-index prefix, in-order
   record fields — https://avro.apache.org/docs/1.11.1/specification/);
2. the exact byte layout is PINNED: reordering fields, flipping a union's
   branch order, or changing a type changes the golden bytes and fails;
3. the Confluent wire framing (magic 0x00 + 4-byte schema id + payload)
   and the engine's framing expression ``substring(value, 6, len-5)``
   (streaming/kafka.py:145) strip exactly those 5 bytes — checked through
   Spark itself.

The upstream schema source is bakdata error-handling-avro (reference
build.gradle.kts:43-44); its field set/optionality is evidenced in the
reference parsers (SURVEY.md §1.4) and asserted structurally here: all
optional fields are ["null", T] unions with null defaults (Java builders
write null as union index 0), description/cause are required non-unions.
"""

from __future__ import annotations

import io
import json
import struct

import pytest

from kafka_dead_letter_analyzer_spark.streaming.kafka import (
    _dead_letter_avro_schema,
)

# ---------------------------------------------------------------------------
# Minimal Avro binary codec (spec-driven, test-only)
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        [b] = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _branch_for(value, union: list):
    for i, s in enumerate(union):
        t = s if isinstance(s, str) else s.get("type", s)
        if value is None and t == "null":
            return i, s
        if value is not None and t != "null":
            return i, s
    raise ValueError(f"no union branch for {value!r} in {union}")


def avro_encode(out: io.BytesIO, value, schema) -> None:
    if isinstance(schema, list):  # union: long index, then value
        idx, branch = _branch_for(value, schema)
        _write_long(out, idx)
        return avro_encode(out, value, branch)
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t in ("int", "long"):  # same varint encoding; logicalType irrelevant
        return _write_long(out, int(value))
    if t == "string":
        raw = value.encode("utf-8")
        _write_long(out, len(raw))
        out.write(raw)
        return None
    if t == "record":
        for f in schema["fields"]:
            avro_encode(out, value[f["name"]], f["type"])
        return None
    raise NotImplementedError(t)


def avro_decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):
        idx = _read_long(buf)
        return avro_decode(buf, schema[idx])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "string":
        n = _read_long(buf)
        return buf.read(n).decode("utf-8")
    if t == "record":
        return {f["name"]: avro_decode(buf, f["type"]) for f in schema["fields"]}
    raise NotImplementedError(t)


def confluent_frame(payload: bytes, schema_id: int = 1) -> bytes:
    return b"\x00" + struct.pack(">I", schema_id) + payload


GOLDEN = {
    "input_value": "bad-value",
    "partition": 3,
    "topic": "my-topic",
    "offset": 42,
    "description": "Could not process",
    "cause": {
        "error_class": "java.lang.RuntimeException",
        "message": "boom",
        "stack_trace": None,
    },
    "input_timestamp": 1704110400000,  # 2024-01-01T12:00:00Z millis
}

MINIMAL = {  # every optional absent — the Java builder's minimum
    "input_value": None,
    "partition": None,
    "topic": None,
    "offset": None,
    "description": "d",
    "cause": {"error_class": None, "message": None, "stack_trace": None},
    "input_timestamp": None,
}


@pytest.fixture(scope="module")
def schema():
    return json.loads(_dead_letter_avro_schema())


def _encode(record, schema) -> bytes:
    out = io.BytesIO()
    avro_encode(out, record, schema)
    return out.getvalue()


def test_schema_structure_matches_upstream_evidence(schema):
    assert schema["name"] == "DeadLetter"
    assert schema["namespace"] == "com.bakdata.kafka"
    by_name = {f["name"]: f for f in schema["fields"]}
    assert list(by_name) == [
        "input_value", "partition", "topic", "offset",
        "description", "cause", "input_timestamp",
    ]
    # optionals: ["null", T] with null default (null MUST be branch 0 —
    # that is what the upstream Java builders write for absent fields)
    for name, t in [("input_value", "string"), ("partition", "int"),
                    ("topic", "string"), ("offset", "long")]:
        assert by_name[name]["type"][0] == "null", name
        assert by_name[name]["type"][1] == t, name
        assert by_name[name]["default"] is None, name
    assert by_name["input_timestamp"]["type"][0] == "null"
    assert by_name["input_timestamp"]["type"][1]["logicalType"] == "timestamp-millis"
    # required fields are non-union
    assert by_name["description"]["type"] == "string"
    cause = by_name["cause"]["type"]
    assert cause["type"] == "record" and cause["name"] == "ErrorDescription"
    assert [f["name"] for f in cause["fields"]] == [
        "error_class", "message", "stack_trace"
    ]
    for f in cause["fields"]:
        assert f["type"][0] == "null" and f["type"][1] == "string"


def test_binary_roundtrip_golden_and_minimal(schema):
    for rec in (GOLDEN, MINIMAL):
        payload = _encode(rec, schema)
        assert avro_decode(io.BytesIO(payload), schema) == rec


def test_golden_bytes_are_pinned(schema):
    """Byte-exact layout: any field reorder, union flip, or type change in
    the reconstructed schema changes these bytes. Hand-derivable from the
    Avro spec: union index varints, zigzag ints, length-prefixed utf8."""
    payload = _encode(GOLDEN, schema)
    expected = (
        b"\x02" + bytes([2 * len(b"bad-value")]) + b"bad-value"  # union 1, len 9
        + b"\x02\x06"  # partition: union 1, zigzag(3)=6
        + b"\x02" + bytes([2 * len(b"my-topic")]) + b"my-topic"
        + b"\x02\x54"  # offset: union 1, zigzag(42)=84
        + bytes([2 * len(b"Could not process")]) + b"Could not process"
        + b"\x02" + bytes([2 * len(b"java.lang.RuntimeException")])
        + b"java.lang.RuntimeException"
        + b"\x02\x08boom"
        + b"\x00"  # stack_trace: union 0 (null)
        + b"\x02"  # input_timestamp: union 1
    )
    assert payload.startswith(expected)
    # trailing varint = zigzag(1704110400000)
    tail = io.BytesIO(payload[len(expected):])
    assert _read_long(tail) == GOLDEN["input_timestamp"]
    assert tail.read() == b""
    # minimal record: 6 null-branch markers + "d" + 3 null cause branches
    assert _encode(MINIMAL, schema) == b"\x00" * 4 + b"\x02d" + b"\x00" * 3 + b"\x00"


def test_confluent_framing_strip_via_spark(spark, schema):
    """The engine's exact framing expression (streaming/kafka.py:145)
    must recover the Avro payload from a Confluent-framed value."""
    from pyspark.sql import functions as F

    payload = _encode(GOLDEN, schema)
    framed = confluent_frame(payload, schema_id=17)
    assert framed[0:1] == b"\x00" and len(framed) == len(payload) + 5
    df = spark.createDataFrame([(bytearray(framed),)], "value binary")
    [row] = df.select(
        F.expr("substring(value, 6, length(value) - 5)").alias("p"),
        (F.expr("substring(value, 1, 1)") == F.lit(bytes([0]))).alias("is_wire"),
    ).collect()
    assert bytes(row["p"]) == payload
    assert row["is_wire"] is True
    # and the stripped payload decodes to the golden record
    assert avro_decode(io.BytesIO(bytes(row["p"])), schema) == GOLDEN


# ---------------------------------------------------------------------------
# Property-based: every combination of present/absent optionals round-trips
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:
    _text = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=80,
    )
    _opt_text = st.none() | _text
    _record = st.fixed_dictionaries(
        {
            "input_value": _opt_text,
            "partition": st.none() | st.integers(-(2**31), 2**31 - 1),
            "topic": _opt_text,
            "offset": st.none() | st.integers(-(2**63), 2**63 - 1),
            "description": _text,
            "cause": st.fixed_dictionaries(
                {
                    "error_class": _opt_text,
                    "message": _opt_text,
                    "stack_trace": _opt_text,
                }
            ),
            "input_timestamp": st.none() | st.integers(0, 2**53),
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(rec=_record, schema_id=st.integers(0, 2**32 - 1))
    def test_any_deadletter_roundtrips_through_the_wire(rec, schema_id):
        """Encode -> Confluent-frame -> strip 5 bytes -> decode restores the
        record exactly, for every optional-field combination and arbitrary
        utf-8 content (multi-byte chars exercise the length prefixes)."""
        schema = json.loads(_dead_letter_avro_schema())
        payload = _encode(rec, schema)
        framed = confluent_frame(payload, schema_id)
        assert framed[0] == 0 and len(framed) == len(payload) + 5
        assert avro_decode(io.BytesIO(framed[5:]), schema) == rec
