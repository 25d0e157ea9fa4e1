"""P1/P2/P3 parser semantics — mirrors the reference's parser unit tests
(StreamsDeadLetterParserTest.java:56-214, ConnectDeadLetterParserTest.java:74-200,
NativeStreamsDeadLetterParserTest.java:56-174)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.functions import headers as H
from kafka_dead_letter_analyzer_spark.functions.headers import headers_to_map
from kafka_dead_letter_analyzer_spark.operators import parsers as P
from kafka_dead_letter_analyzer_spark.sources import fixtures as FX

UTC = dt.timezone.utc
TS = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC)


def _run(spark, parser, headers, value_text="raw-value"):
    df = FX.raw_frame(
        spark, [FX.envelope(headers=headers, value_text=value_text, timestamp=TS)]
    ).withColumn("headers_map", headers_to_map("headers"))
    dl, err = parser(F.col("headers_map"), F.col("value_text"), F.col("timestamp"))
    [row] = df.select(dl.alias("dl"), err.alias("err")).collect()
    return row["dl"], row["err"]


# ---------------------------------------------------------------------------
# P1 bakdata-Streams (StreamsDeadLetterParserTest.java)
# ---------------------------------------------------------------------------


def test_streams_happy_path(spark):
    dl, err = _run(spark, P.parse_streams, FX.streams_headers())
    assert err is None
    assert dl["partition"] == 1
    assert dl["topic"] == "my-topic"
    assert dl["offset"] == 10
    assert dl["description"] == "Could not process"
    assert dl["cause"]["error_class"] == "java.lang.RuntimeException"
    assert dl["cause"]["message"] == "boom"
    assert "Jdbi" not in dl["cause"]["stack_trace"]
    assert dl["input_value"] == "raw-value"
    assert dl["input_timestamp"] == TS.replace(tzinfo=None)


def test_streams_faulty_offset_fallback(spark):
    """Legacy header accepted when OFFSET absent
    (StreamsDeadLetterParserTest.java:173-189)."""
    hs = [h for h in FX.streams_headers() if h[0] != H.STREAMS_OFFSET]
    hs.append(FX.hdr(H.STREAMS_FAULTY_OFFSET, "99"))
    dl, err = _run(spark, P.parse_streams, hs)
    assert err is None
    assert dl["offset"] == 99


def test_streams_null_message_ok(spark):
    """EXCEPTION_MESSAGE key present with null value is legal
    (StreamsDeadLetterParserTest.java:191-197)."""
    dl, err = _run(spark, P.parse_streams, FX.streams_headers(message=None))
    assert err is None
    assert dl["cause"]["message"] is None


def test_streams_missing_required_headers(spark):
    for name in (
        H.STREAMS_PARTITION,
        H.STREAMS_TOPIC,
        H.STREAMS_OFFSET,
        H.STREAMS_DESCRIPTION,
        H.STREAMS_EXCEPTION_CLASS_NAME,
        H.STREAMS_EXCEPTION_MESSAGE,
        H.STREAMS_EXCEPTION_STACK_TRACE,
    ):
        hs = [h for h in FX.streams_headers() if h[0] != name]
        _, err = _run(spark, P.parse_streams, hs)
        assert err is not None, name
        assert err["error_class"] == "java.lang.IllegalArgumentException"
        assert err["message"] == f"Missing required header {name}"


def test_streams_null_value_numeric_headers(spark):
    """Present-but-null int/long headers fail with Cannot parse
    (StreamsDeadLetterParserTest.java:124-133, HeaderHelper.java:36-46)."""
    hs = FX.streams_headers(partition=None)
    _, err = _run(spark, P.parse_streams, hs)
    assert err["message"] == "Cannot parse int from null"

    hs = FX.streams_headers(offset=None)
    _, err = _run(spark, P.parse_streams, hs)
    assert err["message"] == "Cannot parse long from null"


def test_streams_null_string_header_is_missing(spark):
    """flatMap(stringValue) collapses null-valued string headers to missing
    (StreamsDeadLetterParser.java:53-55)."""
    hs = FX.streams_headers(topic=None)
    _, err = _run(spark, P.parse_streams, hs)
    assert err["message"] == f"Missing required header {H.STREAMS_TOPIC}"


def test_streams_unparseable_numeric(spark):
    _, err = _run(spark, P.parse_streams, FX.streams_headers(partition="abc"))
    assert err["error_class"] == "java.lang.NumberFormatException"
    assert err["message"] == 'For input string: "abc"'


def test_streams_error_order_first_wins(spark):
    """Partition is validated before topic (statement order,
    StreamsDeadLetterParser.java:50-55)."""
    hs = [
        h
        for h in FX.streams_headers()
        if h[0] not in (H.STREAMS_PARTITION, H.STREAMS_TOPIC)
    ]
    _, err = _run(spark, P.parse_streams, hs)
    assert err["message"] == f"Missing required header {H.STREAMS_PARTITION}"


def test_streams_duplicate_header_last_wins(spark):
    """HeaderHelper.java:54-56: lastHeader semantics."""
    hs = FX.streams_headers() + [FX.hdr(H.STREAMS_PARTITION, "7")]
    dl, err = _run(spark, P.parse_streams, hs)
    assert err is None
    assert dl["partition"] == 7


# ---------------------------------------------------------------------------
# P2 Connect (ConnectDeadLetterParserTest.java)
# ---------------------------------------------------------------------------


def test_connect_happy_path(spark):
    dl, err = _run(spark, P.parse_connect, FX.connect_headers())
    assert err is None
    assert dl["partition"] == 2
    assert dl["topic"] == "orig-topic"
    assert dl["offset"] == 20
    assert (
        dl["description"]
        == "Error in stage VALUE_CONVERTER (org.apache.kafka.connect.json.JsonConverter) in my-sink[0]"
    )
    assert dl["cause"]["error_class"] == "org.apache.kafka.connect.errors.DataException"


def test_connect_optional_context_headers_absent(spark):
    """topic/partition/offset optional — context headers may be disabled
    (ConnectDeadLetterParserTest.java:163-176)."""
    dl, err = _run(
        spark, P.parse_connect, FX.connect_headers(partition=None, topic=None, offset=None)
    )
    assert err is None
    assert dl["partition"] is None
    assert dl["topic"] is None
    assert dl["offset"] is None


def test_connect_missing_required(spark):
    for name in (
        H.CONNECT_STAGE,
        H.CONNECT_EXECUTING_CLASS,
        H.CONNECT_TASK_ID,
        H.CONNECT_CONNECTOR_NAME,
    ):
        hs = [h for h in FX.connect_headers() if h[0] != name]
        _, err = _run(spark, P.parse_connect, hs)
        assert err is not None
        assert err["message"] == f"Missing required header {name}"


def test_connect_optional_numeric_null_still_fails(spark):
    """Optional headers still throw on present-but-null numeric values
    (.map(intValue) runs, ConnectDeadLetterParser.java:50-55)."""
    hs = [
        FX.hdr(H.CONNECT_ORIG_PARTITION, None),
        *[h for h in FX.connect_headers(partition=None)],
    ]
    _, err = _run(spark, P.parse_connect, hs)
    assert err["message"] == "Cannot parse int from null"


# ---------------------------------------------------------------------------
# P3 Native Streams (NativeStreamsDeadLetterParserTest.java)
# ---------------------------------------------------------------------------


def test_native_happy_path(spark):
    dl, err = _run(spark, P.parse_native, FX.native_headers())
    assert err is None
    assert dl["partition"] == 3
    assert dl["offset"] == 30
    assert dl["description"] == "Error in processor node process-node in task 0_1"


def test_native_unknown_defaults(spark):
    """Absent node/task -> [unknown]
    (NativeStreamsDeadLetterParser.java:73-75)."""
    dl, err = _run(spark, P.parse_native, FX.native_headers(node=None, task=None))
    assert err is None
    assert dl["description"] == "Error in processor node [unknown] in task [unknown]"


def test_native_missing_required(spark):
    for name in (
        H.NATIVE_PARTITION,
        H.NATIVE_OFFSET,
        H.NATIVE_EXCEPTION,
        H.NATIVE_STACKTRACE,
    ):
        hs = [h for h in FX.native_headers() if h[0] != name]
        _, err = _run(spark, P.parse_native, hs)
        assert err is not None
        assert err["message"] == f"Missing required header {name}"


def test_native_optional_topic_message(spark):
    dl, err = _run(spark, P.parse_native, FX.native_headers(topic=None, message=None))
    assert err is None
    assert dl["topic"] is None
    assert dl["cause"]["message"] is None
