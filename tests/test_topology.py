"""End-to-end topology tests — mirrors DeadLetterAnalyzerTopologyTest.java's
eight scenarios (SURVEY.md §5 layer 2) on the batch dataflow."""

from __future__ import annotations

import datetime as dt

from kafka_dead_letter_analyzer_spark.functions import headers as H
from kafka_dead_letter_analyzer_spark.plans.topology import (
    build_topology,
    error_feedback_pass,
)
from kafka_dead_letter_analyzer_spark.sources import fixtures as FX

UTC = dt.timezone.utc
T0 = dt.datetime(2024, 3, 1, 10, 0, 0, tzinfo=UTC)
T1 = dt.datetime(2024, 3, 1, 10, 5, 0, tzinfo=UTC)

TRACE = (
    "java.lang.RuntimeException: boom\n"
    "\tat com.example.App.run(App.java:12)\n"
)
TYPE = "com.example.App.run(App.java:12)"


def _rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_avro_dialect_end_to_end(spark):
    """Avro-dialect record flows to the main output with derived keys
    (DeadLetterAnalyzerTopologyTest.java:131-195)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="app-dead-letters",
                partition=2,
                offset=17,
                timestamp=T0,
                key="k1",
                value_deadletter=FX.dead_letter_value(stack_trace=TRACE),
            )
        ],
    )
    out = build_topology(raw)

    [full] = _rows(out.full_dead_letters)
    assert full["kafka_key"] == "app-dead-letters+2+17"
    assert full["key"] == "k1"
    assert full["topic"] == "app-dead-letters"
    assert full["type"] == TYPE
    assert full["timestamp"] == "2024-03-01T10:00:00.000"
    assert full["dead_letter"]["description"] == "Error in map"

    [stats] = _rows(out.error_statistics)
    assert stats["kafka_key"] == f"app-dead-letters:{TYPE}"
    assert stats["count"] == 1
    assert stats["created"] == stats["updated"] == "2024-03-01T10:00:00.000"

    [ex] = _rows(out.error_examples)
    assert ex["kafka_key"] == f"app-dead-letters:{TYPE}"
    assert ex["example"]["key"] == "k1"
    assert ex["example"]["offset"] == 17

    assert out.error_topic.count() == 0  # happy path: error topic empty


def test_stats_accumulate_min_max(spark):
    """Two records, one key: count=2, created=min, updated=max
    (DeadLetterAnalyzerTopologyTest.java:197-253)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="t-dead-letters", offset=1, timestamp=T1, key="a",
                value_deadletter=FX.dead_letter_value(stack_trace=TRACE),
            ),
            FX.envelope(
                topic="t-dead-letters", offset=2, timestamp=T0, key="b",
                value_deadletter=FX.dead_letter_value(stack_trace=TRACE),
            ),
        ],
    )
    out = build_topology(raw)
    [stats] = _rows(out.error_statistics)
    assert stats["count"] == 2
    assert stats["created"] == "2024-03-01T10:00:00.000"
    assert stats["updated"] == "2024-03-01T10:05:00.000"


def test_first_example_only(spark):
    """Only the first (ts, offset)-ordered record becomes the example
    (DeadLetterAnalyzerTopologyTest.java:255-318; batch order refinement
    SURVEY.md §7.4)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="t-dead-letters", offset=5, timestamp=T1, key="late",
                value_deadletter=FX.dead_letter_value(stack_trace=TRACE),
            ),
            FX.envelope(
                topic="t-dead-letters", offset=3, timestamp=T0, key="early",
                value_deadletter=FX.dead_letter_value(stack_trace=TRACE),
            ),
        ],
    )
    out = build_topology(raw)
    [ex] = _rows(out.error_examples)
    assert ex["example"]["key"] == "early"
    assert ex["example"]["offset"] == 3


def test_self_analysis_of_internal_errors(spark):
    """A DeadLetter with null stack trace fails enrichment; the failure is
    itself a dead letter on the error topic, and a feedback pass analyzes it
    (DeadLetterAnalyzerTopologyTest.java:320-383)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="x-dead-letters", offset=9, key="bad",
                value_deadletter=FX.dead_letter_value(stack_trace=None),
            )
        ],
    )
    out = build_topology(raw)
    assert out.full_dead_letters.count() == 0

    [err] = _rows(out.error_topic)
    assert err["kafka_key"] == "bad"
    dl = err["dead_letter"]
    assert dl["description"] == "Error analyzing dead letter"
    assert dl["cause"]["error_class"] == "java.util.NoSuchElementException"
    assert dl["cause"]["message"] == "No value present"

    # E3: the error topic matches the input pattern -> re-analyzed
    out2 = error_feedback_pass(out)
    [full] = _rows(out2.full_dead_letters)
    assert full["type"] == "java.util.NoSuchElementException"
    assert out2.error_topic.count() == 0  # fixpoint after one pass


def test_streams_dialect_end_to_end(spark):
    """bakdata-header dialect e2e (DeadLetterAnalyzerTopologyTest.java:470-550)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="s-dead-letters", partition=0, offset=4, timestamp=T0,
                key="sk", value_text="original payload",
                headers=FX.streams_headers(stack_trace=TRACE),
            )
        ],
    )
    out = build_topology(raw)
    [full] = _rows(out.full_dead_letters)
    assert full["kafka_key"] == "s-dead-letters+0+4"
    assert full["dead_letter"]["input_value"] == "original payload"
    assert full["dead_letter"]["topic"] == "my-topic"  # origin, from headers
    assert full["topic"] == "s-dead-letters"  # consumer topic
    assert full["type"] == TYPE
    assert out.error_topic.count() == 0


def test_connect_dialect_end_to_end(spark):
    """Connect dialect e2e (DeadLetterAnalyzerTopologyTest.java:385-468)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="c-dead-letters", offset=1, timestamp=T0, key="ck",
                value_text="v", headers=FX.connect_headers(stack_trace=TRACE),
            )
        ],
    )
    out = build_topology(raw)
    [full] = _rows(out.full_dead_letters)
    assert full["type"] == TYPE
    assert full["dead_letter"]["description"].startswith("Error in stage")


def test_native_dialect_end_to_end(spark):
    """Native-Streams dialect e2e (DeadLetterAnalyzerTopologyTest.java:552-633)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="n-dead-letters", offset=2, timestamp=T0, key="nk",
                value_text="v", headers=FX.native_headers(stack_trace=TRACE),
            )
        ],
    )
    out = build_topology(raw)
    [full] = _rows(out.full_dead_letters)
    assert full["type"] == TYPE
    assert full["dead_letter"]["description"] == "Error in processor node process-node in task 0_1"


def test_parse_failure_routed_to_error_topic(spark):
    """Missing required header -> E2 dead letter on the error topic
    (streamHeaderDeadLetters wiring, DeadLetterAnalyzerTopology.java:126-137)."""
    hs = [h for h in FX.streams_headers() if h[0] != H.STREAMS_TOPIC]
    raw = FX.raw_frame(
        spark,
        [FX.envelope(topic="s-dead-letters", key="pk", value_text="vv", headers=hs)],
    )
    out = build_topology(raw)
    assert out.full_dead_letters.count() == 0
    [err] = _rows(out.error_topic)
    assert err["kafka_key"] == "pk"
    dl = err["dead_letter"]
    assert dl["description"] == "Error converting errors to dead letters"
    assert dl["cause"]["message"] == f"Missing required header {H.STREAMS_TOPIC}"
    assert dl["input_value"] == "vv"


def test_non_exclusive_dialect_routing(spark):
    """A record carrying two dialects' headers flows down BOTH branches
    (union of independent filters, SURVEY.md §2.2 note)."""
    raw = FX.raw_frame(
        spark,
        [
            FX.envelope(
                topic="m-dead-letters", offset=1, timestamp=T0, key="mk",
                value_text="v",
                headers=FX.streams_headers(stack_trace=TRACE)
                + FX.native_headers(stack_trace=TRACE),
            )
        ],
    )
    out = build_topology(raw)
    rows = _rows(out.full_dead_letters)
    assert len(rows) == 2
    descs = sorted(r["dead_letter"]["description"] for r in rows)
    assert descs[0] == "Could not process"
    assert descs[1] == "Error in processor node process-node in task 0_1"
    # stats see both as one (topic, type) key with count 2
    [stats] = _rows(out.error_statistics)
    assert stats["count"] == 2


def test_salted_stats_equal_plain_stats(spark):
    """The salted two-phase aggregation is bit-identical to the one-phase
    plan (count/min/max are associative)."""
    from kafka_dead_letter_analyzer_spark.operators.aggregate import (
        error_statistics,
        error_statistics_salted,
    )
    from kafka_dead_letter_analyzer_spark.plans.topology import build_topology
    import kafka_dead_letter_analyzer_spark.sources.fixtures as FX2

    rows = [
        FX2.envelope(offset=i, timestamp=None, value_deadletter=FX2.dead_letter_value())
        for i in range(50)
    ]
    enriched = build_topology(FX2.raw_frame(spark, rows)).enriched
    plain = {(r["topic"], r["type"]): (r["count"], r["created"], r["updated"])
             for r in error_statistics(enriched).collect()}
    salted = {(r["topic"], r["type"]): (r["count"], r["created"], r["updated"])
              for r in error_statistics_salted(enriched, salt_buckets=8).collect()}
    assert plain == salted and len(plain) == 1
