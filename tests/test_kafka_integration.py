"""Kafka integration path (requires a real broker + spark-sql-kafka).

Skipped unless KDLA_KAFKA_BROKERS is set — this container has neither the
Kafka connector jar nor a broker. The column programs these queries run are
fully covered broker-free in test_streaming.py; what this adds on real
infrastructure is the source/sink round trip and the E3 broker loop.

Run against a live stack with:

    KDLA_KAFKA_BROKERS=localhost:9092 pytest tests/test_kafka_integration.py
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BROKERS = os.environ.get("KDLA_KAFKA_BROKERS")

pytestmark = pytest.mark.skipif(
    not BROKERS, reason="set KDLA_KAFKA_BROKERS to run Kafka integration tests"
)


def test_end_to_end_via_broker(spark, tmp_path):
    from kafka_dead_letter_analyzer_spark.sources.fixtures import dead_letter_value
    from kafka_dead_letter_analyzer_spark.streaming import (
        build_streaming_topology,
        read_dead_letter_stream,
    )
    from kafka_dead_letter_analyzer_spark.streaming.kafka import (
        write_stream_to_kafka,
    )

    run_id = uuid.uuid4().hex[:8]
    in_topic = f"it-{run_id}-dead-letters"

    # produce one JSON dead letter
    (
        spark.createDataFrame(
            [("k0", json.dumps(dead_letter_value()))], "key string, value string"
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("topic", in_topic)
        .save()
    )

    raw = read_dead_letter_stream(
        spark, BROKERS, input_pattern=f"it-{run_id}-.*-dead-letters|{in_topic}"
    )
    topo = build_streaming_topology(raw)
    q = write_stream_to_kafka(
        topo.full_dead_letters,
        BROKERS,
        f"it-{run_id}-analyzed",
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BROKERS)
        .option("subscribe", f"it-{run_id}-analyzed")
        .option("startingOffsets", "earliest")
        .load()
    )
    rows = out.selectExpr("CAST(value AS STRING) v").collect()
    assert len(rows) == 1
    payload = json.loads(rows[0]["v"])
    assert payload["type"] == "com.example.App.run(App.java:12)"
