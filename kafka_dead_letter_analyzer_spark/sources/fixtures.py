"""In-memory ``dead_letters_raw`` fixture builder (FIXTURES.md §1-§3).

Replicates the record shapes the reference's e2e tests feed via
TestTopology (DeadLetterAnalyzerTopologyTest.java:719-736): rows of the
RAW_ENVELOPE schema with per-dialect header sets. Used by our pytest suite;
NOT used by the driver harness (which runs on the synthetic parquet tables).
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession

from kafka_dead_letter_analyzer_spark.functions import headers as H
from kafka_dead_letter_analyzer_spark.schemas import RAW_ENVELOPE

UTC = dt.timezone.utc


def hdr(key: str, value: str | None) -> tuple[str, bytes | None]:
    return (key, None if value is None else value.encode("utf-8"))


def streams_headers(
    partition: str = "1",
    topic: str = "my-topic",
    offset: str = "10",
    description: str = "Could not process",
    error_class: str = "java.lang.RuntimeException",
    message: str | None = "boom",
    stack_trace: str = "java.lang.RuntimeException: boom\n\tat com.example.App.run(App.java:12)\n",
) -> list[tuple[str, bytes | None]]:
    """Happy-path bakdata-Streams header set
    (DeadLetterAnalyzerTopologyTest.java:480-487)."""
    return [
        hdr(H.STREAMS_PARTITION, partition),
        hdr(H.STREAMS_TOPIC, topic),
        hdr(H.STREAMS_OFFSET, offset),
        hdr(H.STREAMS_DESCRIPTION, description),
        hdr(H.STREAMS_EXCEPTION_CLASS_NAME, error_class),
        hdr(H.STREAMS_EXCEPTION_MESSAGE, message),
        hdr(H.STREAMS_EXCEPTION_STACK_TRACE, stack_trace),
    ]


def connect_headers(
    partition: str | None = "2",
    topic: str | None = "orig-topic",
    offset: str | None = "20",
    stage: str = "VALUE_CONVERTER",
    executing_class: str = "org.apache.kafka.connect.json.JsonConverter",
    task_id: str = "0",
    connector: str = "my-sink",
    error_class: str | None = "org.apache.kafka.connect.errors.DataException",
    message: str | None = "bad json",
    stack_trace: str | None = "org.apache.kafka.connect.errors.DataException: bad json\n\tat org.example.Conv.apply(Conv.java:7)\n",
) -> list[tuple[str, bytes | None]]:
    """Happy-path Connect DLQ header set
    (DeadLetterAnalyzerTopologyTest.java:394-404)."""
    out = []
    if partition is not None:
        out.append(hdr(H.CONNECT_ORIG_PARTITION, partition))
    if topic is not None:
        out.append(hdr(H.CONNECT_ORIG_TOPIC, topic))
    if offset is not None:
        out.append(hdr(H.CONNECT_ORIG_OFFSET, offset))
    out += [
        hdr(H.CONNECT_STAGE, stage),
        hdr(H.CONNECT_EXECUTING_CLASS, executing_class),
        hdr(H.CONNECT_TASK_ID, task_id),
        hdr(H.CONNECT_CONNECTOR_NAME, connector),
    ]
    if error_class is not None:
        out.append(hdr(H.CONNECT_EXCEPTION, error_class))
    if message is not None:
        out.append(hdr(H.CONNECT_EXCEPTION_MESSAGE, message))
    if stack_trace is not None:
        out.append(hdr(H.CONNECT_EXCEPTION_STACK_TRACE, stack_trace))
    return out


def native_headers(
    partition: str = "3",
    topic: str | None = "native-topic",
    offset: str = "30",
    node: str | None = "process-node",
    task: str | None = "0_1",
    error_class: str = "java.lang.IllegalStateException",
    message: str | None = "illegal",
    stack_trace: str = "java.lang.IllegalStateException: illegal\n\tat org.example.Proc.process(Proc.java:42)\n",
) -> list[tuple[str, bytes | None]]:
    """Happy-path native-Streams (KIP-1034) header set
    (DeadLetterAnalyzerTopologyTest.java:562-570)."""
    out = [
        hdr(H.NATIVE_PARTITION, partition),
        hdr(H.NATIVE_OFFSET, offset),
        hdr(H.NATIVE_EXCEPTION, error_class),
        hdr(H.NATIVE_STACKTRACE, stack_trace),
    ]
    if topic is not None:
        out.append(hdr(H.NATIVE_TOPIC, topic))
    if node is not None:
        out.append(hdr(H.NATIVE_PROCESSOR_NODE_ID, node))
    if task is not None:
        out.append(hdr(H.NATIVE_TASK_ID, task))
    return out


def dead_letter_value(
    input_value: str | None = "failed-value",
    partition: int | None = 0,
    topic: str | None = "source-topic",
    offset: int | None = 5,
    description: str = "Error in map",
    error_class: str | None = "java.lang.RuntimeException",
    message: str | None = "boom",
    stack_trace: str | None = "java.lang.RuntimeException: boom\n\tat com.example.App.run(App.java:12)\n",
    input_timestamp: dt.datetime | None = None,
) -> dict[str, Any]:
    """An Avro-dialect value: the record IS a DeadLetter (F1)."""
    return {
        "input_value": input_value,
        "partition": partition,
        "topic": topic,
        "offset": offset,
        "description": description,
        "cause": {
            "error_class": error_class,
            "message": message,
            "stack_trace": stack_trace,
        },
        "input_timestamp": input_timestamp,
    }


def envelope(
    topic: str = "my-dead-letters",
    partition: int = 0,
    offset: int = 0,
    timestamp: dt.datetime | None = None,
    key: str | None = "k0",
    value_deadletter: dict[str, Any] | None = None,
    value_text: str | None = None,
    headers: Iterable[tuple[str, bytes | None]] | None = None,
) -> dict[str, Any]:
    return {
        "topic": topic,
        "partition": partition,
        "offset": offset,
        "timestamp": timestamp or dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=UTC),
        "key": key,
        "value_deadletter": value_deadletter,
        "value_text": value_text,
        "headers": list(headers) if headers is not None else None,
    }


def raw_frame(spark: SparkSession, rows: Iterable[dict[str, Any]]) -> DataFrame:
    return spark.createDataFrame(list(rows), schema=RAW_ENVELOPE)
