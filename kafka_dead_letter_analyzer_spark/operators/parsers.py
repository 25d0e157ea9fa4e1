"""Per-dialect dead-letter normalizers (operators P1/P2/P3) and the dialect
routing predicates (F1/F2).

Reference: the three ``DeadLetterParser.convert`` implementations
(StreamsDeadLetterParser.java:49-89, ConnectDeadLetterParser.java:49-90,
NativeStreamsDeadLetterParser.java:47-86) and the header-presence routing
(DeadLetterAnalyzerTopology.java:164-180, HeaderFilter.java:56-64).

Each parser is a pure column-expression builder returning
``(dead_letter_struct, error_struct)``; errors reproduce the reference's
Optional-chain semantics exactly:

- required **string** header: *absent OR present-with-null-value* both yield
  ``Missing required header %s`` (``flatMap(stringValue)`` collapses null
  values to empty, StreamsDeadLetterParser.java:53-55);
- required **int/long** header: absent yields ``Missing required header``;
  present-with-null-value yields ``Cannot parse int/long from null``
  (``map(intValue)`` runs *before* orElseThrow, HeaderHelper.java:36-46);
  present-but-unparseable yields NumberFormatException
  (``Integer.parseInt``, HeaderHelper.java:38);
- **optional** int/long header (Connect topic/partition/offset): absent is
  fine, but present-with-null still throws (ConnectDeadLetterParser.java:50-55);
- errors are evaluated in the reference's statement order (first wins).

The four dialect branches are **independent filters**, not if/elif — a record
carrying two dialects' headers flows down both branches
(SURVEY.md §2.2 note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.functions import headers as H
from kafka_dead_letter_analyzer_spark.operators.errors import (
    ILLEGAL_ARGUMENT,
    NUMBER_FORMAT,
    first_error,
    raise_when,
)

# ---------------------------------------------------------------------------
# Field accessors with reference error semantics
# ---------------------------------------------------------------------------


def _missing(hmap: Column, name: str) -> Column:
    return raise_when(
        ~H.has_header(hmap, name), ILLEGAL_ARGUMENT, f"Missing required header {name}"
    )


def _req_string(hmap: Column, name: str) -> tuple[Column, Column]:
    """Required string: absent or null-valued -> missing-header error."""
    value = H.header_string(hmap, name)
    err = raise_when(
        value.isNull(), ILLEGAL_ARGUMENT, f"Missing required header {name}"
    )
    return value, err


def _numeric_parse_error(hmap: Column, name: str, kind: str) -> Column:
    """Present header that fails to produce an int/long.

    ``try_cast`` (NULL on malformed input, ANSI-safe) models
    Integer.parseInt's failure declaratively; the NumberFormatException is
    reconstructed as an error value instead of a thrown exception.
    """
    raw = H.header_string(hmap, name)
    cast = raw.try_cast("int" if kind == "int" else "long")
    return first_error(
        raise_when(
            H.has_header(hmap, name) & raw.isNull(),
            ILLEGAL_ARGUMENT,
            f"Cannot parse {kind} from null",
        ),
        raise_when(
            raw.isNotNull() & cast.isNull(),
            NUMBER_FORMAT,
            F.concat(F.lit('For input string: "'), raw, F.lit('"')),
        ),
    )


def _req_numeric(hmap: Column, name: str, kind: str) -> tuple[Column, Column]:
    value = H.header_string(hmap, name).try_cast("int" if kind == "int" else "long")
    err = first_error(_numeric_parse_error(hmap, name, kind), _missing(hmap, name))
    return value, err


def _opt_numeric(hmap: Column, name: str, kind: str) -> tuple[Column, Column]:
    value = H.header_string(hmap, name).try_cast("int" if kind == "int" else "long")
    return value, _numeric_parse_error(hmap, name, kind)


def _opt_string(hmap: Column, name: str) -> Column:
    return H.header_string(hmap, name)


def _dead_letter(
    input_value: Column,
    partition: Column,
    topic: Column,
    offset: Column,
    description: Column,
    error_class: Column,
    message: Column,
    stack_trace: Column,
    input_timestamp: Column,
) -> Column:
    """Assemble the normalized DeadLetter struct (SURVEY.md §1.4)."""
    return F.struct(
        input_value.cast("string").alias("input_value"),
        partition.cast("int").alias("partition"),
        topic.cast("string").alias("topic"),
        offset.cast("long").alias("offset"),
        description.cast("string").alias("description"),
        F.struct(
            error_class.cast("string").alias("error_class"),
            message.cast("string").alias("message"),
            stack_trace.cast("string").alias("stack_trace"),
        ).alias("cause"),
        input_timestamp.cast("timestamp").alias("input_timestamp"),
    )


# ---------------------------------------------------------------------------
# Routing predicates (F1 + F2)
# ---------------------------------------------------------------------------


def is_avro_dialect(value_deadletter: Column) -> Column:
    """F1: the deserialized value *is* a DeadLetter
    (DeadLetterAnalyzerTopology.java:98-100)."""
    return value_deadletter.isNotNull()


def is_streams_dialect(hmap: Column) -> Column:
    """F2: has the bakdata EXCEPTION_CLASS_NAME header
    (DeadLetterAnalyzerTopology.java:167-170)."""
    return H.has_header(hmap, H.STREAMS_EXCEPTION_CLASS_NAME)


def is_native_dialect(hmap: Column) -> Column:
    """F2: has the KIP-1034 HEADER_ERRORS_EXCEPTION_NAME header
    (DeadLetterAnalyzerTopology.java:171-175)."""
    return H.has_header(hmap, H.NATIVE_EXCEPTION)


def is_connect_dialect(hmap: Column) -> Column:
    """F2: has the Connect ERROR_HEADER_CONNECTOR_NAME header
    (DeadLetterAnalyzerTopology.java:176-180)."""
    return H.has_header(hmap, H.CONNECT_CONNECTOR_NAME)


# ---------------------------------------------------------------------------
# P1: bakdata-Streams header parser (StreamsDeadLetterParser.java:49-89)
# ---------------------------------------------------------------------------


def parse_streams(
    hmap: Column, value_text: Column, record_ts: Column
) -> tuple[Column, Column]:
    partition, partition_err = _req_numeric(hmap, H.STREAMS_PARTITION, "int")
    topic, topic_err = _req_string(hmap, H.STREAMS_TOPIC)
    # OFFSET with legacy faulty-header fallback
    # (StreamsDeadLetterParser.java:57-60): prefer OFFSET if *present*,
    # else the literal faulty header; missing-error names OFFSET.
    offset_present = H.has_header(hmap, H.STREAMS_OFFSET)
    offset_src = F.when(
        offset_present, H.header_string(hmap, H.STREAMS_OFFSET)
    ).otherwise(H.header_string(hmap, H.STREAMS_FAULTY_OFFSET))
    offset = offset_src.try_cast("long")
    offset_err = first_error(
        raise_when(
            (offset_present | H.has_header(hmap, H.STREAMS_FAULTY_OFFSET))
            & offset_src.isNull(),
            ILLEGAL_ARGUMENT,
            "Cannot parse long from null",
        ),
        raise_when(
            offset_src.isNotNull() & offset.isNull(),
            NUMBER_FORMAT,
            F.concat(F.lit('For input string: "'), offset_src, F.lit('"')),
        ),
        raise_when(
            ~offset_present & ~H.has_header(hmap, H.STREAMS_FAULTY_OFFSET),
            ILLEGAL_ARGUMENT,
            f"Missing required header {H.STREAMS_OFFSET}",
        ),
    )
    description, description_err = _req_string(hmap, H.STREAMS_DESCRIPTION)
    error_class, error_class_err = _req_string(hmap, H.STREAMS_EXCEPTION_CLASS_NAME)
    # EXCEPTION_MESSAGE: key must exist, value may be null
    # (StreamsDeadLetterParser.java:67-69)
    message = _opt_string(hmap, H.STREAMS_EXCEPTION_MESSAGE)
    message_err = _missing(hmap, H.STREAMS_EXCEPTION_MESSAGE)
    stack_trace, stack_trace_err = _req_string(hmap, H.STREAMS_EXCEPTION_STACK_TRACE)

    error = first_error(
        partition_err,
        topic_err,
        offset_err,
        description_err,
        error_class_err,
        message_err,
        stack_trace_err,
    )
    dead_letter = _dead_letter(
        input_value=value_text,
        partition=partition,
        topic=topic,
        offset=offset,
        description=description,
        error_class=error_class,
        message=message,
        stack_trace=stack_trace,
        input_timestamp=record_ts,
    )
    return dead_letter, error


# ---------------------------------------------------------------------------
# P2: Kafka Connect DLQ parser (ConnectDeadLetterParser.java:49-90)
# ---------------------------------------------------------------------------


def parse_connect(
    hmap: Column, value_text: Column, record_ts: Column
) -> tuple[Column, Column]:
    partition, partition_err = _opt_numeric(hmap, H.CONNECT_ORIG_PARTITION, "int")
    topic = _opt_string(hmap, H.CONNECT_ORIG_TOPIC)
    offset, offset_err = _opt_numeric(hmap, H.CONNECT_ORIG_OFFSET, "long")
    stage, stage_err = _req_string(hmap, H.CONNECT_STAGE)
    clazz, clazz_err = _req_string(hmap, H.CONNECT_EXECUTING_CLASS)
    error_class = _opt_string(hmap, H.CONNECT_EXCEPTION)
    task_id, task_id_err = _req_numeric(hmap, H.CONNECT_TASK_ID, "int")
    connector, connector_err = _req_string(hmap, H.CONNECT_CONNECTOR_NAME)
    message = _opt_string(hmap, H.CONNECT_EXCEPTION_MESSAGE)
    stack_trace = _opt_string(hmap, H.CONNECT_EXCEPTION_STACK_TRACE)

    error = first_error(
        partition_err, offset_err, stage_err, clazz_err, task_id_err, connector_err
    )
    description = F.format_string(
        "Error in stage %s (%s) in %s[%d]", stage, clazz, connector, task_id
    )
    dead_letter = _dead_letter(
        input_value=value_text,
        partition=partition,
        topic=topic,
        offset=offset,
        description=description,
        error_class=error_class,
        message=message,
        stack_trace=stack_trace,
        input_timestamp=record_ts,
    )
    return dead_letter, error


# ---------------------------------------------------------------------------
# P3: Native Streams DLQ parser, KIP-1034
# (NativeStreamsDeadLetterParser.java:47-86)
# ---------------------------------------------------------------------------


def parse_native(
    hmap: Column, value_text: Column, record_ts: Column
) -> tuple[Column, Column]:
    partition, partition_err = _req_numeric(hmap, H.NATIVE_PARTITION, "int")
    topic = _opt_string(hmap, H.NATIVE_TOPIC)
    offset, offset_err = _req_numeric(hmap, H.NATIVE_OFFSET, "long")
    node = _opt_string(hmap, H.NATIVE_PROCESSOR_NODE_ID)
    task = _opt_string(hmap, H.NATIVE_TASK_ID)
    error_class, error_class_err = _req_string(hmap, H.NATIVE_EXCEPTION)
    message = _opt_string(hmap, H.NATIVE_EXCEPTION_MESSAGE)
    stack_trace, stack_trace_err = _req_string(hmap, H.NATIVE_STACKTRACE)

    error = first_error(partition_err, offset_err, error_class_err, stack_trace_err)
    description = F.format_string(
        "Error in processor node %s in task %s",
        F.coalesce(node, F.lit("[unknown]")),
        F.coalesce(task, F.lit("[unknown]")),
    )
    dead_letter = _dead_letter(
        input_value=value_text,
        partition=partition,
        topic=topic,
        offset=offset,
        description=description,
        error_class=error_class,
        message=message,
        stack_trace=stack_trace,
        input_timestamp=record_ts,
    )
    return dead_letter, error
