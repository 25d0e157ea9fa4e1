"""Kafka edge: source decode (S1/S2) and sink encode (O1-O4).

Reference behavior being reproduced:

- S1 pattern subscription: the app consumes EVERY topic matching a regex
  (default ``.*-dead-letters``) as one merged stream
  (DeadLetterAnalyzerTopology.java:161-162, README.md:36,43). Spark:
  ``readStream.format("kafka").option("subscribePattern", ...)`` with
  ``includeHeaders=true`` — the source exposes topic/partition/offset/
  timestamp/headers as columns, which is exactly the metadata the
  reference's ContextEnricher pulls from RecordMetadata.
- S2 brute-force deserialization: per-record format auto-detection
  (BruteForceSerde, DeadLetterAnalyzerTopology.java:102-105): try
  Schema-Registry Avro, fall back to string/bytes. Spark equivalent: a
  ``coalesce`` cascade of parse attempts per record — Confluent-wire Avro
  (when the spark-avro package is on the classpath), then JSON, then the
  raw UTF-8 text. Parsing is per-record fallible-by-construction (null on
  miss), so no record can kill the query — same guarantee BruteForceSerde
  provides.

Sinks write ``kafka_key`` as the record key and the JSON rendering of the
sink struct as the value. (The reference writes Schema-Registry Avro; Avro
encode is applied instead when spark-avro is available — the claim-check
large-message wrapping is a documented non-goal, SURVEY.md §7.5.)

Everything here is a column program over the Kafka source's fixed schema —
each function also works on a *batch* DataFrame of the same shape, which is
how the unit tests exercise it without a broker.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.schemas import DEAD_LETTER

DEFAULT_INPUT_PATTERN = ".*-dead-letters"  # README.md:43

# ---------------------------------------------------------------------------
# Avro availability probe (spark-avro is an optional runtime package)
# ---------------------------------------------------------------------------


def _avro_usable(spark: SparkSession) -> bool:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401
    except ImportError:
        return False
    probe = spark.createDataFrame([(bytearray(b"\x02x"),)], "value binary")
    try:
        from pyspark.sql.avro.functions import from_avro

        probe.select(from_avro("value", '"string"')).collect()
        return True
    except Exception:
        return False


def _dead_letter_avro_schema() -> str:
    """The upstream DeadLetter Avro schema (bakdata error-handling-avro),
    reconstructed from the StructType (field set per SURVEY.md §1.4)."""

    def opt(t):  # nullable union
        return ["null", t]

    return json.dumps(
        {
            "type": "record",
            "name": "DeadLetter",
            "namespace": "com.bakdata.kafka",
            "fields": [
                {"name": "input_value", "type": opt("string"), "default": None},
                {"name": "partition", "type": opt("int"), "default": None},
                {"name": "topic", "type": opt("string"), "default": None},
                {"name": "offset", "type": opt("long"), "default": None},
                {"name": "description", "type": "string"},
                {
                    "name": "cause",
                    "type": {
                        "type": "record",
                        "name": "ErrorDescription",
                        "fields": [
                            {"name": "error_class", "type": opt("string"), "default": None},
                            {"name": "message", "type": opt("string"), "default": None},
                            {"name": "stack_trace", "type": opt("string"), "default": None},
                        ],
                    },
                },
                {
                    "name": "input_timestamp",
                    "type": opt({"type": "long", "logicalType": "timestamp-millis"}),
                    "default": None,
                },
            ],
        }
    )


# ---------------------------------------------------------------------------
# S2: the decode cascade, and the full Kafka-record -> RAW_ENVELOPE program
# ---------------------------------------------------------------------------


def _is_dead_letter(parsed: Column) -> Column:
    """F1's type test on a parse attempt: a struct only counts as a
    DeadLetter if its required fields materialized (description + cause,
    SURVEY.md §1.4) — guards against JSON that parses but isn't the shape."""
    return parsed.isNotNull() & parsed["description"].isNotNull() & parsed[
        "cause"
    ].isNotNull()


def decode_kafka_records(
    kafka_df: DataFrame, *, use_avro: bool | None = None
) -> DataFrame:
    """Kafka source rows -> RAW_ENVELOPE (S2 brute-force cascade).

    Input schema is the Kafka source's fixed shape: ``key binary,
    value binary, headers array<struct<key:string,value:binary>>, topic,
    partition, offset, timestamp``.

    Cascade per record (each attempt null on miss, never throwing):
    1. Confluent-wire Avro — magic byte 0x00 + 4-byte schema id + payload;
       ``substring(value, 6)`` + permissive ``from_avro``
       (only when spark-avro is loadable; SURVEY.md §2.1 S2).
    2. JSON object matching the DeadLetter shape (permissive ``from_json``).
    3. Raw UTF-8 text — always populated as ``value_text`` for parsers and
       ``input_value`` stringification (P5).
    """
    if use_avro is None:
        use_avro = _avro_usable(kafka_df.sparkSession)

    value_text = F.col("value").cast("string")
    # Two-step projection: each parse attempt is materialized ONCE in its
    # own Project; the validity predicate references it 3x and the value a
    # 4th time — inlined, the parse would re-run per reference
    # (subexpression elimination skips conditional branches).
    parse_cols = {"_json": F.from_json(value_text, DEAD_LETTER)}
    if use_avro:
        from pyspark.sql.avro.functions import from_avro

        wire_payload = F.expr("substring(value, 6, length(value) - 5)")
        is_wire = (F.length("value") > 5) & (
            F.expr("substring(value, 1, 1)") == F.lit(bytes([0]))
        )
        parse_cols["_avro"] = from_avro(
            F.when(is_wire, wire_payload),
            _dead_letter_avro_schema(),
            {"mode": "PERMISSIVE"},
        )

    parsed = kafka_df.select(
        "topic", "partition", "offset", "timestamp", "key", "headers",
        value_text.alias("value_text"),
        *[c.alias(name) for name, c in parse_cols.items()],
    )
    attempts = []
    if use_avro:
        attempts.append(F.when(_is_dead_letter(F.col("_avro")), F.col("_avro")))
    attempts.append(F.when(_is_dead_letter(F.col("_json")), F.col("_json")))

    return parsed.select(
        F.col("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("long").alias("offset"),
        F.col("timestamp"),
        F.col("key").cast("string").alias("key"),
        F.coalesce(*attempts).alias("value_deadletter"),
        F.col("value_text"),
        F.col("headers"),
    )


def read_dead_letter_stream(
    spark: SparkSession,
    brokers: str,
    input_pattern: str = DEFAULT_INPUT_PATTERN,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1: pattern-subscribe to every matching topic, headers included,
    decoded to RAW_ENVELOPE. Requires the spark-sql-kafka package."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribePattern", input_pattern)
        .option("includeHeaders", "true")
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
        .load()
    )
    return decode_kafka_records(raw)


# ---------------------------------------------------------------------------
# Sinks: kafka-record projection + writeStream wiring
# ---------------------------------------------------------------------------


def kafka_sink_projection(sink_df: DataFrame, key_col: str = "kafka_key") -> DataFrame:
    """Project a sink frame to the Kafka writer contract: ``key`` = the
    reference's derived document key (K1/K2/K4), ``value`` = JSON of the
    sink *record* (O1-O4 payloads).

    A payload of several columns is one record with those fields (O1-O3:
    FullDeadLetterWithContext / FullErrorStatistics / ErrorExample). A
    payload that is exactly ONE struct column — the error topic's bare
    DeadLetter (O4, to_error_topic) — is the record itself and is encoded
    UNWRAPPED: ``{"description": ...}``, not ``{"dead_letter": {...}}``.
    The reference serializes the DeadLetter record directly as the error
    topic value (DeadLetterAnalyzerTopology.java:107-111), and
    ``decode_kafka_records`` parses values against the top-level DeadLetter
    schema — wrapping would break the E3 broker feedback loop: re-consumed
    error-topic records would match no dialect and be dropped silently.
    """
    from pyspark.sql.types import StructType

    payload_cols = [c for c in sink_df.columns if c != key_col]
    payload_types = {f.name: f.dataType for f in sink_df.schema.fields}
    if len(payload_cols) == 1 and isinstance(payload_types[payload_cols[0]], StructType):
        value = F.to_json(F.col(payload_cols[0]))
    else:
        value = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    return sink_df.select(
        F.col(key_col).cast("string").alias("key"),
        value.alias("value"),
    )


def write_stream_to_kafka(
    sink_df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    query_name: str | None = None,
):
    """Start a Kafka writeStream for one output (O1-O4).

    The error topic (O4) must match the input pattern so failed records
    re-enter the analyzer — the E3 feedback loop closes through the broker
    (README.md:47-48), exactly like the reference.
    """
    return (
        kafka_sink_projection(sink_df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .queryName(query_name or f"dead-letter-analyzer-{topic}")
        .start()
    )
