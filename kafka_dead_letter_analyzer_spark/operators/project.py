"""Sink-shape projections (operators K1-K4, M1-M4).

Reference sites: DeadLetterAnalyzerTopology.java:143-157 with the shape
builders KeyedDeadLetterWithContext.java:38-54 (M1/K1), Result.java:39-51
(M2/M3), DeadLetterAnalyzerTopology.java:74-96 (K2/M4).

All pure projections; timestamps become pre-formatted strings at the sink
boundary only (Formatter.java:58-60 — engine-internal columns stay
TimestampType so min/max/windows keep native semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.functions.formatting import (
    elastic_document_key,
    format_timestamp,
    stats_key,
)


def to_full_dead_letters(enriched: DataFrame) -> DataFrame:
    """M1 + K1: the main output — every dead letter with context, keyed
    ``{topic}+{partition}+{offset}`` (KeyedDeadLetterWithContext.java:38-54,
    sink/FullDeadLetterWithContext.avsc:6-42)."""
    return enriched.select(
        elastic_document_key(
            F.col("error_key.topic"), F.col("context.partition"), F.col("context.offset")
        ).alias("kafka_key"),
        F.col("context.key").alias("key"),
        F.col("context.offset").alias("offset"),
        F.col("context.partition").alias("partition"),
        format_timestamp(F.col("context.timestamp")).alias("timestamp"),
        F.col("dead_letter").alias("dead_letter"),
        F.col("error_key.topic").alias("topic"),
        F.col("error_key.type").alias("type"),
    )


def to_full_error_statistics(stats: DataFrame) -> DataFrame:
    """M2 + K2: stats sink rows (Result.java:43-51,
    sink/FullErrorStatistics.avsc:6-32), keyed ``{topic}:{type}``."""
    return stats.select(
        stats_key(F.col("topic"), F.col("type")).alias("kafka_key"),
        F.col("count").cast("int").alias("count"),
        format_timestamp(F.col("created")).alias("created"),
        format_timestamp(F.col("updated")).alias("updated"),
        F.col("topic").alias("topic"),
        F.col("type").alias("type"),
    )


def to_error_examples(examples: DataFrame) -> DataFrame:
    """M3 + M4 + K2: first-example sink rows
    (DeadLetterAnalyzerTopology.java:78-96, sink/ErrorExample.avsc:6-22)."""
    example = F.struct(
        F.col("context.key").alias("key"),
        F.col("context.offset").alias("offset"),
        F.col("context.partition").alias("partition"),
        format_timestamp(F.col("context.timestamp")).alias("timestamp"),
        F.col("dead_letter").alias("dead_letter"),
    )
    return examples.select(
        stats_key(F.col("topic"), F.col("type")).alias("kafka_key"),
        example.alias("example"),
        F.col("topic").alias("topic"),
        F.col("type").alias("type"),
    )


def to_error_topic(err_dead_letters: DataFrame, key_col: str = "key") -> DataFrame:
    """K4 + O4: internal failures keyed by the stringified original key
    (DeadLetterAnalyzerTopology.java:107-111)."""
    return err_dead_letters.select(
        F.col(key_col).cast("string").alias("kafka_key"),
        F.col("dead_letter").alias("dead_letter"),
    )
