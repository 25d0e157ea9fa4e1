"""The stateful aggregation (operator A1): running stats + first example
per ``ErrorKey{topic, type}``.

Reference: ErrorAggregatingProcessor.java:38-102 — per key keep
``{count, created=min(ts), updated=max(ts)}`` over the *Context* timestamp
(:67-74), merging on every record (:51-57); emit the full example record only
for the key's **first** occurrence (:59-65, Result.java:39-41).

Spark mapping (SURVEY.md §2.8):
- stats: a plain ``groupBy(topic, type).agg(...)`` — Catalyst plans the
  hash-partition Exchange that the reference hand-builds as its repartition
  topic (R1, DeadLetterAnalyzerTopology.java:194-197), with map-side partial
  aggregation the reference doesn't have. At 100 TB this is the right shape:
  partial_count/min/max collapse each map partition to |keys| rows before
  the shuffle.
- first example: Kafka Streams "first" is *arrival order*, which is not a
  pure function of the data. Batch definition (documented refinement,
  SURVEY.md §7.4): first by ``(context.timestamp, context.offset)`` —
  deterministic, matches the reference tests' single-partition expectations.
  Implemented as ``min_by`` over a sortable ``(ts, offset)`` key rather than
  a window: one shuffle with partial aggregation instead of a full
  partition-sort, which matters at scale (no per-group sort, no skew
  amplification from big groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def error_statistics(enriched: DataFrame) -> DataFrame:
    """Final per-(topic, type) stats: count / created=min / updated=max.

    Batch emits finals; streaming runs the same plan in update mode
    (the reference emits per-record updates consumed as upserts,
    README.md:116 — last value per key is what downstream keeps).
    """
    return (
        enriched.groupBy(
            F.col("error_key.topic").alias("topic"),
            F.col("error_key.type").alias("type"),
        ).agg(
            F.count(F.lit(1)).cast("int").alias("count"),
            F.min("context.timestamp").alias("created"),
            F.max("context.timestamp").alias("updated"),
        )
    )


def first_examples(enriched: DataFrame) -> DataFrame:
    """First (ts, offset)-ordered record per (topic, type) — A1's example
    side (ErrorAggregatingProcessor.java:59-65).

    ``min_by`` with a struct ordering key keeps this a single partial-agg
    shuffle (no window sort).
    """
    order_key = F.struct(
        F.col("context.timestamp").alias("ts"), F.col("context.offset").alias("offset")
    )
    payload = F.struct(F.col("context").alias("context"), F.col("dead_letter").alias("dead_letter"))
    return (
        enriched.groupBy(
            F.col("error_key.topic").alias("topic"),
            F.col("error_key.type").alias("type"),
        )
        .agg(F.min_by(payload, order_key).alias("example"))
        .select(
            "topic",
            "type",
            F.col("example.context").alias("context"),
            F.col("example.dead_letter").alias("dead_letter"),
        )
    )


def error_statistics_salted(enriched: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """A1 stats with explicit key salting — the skew-mitigation variant.

    A single exploding error type (the realistic hot key: one bug storm)
    funnels every row through one reducer in the plain groupBy. Salting
    splits the hot key across ``salt_buckets`` partial aggregates and
    re-combines: count is summed; created/updated are min/max of partials
    (all three are associative, so the two-phase result is EXACTLY the
    one-phase result — verified by test against :func:`error_statistics`).

    AQE's skew handling covers joins but not aggregation hot keys; partial
    (map-side) aggregation usually absorbs them, but when one key's
    post-combine volume still dominates (many distinct map partitions, one
    reducer), this is the standard fix. Cost: one extra (tiny) shuffle over
    |keys| x salt_buckets rows.
    """
    salted = enriched.select(
        F.col("error_key.topic").alias("topic"),
        F.col("error_key.type").alias("type"),
        F.col("context.timestamp").alias("ts"),
        (F.spark_partition_id() % salt_buckets).alias("_salt"),
    )
    partial = salted.groupBy("topic", "type", "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.min("ts").alias("_min"),
        F.max("ts").alias("_max"),
    )
    return partial.groupBy("topic", "type").agg(
        F.sum("_cnt").cast("int").alias("count"),
        F.min("_min").alias("created"),
        F.max("_max").alias("updated"),
    )
