"""Application harness — the reference's CLI surface on Spark.

Reference startup path (SURVEY.md §3.1): picocli flags ``--brokers
--schema-registry-url --input-pattern --output-topic --extra-output-topics
stats=...,examples=... --error-topic`` -> build topology -> start
(DeadLetterAnalyzerApplication.java:43-71, README.md:32-41). This module
reproduces that surface:

- **streaming** (default): Kafka pattern source -> the streaming topology
  -> four Kafka sinks; the error topic must match the input pattern so the
  E3 loop closes through the broker. App id ``dead-letter-analyzer-<output
  topic>`` becomes the checkpoint namespace + query-name prefix, exactly
  the reference's app-id derivation (DeadLetterAnalyzerApplication.java:69-71).
- **batch**: the same topology over a RAW_ENVELOPE parquet directory,
  writing the four outputs as parquet — the harness this repo's driver and
  tests exercise.

``--schema-registry-url`` is accepted for CLI compatibility; Avro decode
engages only when spark-avro is on the classpath (documented divergence).
The large-message serde (claim-check pattern + bakdata byte-flag wire
protocol) lives in ``streaming/large_message.py`` — apply ``wire_decode``
after the S2 cascade when input topics carry large-message-encoded values.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field


@dataclass
class AnalyzerConfig:
    brokers: str | None = None
    input_pattern: str = ".*-dead-letters"
    output_topic: str = "analyzed"
    error_topic: str = "analyzer-dead-letters"
    extra_output_topics: dict[str, str] = field(default_factory=dict)
    checkpoint_dir: str = "/tmp/dead-letter-analyzer-checkpoints"
    batch_input: str | None = None
    batch_output: str | None = None
    schema_registry_url: str | None = None  # accepted, unused without spark-avro
    rocksdb_state_store: bool = False  # reference store choice (Topology.java:220-226)
    drift_report: bool = False  # batch: also write the per-key drift report

    @property
    def app_id(self) -> str:
        return f"dead-letter-analyzer-{self.output_topic}"

    @property
    def stats_topic(self) -> str:
        return self.extra_output_topics.get("stats", f"{self.output_topic}-stats")

    @property
    def examples_topic(self) -> str:
        return self.extra_output_topics.get(
            "examples", f"{self.output_topic}-examples"
        )


def parse_args(argv: list[str] | None = None) -> AnalyzerConfig:
    p = argparse.ArgumentParser(
        prog="kafka-dead-letter-analyzer-spark",
        description="Analyze dead letters from Kafka topics (streaming) or "
        "a RAW_ENVELOPE parquet directory (batch).",
    )
    p.add_argument("--brokers", help="Kafka bootstrap servers")
    p.add_argument("--input-pattern", default=".*-dead-letters")
    p.add_argument("--output-topic", default="analyzed")
    p.add_argument("--error-topic", default="analyzer-dead-letters")
    p.add_argument(
        "--extra-output-topics",
        default="",
        help="label=topic pairs, comma separated (labels: stats, examples)",
    )
    p.add_argument("--schema-registry-url")
    p.add_argument("--checkpoint-dir", default="/tmp/dead-letter-analyzer-checkpoints")
    p.add_argument("--batch-input", help="RAW_ENVELOPE parquet dir (batch mode)")
    p.add_argument("--batch-output", help="output dir for batch mode")
    p.add_argument(
        "--drift-report",
        action="store_true",
        help="batch mode: also write a per-(topic, type) drift report "
        "(CUSUM change-point, Theil-Sen trend, Mann-Kendall test, "
        "Hampel outlier days) over the normalized dead-letter feed",
    )
    p.add_argument(
        "--rocksdb-state-store",
        action="store_true",
        help="use the RocksDB streaming state store (the reference's store; "
        "recommended for large per-error-type state)",
    )
    a = p.parse_args(argv)

    extra = {}
    for pair in filter(None, a.extra_output_topics.split(",")):
        label, _, topic = pair.partition("=")
        extra[label.strip()] = topic.strip()
    return AnalyzerConfig(
        brokers=a.brokers,
        input_pattern=a.input_pattern,
        output_topic=a.output_topic,
        error_topic=a.error_topic,
        extra_output_topics=extra,
        checkpoint_dir=a.checkpoint_dir,
        batch_input=a.batch_input,
        batch_output=a.batch_output,
        drift_report=a.drift_report,
        schema_registry_url=a.schema_registry_url,
        rocksdb_state_store=a.rocksdb_state_store,
    )


def run_batch(spark, config: AnalyzerConfig) -> dict[str, str]:
    """Batch mode: RAW_ENVELOPE parquet in -> four parquet outputs.

    Output layout: ``<batch_output>/{full,stats,examples,errors}``.
    Returns the written paths.
    """
    from kafka_dead_letter_analyzer_spark.plans.topology import build_topology
    from kafka_dead_letter_analyzer_spark.schemas import RAW_ENVELOPE
    from kafka_dead_letter_analyzer_spark.sources.batch import _ensure_engine_confs

    _ensure_engine_confs(spark)
    raw = spark.read.schema(RAW_ENVELOPE).parquet(config.batch_input)
    out = build_topology(raw)
    paths = {}
    for name, df in (
        ("full", out.full_dead_letters),
        ("stats", out.error_statistics),
        ("examples", out.error_examples),
        ("errors", out.error_topic),
    ):
        path = f"{config.batch_output}/{name}"
        df.write.mode("overwrite").parquet(path)
        paths[name] = path
    if config.drift_report:
        from pyspark.sql import functions as F

        from kafka_dead_letter_analyzer_spark.functions.formatting import (
            TS_PATTERN,
        )
        from kafka_dead_letter_analyzer_spark.operators.drift import (
            _pick_report_bucket,
            dead_letter_drift_report,
        )

        # the full sink carries the reference's FORMATTED timestamp —
        # parse it back once for the detectors
        feed = spark.read.parquet(paths["full"]).withColumn(
            "event_ts", F.to_timestamp("timestamp", TS_PATTERN)
        )
        # hour buckets when the feed's span fits the pair operators'
        # cap, day otherwise (a long-retention feed must not raise)
        report = dead_letter_drift_report(
            feed, ts_col="event_ts", group_cols=["topic", "type"],
            bucket=_pick_report_bucket(feed, "event_ts"),
        )
        path = f"{config.batch_output}/drift"
        report.write.mode("overwrite").parquet(path)
        paths["drift"] = path
    return paths


def run_streaming(spark, config: AnalyzerConfig) -> list:
    """Streaming mode: start the four queries; returns their handles.

    The caller owns the lifecycle (``awaitAnyTermination`` for a service).
    """
    from kafka_dead_letter_analyzer_spark.streaming import (
        build_streaming_topology,
        read_dead_letter_stream,
    )
    from kafka_dead_letter_analyzer_spark.streaming.kafka import (
        write_stream_to_kafka,
    )

    raw = read_dead_letter_stream(spark, config.brokers, config.input_pattern)
    topo = build_streaming_topology(raw)
    ck = f"{config.checkpoint_dir}/{config.app_id}"
    return [
        write_stream_to_kafka(
            topo.full_dead_letters, config.brokers, config.output_topic,
            f"{ck}/full", "append", f"{config.app_id}-full",
        ),
        write_stream_to_kafka(
            topo.error_statistics, config.brokers, config.stats_topic,
            f"{ck}/stats", "update", f"{config.app_id}-stats",
        ),
        write_stream_to_kafka(
            topo.error_examples, config.brokers, config.examples_topic,
            f"{ck}/examples", "update", f"{config.app_id}-examples",
        ),
        write_stream_to_kafka(
            topo.error_topic, config.brokers, config.error_topic,
            f"{ck}/errors", "append", f"{config.app_id}-errors",
        ),
    ]


def main(argv: list[str] | None = None) -> None:
    from kafka_dead_letter_analyzer_spark.session import get_spark

    config = parse_args(argv)
    spark = get_spark(
        app_name=config.app_id, rocksdb_state_store=config.rocksdb_state_store or None
    )
    if config.batch_input:
        if not config.batch_output:
            raise SystemExit("--batch-output is required with --batch-input")
        paths = run_batch(spark, config)
        for name, path in paths.items():
            print(f"{name}: {path}")
    else:
        if not config.brokers:
            raise SystemExit("--brokers is required in streaming mode")
        queries = run_streaming(spark, config)
        spark.streams.awaitAnyTermination()
        for q in queries:
            q.stop()
