"""CLI harness tests: flag parsing (reference CLI surface parity) and the
batch-mode end-to-end run."""

from __future__ import annotations

import datetime as dt

from kafka_dead_letter_analyzer_spark.cli import AnalyzerConfig, parse_args, run_batch
from kafka_dead_letter_analyzer_spark.sources import fixtures as FX


def test_parse_args_reference_surface():
    cfg = parse_args(
        [
            "--brokers", "broker:9092",
            "--input-pattern", ".*-dl",
            "--output-topic", "out",
            "--error-topic", "out-dl",
            "--extra-output-topics", "stats=my-stats,examples=my-examples",
            "--schema-registry-url", "http://sr:8081",
        ]
    )
    assert cfg.brokers == "broker:9092"
    assert cfg.input_pattern == ".*-dl"
    assert cfg.app_id == "dead-letter-analyzer-out"
    assert cfg.stats_topic == "my-stats"
    assert cfg.examples_topic == "my-examples"
    assert cfg.error_topic == "out-dl"


def test_extra_topics_default_derivation():
    cfg = parse_args(["--output-topic", "analyzed"])
    assert cfg.stats_topic == "analyzed-stats"
    assert cfg.examples_topic == "analyzed-examples"


def test_batch_mode_end_to_end(spark, tmp_path):
    rows = [
        FX.envelope(offset=0, value_deadletter=FX.dead_letter_value()),
        FX.envelope(offset=1, key="bad",
                    value_deadletter=FX.dead_letter_value(stack_trace=None)),
    ]
    src = str(tmp_path / "raw")
    FX.raw_frame(spark, rows).write.parquet(src)

    cfg = AnalyzerConfig(batch_input=src, batch_output=str(tmp_path / "out"))
    paths = run_batch(spark, cfg)

    full = spark.read.parquet(paths["full"]).collect()
    assert len(full) == 1 and full[0]["kafka_key"] == "my-dead-letters+0+0"
    stats = spark.read.parquet(paths["stats"]).collect()
    assert len(stats) == 1 and stats[0]["count"] == 1
    examples = spark.read.parquet(paths["examples"]).collect()
    assert len(examples) == 1
    errors = spark.read.parquet(paths["errors"]).collect()
    assert len(errors) == 1
    assert errors[0]["dead_letter"]["description"] == "Error analyzing dead letter"


def test_batch_mode_drift_report(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    rows = [
        FX.envelope(offset=i,
                    timestamp=base + dt.timedelta(hours=i // 2),
                    value_deadletter=FX.dead_letter_value())
        for i in range(8)  # 2 dead letters per hour, 4 hours
    ]
    src = str(tmp_path / "raw_drift")
    FX.raw_frame(spark, rows).write.parquet(src)

    cfg = AnalyzerConfig(
        batch_input=src, batch_output=str(tmp_path / "out_drift"),
        drift_report=True,
    )
    paths = run_batch(spark, cfg)
    assert "drift" in paths
    report = spark.read.parquet(paths["drift"]).collect()
    assert len(report) == 1
    r = report[0]
    assert r["n"] == 8 and r["buckets"] == 4
    # perfectly steady rate: no level shift, flat robust trend,
    # Mann-Kendall S = 0, nothing Hampel-flagged
    assert r["up_ppm"] == 0 and r["down_ppm"] == 0
    assert r["slope_num"] == 0 and r["s_stat"] == 0
    assert r["flagged_buckets"] == 0
    # the flag defaults off: a plain batch run writes no drift dir
    cfg2 = AnalyzerConfig(
        batch_input=src, batch_output=str(tmp_path / "out_plain")
    )
    assert "drift" not in run_batch(spark, cfg2)
