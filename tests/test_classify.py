"""N2 golden cases — mirrors StackTraceClassifierTest.java:36-74."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.functions.classify import classify_stack_trace

# The reference's shared fixture (StackTraceClassifierTest.java:36-56):
# a realistic multi-frame trace whose first \tat frame is Jdbi.open.
JDBI_TRACE = (
    "org.jdbi.v3.core.ConnectionException: java.sql.SQLTransientConnectionException: "
    "HikariPool-1 - Connection is not available, request timed out after 30000ms.\n"
    "\tat org.jdbi.v3.core.Jdbi.open(Jdbi.java:319)\n"
    "\tat org.jdbi.v3.core.Jdbi.withHandle(Jdbi.java:341)\n"
    "Caused by: java.sql.SQLTransientConnectionException: HikariPool-1\n"
    "\tat com.zaxxer.hikari.pool.HikariPool.createTimeoutException(HikariPool.java:696)\n"
)

REPORTING_LINE = (
    "io.confluent.connect.elasticsearch.ElasticsearchClient$ReportingException: "
    "Indexing failed: mapper_parsing_exception"
)


@pytest.mark.parametrize(
    ("stack_trace", "expected"),
    [
        # first \tat frame wins
        (JDBI_TRACE, "org.jdbi.v3.core.Jdbi.open(Jdbi.java:319)"),
        # no frames -> exception class from first line (incl. $ nesting)
        (
            REPORTING_LINE,
            "io.confluent.connect.elasticsearch.ElasticsearchClient$ReportingException",
        ),
        # bare exception line with trailing newline
        ("java.lang.NullPointerException\n", "java.lang.NullPointerException"),
        # nothing regex-able -> whole first line
        ("!!not a trace!! with spaces\nsecond line", "!!not a trace!! with spaces"),
    ],
)
def test_classify_golden(spark, stack_trace, expected):
    df = spark.createDataFrame([(stack_trace,)], "st: string")
    [row] = df.select(classify_stack_trace("st").alias("type")).collect()
    assert row["type"] == expected


def test_classify_null_is_null(spark):
    df = spark.createDataFrame([(None,)], "st: string")
    [row] = df.select(classify_stack_trace("st").alias("type")).collect()
    assert row["type"] is None


def test_classify_matches_duckdb_oracle(spark):
    """The SQL rendering used for driver oracles agrees with the Spark expr."""
    import duckdb

    from kafka_dead_letter_analyzer_spark.functions.classify import (
        classify_stack_trace_sql,
    )

    cases = [JDBI_TRACE, REPORTING_LINE, "java.lang.NullPointerException\n", "plain text"]
    df = spark.createDataFrame([(c,) for c in cases], "st: string")
    got_spark = [
        r["type"] for r in df.select(classify_stack_trace("st").alias("type")).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"select {classify_stack_trace_sql('st')} from (select ? as st)", [c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got_spark == got_duck
