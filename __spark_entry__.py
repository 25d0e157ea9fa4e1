"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Query implementations live in ``kafka_dead_letter_analyzer_spark.queries``;
this file is the thin contract surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_dead_letter_analyzer_spark import queries as Q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's raison d'être (SURVEY.md §7.2): per-key
    error statistics (A1 + M2 + K2 + N3).
    """
    return Q.a1_error_stats(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalent for each query (column names identical)."""
    return Q.oracle_sql()
