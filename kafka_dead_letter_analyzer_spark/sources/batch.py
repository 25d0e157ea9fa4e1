"""Batch parquet sources for the driver's synthetic tables (TESTDATA.md).

In batch mode "topics" are tables (SURVEY.md §1.1); the S1
pattern-subscription scan maps to reading each matching table and unioning
(done by callers). Filters/projections on these readers push down to the
parquet scan — verify with ``.explain("formatted")`` (PushedFilters /
ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_engine_confs(spark: SparkSession) -> None:
    """Apply the engine's runtime-settable SQL confs defensively.

    The driver harness may hand us a SparkSession built without
    session.py's defaults; without these, reading events.parquet
    (TIMESTAMP NANOS) throws PARQUET_TYPE_ILLEGAL, header-map collapse
    loses last-wins semantics, and sink timestamp strings follow the host
    zone instead of UTC. All three are runtime-settable; setting them is
    idempotent and free."""
    for key, value in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.mapKeyDedupPolicy", "LAST_WIN"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # conf removed/renamed in a future version: proceed


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS): read as long ns (legacy conf in
    # session.py) and truncate to micros with integer division — float math
    # would lose precision at 1.7e18 ns. DuckDB's TIMESTAMP_NS formats to the
    # same millisecond strings, so oracles agree.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
