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


def _nanos_timestamp_columns(path: str) -> set[str]:
    """Columns whose PARQUET logical type is timestamp[ns] — the ones the
    nanosAsLong legacy conf surfaces as bigint nanoseconds in Spark. Read
    from the parquet footer so the detection follows the writer, not a
    hardcoded column list (the driver regenerates the tables per round
    and has already changed physical timestamp types twice)."""
    try:
        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            # Spark-written dataset directory: any one part file's footer
            # carries the schema
            parts = sorted(
                p
                for p in os.listdir(path)
                if p.endswith(".parquet") and not p.startswith("_")
            )
            if not parts:
                return set()
            target = os.path.join(path, parts[0])
        return {
            f.name
            for f in pq.read_schema(target)
            if str(f.type).startswith("timestamp[ns")
        }
    except Exception:
        # pyarrow unavailable or unreadable footer: fall back to the
        # pre-footer heuristic (the known NANOS case) rather than
        # silently skipping normalization
        return {"ts"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_engine_confs(spark)
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    nanos_cols = _nanos_timestamp_columns(path)
    # Timestamp normalization: the driver regenerates the synthetic tables
    # per round and the parquet writer's physical timestamp type has varied
    # (TIMESTAMP(NANOS) in round 2; TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # -> TIMESTAMP_NTZ in round 3). The engine's contract is one session-zone
    # TimestampType (UTC, set above) everywhere — half the temporal surface
    # (unix_micros, session_window, lag over micros) requires it, and the
    # DuckDB oracle's naive timestamps carry the same UTC wall values.
    for col_name, dtype in df.dtypes:
        if col_name in nanos_cols and dtype == "bigint":
            # NANOS read as long ns (legacy conf): truncate to micros with
            # integer division — float math would lose precision at 1.7e18.
            df = df.withColumn(
                col_name,
                F.timestamp_micros(F.expr(f"`{col_name}` div 1000")),
            )
        elif dtype == "timestamp_ntz":
            # naive UTC wall time -> session-zone timestamp; with the session
            # pinned to UTC this changes the type, not the instant.
            df = df.withColumn(col_name, F.col(col_name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL surface."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
