"""Local replica of the driver's t2 correctness gate: every declared query
must match its DuckDB oracle at a small scale factor — row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

# Default to the DRIVER'S gate scale (sf0.01): round 2's only red was a
# type leak visible only above sf0.001, so the local replica must run
# where the driver runs. Use the env to drop to sf0.001 for quick loops.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    # STRICT on decimals: raw str (no normalize) so scale/repr differences
    # fail locally exactly where the driver's value-hash would fail. The
    # declared surface should carry no DECIMAL at all (BIGINT scaled ints).
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _rowset(rows, cols):
    # driver sorts columns by name before hashing -> do the same
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: order-insensitive compare that tolerates None/mixed types
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows), key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), f"{name}: row count"
    s, d = _rowset(spark_rows, spark_cols), _rowset(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b][:5]
    assert s == d, f"{name}: value mismatch, first diffs: {mismatches}"


_BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL", "UINTEGER", "UBIGINT", "USMALLINT", "UTINYINT")


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_output_types_driver_safe(duck, name):
    """The driver's value-hash is TYPE-sensitive: DuckDB HUGEINT/DECIMAL/
    UINT* columns hash differently from Spark's BIGINT/DOUBLE even when
    every value is identical (round-1 DECIMAL reds, round-2 x_session_rows
    HUGEINT red). The value-compare above can't see this (Python ints
    compare equal), so pin the oracle's declared output types directly."""
    rows = duck.execute(f"DESCRIBE {entry_mod.oracle_sql()[name]}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in _BANNED_ORACLE_TYPES)
    ]
    assert not bad, (
        f"{name}: oracle output columns with driver-hash-unsafe types {bad}; "
        "CAST to BIGINT/DOUBLE in the oracle SQL"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_query_has_runnable_callable(spark):
    from pyspark.sql.types import DecimalType

    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        # The driver's value-hash mismatches on DECIMAL even when values are
        # bit-identical (round-1 verdict) — keep DECIMAL out of every
        # declared result surface (emit BIGINT scaled integers instead).
        dec_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, DecimalType)]
        assert not dec_cols, f"{name}: DECIMAL columns in declared surface: {dec_cols}"


_SPARK_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "tinyint": "i8",
    "double": "f64", "float": "f32", "string": "str", "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "date": "date",
    "binary": "bytes",
}
_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "TINYINT": "i8",
    "DOUBLE": "f64", "FLOAT": "f32", "REAL": "f32", "VARCHAR": "str",
    "BOOLEAN": "bool", "TIMESTAMP": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "DATE": "date", "BLOB": "bytes",
}


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_cross_engine_column_types_align(spark, duck, name):
    """The driver's value-hash is type-sensitive ACROSS engines too: a
    Spark INT next to a DuckDB BIGINT hash-mismatches on identical
    values, and the value-compare above cannot see it (Python ints
    compare equal). Canonicalize both schemas and require per-column
    equality — this is the local gate that would have predicted every
    type-only red of rounds 1-2 before the driver saw it."""
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    duck_rows = duck.execute(
        f"DESCRIBE {entry_mod.oracle_sql()[name]}"
    ).fetchall()
    duck_types = {col: typ for col, typ, *_ in duck_rows}
    assert sorted(spark_types) == sorted(duck_types), name
    mismatched = []
    for col, styp in spark_types.items():
        s_can = _SPARK_CANON.get(styp, styp)
        d_raw = duck_types[col].upper()
        d_can = _DUCK_CANON.get(d_raw, d_raw)
        if s_can != d_can:
            mismatched.append((col, styp, duck_types[col]))
    assert not mismatched, (
        f"{name}: cross-engine column type drift {mismatched}; align with "
        "explicit CASTs on both sides"
    )


def test_query_schemas_stable_across_scale_factors(spark):
    """The driver smoke-checks entry() for a stable schema; extend that
    to EVERY declared query: building the plan at two scale factors must
    give identical schemas (plan-only — no execution). A query whose
    schema depends on the data (e.g. a pivot without a fixed value list)
    would differ and break the driver's hash comparison unpredictably."""
    a_dir, b_dir = "/root/testdata/sf0.001", "/root/testdata/sf0.01"
    diffs = []
    for name, fn in entry_mod.queries().items():
        sa = fn(spark, a_dir).schema.simpleString()
        sb = fn(spark, b_dir).schema.simpleString()
        if sa != sb:
            diffs.append((name, sa, sb))
    assert not diffs, diffs
