"""_memo_plan (optimization r14): the generic built-plan memo behind
x_drift_report / x_kendall_price_quantized / x_rate_autocorr /
x_leadlag_purchase_error / x_dedup_agreement / x_contamination_prefiltered.

Contract under test: (1) a memo hit returns the SAME plan and re-arms
the chain's internal persists after a release_all()/clearCache()
boundary, with forced actions recomputing from parquet (bit-equal
repeat results); (2) rewriting an input parquet BUSTS the memo — no
stale rows can ever be served off a changed file."""

from __future__ import annotations

import pytest
from pyspark import StorageLevel
from pyspark.sql import functions as F


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(path))


@pytest.fixture()
def sf_dir(spark, tmp_path):
    _write_docs(
        spark,
        tmp_path / "documents.parquet",
        [(i, f"doc number {i}") for i in range(10)],
    )
    return str(tmp_path)


def test_memo_hit_rearms_persists_and_repeats_bit_equal(spark, sf_dir):
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.queries import _memo_plan

    builds = []

    def build():
        base = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .groupBy((F.col("doc_id") % 2).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        cache_registry.track(base)
        builds.append(base)
        return base.select("k", "n")

    out1 = _memo_plan(spark, sf_dir, "t_memo", ["documents"], build)
    r1 = sorted(map(tuple, out1.collect()))
    assert len(builds) == 1

    # consumption boundary: unpersist everything (what bench.py does)
    cache_registry.release_all()
    spark.catalog.clearCache()
    assert builds[0].storageLevel == StorageLevel.NONE

    out2 = _memo_plan(spark, sf_dir, "t_memo", ["documents"], build)
    assert len(builds) == 1  # memo hit: no rebuild (a fresh thin
    # projection is returned so explain/planning reflect current
    # cache state, but the memoized plan underneath is reused)
    # the internal persist was re-armed on the hit
    assert builds[0].storageLevel != StorageLevel.NONE
    assert sorted(map(tuple, out2.collect())) == r1


def test_memo_busts_on_input_rewrite(spark, sf_dir):
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.queries import _memo_plan

    def build():
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )

    n1 = _memo_plan(spark, sf_dir, "t_bust", ["documents"], build).collect()[
        0
    ]["n"]
    assert n1 == 10

    _write_docs(
        spark,
        f"{sf_dir}/documents.parquet",
        [(i, f"doc number {i}") for i in range(25)],
    )
    cache_registry.release_all()
    spark.catalog.clearCache()
    n2 = _memo_plan(spark, sf_dir, "t_bust", ["documents"], build).collect()[
        0
    ]["n"]
    assert n2 == 25  # fresh key -> fresh build, never a stale result


def test_nested_memo_rearms_even_when_build_saw_armed_chain(spark):
    """Composition hazard (r14): if an outer memo's build runs while a
    NESTED memoized chain is already armed, the registry snapshot diff
    misses the nested frames — the outer query must re-arm the nested
    memo explicitly so a post-release_all hit keeps the single-scan
    plan contract (x_ndcg_at_k over _bm25_int_rankers)."""
    import contextlib
    import io
    import re

    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    # adversarial ordering: arm the ranker chain FIRST
    Q._bm25_int_rankers(spark, sf)
    Q.queries()["x_ndcg_at_k"](spark, sf).collect()
    cache_registry.release_all()
    spark.catalog.clearCache()
    df = Q.queries()["x_ndcg_at_k"](spark, sf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    scans = len(set(re.findall(r"\((\d+)\) Scan parquet", buf.getvalue())))
    assert scans == 1, scans
    cache_registry.release_all()
    spark.catalog.clearCache()
