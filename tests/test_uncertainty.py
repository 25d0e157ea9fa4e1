"""Unit tests for operators/uncertainty.py: multiplier bootstrap and
block jackknife — determinism, exactness of the replicate algebra, and
the statistical sanity of the derived stderr."""

from __future__ import annotations

import math

import pytest

from kafka_dead_letter_analyzer_spark.operators.uncertainty import (
    bootstrap_moments,
    jackknife_blocks,
)


def _docs(spark, values, group="s"):
    rows = [(group, i, v) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "src string, id long, v long")


def test_bootstrap_replicates_are_deterministic_and_exact(spark):
    import hashlib

    vals = [10, 20, 30, 40, 50]
    df = _docs(spark, vals)
    out = {
        r["b"]: r
        for r in bootstrap_moments(
            df, key="id", value_col="v", n_resamples=4
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3]
    # replicate the md5 draw locally: w = (u32(k:b:boot:) % 2) * 2
    for b in range(4):
        n_eff = sum_v = 0
        for i, v in enumerate(vals):
            h = hashlib.md5(f"{i}:{b}:boot:".encode()).hexdigest()[:8]
            w = (int(h, 16) % 2) * 2
            n_eff += w
            sum_v += w * v
        assert (out[b]["n_eff"], out[b]["sum_v"]) == (n_eff, sum_v), b


def test_bootstrap_mean_weight_is_one_in_expectation(spark):
    # across many resamples, sum(n_eff) ~ B * n (E[w] = 1)
    n, B = 200, 32
    df = _docs(spark, list(range(n)))
    out = bootstrap_moments(
        df, key="id", value_col="v", n_resamples=B
    ).collect()
    assert len(out) == B
    total_eff = sum(r["n_eff"] for r in out)
    assert abs(total_eff - B * n) < 4 * math.sqrt(B * n)  # 4 sigma


def test_bootstrap_stderr_tracks_truth(spark):
    # iid values with known variance: bootstrap stderr of the mean
    # should approximate sigma/sqrt(n) within a loose factor
    import random

    rng = random.Random(3)
    n = 400
    vals = [rng.randint(0, 100) for _ in range(n)]
    var = (sum(v * v for v in vals) / n) - (sum(vals) / n) ** 2
    truth = math.sqrt(var / n)
    df = _docs(spark, vals)
    out = bootstrap_moments(
        df, key="id", value_col="v", n_resamples=32
    ).collect()
    means = [r["sum_v"] / r["n_eff"] for r in out if r["n_eff"] > 0]
    mu = sum(means) / len(means)
    se = math.sqrt(sum((m - mu) ** 2 for m in means) / (len(means) - 1))
    assert 0.5 * truth < se < 2.0 * truth, (se, truth)


def test_bootstrap_guards_and_nulls(spark):
    df = spark.createDataFrame(
        [("s", 1, 5), ("s", 2, None)], "src string, id long, v long"
    )
    with pytest.raises(ValueError, match="n_resamples"):
        bootstrap_moments(df, key="id", value_col="v", n_resamples=0)
    out = bootstrap_moments(
        df, key="id", value_col="v", n_resamples=2
    ).collect()
    # the NULL row never contributes, even with weight 2
    assert all(r["sum_v"] in (0, 10) for r in out)


def test_jackknife_loo_identity_and_block_partition(spark):
    vals = list(range(1, 101))
    df = _docs(spark, vals)
    out = jackknife_blocks(
        df, key="id", value_col="v", n_blocks=8
    ).collect()
    tot_n, tot_sum = len(vals), sum(vals)
    assert sum(r["blk_n"] for r in out) == tot_n
    assert sum(r["blk_sum"] for r in out) == tot_sum
    for r in out:
        assert r["loo_n"] == tot_n - r["blk_n"]
        assert r["loo_sum"] == tot_sum - r["blk_sum"]


def test_jackknife_stderr_tracks_truth(spark):
    import random

    rng = random.Random(9)
    n = 400
    vals = [rng.randint(0, 100) for _ in range(n)]
    var = (sum(v * v for v in vals) / n) - (sum(vals) / n) ** 2
    truth = math.sqrt(var / n)
    df = _docs(spark, vals)
    out = jackknife_blocks(
        df, key="id", value_col="v", n_blocks=32
    ).collect()
    nb = len(out)
    loo_means = [r["loo_sum"] / r["loo_n"] for r in out]
    mu = sum(loo_means) / nb
    se = math.sqrt((nb - 1) / nb * sum((m - mu) ** 2 for m in loo_means))
    assert 0.5 * truth < se < 2.0 * truth, (se, truth)


def test_jackknife_grouped_and_guard(spark):
    rows = [("a", i, i) for i in range(50)] + [("b", i, 2 * i)
                                               for i in range(50)]
    df = spark.createDataFrame(rows, "src string, id long, v long")
    out = jackknife_blocks(
        df, key="id", value_col="v", group_cols=["src"], n_blocks=4
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["src"], []).append(r)
    assert sorted(by) == ["a", "b"]
    for g, rs in by.items():
        tot = sum(r["blk_sum"] for r in rs)
        for r in rs:
            assert r["loo_sum"] == tot - r["blk_sum"]
    with pytest.raises(ValueError, match="n_blocks"):
        jackknife_blocks(df, key="id", value_col="v", n_blocks=1)
