"""Unit tests for operators/drift.py: CUSUM change-point and TVD drift.

The differential reference for cusum is a pure-Python O(B) walk over the
FULL bucket timeline (empty buckets included) — the operator's claim is
that its contraction-only windows (pre/post values at nonempty buckets)
attain exactly the same extreme deviations, so the two must agree bit
for bit on every generated input.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.drift import (
    cusum_changepoint,
    tvd_drift,
)

HOUR_US = 3_600_000_000
EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _ts(hours: float) -> dt.datetime:
    return EPOCH + dt.timedelta(hours=hours)


def _events(spark, hours, group="g"):
    """One event per entry of `hours` (fractional = inside the bucket)."""
    rows = [(group, _ts(h)) for h in hours]
    return spark.createDataFrame(rows, "grp string, ts timestamp")


def _ppm2(num: int, nt: int) -> int:
    d1 = (num * 1000) // nt
    d2 = ((num * 1000) % nt) * 1000 // nt
    return d1 * 1000 + d2


def _brute_cusum(hours):
    """O(B) reference over the full hour-bucket timeline."""
    buckets = sorted({int(h) for h in hours})
    lo = buckets[0]
    B = buckets[-1] - lo + 1
    counts = {int(h) - lo: 0 for h in hours}
    for h in hours:
        counts[int(h) - lo] = counts.get(int(h) - lo, 0) + 1
    total = len(hours)
    s_prev, run_min, run_max = 0, 0, 0
    up_best = (-1, None)  # (deviation, bucket index) earliest-tie
    down_best = (-1, None)
    p = 0
    for t in range(1, B + 1):
        x = counts.get(t - 1, 0)
        pre = p * B - (t - 1) * total  # S just before bucket t's mass
        run_min = min(run_min, pre)
        run_max = max(run_max, pre)
        p += x
        s = p * B - t * total
        if x > 0:  # peaks live at nonempty post-values
            d_up = s - run_min
            if d_up > up_best[0]:
                up_best = (d_up, t - 1)
            # troughs live at pre-values of nonempty buckets (+ final S)
            d_dn = run_max - pre
            if t == B:
                d_dn = max(d_dn, max(run_max, s) - s)
            if d_dn > down_best[0]:
                down_best = (d_dn, t - 1)
        run_max = max(run_max, s)
    n_buckets = B
    return {
        "n": total,
        "buckets": n_buckets,
        "up_ppm": _ppm2(up_best[0], total * n_buckets),
        "up_bucket": up_best[1] + lo,
        "down_ppm": _ppm2(down_best[0], total * n_buckets),
        "down_bucket": down_best[1] + lo,
    }


def _run_cusum(spark, hours):
    df = _events(spark, hours)
    out = cusum_changepoint(
        df, ts_col="ts", group_cols=["grp"], bucket="hour"
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    r["up_bucket"] = int(
        (r["up_cp_ts"].replace(tzinfo=dt.timezone.utc) - EPOCH)
        .total_seconds() // 3600
    )
    r["down_bucket"] = int(
        (r["down_cp_ts"].replace(tzinfo=dt.timezone.utc) - EPOCH)
        .total_seconds() // 3600
    )
    return r


CASES = [
    # single bucket: S == 0 everywhere, 0/0 deviations
    [0.1, 0.2, 0.9],
    # perfectly steady rate: zero deviation, earliest-bucket ties
    [0.5, 1.5, 2.5, 3.5],
    # step up: 1/bucket for 4 buckets then 4/bucket for 2
    [0.1, 1.1, 2.1, 3.1, 4.1, 4.2, 4.3, 4.4, 5.1, 5.2, 5.3, 5.4],
    # step down (outage): dense then sparse
    [0.1, 0.2, 0.3, 0.4, 1.1, 1.2, 1.3, 1.4, 2.5, 5.5],
    # long empty stretch in the middle (running min inside the gap)
    [0.1, 0.2, 10.5, 10.6, 10.7],
    # empty tail never happens (last bucket nonempty by construction),
    # but a final under-running bucket exercises the is_last branch
    [0.1, 0.2, 0.3, 1.1, 1.2, 1.3, 7.9],
    # burst in the middle
    [0.5, 3.1, 3.2, 3.3, 3.4, 3.5, 6.5],
]


@pytest.mark.parametrize("hours", CASES, ids=range(len(CASES)))
def test_cusum_matches_full_timeline_reference(spark, hours):
    got = _run_cusum(spark, hours)
    want = _brute_cusum(hours)
    for k in ("n", "buckets", "up_ppm", "down_ppm", "up_bucket",
              "down_bucket"):
        assert got[k] == want[k], (k, got, want)


def test_cusum_randomized_against_reference(spark):
    import random

    rng = random.Random(0xD21F7)
    for trial in range(12):
        B = rng.randint(1, 12)
        hours = []
        for b in range(B):
            for i in range(rng.randint(0, 5)):
                hours.append(b + (i + 1) / 10)
        if not hours:
            hours = [0.5]
        # ensure first/last buckets nonempty so B matches the span
        hours.append(0.05)
        hours.append(B - 1 + 0.95)
        got = _run_cusum(spark, hours)
        want = _brute_cusum(hours)
        for k in ("n", "buckets", "up_ppm", "down_ppm", "up_bucket",
                  "down_bucket"):
            assert got[k] == want[k], (trial, k, got, want, sorted(hours))


def test_cusum_step_up_locates_the_step(spark):
    # 1/bucket for 5 buckets, then 10/bucket for 5.  S traces a V:
    # the DOWNWARD statistic peaks exactly at the regime change (the
    # trough just before the first dense bucket), the UPWARD one at the
    # recovery end — and for a single clean step the two deviations are
    # EQUAL (both measure the same 225/550 mass displacement).
    hours = [b + 0.5 for b in range(5)]
    hours += [b + (i + 1) / 20 for b in range(5, 10) for i in range(10)]
    got = _run_cusum(spark, hours)
    assert got["down_bucket"] == 5  # the step location
    assert got["up_bucket"] == 9
    assert got["up_ppm"] == got["down_ppm"] == _ppm2(225, 55 * 10)


def test_cusum_groups_are_independent(spark):
    a = [0.1, 1.1, 2.1]
    b = [0.5, 0.6, 0.7, 5.5]
    df = _events(spark, a, "a").unionByName(_events(spark, b, "b"))
    out = {
        r["grp"]: r.asDict()
        for r in cusum_changepoint(
            df, ts_col="ts", group_cols=["grp"], bucket="hour"
        ).collect()
    }
    assert out["a"]["n"] == 3 and out["a"]["buckets"] == 3
    assert out["b"]["n"] == 4 and out["b"]["buckets"] == 6
    # steady group: zero deviation both ways
    assert out["a"]["up_ppm"] == 0 and out["a"]["down_ppm"] == 0
    # front-loaded group: strong downward signal
    assert out["b"]["down_ppm"] > out["b"]["up_ppm"]


def test_cusum_null_ts_excluded_and_global_path(spark):
    rows = [("g", _ts(0.5)), ("g", None), ("g", _ts(1.5))]
    df = spark.createDataFrame(rows, "grp string, ts timestamp")
    out = cusum_changepoint(df, ts_col="ts", bucket="hour").collect()
    assert len(out) == 1
    assert out[0]["n"] == 2 and out[0]["buckets"] == 2


def test_cusum_rejects_unknown_bucket(spark):
    df = _events(spark, [0.5])
    with pytest.raises(ValueError, match="bucket must be one of"):
        cusum_changepoint(df, bucket="fortnight")


def test_tvd_hand_computed(spark):
    # early half (ts <= mid): 3 A, 1 B; late half: 1 A, 3 B
    # TVD = (|3/4 - 1/4| + |1/4 - 3/4|)/2 = 1/2 -> 500_000 ppm
    rows = (
        [("A", _ts(h)) for h in (0.1, 0.2, 0.3)]
        + [("B", _ts(0.4))]
        + [("A", _ts(9.6))]
        + [("B", _ts(h)) for h in (9.7, 9.8, 9.9)]
    )
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = tvd_drift(df, ts_col="ts", cat_col="cat").collect()
    assert len(out) == 1
    r = out[0]
    assert r["tvd_ppm"] == 500_000
    assert r["n_early"] == 4 and r["n_late"] == 4 and r["n_cats"] == 2


def test_tvd_identical_mix_is_zero(spark):
    rows = [(c, _ts(h)) for h in (0.1, 9.9) for c in ("A", "A", "B")]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = tvd_drift(df, ts_col="ts", cat_col="cat").collect()
    assert out[0]["tvd_ppm"] == 0


def test_tvd_disjoint_mix_is_one(spark):
    rows = [("A", _ts(0.1)), ("A", _ts(0.2)), ("B", _ts(9.8)),
            ("B", _ts(9.9))]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = tvd_drift(df, ts_col="ts", cat_col="cat").collect()
    assert out[0]["tvd_ppm"] == 1_000_000


def test_tvd_single_timestamp_group_drops(spark):
    # all mass on one instant: mid == ts, everything early, late empty
    rows = [("A", _ts(1.0)), ("B", _ts(1.0))]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    assert tvd_drift(df, ts_col="ts", cat_col="cat").count() == 0


def test_tvd_null_category_counts_null_ts_drops(spark):
    rows = [
        (None, _ts(0.1)),
        ("A", _ts(0.2)),
        ("A", None),  # excluded
        (None, _ts(9.8)),
        ("B", _ts(9.9)),
    ]
    df = spark.createDataFrame(rows, "cat string, ts timestamp")
    out = tvd_drift(df, ts_col="ts", cat_col="cat").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_early"] == 2 and r["n_late"] == 2
    # NULL is a real category: 3 categories total
    assert r["n_cats"] == 3
    # early {null, A} vs late {null, B}: TVD = 1/2
    assert r["tvd_ppm"] == 500_000


def test_tvd_grouped_and_global_split_shared(spark):
    # the split anchor is GLOBAL (documented): group g2 sits entirely in
    # the late half, so it drops (its early half is empty)
    rows = [
        ("g1", "A", _ts(0.1)),
        ("g1", "B", _ts(9.9)),
        ("g2", "A", _ts(8.0)),
        ("g2", "B", _ts(9.0)),
    ]
    df = spark.createDataFrame(rows, "grp string, cat string, ts timestamp")
    out = tvd_drift(
        df, ts_col="ts", cat_col="cat", group_cols=["grp"]
    ).collect()
    assert [r["grp"] for r in out] == ["g1"]
    assert out[0]["tvd_ppm"] == 1_000_000


def test_cusum_plan_has_no_global_single_task_window_when_grouped(spark):
    """Grouped cusum's windows must all partition on the group column —
    no empty-frame (single task) window stage in the plan."""
    df = _events(spark, [0.1, 1.1, 2.1])
    plan = cusum_changepoint(
        df, ts_col="ts", group_cols=["grp"], bucket="hour"
    )._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
