"""Sketch algebra tests (operators/sketches.py): the merge laws that make
the sketches distributed state, and the float estimators' accuracy
(which live OUTSIDE the oracle-hash surface — properties, not hashes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import sketches as SK
from kafka_dead_letter_analyzer_spark.sources.batch import load_table

SF = "/root/testdata/sf0.01"  # 150 distinct users / 10k events


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF, "events").select("event_id", "user_id")


def _halves(events):
    a = events.filter(F.col("event_id") % 2 == 0)
    b = events.filter(F.col("event_id") % 2 == 1)
    return a, b


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


def test_kmv_union_merge_law(spark, events):
    """min-k(sketch(A) ∪ sketch(B)) == sketch(A ∪ B): per-partition /
    per-day sketches roll up losslessly."""
    k = 32
    a, b = _halves(events)
    whole = {r["h60"] for r in SK.kmv_distinct_sketch(events, "user_id", k).collect()}
    sa = [r["h60"] for r in SK.kmv_distinct_sketch(a, "user_id", k).collect()]
    sb = [r["h60"] for r in SK.kmv_distinct_sketch(b, "user_id", k).collect()]
    merged = set(sorted(set(sa) | set(sb))[:k])
    assert merged == whole


def test_kmv_estimate_accuracy(spark, events):
    k = 128
    true = events.select("user_id").distinct().count()
    rows = SK.kmv_distinct_sketch(events, "user_id", k).collect()
    est = SK.kmv_estimate(rows, k)
    assert abs(est - true) / true < 0.25, (est, true)


def test_kmv_exact_below_k(spark, events):
    """Fewer distincts than k -> the sketch IS the distinct set and the
    estimator returns the exact count."""
    small = events.filter(F.col("user_id") % 50 == 0)
    true = small.select("user_id").distinct().count()
    rows = SK.kmv_distinct_sketch(small, "user_id", 128).collect()
    assert len(rows) == true
    assert SK.kmv_estimate(rows, 128) == float(true)


def test_kmv_ranks_are_dense_and_sorted(spark, events):
    rows = SK.kmv_distinct_sketch(events, "user_id", 16).collect()
    ranks = [r["rank"] for r in rows]
    hashes = [r["h60"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ranks and sorted(ranks) == list(range(1, len(ranks) + 1))
    assert hashes == sorted(hashes)
    assert all(0 <= h < 1 << 60 for h in hashes)


# ---------------------------------------------------------------------------
# CMS
# ---------------------------------------------------------------------------


def test_cms_merge_is_cellwise_sum(spark, events):
    a, b = _halves(events)
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_sketch(events, "user_id", depth=3, width=64).collect()
    }
    merged: dict = {}
    for half in _halves(events):
        for r in SK.cms_sketch(half, "user_id", depth=3, width=64).collect():
            merged[(r["d"], r["bucket"])] = merged.get((r["d"], r["bucket"]), 0) + r["cnt"]
    assert merged == whole


def test_cms_lookup_never_underestimates(spark, events):
    """The one-sided error guarantee: est >= true count for EVERY key,
    and the total overshoot is bounded (collisions add counts, never
    subtract)."""
    width = 64
    sketch = SK.cms_sketch(events, "user_id", depth=4, width=width)
    true = {
        r["user_id"]: r["cnt"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()
    }
    est = {
        r["user_id"]: r["est"]
        for r in SK.cms_lookup(
            sketch, events.select("user_id"), "user_id", width=width
        ).collect()
    }
    n = sum(true.values())
    assert set(est) == {str(k) for k in true} or set(est) == set(true)
    for k, t in true.items():
        e = est.get(k, est.get(str(k)))
        assert e >= t, (k, e, t)
        # standard bound: overshoot <= e*N/width w.p. 1-e^-depth; allow 3x
        assert e - t <= 3 * 2.72 * n / width, (k, e, t)


def test_cms_weighted_counts_weights(spark, events):
    w = events.withColumn("wt", (F.col("event_id") % 3).cast("bigint"))
    sk = SK.cms_sketch(w, "user_id", depth=2, width=32, weight="wt")
    total = sk.filter(F.col("d") == 0).agg(F.sum("cnt")).collect()[0][0]
    true_total = w.agg(F.sum("wt")).collect()[0][0]
    assert total == true_total


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def test_hll_merge_is_cellwise_max(spark, events):
    whole = {
        r["register"]: r["max_rho"]
        for r in SK.hll_register_maxima(events, "user_id", p=6).collect()
    }
    merged: dict = {}
    for half in _halves(events):
        for r in SK.hll_register_maxima(half, "user_id", p=6).collect():
            merged[r["register"]] = max(merged.get(r["register"], 0), r["max_rho"])
    assert merged == whole


def test_hll_estimate_accuracy(spark, events):
    true = events.select("user_id").distinct().count()
    rows = SK.hll_register_maxima(events, "user_id", p=8).collect()
    est = SK.hll_estimate(rows, p=8)
    # p=8 -> ~6.5% typical; 150 distincts sit in the linear-counting
    # regime which is tighter still. 20% is a loose, stable bound.
    assert abs(est - true) / true < 0.20, (est, true)


def test_hll_rho_bounds(spark, events):
    rows = SK.hll_register_maxima(events, "user_id", p=8).collect()
    assert rows
    for r in rows:
        assert 0 <= r["register"] < 256
        assert 1 <= r["max_rho"] <= 53  # 60-8 bits + 1


def test_hll_register_count_bounded_by_m(spark, events):
    assert SK.hll_register_maxima(events, "user_id", p=4).count() <= 16


def test_hll_grouped_daily_rolls_up_to_whole(spark):
    """Per-day register sketches merged by max == the whole-period
    sketch: the cross-granularity rollup law that lets a pipeline keep
    only daily sketches and answer any date-range distinct count."""
    ev = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = SK.hll_register_maxima(ev, "user_id", p=6, group_cols=["day"])
    rolled = {
        (r["register"]): r["mr"]
        for r in daily.groupBy("register")
        .agg(F.max("max_rho").alias("mr"))
        .collect()
    }
    whole = {
        r["register"]: r["max_rho"]
        for r in SK.hll_register_maxima(ev, "user_id", p=6).collect()
    }
    assert rolled == whole


def test_kmv_jaccard_estimate_from_sketches_alone(spark, events):
    """Sketch-only Jaccard between two key sets tracks the true overlap
    (join-cardinality pricing without scanning either side again)."""
    a = events.filter(F.col("user_id") % 3 != 0)   # 2/3 of users
    b = events.filter(F.col("user_id") % 2 != 0)   # 1/2 of users
    sa = set(r["user_id"] for r in a.select("user_id").distinct().collect())
    sb = set(r["user_id"] for r in b.select("user_id").distinct().collect())
    true_j = len(sa & sb) / len(sa | sb)
    k = 64
    ra = SK.kmv_distinct_sketch(a, "user_id", k).collect()
    rb = SK.kmv_distinct_sketch(b, "user_id", k).collect()
    est = SK.kmv_jaccard_estimate(ra, rb, k)
    assert abs(est - true_j) < 0.2, (est, true_j)
    # identical sets -> exactly 1.0; disjoint -> exactly 0.0
    assert SK.kmv_jaccard_estimate(ra, ra, k) == 1.0
    c = events.filter(F.col("user_id") % 3 == 0)
    rc = SK.kmv_distinct_sketch(c, "user_id", k).collect()
    assert SK.kmv_jaccard_estimate(ra, rc, k) == 0.0


def test_kmv_grouped_union_rollup_law(spark):
    """Per-day KMV sketches union + re-limit == the whole-period sketch
    (and any day-range subset's sketch) — min-k set algebra."""
    ev = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    k = 32
    daily = SK.kmv_distinct_sketch(ev, "user_id", k, group_cols=["day"])
    rows = daily.collect()
    whole = [r["h60"] for r in SK.kmv_distinct_sketch(ev, "user_id", k).collect()]
    merged = sorted({r["h60"] for r in rows})[:k]
    assert merged == whole
    # every group's sketch is dense-ranked and <= k rows
    per = {}
    for r in rows:
        per.setdefault(r["day"], []).append(r["rank"])
    for day, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= k


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_bounded_fpr(spark, events):
    """Every inserted key probes True (the hard guarantee); absent keys
    probe True at roughly the analytic false-positive rate."""
    users = events.select("user_id").distinct()
    n = users.count()
    rows = SK.bloom_sketch(users, "user_id", num_hashes=4, num_words=64).collect()
    present = [r["user_id"] for r in users.collect()]
    for u in present:
        assert SK.bloom_contains(rows, u, 4, 64), u
    m, k = 63 * 64, 4
    import math

    fpr = (1 - math.exp(-k * n / m)) ** k
    absent = [10_000_000 + i for i in range(2000)]
    hits = sum(1 for a in absent if SK.bloom_contains(rows, a, 4, 64))
    assert hits / len(absent) < max(3 * fpr, 0.02), (hits, fpr)


def test_bloom_merge_is_wordwise_or(spark, events):
    whole = {
        r["word"]: r["bits"]
        for r in SK.bloom_sketch(events, "user_id", 3, 16).collect()
    }
    merged: dict = {}
    for half in _halves(events):
        for r in SK.bloom_sketch(half, "user_id", 3, 16).collect():
            merged[r["word"]] = merged.get(r["word"], 0) | r["bits"]
    assert merged == whole


def test_bloom_words_nonnegative(spark, events):
    rows = SK.bloom_sketch(events, "user_id", 4, 8).collect()
    assert rows and all(r["bits"] >= 0 and 0 <= r["word"] < 8 for r in rows)


def test_cms_grouped_rollup_is_cellwise_sum(spark):
    """Per-day CMS cells summed over days == the whole-period sketch."""
    ev = load_table(spark, SF, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = SK.cms_sketch(ev, "user_id", depth=3, width=32, group_cols=["day"])
    rolled = {
        (r["d"], r["bucket"]): r["s"]
        for r in daily.groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("s"))
        .collect()
    }
    whole = {
        (r["d"], r["bucket"]): r["cnt"]
        for r in SK.cms_sketch(ev, "user_id", depth=3, width=32).collect()
    }
    assert rolled == whole


# ---------------------------------------------------------------------------
# KMV set algebra (kmv_set_algebra / kmv_setops_estimates)
# ---------------------------------------------------------------------------


def _user_day_sets(spark):
    ev = load_table(spark, SF, "events")
    ud = F.concat(
        F.col("user_id").cast("string"), F.lit("@"),
        F.date_format("ts", "yyyy-MM-dd"),
    )
    base = ev.select("event_type", ud.alias("ud"))
    a = base.filter(F.col("event_type") == "click").select("ud")
    b = base.filter(F.col("event_type") == "purchase").select("ud")
    return a, b


def test_kmv_setops_flags_exact_in_valid_region(spark):
    """Inside h <= min(theta_a, theta_b) both sketches are complete
    membership oracles, so every flag must agree with true membership."""
    import hashlib

    k = 64
    a, b = _user_day_sets(spark)
    sa = SK.kmv_distinct_sketch(a, "ud", k)
    sb = SK.kmv_distinct_sketch(b, "ud", k)
    rows = SK.kmv_set_algebra(sa, sb, k).collect()

    def _hashes(df):
        return {
            int(hashlib.md5(r["ud"].encode()).hexdigest()[:15], 16)
            for r in df.distinct().collect()
        }

    ha, hb = _hashes(a), _hashes(b)
    for r in rows:
        assert r["in_a"] == int(r["h60"] in ha), r
        assert r["in_b"] == int(r["h60"] in hb), r


def test_kmv_setops_truncates_at_min_theta(spark):
    """No union row may exceed either side's theta (k-th smallest when
    full): beyond it a side's sketch is silent and flags would lie."""
    k = 32
    a, b = _user_day_sets(spark)
    sa = SK.kmv_distinct_sketch(a, "ud", k)
    sb = SK.kmv_distinct_sketch(b, "ud", k)
    th_a = max(r["h60"] for r in sa.collect())
    th_b = max(r["h60"] for r in sb.collect())
    rows = SK.kmv_set_algebra(sa, sb, k).collect()
    assert len(rows) <= k
    assert all(r["h60"] <= min(th_a, th_b) for r in rows)
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_kmv_setops_estimates_accuracy(spark):
    """Jaccard / union / intersection from the composed sketch rows vs
    ground truth: jaccard within 4 binomial sigmas, union within the
    KMV envelope, intersection = their product."""
    k = 128
    a, b = _user_day_sets(spark)
    rows = SK.kmv_set_algebra(
        SK.kmv_distinct_sketch(a, "ud", k), SK.kmv_distinct_sketch(b, "ud", k), k
    ).collect()
    est = SK.kmv_setops_estimates(rows, k)
    sa = {r["ud"] for r in a.distinct().collect()}
    sb = {r["ud"] for r in b.distinct().collect()}
    true_j = len(sa & sb) / len(sa | sb)
    sigma = (true_j * (1 - true_j) / len(rows)) ** 0.5
    assert abs(est["jaccard"] - true_j) < 4 * sigma + 1 / len(rows)
    assert abs(est["union"] - len(sa | sb)) / len(sa | sb) < 0.3
    assert est["intersection"] == pytest.approx(est["jaccard"] * est["union"])
    # difference estimates: same identity, asymmetric fractions; the
    # three disjoint regions must tile the union estimate exactly
    assert est["a_minus_b"] + est["b_minus_a"] + est["intersection"] == (
        pytest.approx(est["union"])
    )
    true_ab = len(sa - sb) / len(sa | sb)
    sig_ab = (true_ab * (1 - true_ab) / len(rows)) ** 0.5
    assert abs(est["a_minus_b"] / est["union"] - true_ab) < 4 * sig_ab + 1 / len(rows)


def test_kmv_setops_exact_when_both_below_k(spark):
    """Both sides under k: thetas are the whole space, the composition
    is the EXACT flagged union and the estimates are exact."""
    a, b = _user_day_sets(spark)
    a = a.distinct().limit(40)
    b = b.distinct().limit(40)
    k = 128
    rows = SK.kmv_set_algebra(
        SK.kmv_distinct_sketch(a, "ud", k), SK.kmv_distinct_sketch(b, "ud", k), k
    ).collect()
    sa = {r["ud"] for r in a.collect()}
    sb = {r["ud"] for r in b.collect()}
    assert len(rows) == len(sa | sb)
    est = SK.kmv_setops_estimates(rows, k)
    assert est["union"] == float(len(sa | sb))
    assert est["jaccard"] == pytest.approx(len(sa & sb) / len(sa | sb))


def test_mg_summary_deterministic_guarantees(spark):
    """Misra-Gries in the DECREMENT regime (k << distinct): for a skewed
    corpus, every emitted count is a certified lower bound, the error is
    bounded by the summary's own certificate (n - sum(counts))/(k+1),
    and every item with true frequency above that bound is present.
    Exact regime (k >= distinct): the summary IS the exact counts."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        mg_summary,
    )

    rng = random.Random(31)
    # zipf-ish: a few heavy items over a long tail
    items = (
        ["hot_a"] * 400 + ["hot_b"] * 250 + ["hot_c"] * 120
        + [f"tail{i}" for i in range(600) for _ in (0,)]
        + [f"mid{i % 20}" for i in range(300)]
    )
    rng.shuffle(items)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    n = len(items)
    df = spark.createDataFrame([(it,) for it in items], "event_type string")

    k = 8
    out = {
        r["item"]: r["count_lower"]
        for r in mg_summary(df, "event_type", k=k).collect()
    }
    assert 0 < len(out) <= k
    cert = (n - sum(out.values())) / (k + 1)
    for item, c in out.items():
        assert c <= true[item], (item, c, true[item])
        assert true[item] - c <= cert, (item, c, true[item], cert)
    for item, t in true.items():
        if t > cert:
            assert item in out, (item, t, cert)

    # exact regime
    exact = {
        r["item"]: r["count_lower"]
        for r in mg_summary(df, "event_type", k=2000).collect()
    }
    assert exact == true


def test_mg_merge_preserves_certificate(spark):
    """Rolling per-group MG summaries up with mg_merge keeps the MG
    guarantees for the UNION stream: merged counts stay certified lower
    bounds, and the merged summary's OWN certificate (n - sum(c))/(k+1)
    still dominates every item's error (the decrement step removes at
    least t*(k+1) mass, so certificates compose — Agarwal et al.)."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        mg_merge,
        mg_summary,
    )

    rng = random.Random(77)
    rows = []
    for day in range(4):
        # per-day zipf-ish mix with day-varying heavies
        items = (
            [f"hot{day}"] * 300 + ["global_hot"] * 200
            + [f"t{day}_{i}" for i in range(250)]
        )
        rng.shuffle(items)
        rows += [(day, it) for it in items]
    true = {}
    for _, it in rows:
        true[it] = true.get(it, 0) + 1
    n = len(rows)
    df = spark.createDataFrame(rows, "day int, event_type string")

    k = 6
    daily = mg_summary(df, "event_type", k=k, group_cols=["day"])
    merged = {
        r["item"]: r["count_lower"]
        for r in mg_merge(daily, k=k).collect()
    }
    assert 0 < len(merged) <= k
    cert = (n - sum(merged.values())) / (k + 1)
    for item, c in merged.items():
        assert c <= true[item], (item, c, true[item])
        assert true[item] - c <= cert, (item, c, true[item], cert)
    # items above the certificate are guaranteed present
    for item, t in true.items():
        if t > cert:
            assert item in merged, (item, t, cert)

    # per-day summaries in the exact regime equal per-day counts
    exact_daily = {
        (r["day"], r["item"]): r["count_lower"]
        for r in mg_summary(
            df, "event_type", k=1000, group_cols=["day"]
        ).collect()
    }
    true_daily = {}
    for day, it in rows:
        true_daily[(day, it)] = true_daily.get((day, it), 0) + 1
    assert exact_daily == true_daily


def test_ss_summary_upper_bound_brackets(spark):
    """Space-Saving in the EVICTION regime (k << distinct): every
    emitted row brackets its item's true frequency from both sides —
    ``count_upper >= true >= count_upper - err_upper`` — under an
    arbitrary partition layout (the distributed merge adds each absent
    partition's residual to both the bound and the error).  Exact
    regime (k >= distinct): counts are exact and every error is 0."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        ss_summary,
    )

    rng = random.Random(53)
    items = (
        ["hot_a"] * 500 + ["hot_b"] * 300 + ["hot_c"] * 150
        + [f"tail{i}" for i in range(700)]
        + [f"mid{i % 25}" for i in range(400)]
    )
    rng.shuffle(items)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    df = spark.createDataFrame(
        [(it,) for it in items], "event_type string"
    ).repartition(7)

    k = 8
    out = ss_summary(df, "event_type", k=k).collect()
    assert 0 < len(out) <= k
    for r in out:
        t = true.get(r["item"], 0)
        assert r["count_upper"] >= t, (r, t)
        assert r["count_upper"] - r["err_upper"] <= t, (r, t)
        assert r["err_upper"] >= 0

    # exact regime: top-k of the exact counts, zero error
    exact = {
        r["item"]: (r["count_upper"], r["err_upper"])
        for r in ss_summary(df, "event_type", k=5000).collect()
    }
    assert all(e == 0 for _, e in exact.values())
    assert {i: c for i, (c, _) in exact.items()} == true

    # heavy-hitter retention: any item certified heavier than every
    # possible missed item must be in the top-k — its LOWER bound
    # (count_upper - err_upper) beating the k-th retained upper bound
    # implies no absent item can outrank it
    kth_upper = min(r["count_upper"] for r in out)
    present = {r["item"] for r in out}
    for r in out:
        if r["count_upper"] - r["err_upper"] > kth_upper:
            assert r["item"] in present


def test_ss_summary_grouped_bounds_and_contract(spark):
    """Grouped Space-Saving: per-group k-bounded summaries with the
    same two-sided bracket per row, contracted per group by the rank
    window (never more than k rows per group)."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        ss_summary,
    )

    rng = random.Random(91)
    rows = []
    for day in range(3):
        items = (
            [f"hot{day}"] * 250 + ["global_hot"] * 150
            + [f"t{day}_{i}" for i in range(200)]
        )
        rng.shuffle(items)
        rows += [(day, it) for it in items]
    true = {}
    for day, it in rows:
        true[(day, it)] = true.get((day, it), 0) + 1
    df = spark.createDataFrame(
        rows, "day int, event_type string"
    ).repartition(5)

    k = 6
    out = ss_summary(df, "event_type", k=k, group_cols=["day"]).collect()
    per_day = {}
    for r in out:
        per_day.setdefault(r["day"], []).append(r)
        t = true.get((r["day"], r["item"]), 0)
        assert r["count_upper"] >= t, (r, t)
        assert r["count_upper"] - r["err_upper"] <= t, (r, t)
    assert all(len(v) <= k for v in per_day.values())
    assert set(per_day) == {0, 1, 2}

    # exact regime per group
    exact = {
        (r["day"], r["item"]): (r["count_upper"], r["err_upper"])
        for r in ss_summary(
            df, "event_type", k=1000, group_cols=["day"]
        ).collect()
    }
    assert all(e == 0 for _, e in exact.values())
    assert {g: c for g, (c, _) in exact.items()} == true


def test_ss_vs_mg_bracket_the_truth_together(spark):
    """The two deterministic sketches run on the same stream bracket
    every co-reported item: mg count_lower <= true <= ss count_upper."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        mg_summary,
        ss_summary,
    )

    rng = random.Random(17)
    items = ["h1"] * 400 + ["h2"] * 250 + [f"t{i}" for i in range(500)]
    rng.shuffle(items)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    df = spark.createDataFrame(
        [(it,) for it in items], "event_type string"
    ).repartition(4)
    lo = {
        r["item"]: r["count_lower"]
        for r in mg_summary(df, "event_type", k=8).collect()
    }
    hi = {
        r["item"]: r["count_upper"]
        for r in ss_summary(df, "event_type", k=8).collect()
    }
    for item in set(lo) & set(hi):
        assert lo[item] <= true[item] <= hi[item], (
            item, lo[item], true[item], hi[item],
        )


# ---------------------------------------------------------------------------
# Distributed Bloom probe (round 8)


def test_bloom_probe_no_false_negatives_and_agrees_with_driver(spark):
    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        bloom_contains,
        bloom_probe,
        bloom_sketch,
    )

    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(200)], "k string"
    )
    sk = bloom_sketch(members, key="k", num_hashes=4, num_words=16)
    probes = spark.createDataFrame(
        [(f"m{i}",) for i in range(200)]
        + [(f"x{i}",) for i in range(300)],
        "k string",
    )
    got = {
        r["k"]: r["maybe_member"]
        for r in bloom_probe(
            probes, sk, key="k", num_hashes=4, num_words=16
        ).collect()
    }
    # structural: every true member answers True
    assert all(got[f"m{i}"] for i in range(200))
    # the distributed probe agrees with the driver-side probe, key by key
    rows = sk.collect()
    for k, v in got.items():
        assert v == bloom_contains(rows, k, num_hashes=4, num_words=16), k
    # at 16 words (1008 bits) / 200 keys / 4 hashes some but not all
    # non-members pass — the FP band sanity check
    fps = sum(1 for i in range(300) if got[f"x{i}"])
    assert 0 < fps < 300

    import pytest as pt

    with pt.raises(ValueError, match="bloom_probe"):
        bloom_probe(probes, sk, key="k", num_hashes=0)
