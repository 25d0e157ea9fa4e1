"""Quantile sketch tests (operators/quantiles.py): the EXACT algebraic
merge/rollup laws of the level-sampling sketch (the hash-gated member),
and the differential accuracy + exact weight invariant of the true KLL
compactor (the rows-only member — compaction is not SQL-expressible).
Mirrors tests/test_sketches.py's law-test structure.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import quantiles as QT
from kafka_dead_letter_analyzer_spark.sources.batch import load_table

SF = "/root/testdata/sf0.01"  # 10k events


@pytest.fixture(scope="module")
def events(spark):
    return (
        load_table(spark, SF, "events")
        .filter(F.col("value").isNotNull())
        .select("event_id", "event_type", "value")
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _exact_quantile(events, q: float) -> float:
    vals = sorted(r["value"] for r in events.select("value").collect())
    rank = int(max(1, -(-q * len(vals) // 1)))
    return vals[rank - 1]


# ---------------------------------------------------------------------------
# Level-sampling sketch — exact laws
# ---------------------------------------------------------------------------


def test_level_sketch_merge_law_exact(spark, events):
    """merge(sketch(A), sketch(B)) == sketch(A ⊎ B) EXACTLY — the
    algebraic law that makes per-day sketches roll up losslessly
    ({h < T} is monotone in T)."""
    k = 64
    a = events.filter(F.col("event_id") % 2 == 0).withColumn("src", F.lit("a"))
    b = events.filter(F.col("event_id") % 2 == 1).withColumn("src", F.lit("b"))
    sa = QT.quantile_level_sketch(a, "event_id", "value", k=k, group_cols=["src"])
    sb = QT.quantile_level_sketch(b, "event_id", "value", k=k, group_cols=["src"])
    merged = QT.quantile_sketch_merge(sa.unionByName(sb), k=k, source_cols=["src"])
    whole = QT.quantile_level_sketch(events, "event_id", "value", k=k)
    assert _rows(merged) == _rows(whole)


def test_level_sketch_grouped_rollup_law(spark, events):
    """Per-event-type sketches merge to exactly the global sketch —
    the rollup the declared x_quantile_sketch_groups query feeds."""
    k = 64
    per_type = QT.quantile_level_sketch(
        events, "event_id", "value", k=k, group_cols=["event_type"]
    )
    rolled = QT.quantile_sketch_merge(per_type, k=k, source_cols=["event_type"])
    whole = QT.quantile_level_sketch(events, "event_id", "value", k=k)
    assert _rows(rolled) == _rows(whole)


def test_level_sketch_exact_below_k(spark, events):
    """n <= k: L = 0, every row kept at weight 1 — the sketch IS the
    data and estimates are exact."""
    small = events.filter(F.col("event_id") % 100 == 0)
    n = small.count()
    rows = QT.quantile_level_sketch(small, "event_id", "value", k=256).collect()
    assert len(rows) == n
    assert all(r["weight"] == 1 and r["n"] == n for r in rows)
    est = QT.quantile_sketch_estimate(rows, [0.5])
    assert est[0.5] == _exact_quantile(small, 0.5)


def test_level_sketch_state_shape(spark, events):
    """weight = 2^L with L minimal s.t. n/2^L <= k; sample size close
    to its expectation n/2^L; h60 strictly below the threshold."""
    k = 256
    n = events.count()
    rows = QT.quantile_level_sketch(events, "event_id", "value", k=k).collect()
    weight = rows[0]["weight"]
    assert all(r["weight"] == weight and r["n"] == n for r in rows)
    # minimal power of two: n/weight <= k < n/(weight/2)
    assert n / weight <= k
    assert weight == 1 or n / (weight // 2) > k
    expected = n / weight
    assert abs(len(rows) - expected) < 5 * (expected ** 0.5)
    thresh = (1 << 60) // weight
    assert all(0 <= r["h60"] < thresh for r in rows)


def test_level_sketch_estimator_accuracy(spark, events):
    """Rank error of the estimate ~ O(1/sqrt(sample)); assert within
    5 standard errors at each probe (deterministic draw, fixed data)."""
    k = 1024
    rows = QT.quantile_level_sketch(events, "event_id", "value", k=k).collect()
    n = events.count()
    vals = sorted(r["value"] for r in events.select("value").collect())
    import bisect

    est = QT.quantile_sketch_estimate(rows, [0.25, 0.5, 0.9, 0.99])
    s = len(rows)
    for q, v in est.items():
        rank = bisect.bisect_right(vals, v) / n
        se = (q * (1 - q) / s) ** 0.5
        assert abs(rank - q) < 5 * se + 2 / s, (q, v, rank)


def test_level_sketch_empty_input(spark, events):
    empty = events.filter(F.lit(False))
    assert QT.quantile_level_sketch(empty, "event_id", "value", k=64).count() == 0
    assert QT.quantile_sketch_estimate([], [0.5])[0.5] != QT.quantile_sketch_estimate([], [0.5])[0.5]  # NaN


def test_level_sketch_rejects_bad_k(spark, events):
    with pytest.raises(ValueError):
        QT.quantile_level_sketch(events, "event_id", "value", k=2)


# ---------------------------------------------------------------------------
# KLL — exact invariant + differential accuracy
# ---------------------------------------------------------------------------


def test_kll_weight_invariant_exact():
    """sum(len(level) * 2^level) == n after any mix of updates and
    merges — compaction conserves total weight exactly."""
    sk = QT.KLL(k=64)
    for i in range(10_000):
        sk.update((i * 2654435761) % 99991)  # deterministic scramble
    assert sum(len(b) << l for l, b in enumerate(sk.levels)) == sk.n == 10_000
    other = QT.KLL(k=64)
    for i in range(3_333):
        other.update(float(i))
    sk.merge(other)
    assert sum(len(b) << l for l, b in enumerate(sk.levels)) == sk.n == 13_333


def test_kll_rank_error_bound():
    """KLL rank error is O(n/k); assert a generous 6n/k envelope on a
    sorted (worst-case-order) stream at several probe points."""
    n, k = 50_000, 200
    sk = QT.KLL(k=k)
    for i in range(n):
        sk.update(float(i))
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = sk.quantile(q)
        true_rank = q * n
        assert abs(est - true_rank) <= 6 * n / k, (q, est)


def test_kll_merge_accuracy():
    """Merged sketch of two disjoint halves estimates the union's
    quantiles within the single-sketch envelope."""
    n, k = 40_000, 200
    a, b = QT.KLL(k=k), QT.KLL(k=k)
    for i in range(0, n, 2):
        a.update(float(i))
    for i in range(1, n, 2):
        b.update(float(i))
    a.merge(b)
    assert a.n == n
    for q in (0.1, 0.5, 0.9):
        assert abs(a.quantile(q) - q * n) <= 8 * n / k, q


def test_kll_deterministic_and_partition_independent(spark, events):
    """kll_quantiles is a pure function of the data multiset: same
    result from differently-partitioned inputs (the md5 coins +
    hash-ordered, fixed-chunk feed make the build bit-reproducible)."""
    r1 = QT.kll_quantiles(events, "event_id", "value", k=128, buckets=4).collect()
    shuffled = events.repartition(17, "event_type")
    r2 = QT.kll_quantiles(shuffled, "event_id", "value", k=128, buckets=4).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_kll_quantiles_vs_exact(spark, events):
    """Distributed KLL estimates land within the O(n/k) envelope of the
    exact nearest-rank quantiles at sf0.01."""
    n = events.count()
    k = 200
    rows = QT.kll_quantiles(events, "event_id", "value", k=k, buckets=8).collect()
    got = {r["q_permille"]: r["est"] for r in rows}
    assert all(r["n"] == n for r in rows)
    vals = sorted(r["value"] for r in events.select("value").collect())
    import bisect

    for qpm, est in got.items():
        q = qpm / 1000.0
        rank = bisect.bisect_right(vals, est)
        assert abs(rank - q * n) <= 8 * n / k, (qpm, est, rank)


def test_kll_rejects_bad_k():
    with pytest.raises(ValueError):
        QT.KLL(k=4)


def test_kll_grouped_matches_local_replay(spark, events):
    """kll_quantiles_grouped is a pure function of each group's value
    multiset: the distributed build equals a from-scratch local replay
    (per (group, bucket): values in key-hash order fed in the same
    512-row chunks, sorted-buffer merge in bucket order) — proving the
    per-group feed order is deterministic and independent of both input
    partition layout and co-resident groups."""
    import hashlib

    k, buckets = 64, 3
    got = {
        (r["event_type"], r["q_permille"]): (r["est"], r["n"])
        for r in QT.kll_quantiles_grouped(
            events, "event_id", "value", ["event_type"],
            k=k, buckets=buckets,
        ).collect()
    }

    # local replay with the operator's own hash + chunk contract
    rows = events.select("event_type", "event_id", "value").collect()
    per_group: dict[str, list] = {}
    for r in rows:
        if r["value"] is None:
            continue
        h = int(
            hashlib.md5(f"kbk:{r['event_id']}".encode()).hexdigest()[:15],
            16,
        )
        per_group.setdefault(r["event_type"], []).append(
            (h % buckets, h, float(r["value"]))
        )
    CHUNK = 512
    for g, tagged in per_group.items():
        merged = QT.KLL(k)
        for b in range(buckets):
            sk = QT.KLL(k)
            vs = [v for bb, h, v in sorted(tagged) if bb == b]
            for off in range(0, len(vs) - len(vs) % CHUNK, CHUNK):
                sk.bulk_update(vs[off : off + CHUNK])
            if len(vs) % CHUNK:
                sk.bulk_update(vs[len(vs) - len(vs) % CHUNK :])
            for buf in sk.levels:
                buf.sort()
            merged.merge(sk)
        for qpm in (500, 900, 990):
            est, n = got[(g, qpm)]
            assert n == merged.n, (g, n, merged.n)
            assert est == merged.quantile(qpm / 1000.0), (g, qpm)

    # partition-layout independence of the same grouped build
    reshuffled = events.repartition(23, "value")
    again = {
        (r["event_type"], r["q_permille"]): (r["est"], r["n"])
        for r in QT.kll_quantiles_grouped(
            reshuffled, "event_id", "value", ["event_type"],
            k=k, buckets=buckets,
        ).collect()
    }
    assert again == got


def test_kll_grouped_accuracy_per_group(spark, events):
    """Each group's estimates land within the O(n_g/k) rank envelope of
    that group's exact nearest-rank quantiles."""
    import bisect

    k = 200
    out = QT.kll_quantiles_grouped(
        events, "event_id", "value", ["event_type"], k=k, buckets=4
    ).collect()
    vals: dict[str, list] = {}
    for r in events.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for v in vals.values():
        v.sort()
    assert {r["event_type"] for r in out} == set(vals)
    for r in out:
        g, vs = r["event_type"], vals[r["event_type"]]
        assert r["n"] == len(vs)
        rank = bisect.bisect_right(vs, r["est"])
        q = r["q_permille"] / 1000.0
        assert abs(rank - q * len(vs)) <= 8 * len(vs) / k, (g, r)


def test_kll_grouped_guards_group_explosion(spark, events):
    """The bounded-collect contract: an unbounded group domain RAISES
    instead of silently collecting groups x buckets sketches."""
    with pytest.raises(ValueError, match="distinct groups"):
        QT.kll_quantiles_grouped(
            events, "event_id", "value", ["event_id"], max_groups=100
        )


def test_kll_partial_collect_is_buckets_bounded(spark, monkeypatch):
    """r9 VERDICT #8 (docstring driver-memory claims): kll_quantiles'
    docstring promises the partial collect stays ``buckets x
    O(k log(n/k))`` rows NO MATTER how many partitions feed it —
    enforced by repartition(buckets, 'b') putting each bucket's
    stream in exactly one task.  Spy on the one internal collect and
    assert the bound against a deliberately over-partitioned input
    (64 partitions, 8 buckets): a per-task-partials regression would
    collect ~8x more rows."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    from kafka_dead_letter_analyzer_spark.operators.quantiles import (
        kll_quantiles,
    )

    captured = []
    orig = CDF.collect

    def spy(self):
        rows = orig(self)
        captured.append(len(rows))
        return rows

    monkeypatch.setattr(CDF, "collect", spy)
    df = (
        spark.range(100_000)
        .selectExpr("id AS event_id", "CAST(id % 9973 AS DOUBLE) AS value")
        .repartition(64)
    )
    out = kll_quantiles(df, "event_id", "value", k=200, buckets=8)
    assert len(out.collect()) == 5
    # first spied collect = the partial-sketch frame; KLL(k=200) holds
    # well under 3k items across levels, +1 n-marker row per bucket
    assert captured[0] <= 8 * 3_000
    # and it is NOT partition-shaped: 64 tasks of per-task partials
    # would exceed the per-bucket bound several-fold
    assert captured[0] < 64 * 600
