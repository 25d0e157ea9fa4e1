"""Ranking/evaluation metric tests (operators/ranking.py): exact AUC
differential vs a from-scratch local Mann-Whitney computation (both
strategies: global two-phase range prefix and grouped window), the
empty-class drop, partition independence of the range-prefix path, and
RRF's dense-rank / missing-item conventions.
"""

from __future__ import annotations

import bisect
import random

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import ranking as R


def _local_u2(pairs):
    pos = sorted(s for s, y in pairs if y)
    neg = sorted(s for s, y in pairs if not y)
    u2 = 0
    for p in pos:
        lt = bisect.bisect_left(neg, p)
        eq = bisect.bisect_right(neg, p) - lt
        u2 += 2 * lt + eq
    return u2, len(pos), len(neg)


def test_auc_global_matches_local_mann_whitney(spark):
    rng = random.Random(11)
    rows = [
        (rng.randint(0, 40), rng.random() < 0.4) for _ in range(3000)
    ]
    df = spark.createDataFrame(rows, "s bigint, y boolean").repartition(7)
    got = R.auc_exact(df, "s", "y").collect()
    assert len(got) == 1
    u2, n_pos, n_neg = _local_u2(rows)
    r = got[0]
    assert (r["u2"], r["n_pos"], r["n_neg"]) == (u2, n_pos, n_neg)
    assert r["auc_ppm"] == (u2 * 500_000) // (n_pos * n_neg)
    # a perfectly separating score: AUC = 1
    perfect = spark.createDataFrame(
        [(i, i >= 50) for i in range(100)], "s bigint, y boolean"
    )
    assert R.auc_exact(perfect, "s", "y").collect()[0]["auc_ppm"] == 1_000_000


def test_auc_global_partition_and_range_count_independent(spark):
    """The two-phase prefix sum must not depend on input layout or on
    the number of range partitions (boundaries are sampled, the sums
    are exact either way)."""
    rng = random.Random(23)
    rows = [(rng.randint(0, 1000), rng.random() < 0.5) for _ in range(4000)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    a = R.auc_exact(df.repartition(3), "s", "y").collect()[0]
    b = R.auc_exact(
        df.repartition(19, "s"), "s", "y", range_partitions=5
    ).collect()[0]
    assert tuple(a) == tuple(b)


def test_auc_grouped_matches_local_and_drops_empty_class(spark):
    rng = random.Random(5)
    rows = [
        (rng.choice(["a", "b"]), rng.randint(0, 30), rng.random() < 0.3)
        for _ in range(2000)
    ]
    # group with one class only: must be absent from the output
    rows += [("onlypos", rng.randint(0, 30), True) for _ in range(50)]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    got = {
        r["g"]: (r["u2"], r["n_pos"], r["n_neg"])
        for r in R.auc_exact(df, "s", "y", group_cols=["g"]).collect()
    }
    assert set(got) == {"a", "b"}
    for g in ("a", "b"):
        assert got[g] == _local_u2(
            [(s, y) for gg, s, y in rows if gg == g]
        )


def test_auc_null_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (None, True), (3, None)],
        "s bigint, y boolean",
    )
    r = R.auc_exact(df, "s", "y").collect()[0]
    assert (r["n_pos"], r["n_neg"]) == (1, 1)
    # the surviving pair is pos=1 < neg=2: zero wins, zero ties
    assert r["u2"] == _local_u2([(1, True), (2, False)])[0] == 0
    assert r["auc_ppm"] == 0


def test_rrf_fuse_dense_rank_and_missing_items(spark):
    """Items absent from a source contribute nothing (standard RRF);
    dense rank shares tied positions; the integer reciprocal matches
    10^9 // (k + rank) exactly."""
    rows = [
        ("s1", 1, 100), ("s1", 2, 90), ("s1", 3, 90), ("s1", 4, 80),
        ("s2", 1, 5), ("s2", 4, 9),
    ]
    df = spark.createDataFrame(rows, "src string, item bigint, v bigint")
    got = {
        r["item"]: (r["rrf_score_ppb"], r["n_sources"])
        for r in R.rrf_fuse(df, ["item"], "src", "v", k=10).collect()
    }
    G = 10**9
    assert got[1] == (G // 11 + G // 12, 2)  # rank 1 in s1, rank 2 in s2
    assert got[2] == (G // 12, 1)  # tied rank 2 in s1 only
    assert got[3] == (G // 12, 1)  # same tied rank
    assert got[4] == (G // 13 + G // 11, 2)  # dense rank 3 after the tie
    top1 = R.rrf_fuse(df, ["item"], "src", "v", k=10, top_n=1).collect()
    # item 1: G//11 + G//12 = 174242423 beats item 4: G//13 + G//11
    assert len(top1) == 1 and top1[0]["item"] == 1


def test_rrf_rejects_bad_k(spark):
    df = spark.createDataFrame([("s", 1, 1)], "src string, item bigint, v bigint")
    with pytest.raises(ValueError):
        R.rrf_fuse(df, ["item"], "src", "v", k=0)


def _local_gini_ppm(values):
    xs = sorted(values)
    n = len(xs)
    total = sum(xs)
    if total == 0:
        return None
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    num = 2 * s1 - (n + 1) * total
    nt = n * total
    d1 = (num * 1000) // nt
    d2 = ((num * 1000) % nt) * 1000 // nt
    return d1 * 1000 + d2, n, total


def test_gini_global_matches_local_rank_sum(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as P

    rng = random.Random(7)
    vals = [rng.randint(0, 500) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint").repartition(9)
    r = P.gini_concentration(df, "v").collect()
    assert len(r) == 1
    assert (r[0]["gini_ppm"], r[0]["n"], r[0]["total"]) == _local_gini_ppm(vals)
    # uniform data: gini == 0 exactly (num = 2*S1 - (n+1)*total = 0)
    uni = spark.createDataFrame([(7,)] * 100, "v bigint")
    assert P.gini_concentration(uni, "v").collect()[0]["gini_ppm"] == 0
    # one row holds everything: gini -> (n-1)/n = 0.99 for n=100
    conc = spark.createDataFrame([(0,)] * 99 + [(1000,)], "v bigint")
    assert P.gini_concentration(conc, "v").collect()[0]["gini_ppm"] == 990_000


def test_gini_grouped_matches_local_and_excludes_nulls(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as P

    rng = random.Random(31)
    rows = [
        (rng.choice(["a", "b", "c"]), rng.randint(0, 80)) for _ in range(3000)
    ]
    rows_with_null = rows + [("a", None), (None, 5)]
    df = spark.createDataFrame(rows_with_null, "g string, v bigint")
    got = {
        r["g"]: (r["gini_ppm"], r["n"], r["total"])
        for r in P.gini_concentration(df, "v", group_cols=["g"]).collect()
    }
    # the NULL-group row survives as its own group (group cols are not
    # filtered — only NULL values drop); local check per real group
    for g in ("a", "b", "c"):
        assert got[g] == _local_gini_ppm([v for gg, v in rows if gg == g])
    assert None in got and got[None] == _local_gini_ppm([5])


def test_gini_zero_mass_group_drops_and_partition_independent(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as P

    rng = random.Random(43)
    rows = [("live", rng.randint(1, 60)) for _ in range(500)]
    rows += [("dead", 0)] * 40  # total == 0: Gini undefined, must drop
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = P.gini_concentration(df, "v", group_cols=["g"]).collect()
    assert {r["g"] for r in got} == {"live"}
    # global path: result independent of layout and range partition count
    flat = df.select("v")
    a = P.gini_concentration(flat.repartition(3), "v").collect()[0]
    b = P.gini_concentration(
        flat.repartition(17, "v"), "v", range_partitions=5
    ).collect()[0]
    assert tuple(a) == tuple(b)


# ---------------------------------------------------------------------------
# spearman_exact


def _spearman_ref(xs, ys):
    """Fraction-exact Pearson-on-average-ranks (x4, doubled ranks)."""
    import collections
    from fractions import Fraction

    def avg_ranks(v):
        cnt = collections.Counter(v)
        cum, r = 0, {}
        for k in sorted(cnt):
            r[k] = Fraction(2 * cum + cnt[k] + 1, 2)
            cum += cnt[k]
        return [r[t] for t in v]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = sum((a - mx) ** 2 for a in rx)
    dy = sum((b - my) ** 2 for b in ry)
    return 4 * num, 4 * dx, 4 * dy


def test_spearman_matches_fraction_reference_randomized(spark):
    import random

    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    rng = random.Random(0x5EA2)
    for trial in range(10):
        n = rng.randint(3, 50)
        xs = [rng.randint(0, 9) for _ in range(n)]
        ys = [x + rng.randint(-4, 4) for x in xs]
        df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
        out = spearman_exact(df, "x", "y").collect()
        num, dx, dy = _spearman_ref(xs, ys)
        if dx == 0 or dy == 0:
            assert out == [], (trial, xs, ys)
            continue
        r = out[0]
        assert (r["num"], r["den_x"], r["den_y"], r["n"]) == (
            num, dx, dy, n,
        ), (trial, xs, ys)


def test_spearman_monotone_extremes_and_tie_invariance(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    up = spark.createDataFrame(
        [(i, i * i) for i in range(1, 9)], "x long, y long"
    )
    assert spearman_exact(up, "x", "y").collect()[0]["rho_e6"] == 1_000_000
    down = spark.createDataFrame(
        [(i, -3 * i) for i in range(1, 9)], "x long, y long"
    )
    assert (
        spearman_exact(down, "x", "y").collect()[0]["rho_e6"] == -1_000_000
    )
    # rho is rank-based: any monotone transform of y leaves it unchanged
    a = [(1, 10), (2, 10), (3, 30), (4, 25)]
    b = [(1, 100), (2, 100), (3, 900), (4, 600)]  # same y-RANKS incl. tie
    ra = spearman_exact(
        spark.createDataFrame(a, "x long, y long"), "x", "y"
    ).collect()[0]
    rb = spearman_exact(
        spark.createDataFrame(b, "x long, y long"), "x", "y"
    ).collect()[0]
    assert (ra["num"], ra["den_x"], ra["den_y"]) == (
        rb["num"], rb["den_x"], rb["den_y"],
    )


def test_spearman_constant_column_drops_nulls_excluded_grouped(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    rows = [
        ("a", 1, 5), ("a", 2, 7), ("a", None, 9), ("a", 3, None),
        ("b", 1, 4), ("b", 2, 4), ("b", 3, 4),  # constant y: drops
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = spearman_exact(df, "x", "y", group_cols=["g"]).collect()
    assert [r["g"] for r in out] == ["a"]
    assert out[0]["n"] == 2  # null rows excluded
    assert out[0]["rho_e6"] == 1_000_000


def test_spearman_grouped_plan_has_no_single_partition(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    df = spark.createDataFrame(
        [("g", 1, 2), ("g", 2, 3)], "g string, x long, y long"
    )
    plan = (
        spearman_exact(df, "x", "y", group_cols=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SinglePartition" not in plan


# ---------------------------------------------------------------------------
# kendall_tau_exact


def _kendall_brute(xs, ys):
    n = len(xs)
    nc = nd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            if dx == 0:
                tx += 1
                if dy == 0:
                    ty += 1
            elif dy == 0:
                ty += 1
            elif dx * dy > 0:
                nc += 1
            else:
                nd += 1
    return nc, nd, tx, ty


def test_kendall_matches_brute_force_randomized(spark):
    import math
    import random

    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        kendall_tau_exact,
    )

    rng = random.Random(0x7A0B)
    for trial in range(8):
        n = rng.randint(3, 40)
        xs = [rng.randint(0, 5) for _ in range(n)]
        ys = [x + rng.randint(-2, 2) for x in xs]
        df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
        out = kendall_tau_exact(df, "x", "y").collect()
        nc, nd, tx, ty = _kendall_brute(xs, ys)
        n0 = n * (n - 1) // 2
        if n0 == tx or n0 == ty:
            assert out == [], (trial, xs, ys)
            continue
        r = out[0]
        assert (r["nc"], r["nd"], r["tx_pairs"], r["ty_pairs"], r["n"]) == (
            nc, nd, tx, ty, n,
        ), (trial, xs, ys)
        want = math.floor(
            (nc - nd) * 1e6 / (math.sqrt(n0 - tx) * math.sqrt(n0 - ty))
            + 0.5
        )
        assert r["tau_e6"] == want, (trial, xs, ys)


def test_kendall_extremes_and_monotone_invariance(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        kendall_tau_exact,
    )

    up = spark.createDataFrame(
        [(i, i * i) for i in range(1, 9)], "x long, y long"
    )
    assert kendall_tau_exact(up, "x", "y").collect()[0]["tau_e6"] == 1_000_000
    down = spark.createDataFrame(
        [(i, 100 - i) for i in range(1, 9)], "x long, y long"
    )
    assert (
        kendall_tau_exact(down, "x", "y").collect()[0]["tau_e6"]
        == -1_000_000
    )


def test_kendall_constant_drops_and_grouped(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        kendall_tau_exact,
    )

    rows = [
        ("a", 1, 2), ("a", 2, 5), ("a", 3, 4),
        ("b", 1, 9), ("b", 2, 9),  # constant y: drops
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = kendall_tau_exact(df, "x", "y", group_cols=["g"]).collect()
    assert [r["g"] for r in out] == ["a"]
    assert (out[0]["nc"], out[0]["nd"]) == (2, 1)


def test_kendall_max_cells_raises(spark):
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        kendall_tau_exact,
    )

    df = spark.createDataFrame(
        [(i, i) for i in range(30)], "x long, y long"
    )
    with pytest.raises(ValueError, match="max_cells"):
        kendall_tau_exact(df, "x", "y", max_cells=10)


def test_spearman_two_phase_path_equals_window_path(spark):
    import random

    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    rng = random.Random(0x2F5)
    rows = [
        (rng.choice(["a", "b"]), rng.randint(0, 6),
         rng.randint(0, 1000))  # near-continuous y
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    key = lambda r: (r["g"],)
    a = sorted(
        (tuple(r) for r in spearman_exact(
            df, "x", "y", group_cols=["g"]).collect()),
    )
    b = sorted(
        (tuple(r) for r in spearman_exact(
            df, "x", "y", group_cols=["g"], two_phase=True).collect()),
    )
    assert a == b
    # global path too
    ag = sorted(tuple(r) for r in spearman_exact(df, "x", "y").collect())
    bg = sorted(tuple(r) for r in spearman_exact(
        df, "x", "y", two_phase=True).collect())
    assert ag == bg


# ---------------------------------------------------------------------------
# Round 8: overflow guards, data-driven two-phase, quantized Kendall
# ---------------------------------------------------------------------------


def test_auc_ppm_two_step_division_is_exact_floor(spark):
    """auc_ppm must equal floor(u2 * 1e6 / (2*n_pos*n_neg)) exactly —
    the two-step long division replaced the single-step form whose
    u2*500000 product wrapped past n_pos*n_neg ~ 9.2e12."""
    from fractions import Fraction

    rng = random.Random(81)
    rows = [(rng.randint(0, 37), rng.random() < 0.3) for _ in range(2500)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    r = R.auc_exact(df, "s", "y").collect()[0]
    want = int(Fraction(r["u2"] * 1_000_000, 2 * r["n_pos"] * r["n_neg"]))
    assert r["auc_ppm"] == want


def test_auc_overflow_guard_raises_with_sharding_hint(spark, monkeypatch):
    """Past the exact-ppm bound the operator must RAISE (distributed
    raise_error CASE on the exact class counts), never emit a wrapped
    ppm.  The ceiling is monkeypatched down so a tiny input crosses."""
    monkeypatch.setattr(R, "_I64_MAX", 1000)
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, True)], "s bigint, y boolean"
    )
    with pytest.raises(Exception, match="shard"):
        R.auc_exact(df, "s", "y").collect()


def test_auc_grouped_auto_two_phase_matches_window(spark, monkeypatch):
    """With the distinct threshold probed PAST, the grouped path must
    swap to the range-partitioned prefix and agree with the window
    path bit-for-bit."""
    rng = random.Random(82)
    rows = [
        (f"g{i % 2}", rng.randint(0, 100_000), rng.random() < 0.5)
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    window = sorted(
        tuple(r)
        for r in R.auc_exact(
            df, "s", "y", group_cols=["g"], two_phase=False
        ).collect()
    )
    monkeypatch.setattr(R, "_TWO_PHASE_MIN_DISTINCT", 10)
    auto = sorted(
        tuple(r)
        for r in R.auc_exact(df, "s", "y", group_cols=["g"]).collect()
    )
    assert auto == window


def test_spearman_fractional_input_raises(spark):
    """A double score in [0,1) collapses to constant 0 under the
    bigint cast — the default probe must refuse it loudly instead of
    silently dropping the group."""
    df = spark.createDataFrame(
        [(1, 0.25), (2, 0.75), (3, 0.5)], "x long, y double"
    )
    with pytest.raises(ValueError, match="fractional"):
        R.spearman_exact(df, "x", "y")
    # integer-VALUED doubles pass and match the integer-typed run
    ok = spark.createDataFrame(
        [(1, 3.0), (2, 1.0), (3, 2.0), (4, 4.0)], "x long, y double"
    )
    got = R.spearman_exact(ok, "x", "y").collect()[0]
    ints = spark.createDataFrame(
        [(1, 3), (2, 1), (3, 2), (4, 4)], "x long, y long"
    )
    want = R.spearman_exact(ints, "x", "y").collect()[0]
    assert tuple(got) == tuple(want)


def test_spearman_auto_two_phase_per_column_matches_window(
    spark, monkeypatch
):
    """The probe picks the path PER COLUMN (a near-continuous y swaps
    to the grouped range prefix while a bounded x keeps the window);
    results must equal both forced paths bit-for-bit."""
    rng = random.Random(83)
    rows = [
        (f"g{i % 3}", rng.randint(1, 8), rng.randint(0, 1_000_000))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    forced_window = sorted(
        tuple(r)
        for r in R.spearman_exact(
            df, "x", "y", group_cols=["g"], two_phase=False
        ).collect()
    )
    forced_prefix = sorted(
        tuple(r)
        for r in R.spearman_exact(
            df, "x", "y", group_cols=["g"], two_phase=True
        ).collect()
    )
    monkeypatch.setattr(R, "_TWO_PHASE_MIN_DISTINCT", 50)
    auto = sorted(
        tuple(r)
        for r in R.spearman_exact(
            df, "x", "y", group_cols=["g"]
        ).collect()
    )
    assert auto == forced_window == forced_prefix


def test_spearman_n_bound_probe_raises(spark, monkeypatch):
    monkeypatch.setattr(R, "_SPEARMAN_N_MAX", 50)
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "x long, y long"
    )
    with pytest.raises(ValueError, match="shard"):
        R.spearman_exact(df, "x", "y")


def test_spearman_n_bound_backstop_raises_without_probe(
    spark, monkeypatch
):
    """Explicit two_phase skips the driver probe; the distributed
    raise_error CASE on the exact per-group count must still fire."""
    monkeypatch.setattr(R, "_SPEARMAN_N_MAX", 50)
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(100)], "x long, y long"
    )
    with pytest.raises(Exception, match="shard"):
        R.spearman_exact(df, "x", "y", two_phase=False).collect()


def test_kendall_backstop_guard_raises(spark, monkeypatch):
    monkeypatch.setattr(R, "_KENDALL_N_MAX", 10)
    df = spark.createDataFrame(
        [(i % 5, i % 3) for i in range(20)], "x long, y long"
    )
    with pytest.raises(Exception, match="shard"):
        R.kendall_tau_exact(df, "x", "y").collect()


def test_kendall_quantized_grid_prefix_matches_cell_pair(spark):
    """The grid-prefix dominance algebra must agree with the exact
    cell-pair self-join on the SAME quantized data (the algorithmic
    differential), across random grouped inputs."""
    rng = random.Random(84)
    for trial in range(4):
        b = rng.choice([3, 5, 8])
        rows = [
            (f"g{i % 2}", rng.randint(1, 12), rng.randint(0, 5000))
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "g string, x long, y long")
        got = sorted(
            tuple(r)
            for r in R.kendall_tau_quantized(
                df, "x", "y", group_cols=["g"], y_buckets=b
            ).collect()
        )
        # reference: quantize in Python with the same integer formula,
        # then run the exact cell-pair operator
        spans = {}
        for g, _, y in rows:
            lo, hi = spans.get(g, (y, y))
            spans[g] = (min(lo, y), max(hi, y))
        qrows = [
            (g, x, ((y - spans[g][0]) * b) // (spans[g][1] - spans[g][0] + 1))
            for g, x, y in rows
        ]
        qdf = spark.createDataFrame(qrows, "g string, x long, y long")
        want = sorted(
            tuple(r)
            for r in R.kendall_tau_exact(
                qdf, "x", "y", group_cols=["g"]
            ).collect()
        )
        assert got == want, (trial, b)


def test_kendall_quantized_kernel_bitequal_sql(spark):
    """r13 optimization: the grouped Arrow grid kernel (impl='kernel',
    the default) must be BIT-IDENTICAL to the retained densified-grid
    window formulation (impl='sql') — grouped, global, and with a NULL
    group key (the null-safe-join hazard the SQL path guards)."""
    rng = random.Random(86)
    rows = [
        (
            rng.choice(["g0", "g1", None]),
            rng.randint(1, 15),
            rng.randint(0, 9999),
        )
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    def nskey(t):  # None-safe tuple sort (the NULL group row)
        return tuple((x is None, x) for x in t)

    for kwargs in (
        {"group_cols": ["g"], "y_buckets": 7},
        {"group_cols": ["g"], "y_buckets": 64, "x_buckets": 4},
        {"y_buckets": 16},  # global: one grid-bounded kernel task
    ):
        kern = sorted(
            (
                tuple(r)
                for r in R.kendall_tau_quantized(
                    df, "x", "y", **kwargs
                ).collect()
            ),
            key=nskey,
        )
        sql = sorted(
            (
                tuple(r)
                for r in R.kendall_tau_quantized(
                    df, "x", "y", impl="sql", **kwargs
                ).collect()
            ),
            key=nskey,
        )
        assert kern == sql, kwargs
        assert kern, kwargs  # non-degenerate: groups actually emitted
        if "group_cols" in kwargs:
            # the NULL group key must survive both implementations
            assert any(t[0] is None for t in kern), kwargs


def test_kendall_quantized_injective_buckets_equal_exact(spark):
    """With bucket count >= the value span, quantization is strictly
    monotone (injective) and tau-b is invariant — the quantized
    operator must reproduce kendall_tau_exact on the raw data."""
    rng = random.Random(85)
    rows = [(rng.randint(1, 9), rng.randint(100, 160)) for _ in range(400)]
    df = spark.createDataFrame(rows, "x long, y long")
    exact = R.kendall_tau_exact(df, "x", "y").collect()[0]
    quant = R.kendall_tau_quantized(df, "x", "y", y_buckets=61).collect()[0]
    assert (
        quant["nc"], quant["nd"], quant["tx_pairs"], quant["ty_pairs"],
        quant["n"], quant["tau_e6"],
    ) == (
        exact["nc"], exact["nd"], exact["tx_pairs"], exact["ty_pairs"],
        exact["n"], exact["tau_e6"],
    )


def test_kendall_quantized_grid_probe_raises(spark):
    df = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(50)], "x long, y long"
    )
    with pytest.raises(ValueError, match="grid"):
        R.kendall_tau_quantized(df, "x", "y", y_buckets=16, max_grid=4)


# ---------------------------------------------------------------------------
# isotonic_calibrate (PAV)


def _pav_reference(scores_pos_n):
    """Independent O(n^2) fixed-point PAV: repeatedly merge the first
    adjacent violating pair until the sequence is isotonic — a
    different control flow from the operator's one-pass stack."""
    from fractions import Fraction

    blocks = [
        [Fraction(p, n), p, n, [s]] for s, p, n in sorted(scores_pos_n)
    ]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            if blocks[i][0] >= blocks[i + 1][0]:
                a, b = blocks[i], blocks[i + 1]
                merged = [
                    Fraction(a[1] + b[1], a[2] + b[2]),
                    a[1] + b[1],
                    a[2] + b[2],
                    a[3] + b[3],
                ]
                blocks[i : i + 2] = [merged]
                changed = True
                break
    out = {}
    for rate, p, n, ss in blocks:
        for s in ss:
            out[s] = (p, n)
    return out


def test_isotonic_matches_fixed_point_reference_randomized(spark):
    rng = random.Random(86)
    for trial in range(5):
        rows = []
        per_score = {}
        for _ in range(600):
            s = rng.randint(0, 25)
            y = rng.random() < min(0.9, 0.1 + 0.03 * s + rng.random() * 0.2)
            rows.append((s, y))
            p, n = per_score.get(s, (0, 0))
            per_score[s] = (p + int(y), n + 1)
        df = spark.createDataFrame(rows, "s long, y boolean")
        got = {
            r["s"]: (r["cal_num"], r["cal_den"])
            for r in R.isotonic_calibrate(df, "s", "y").collect()
        }
        want = _pav_reference(
            [(s, p, n) for s, (p, n) in per_score.items()]
        )
        from fractions import Fraction

        assert set(got) == set(want), trial
        for s in got:
            assert Fraction(*got[s]) == Fraction(*want[s]), (trial, s)


def test_isotonic_invariants_and_grouping(spark):
    rng = random.Random(87)
    rows = [
        (f"g{i % 2}", rng.randint(0, 40), rng.random() < 0.5)
        for i in range(800)
    ]
    df = spark.createDataFrame(rows, "g string, s long, y boolean")
    out = R.isotonic_calibrate(df, "s", "y", group_cols=["g"]).collect()
    from collections import defaultdict
    from fractions import Fraction

    per_g = defaultdict(list)
    for r in out:
        per_g[r["g"]].append(r)
    raw = defaultdict(lambda: [0, 0])
    for g, s, y in rows:
        raw[g][0] += int(y)
        raw[g][1] += 1
    for g, rs in per_g.items():
        rs.sort(key=lambda r: r["s"])
        rates = [Fraction(r["cal_num"], r["cal_den"]) for r in rs]
        # isotonic: calibrated rates never decrease in score
        assert all(a <= b for a, b in zip(rates, rates[1:])), g
        # mass preservation: each pooled block's rational is the block's
        # own (pos, n), so sum over rows of n == group rows and
        # per-block identity pos/n holds; check the block partition sums
        total_n = sum(r["n"] for r in rs)
        assert total_n == raw[g][1]
        # weighted mean of calibrated rates == raw positive rate
        acc = sum(Fraction(r["cal_num"], r["cal_den"]) * r["n"] for r in rs)
        assert acc == Fraction(raw[g][0], 1)


def test_isotonic_cap_raises(spark):
    df = spark.createDataFrame(
        [(i, i % 2 == 0) for i in range(100)], "s long, y boolean"
    )
    with pytest.raises(Exception, match="quantize"):
        R.isotonic_calibrate(df, "s", "y", max_buckets=10).collect()


def test_isotonic_plan_is_contraction_then_grouped_pandas(spark):
    df = spark.createDataFrame(
        [("g", 1, True), ("g", 2, False)], "g string, s long, y boolean"
    )
    p = (
        R.isotonic_calibrate(df, "s", "y", group_cols=["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the PAV pandas stage consumes the (group, score) CONTRACTION —
    # an aggregate must sit below FlatMapGroupsInPandas, and the only
    # exchanges are the contraction's and the group regroup
    assert "FlatMapGroupsInPandas" in p
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


# ---------------------------------------------------------------------------
# roc_curve_points


def test_roc_curve_matches_brute_and_ties_to_auc(spark):
    rng = random.Random(88)
    rows = [(rng.randint(0, 30), rng.random() < 0.4) for _ in range(1200)]
    df = spark.createDataFrame(rows, "s bigint, y boolean")
    got = {
        r["s"]: (r["tp"], r["fp"], r["fn"], r["tn"])
        for r in R.roc_curve_points(df, "s", "y").collect()
    }
    scores = sorted({s for s, _ in rows})
    assert set(got) == set(scores)
    for t in scores:
        tp = sum(1 for s, y in rows if y and s >= t)
        fp = sum(1 for s, y in rows if not y and s >= t)
        fn = sum(1 for s, y in rows if y and s < t)
        tn = sum(1 for s, y in rows if not y and s < t)
        assert got[t] == (tp, fp, fn, tn), t
    # trapezoid over the curve's (fp, tp) points == auc_exact's U2:
    # sum over thresholds of (fp_gap) * (tp_above + tp_below) = u2
    pts = sorted(got)  # ascending score = descending (fp, tp)
    curve = [(got[t][1], got[t][0]) for t in pts] + [(0, 0)]  # (fp, tp)
    u2 = sum(
        (fp1 - fp2) * (tp1 + tp2)
        for (fp1, tp1), (fp2, tp2) in zip(curve, curve[1:])
    )
    want = R.auc_exact(df, "s", "y").collect()[0]
    assert u2 == want["u2"]
    # the lowest threshold predicts everything positive: (fp, tp) =
    # (n_neg, n_pos)
    assert curve[0] == (want["n_neg"], want["n_pos"])


def test_roc_curve_grouped_keeps_empty_class_and_caps(spark):
    df = spark.createDataFrame(
        [("g1", 1, True), ("g1", 2, True), ("g2", 1, True), ("g2", 2, False)],
        "g string, s bigint, y boolean",
    )
    out = {
        (r["g"], r["s"]): (r["tp"], r["fp"], r["fn"], r["tn"])
        for r in R.roc_curve_points(
            df, "s", "y", group_cols=["g"]
        ).collect()
    }
    # g1 has no negatives: curve still defined with fp = tn = 0
    assert out[("g1", 2)] == (1, 0, 1, 0)
    assert out[("g2", 2)] == (0, 1, 1, 0)
    with pytest.raises(ValueError, match="quantize"):
        R.roc_curve_points(df, "s", "y", max_points=1)


def test_kendall_n0_expression_exact_through_guarded_range(spark):
    """C(n,2) must be exact for every n the guard admits — the naive
    n*(n-1) DIV 2 wraps at n > ~3.04e9, INSIDE the guarded range
    (round-8 review).  Check the emitted parity-split expression at
    the wrap boundary and at the guard ceiling."""
    for n in (3_037_000_499, 3_037_000_500, 4_000_000_000, 4_294_967_295):
        [r] = spark.sql(
            f"SELECT CASE WHEN {n} % 2 = 0 THEN ({n} DIV 2) * ({n} - 1)"
            f" ELSE {n} * (({n} - 1) DIV 2) END AS n0"
        ).collect()
        assert r["n0"] == n * (n - 1) // 2, n


def test_spearman_guard_fires_before_undefined_rho_filter(
    spark, monkeypatch
):
    """A past-bound group whose den_x is degenerate (or wrapped
    negative) must RAISE, not be silently dropped by the den > 0
    filter — the guard lives inside den_x (round-8 review)."""
    monkeypatch.setattr(R, "_SPEARMAN_N_MAX", 50)
    # constant x: den_x = 0, so an after-filter guard would never see
    # this group at all
    df = spark.createDataFrame(
        [(7, i) for i in range(100)], "x long, y long"
    )
    with pytest.raises(Exception, match="shard"):
        R.spearman_exact(df, "x", "y", two_phase=False).collect()


# ---------------------------------------------------------------------------
# Round 9: NULL-group safety on the two-phase / kendall paths, wrap-proof
# quantize span guard (driver ADVICE r8)
# ---------------------------------------------------------------------------


def test_auc_two_phase_keeps_null_group(spark):
    """The grouped range-prefix path joins offsets back NULL-SAFELY: a
    NULL group key — a real group under groupBy — must appear in the
    two-phase output exactly as it does under the window path (the r8
    join dropped it via plain group equality)."""
    rng = random.Random(91)
    rows = [
        (rng.choice(["a", None]), rng.randint(0, 50), rng.random() < 0.5)
        for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    key = lambda t: tuple(map(str, t))
    window = sorted(
        (
            tuple(r)
            for r in R.auc_exact(
                df, "s", "y", group_cols=["g"], two_phase=False
            ).collect()
        ),
        key=key,
    )
    prefix = sorted(
        (
            tuple(r)
            for r in R.auc_exact(
                df, "s", "y", group_cols=["g"], two_phase=True
            ).collect()
        ),
        key=key,
    )
    assert sum(1 for t in window if t[0] is None) == 1  # NULL group exists
    assert prefix == window


def test_two_phase_grouped_offsets_join_not_forced_broadcast(spark):
    """Grouped offsets are range_partitions x #groups rows — NOT
    bounded at millions of groups, so the join-back must carry NO
    broadcast hint (AQE picks at runtime); the ungrouped offsets table
    (exactly range_partitions rows) keeps its hint."""
    df = spark.createDataFrame(
        [("a" if i % 2 else "b", i, i % 3) for i in range(50)],
        "g string, s bigint, neg bigint",
    )
    grouped = R.global_exclusive_prefix(
        df, order_col="s", sum_col="neg", out_col="o", group_cols=["g"]
    )
    g_plan = grouped._jdf.queryExecution().analyzed().toString().lower()
    assert "broadcast" not in g_plan
    glob = R.global_exclusive_prefix(
        df, order_col="s", sum_col="neg", out_col="o"
    )
    u_plan = glob._jdf.queryExecution().analyzed().toString().lower()
    assert "broadcast" in u_plan


def test_kendall_quantized_span_guard_is_wrap_proof(spark):
    """lo=-2^62, hi=2^62: the true span (2^63+1) WRAPS int64, so a
    guard that forms hi-lo+1 compares a wrapped negative and passes;
    the sign-split guard must still raise."""
    df = spark.createDataFrame(
        [(-(2**62), 0), (2**62, 1), (0, 1)], "x bigint, y bigint"
    )
    with pytest.raises(Exception, match="rescale"):
        R.kendall_tau_quantized(
            df, "x", "y", x_buckets=16, y_buckets=2
        ).collect()


def test_kendall_quantized_span_guard_same_sign_overwide(spark):
    """Same-sign bounds that fit int64 but exceed I64_MAX/buckets must
    still raise through the no-wrap arm (hi - lo > T - 1)."""
    df = spark.createDataFrame(
        [(0, 0), (2**61, 1), (5, 1)], "x bigint, y bigint"
    )
    with pytest.raises(Exception, match="rescale"):
        R.kendall_tau_quantized(
            df, "x", "y", x_buckets=16, y_buckets=2
        ).collect()


def test_kendall_null_group_kept_exact_and_quantized(spark):
    """A NULL group key is a real group under groupBy: both kendall
    variants must emit its row, identical to the same data under a
    non-NULL key (the r8 grid/pair/tie joins dropped it via plain
    group equality)."""
    data = [(1, 5), (2, 3), (3, 9), (4, 1), (5, 7), (2, 8)]
    rows = [("a", x, y) for x, y in data] + [
        (None, x, y) for x, y in data
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    out = {
        r["g"]: r
        for r in R.kendall_tau_exact(
            df, "x", "y", group_cols=["g"]
        ).collect()
    }
    assert set(out) == {"a", None}
    a, n = out["a"], out[None]
    assert (a["nc"], a["nd"], a["tx_pairs"], a["ty_pairs"], a["tau_e6"]) == (
        n["nc"], n["nd"], n["tx_pairs"], n["ty_pairs"], n["tau_e6"]
    )
    outq = {
        r["g"]: r
        for r in R.kendall_tau_quantized(
            df, "x", "y", group_cols=["g"], y_buckets=4
        ).collect()
    }
    assert set(outq) == {"a", None}
    qa, qn = outq["a"], outq[None]
    assert (qa["nc"], qa["nd"], qa["tau_e6"]) == (
        qn["nc"], qn["nd"], qn["tau_e6"]
    )


def test_auc_two_phase_null_group_numeric_key(spark):
    """Round-9 review: a nullable NUMERIC group column reaches the
    local-prefix pandas pass as NaN, and NaN != NaN would scatter the
    carry dict (local_lt pinned to 0 for the whole NULL group) — the
    normalized key must make the two-phase path agree with the window
    path bit-for-bit, NULL group included."""
    rng = random.Random(92)
    rows = [
        (rng.choice([7, None]), rng.randint(0, 40), rng.random() < 0.5)
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "g bigint, s bigint, y boolean")
    key = lambda t: tuple(map(str, t))
    window = sorted(
        (
            tuple(r)
            for r in R.auc_exact(
                df, "s", "y", group_cols=["g"], two_phase=False
            ).collect()
        ),
        key=key,
    )
    prefix = sorted(
        (
            tuple(r)
            for r in R.auc_exact(
                df, "s", "y", group_cols=["g"], two_phase=True
            ).collect()
        ),
        key=key,
    )
    assert sum(1 for t in window if t[0] is None) == 1
    assert prefix == window


def test_calibration_bins_matches_brute_force_randomized(spark):
    """Round-9: bin assignment, edges, counts, and ppm rates against a
    pure-Python reference, grouped and global, NULL group included."""
    from fractions import Fraction

    rng = random.Random(0xCB91)
    rows = [
        (rng.choice(["a", "b", None]), rng.randint(-50, 200),
         rng.random() < 0.3)
        for _ in range(800)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    B = 8
    got = {
        (r["g"], r["bin"]): (
            r["bin_lo"], r["n"], r["n_pos"], r["pos_rate_ppm"]
        )
        for r in R.calibration_bins(
            df, "s", "y", group_cols=["g"], bins=B
        ).collect()
    }
    by_g: dict = {}
    for g, s, y in rows:
        by_g.setdefault(g, []).append((s, y))
    want = {}
    for g, vals in by_g.items():
        lo = min(s for s, _ in vals)
        hi = max(s for s, _ in vals)
        span = hi - lo + 1
        per: dict = {}
        for s, y in vals:
            bin_ = ((s - lo) * B) // span
            n, np_ = per.get(bin_, (0, 0))
            per[bin_] = (n + 1, np_ + (1 if y else 0))
        for bin_, (n, np_) in per.items():
            want[(g, bin_)] = (
                lo + (bin_ * span) // B,
                n,
                np_,
                int(Fraction(np_ * 1_000_000, n)),
            )
    assert got == want
    assert any(k[0] is None for k in got)  # NULL group kept
    # global path
    gg = {
        r["bin"]: (r["n"], r["n_pos"])
        for r in R.calibration_bins(df, "s", "y", bins=B).collect()
    }
    flat = [(s, y) for _, s, y in rows]
    lo = min(s for s, _ in flat)
    hi = max(s for s, _ in flat)
    want_g: dict = {}
    for s, y in flat:
        bin_ = ((s - lo) * B) // (hi - lo + 1)
        n, np_ = want_g.get(bin_, (0, 0))
        want_g[bin_] = (n + 1, np_ + (1 if y else 0))
    assert gg == want_g


def test_calibration_bins_guards(spark):
    df = spark.createDataFrame(
        [(-(2**62), True), (2**62, False)], "s bigint, y boolean"
    )
    # wrap-proof span guard (same arms as kendall quantize)
    with pytest.raises(Exception, match="rescale"):
        R.calibration_bins(df, "s", "y", bins=8).collect()
    small = spark.createDataFrame([(1, True)], "s bigint, y boolean")
    with pytest.raises(ValueError, match="bins"):
        R.calibration_bins(small, "s", "y", bins=1)
    # constant score: everything lands in bin 0, rate exact
    const = spark.createDataFrame(
        [(5, True), (5, False), (5, True)], "s bigint, y boolean"
    )
    out = R.calibration_bins(const, "s", "y", bins=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bin"], r["bin_lo"], r["n"], r["n_pos"]) == (0, 5, 3, 2)
    assert r["pos_rate_ppm"] == 666_666


def test_calibration_bins_mass_mode_matches_brute_force(spark):
    """Equal-mass bins: a tied score value lands whole in the bin of
    its first rank — checked against a pure-Python replica over
    tie-heavy random data, grouped and global."""
    from fractions import Fraction

    rng = random.Random(0xCB92)
    rows = [
        (rng.choice(["a", "b"]), rng.randint(0, 12), rng.random() < 0.4)
        for _ in range(600)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    B = 5
    got = {
        (r["g"], r["bin"]): (
            r["bin_lo"], r["n"], r["n_pos"], r["pos_rate_ppm"]
        )
        for r in R.calibration_bins(
            df, "s", "y", group_cols=["g"], bins=B, mode="mass"
        ).collect()
    }
    by_g: dict = {}
    for g, s, y in rows:
        by_g.setdefault(g, []).append((s, y))
    want = {}
    for g, vals in by_g.items():
        n_all = len(vals)
        per_s: dict = {}
        for s, y in vals:
            c, cp = per_s.get(s, (0, 0))
            per_s[s] = (c + 1, cp + (1 if y else 0))
        cum = 0
        bins_acc: dict = {}
        for s in sorted(per_s):
            c, cp = per_s[s]
            bin_ = (cum * B) // n_all
            lo, n, np_ = bins_acc.get(bin_, (s, 0, 0))
            bins_acc[bin_] = (min(lo, s), n + c, np_ + cp)
            cum += c
        for bin_, (lo, n, np_) in bins_acc.items():
            want[(g, bin_)] = (lo, n, np_, int(Fraction(np_ * 1_000_000, n)))
    assert got == want
    with pytest.raises(ValueError, match="mode"):
        R.calibration_bins(df, "s", "y", mode="bogus")
    # mass bins sum to the group totals and n is balanced within the
    # tie-granularity (no bin exceeds ceil(n/B) + max tie mass)
    for g in ("a", "b"):
        tot = sum(v[1] for k, v in got.items() if k[0] == g)
        assert tot == len(by_g[g])


def test_cohens_kappa_matches_brute_force_randomized(spark):
    """po/pe ppm against a pure-Python contingency replica, grouped
    (with a NULL group) and global; kappa derivation sanity on the
    perfect-agreement and independence extremes."""
    from fractions import Fraction

    rng = random.Random(0xCA99)
    cats = ["en", "de", "fr", "und"]
    rows = [
        (rng.choice(["a", None]), rng.choice(cats), rng.choice(cats))
        for _ in range(700)
    ]
    df = spark.createDataFrame(rows, "g string, ra string, rb string")
    got = {
        r["g"]: (r["n"], r["agree"], r["po_ppm"], r["pe_ppm"])
        for r in R.cohens_kappa(
            df, "ra", "rb", group_cols=["g"]
        ).collect()
    }
    by_g: dict = {}
    for g, a, b in rows:
        by_g.setdefault(g, []).append((a, b))
    for g, vals in by_g.items():
        n = len(vals)
        agree = sum(1 for a, b in vals if a == b)
        from collections import Counter

        ra = Counter(a for a, _ in vals)
        rb = Counter(b for _, b in vals)
        s = sum(ra[k] * rb.get(k, 0) for k in ra)
        want = (
            n,
            agree,
            int(Fraction(agree * 1_000_000, n)),
            int(Fraction(s * 1_000_000, n * n)),
        )
        assert got[g] == want, g
    assert None in got  # NULL group kept
    # perfect agreement: po_ppm = 1e6
    perf = spark.createDataFrame(
        [("x", "x"), ("y", "y"), ("x", "x")], "ra string, rb string"
    )
    r = R.cohens_kappa(perf, "ra", "rb").collect()[0]
    assert (r["n"], r["agree"], r["po_ppm"]) == (3, 3, 1_000_000)
    # independence-ish: constant rater b -> pe = marginal of a's match
    const = spark.createDataFrame(
        [("x", "z"), ("y", "z"), ("z", "z"), ("z", "z")],
        "ra string, rb string",
    )
    r = R.cohens_kappa(const, "ra", "rb").collect()[0]
    # pe = sum(r_k * c_k)/n^2 = (r_z * 4)/16 = 8/16
    assert (r["agree"], r["pe_ppm"]) == (2, 500_000)


def test_cohens_kappa_overflow_guard_raises(spark, monkeypatch):
    monkeypatch.setattr(R, "_KAPPA_N_MAX", 2)
    df = spark.createDataFrame(
        [("x", "x"), ("y", "x"), ("x", "y")], "ra string, rb string"
    )
    with pytest.raises(Exception, match="shard"):
        R.cohens_kappa(df, "ra", "rb").collect()


def test_spearman_null_group_kept_both_paths(spark):
    """Round-9: spearman's value joins (and the two-phase totals
    join) must be null-safe on the group key — a NULL group's rho
    must appear on BOTH strategy paths, equal to the same data under
    a non-NULL key."""
    data = [(1, 5), (2, 3), (3, 9), (4, 1), (5, 7), (2, 8)]
    rows = [("a", x, y) for x, y in data] + [
        (None, x, y) for x, y in data
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    for tp in (False, True):
        out = {
            r["g"]: r
            for r in R.spearman_exact(
                df, "x", "y", group_cols=["g"], two_phase=tp
            ).collect()
        }
        assert set(out) == {"a", None}, tp
        a, n = out["a"], out[None]
        assert (a["num"], a["den_x"], a["den_y"], a["rho_e6"]) == (
            n["num"], n["den_x"], n["den_y"], n["rho_e6"]
        ), tp


def test_probe_verified_group_count_restores_broadcast_hint(
    spark, monkeypatch
):
    """Round-9: when the probe proves the group count small, the
    two-phase offsets/totals joins carry the broadcast hint again
    (skipping AQE's pre-conversion shuffle-write of the contraction);
    with the threshold forced to 0 the hint must be absent (AQE
    decides at scale)."""
    rng = random.Random(93)
    rows = [
        ("g%d" % (i % 3), rng.randint(0, 100_000), rng.random() < 0.5)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "g string, s bigint, y boolean")
    monkeypatch.setattr(R, "_TWO_PHASE_MIN_DISTINCT", 10)
    out = R.auc_exact(df, "s", "y", group_cols=["g"])
    plan = out._jdf.queryExecution().analyzed().toString().lower()
    assert "broadcast" in plan
    monkeypatch.setattr(R, "_OFFSETS_BROADCAST_MAX_GROUPS", 0)
    out2 = R.auc_exact(df, "s", "y", group_cols=["g"])
    plan2 = out2._jdf.queryExecution().analyzed().toString().lower()
    assert "broadcast" not in plan2
    # values identical either way
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, out2.collect())
    )


def test_cohens_kappa_disjoint_categories_and_empty_overlap(spark):
    """Round-9 review: a group where the raters share NO category must
    still be emitted with pe_ppm = 0 (total disagreement is exactly
    what a kappa audit exists to surface), grouped and ungrouped."""
    df = spark.createDataFrame(
        [("g1", "x", "y"), ("g1", "x", "z"), ("g2", "a", "a")],
        "g string, ra string, rb string",
    )
    out = {
        r["g"]: (r["n"], r["agree"], r["po_ppm"], r["pe_ppm"])
        for r in R.cohens_kappa(
            df, "ra", "rb", group_cols=["g"]
        ).collect()
    }
    assert out["g1"] == (2, 0, 0, 0)
    assert out["g2"] == (1, 1, 1_000_000, 1_000_000)
    flat = spark.createDataFrame(
        [("x", "y"), ("x", "z")], "ra string, rb string"
    )
    r = R.cohens_kappa(flat, "ra", "rb").collect()[0]
    assert (r["n"], r["agree"], r["po_ppm"], r["pe_ppm"]) == (2, 0, 0, 0)


def _fleiss_expected(ratings, n_exp):
    """Pure-Python Fleiss replica: ratings = [(item, label)] for ONE
    group; returns (n_items, n_dropped, po_ppm, pe_ppm) over items
    with exactly n_exp ratings, or None if no item conforms."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    per_item: dict = defaultdict(Counter)
    for it, lab in ratings:
        per_item[it][lab] += 1
    conform = {
        it: c for it, c in per_item.items()
        if sum(c.values()) == n_exp
    }
    n_dropped = len(per_item) - len(conform)
    if not conform:
        return None
    N, n = len(conform), n_exp
    sum_sq = sum(v * v for c in conform.values() for v in c.values())
    cat = Counter()
    for c in conform.values():
        cat.update(c)
    s_cc = sum(v * v for v in cat.values())
    po = int(Fraction((sum_sq - N * n) * 1_000_000, N * n * (n - 1)))
    pe = int(Fraction(s_cc * 1_000_000, (N * n) * (N * n)))
    return (N, n_dropped, po, pe)


def test_fleiss_kappa_matches_brute_force_randomized(spark):
    """po/pe ppm against a pure-Python n_ij replica, grouped (with a
    NULL group), items with missing/extra ratings dropped and counted;
    perfect-agreement and single-category extremes."""
    rng = random.Random(0xF1E5)
    cats = ["en", "de", "fr", "und"]
    rows = []
    for g in ("a", "b", None):
        for it in range(40):
            # 2-5 ratings per item: only the 3-rating items conform
            for _ in range(rng.choice([2, 3, 3, 3, 4, 5])):
                rows.append((g, it, rng.choice(cats)))
    df = spark.createDataFrame(rows, "g string, item int, lab string")
    got = {
        r["g"]: (
            r["n_items"], r["n_items_dropped"], r["n_raters"],
            r["po_ppm"], r["pe_ppm"],
        )
        for r in R.fleiss_kappa(
            df, "item", "lab", group_cols=["g"], n_raters=3
        ).collect()
    }
    by_g: dict = {}
    for g, it, lab in rows:
        by_g.setdefault(g, []).append((it, lab))
    for g, vals in by_g.items():
        want = _fleiss_expected(vals, 3)
        assert want is not None
        n, dropped, po, pe = want
        assert got[g] == (n, dropped, 3, po, pe), g
    assert None in got  # NULL group kept
    # perfect agreement: every item unanimous -> po = 1e6
    perf = spark.createDataFrame(
        [(i, lab) for i, lab in enumerate(["x", "y", "x"]) for _ in range(3)],
        "item int, lab string",
    )
    r = R.fleiss_kappa(perf, "item", "lab", n_raters=3).collect()[0]
    assert (r["n_items"], r["po_ppm"], r["n_items_dropped"]) == (
        3, 1_000_000, 0,
    )
    # one category everywhere: pe = 1e6 as well (kappa undefined 0/0)
    assert r["pe_ppm"] < 1_000_000  # two categories above
    mono = spark.createDataFrame(
        [(i, "x") for i in range(4) for _ in range(3)],
        "item int, lab string",
    )
    r = R.fleiss_kappa(mono, "item", "lab", n_raters=3).collect()[0]
    assert (r["po_ppm"], r["pe_ppm"]) == (1_000_000, 1_000_000)


def test_fleiss_kappa_inferred_raters_null_rows_and_guards(spark):
    """n_raters=None infers the per-group max and drops items below
    it; NULL item/label rows are excluded; inferred n < 2 raises at
    execution, explicit n_raters < 2 raises at construction; the
    overflow guard fires past the (monkeypatched) ppm bound."""
    rows = [
        # group a: items 0,1 rated 3x, item 2 rated twice -> dropped
        *[("a", 0, lab) for lab in ("x", "x", "y")],
        *[("a", 1, lab) for lab in ("y", "y", "y")],
        *[("a", 2, lab) for lab in ("x", "y")],
        # NULL rows: excluded entirely
        ("a", None, "x"),
        ("a", 0, None),
    ]
    df = spark.createDataFrame(rows, "g string, item int, lab string")
    out = R.fleiss_kappa(df, "item", "lab", group_cols=["g"]).collect()
    assert len(out) == 1
    r = out[0]
    want = _fleiss_expected(
        [(0, "x"), (0, "x"), (0, "y"), (1, "y"), (1, "y"), (1, "y"),
         (2, "x"), (2, "y")], 3,
    )
    assert (
        r["n_items"], r["n_items_dropped"], r["po_ppm"], r["pe_ppm"]
    ) == (want[0], want[1], want[2], want[3])
    assert r["n_raters"] == 3
    import pytest as pt

    with pt.raises(ValueError, match="n_raters"):
        R.fleiss_kappa(df, "item", "lab", n_raters=1)
    single = spark.createDataFrame(
        [(0, "x"), (1, "y")], "item int, lab string"
    )
    with pt.raises(Exception, match="n_raters < 2"):
        R.fleiss_kappa(single, "item", "lab").collect()


def test_fleiss_kappa_overflow_guard_raises(spark, monkeypatch):
    monkeypatch.setattr(R, "_KAPPA_N_MAX", 5)
    df = spark.createDataFrame(
        [(i, "x") for i in range(4) for _ in range(2)],
        "item int, lab string",
    )
    with pytest.raises(Exception, match="exact-ppm bound"):
        R.fleiss_kappa(df, "item", "lab", n_raters=2).collect()


def test_kappa_ungrouped_crossjoin_invariant(spark):
    """r9 VERDICT cosmetic: the ungrouped cohens_kappa cross-joins the
    totals against a broadcast GLOBAL aggregate — pin the invariant
    that makes it safe: empty input -> zero rows out (never a
    fabricated row), non-empty input -> exactly one row (never a
    fan-out), even when the raters share no category (pe = 0)."""
    empty = spark.createDataFrame([], "ra string, rb string")
    assert R.cohens_kappa(empty, "ra", "rb").count() == 0
    disjoint = spark.createDataFrame(
        [("x", "p"), ("y", "q"), ("x", "q")], "ra string, rb string"
    )
    out = R.cohens_kappa(disjoint, "ra", "rb").collect()
    assert len(out) == 1
    assert (out[0]["agree"], out[0]["pe_ppm"]) == (0, 0)
    # same invariant for fleiss' inferred-raters path
    e2 = spark.createDataFrame([], "item int, lab string")
    assert R.fleiss_kappa(e2, "item", "lab").count() == 0


def _kripp_expected(ratings):
    """Pure-Python Krippendorff (nominal) replica: ratings = [(item,
    label)] for ONE group; returns (n_ratings, n_items, n_dropped,
    do_ppm, de_ppm) over pairable items (>= 2 ratings), or None if no
    item is pairable.  ppm values are exact floor(x * 1e6) via
    Fraction — the two-step ppm2 division equals that floor."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    per_item: dict = defaultdict(Counter)
    for it, lab in ratings:
        per_item[it][lab] += 1
    pair = {
        it: c for it, c in per_item.items() if sum(c.values()) >= 2
    }
    dropped = len(per_item) - len(pair)
    if not pair:
        return None
    n = sum(sum(c.values()) for c in pair.values())
    L = 27_720
    do_num = 0
    for c in pair.values():
        nu = sum(c.values())
        ssq = sum(v * v for v in c.values())
        do_num += (nu * nu - ssq) * (L // (nu - 1))
    cat = Counter()
    for c in pair.values():
        cat.update(c)
    s_cc = sum(v * v for v in cat.values())
    do = int(Fraction(do_num * 1_000_000, L * n))
    de = int(Fraction((n * n - s_cc) * 1_000_000, n * (n - 1)))
    return (n, len(pair), dropped, do, de)


def test_krippendorff_matches_brute_force_randomized(spark):
    """do/de ppm against a pure-Python replica, grouped (with a NULL
    group), items with 1-5 ratings so singletons are dropped and the
    1/(n_u - 1) weighting is exercised across mixed rater counts —
    the exact shape Fleiss must throw away; perfect-agreement and
    unanimous extremes."""
    rng = random.Random(0xA1FA)
    cats = ["en", "de", "fr", "und"]
    rows = []
    for g in ("a", "b", None):
        for it in range(40):
            for _ in range(rng.choice([1, 2, 2, 3, 3, 3, 4, 5])):
                rows.append((g, it, rng.choice(cats)))
    df = spark.createDataFrame(rows, "g string, item int, lab string")
    got = {
        r["g"]: (
            r["n_ratings"], r["n_items"], r["n_items_dropped"],
            r["do_ppm"], r["de_ppm"],
        )
        for r in R.krippendorff_alpha(
            df, "item", "lab", group_cols=["g"]
        ).collect()
    }
    by_g: dict = {}
    for g, it, lab in rows:
        by_g.setdefault(g, []).append((it, lab))
    for g, vals in by_g.items():
        want = _kripp_expected(vals)
        assert want is not None
        assert got[g] == want, g
    assert None in got  # NULL group kept
    # perfect agreement with 2 categories: Do = 0, De > 0 -> alpha 1
    perf = spark.createDataFrame(
        [(i, lab) for i, lab in enumerate(["x", "y", "x"])
         for _ in range(3)],
        "item int, lab string",
    )
    r = R.krippendorff_alpha(perf, "item", "lab").collect()[0]
    assert r["do_ppm"] == 0 and r["de_ppm"] > 0
    assert r["n_items_dropped"] == 0
    # unanimous single category: De = 0 too (alpha undefined,
    # caller-side 0/0 by contract)
    mono = spark.createDataFrame(
        [(i, "x") for i in range(4) for _ in range(2)],
        "item int, lab string",
    )
    r = R.krippendorff_alpha(mono, "item", "lab").collect()[0]
    assert (r["do_ppm"], r["de_ppm"]) == (0, 0)


def test_krippendorff_guards_nulls_and_invariants(spark, monkeypatch):
    """NULL item/label rows are excluded (abstention = missing
    rating); an item with > 12 ratings raises (the lcm(1..11) exact
    bound); the ppm overflow guard fires past the (monkeypatched)
    bound; ungrouped empty input -> zero rows (the sentinel filter);
    a group whose every item is a singleton vanishes."""
    rows = [
        ("a", 0, "x"), ("a", 0, "y"), ("a", 1, "x"), ("a", 1, "x"),
        ("a", None, "x"), ("a", 0, None),
        # group b: only singletons -> no pairable items -> no row
        ("b", 0, "x"), ("b", 1, "y"),
    ]
    df = spark.createDataFrame(rows, "g string, item int, lab string")
    out = R.krippendorff_alpha(df, "item", "lab", group_cols=["g"]).collect()
    assert len(out) == 1 and out[0]["g"] == "a"
    want = _kripp_expected(
        [(0, "x"), (0, "y"), (1, "x"), (1, "x")]
    )
    r = out[0]
    assert (
        r["n_ratings"], r["n_items"], r["n_items_dropped"],
        r["do_ppm"], r["de_ppm"],
    ) == want
    # > 12 ratings on one item: division-form raise at emit
    wide = spark.createDataFrame(
        [(0, "x" if i % 2 else "y") for i in range(13)],
        "item int, lab string",
    )
    with pytest.raises(Exception, match="12 ratings"):
        R.krippendorff_alpha(wide, "item", "lab").collect()
    # ppm bound guard (monkeypatched tiny)
    monkeypatch.setattr(R, "_KAPPA_N_MAX", 5)
    big = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(4) for _ in range(2)],
        "item int, lab string",
    )
    with pytest.raises(Exception, match="exact-ppm bound"):
        R.krippendorff_alpha(big, "item", "lab").collect()
    monkeypatch.undo()
    # ungrouped empty-in -> empty-out (crossjoin sentinel filter)
    empty = spark.createDataFrame([], "item int, lab string")
    assert R.krippendorff_alpha(empty, "item", "lab").count() == 0


def _wkappa_expected(pairs, weights="quadratic"):
    """Pure-Python weighted-kappa replica for ONE group: pairs =
    [(a, b)]; returns (n, swo, ratio_ppm|None)."""
    from collections import Counter
    from fractions import Fraction

    w = (
        (lambda a, b: (a - b) * (a - b))
        if weights == "quadratic"
        else (lambda a, b: abs(a - b))
    )
    cells = Counter(pairs)
    n = sum(cells.values())
    swo = sum(w(a, b) * c for (a, b), c in cells.items())
    rm, cm = Counter(), Counter()
    for (a, b), c in cells.items():
        rm[a] += c
        cm[b] += c
    swe = sum(
        w(a, b) * ra * cb for a, ra in rm.items() for b, cb in cm.items()
    )
    if swe == 0:
        return (n, swo, None)
    return (n, swo, int(Fraction(n * swo * 1_000_000, swe)))


def test_weighted_kappa_matches_brute_force_randomized(spark):
    """ratio ppm against a pure-Python replica, grouped (with a NULL
    group), both weight schemes; the perfect-agreement and
    anti-correlated (negative kappa -> ratio > 1e6) extremes."""
    rng = random.Random(0x3A11)
    rows = [
        (g, rng.randint(0, 4), rng.randint(0, 4))
        for g in ("a", "b", None)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, ra int, rb int")
    for weights in ("quadratic", "linear"):
        got = {
            r["g"]: (r["n"], r["swo"], r["ratio_ppm"])
            for r in R.cohens_kappa_weighted(
                df, "ra", "rb", group_cols=["g"], weights=weights
            ).collect()
        }
        by_g: dict = {}
        for g, a, b in rows:
            by_g.setdefault(g, []).append((a, b))
        for g, vals in by_g.items():
            assert got[g] == _wkappa_expected(vals, weights), (g, weights)
        assert None in got
    # perfect agreement: swo = 0, ratio = 0 -> kappa_w = 1
    perf = spark.createDataFrame(
        [(i % 5, i % 5) for i in range(50)], "ra int, rb int"
    )
    r = R.cohens_kappa_weighted(perf, "ra", "rb").collect()[0]
    assert (r["swo"], r["ratio_ppm"]) == (0, 0)
    # anti-correlated: ratio exceeds 1e6 exactly when kappa_w < 0
    anti = spark.createDataFrame(
        [(0, 4), (4, 0), (0, 4), (4, 0), (1, 3), (3, 1)],
        "ra int, rb int",
    )
    r = R.cohens_kappa_weighted(anti, "ra", "rb").collect()[0]
    want = _wkappa_expected([(0, 4), (4, 0), (0, 4), (4, 0), (1, 3), (3, 1)])
    assert (r["n"], r["swo"], r["ratio_ppm"]) == want
    assert r["ratio_ppm"] > 1_000_000


def test_weighted_kappa_contracts_and_guards(spark, monkeypatch):
    """Non-integral rater dtype raises at construction (silent casts
    would hide unparseable labels); bad weights raises; NULL labels
    excluded; zero-entropy marginals (swe = 0) emit NULL ratio, not a
    division error; ungrouped empty-in -> empty-out; the ppm bound
    guard fires past the (monkeypatched) n cap."""
    strs = spark.createDataFrame([("1", 1)], "ra string, rb int")
    with pytest.raises(ValueError, match="integral"):
        R.cohens_kappa_weighted(strs, "ra", "rb")
    ints = spark.createDataFrame([(1, 1)], "ra int, rb int")
    with pytest.raises(ValueError, match="weights"):
        R.cohens_kappa_weighted(ints, "ra", "rb", weights="cubic")
    # NULLs excluded; unanimous-on-one-category marginals -> swe = 0
    mono = spark.createDataFrame(
        [(2, 2), (2, 2), (None, 2), (2, None)], "ra int, rb int"
    )
    r = R.cohens_kappa_weighted(mono, "ra", "rb").collect()[0]
    assert (r["n"], r["swo"]) == (2, 0)
    assert r["ratio_ppm"] is None
    empty = spark.createDataFrame([], "ra int, rb int")
    assert R.cohens_kappa_weighted(empty, "ra", "rb").count() == 0
    monkeypatch.setattr(R, "_KAPPA_N_MAX", 5)
    big = spark.createDataFrame(
        [(i % 5, (i + 1) % 5) for i in range(8)], "ra int, rb int"
    )
    with pytest.raises(Exception, match="exact-ppm bound"):
        R.cohens_kappa_weighted(big, "ra", "rb").collect()


def _kripp_interval_expected(ratings):
    """Pure-Python interval-metric replica: ratings = [(item, int)]
    for ONE group; returns (n_ratings, n_items, n_dropped, do_ppm,
    de_ppm) or None if nothing is pairable."""
    from collections import defaultdict
    from fractions import Fraction

    per: dict = defaultdict(list)
    for it, v in ratings:
        per[it].append(v)
    pair = {it: vs for it, vs in per.items() if len(vs) >= 2}
    dropped = len(per) - len(pair)
    if not pair:
        return None
    n = sum(len(vs) for vs in pair.values())
    L = 27_720
    do_num = 0
    for vs in pair.values():
        nu = len(vs)
        d = sum((x - y) ** 2 for x in vs for y in vs)
        do_num += d * (L // (nu - 1))
    allv = [v for vs in pair.values() for v in vs]
    s1, s2 = sum(allv), sum(v * v for v in allv)
    do = int(Fraction(do_num * 1_000_000, L * n))
    de = int(Fraction(2 * (n * s2 - s1 * s1) * 1_000_000, n * (n - 1)))
    return (n, len(pair), dropped, do, de)


def test_krippendorff_interval_matches_brute_force(spark):
    """Interval metric (squared-difference distance on integer
    labels, incl. negatives) against the pair-sum-identity replica,
    grouped with a NULL group and mixed 1-5 rater counts; unanimous
    extreme (do = de = 0); dtype and magnitude guards; nominal and
    interval DISAGREE on a fixture built to separate them (distance
    magnitude matters to interval only)."""
    rng = random.Random(0x1472)
    rows = []
    for g in ("a", "b", None):
        for it in range(40):
            for _ in range(rng.choice([1, 2, 2, 3, 3, 4, 5])):
                rows.append((g, it, rng.randint(-2, 4)))
    df = spark.createDataFrame(rows, "g string, item int, lab int")
    got = {
        r["g"]: (
            r["n_ratings"], r["n_items"], r["n_items_dropped"],
            r["do_ppm"], r["de_ppm"],
        )
        for r in R.krippendorff_alpha(
            df, "item", "lab", group_cols=["g"], metric="interval"
        ).collect()
    }
    by: dict = {}
    for g, it, v in rows:
        by.setdefault(g, []).append((it, v))
    for g, vals in by.items():
        assert got[g] == _kripp_interval_expected(vals), g
    assert None in got
    # unanimous: both disagreements zero
    mono = spark.createDataFrame(
        [(i, 3) for i in range(4) for _ in range(2)],
        "item int, lab int",
    )
    r = R.krippendorff_alpha(
        mono, "item", "lab", metric="interval"
    ).collect()[0]
    assert (r["do_ppm"], r["de_ppm"]) == (0, 0)
    # nominal vs interval separation: {0 vs 1} and {0 vs 4} are the
    # same nominal disagreement but 16x apart on the interval metric
    near = [(0, 0), (0, 1), (1, 0), (1, 1)]
    far = [(0, 0), (0, 4), (1, 0), (1, 4)]
    def _do(pairs, metric):
        d = spark.createDataFrame(pairs, "item int, lab int")
        return R.krippendorff_alpha(
            d, "item", "lab", metric=metric
        ).collect()[0]["do_ppm"]
    assert _do(near, "nominal") == _do(far, "nominal")
    assert _do(far, "interval") == 16 * _do(near, "interval")
    with pytest.raises(ValueError, match="integral"):
        R.krippendorff_alpha(
            df.withColumn("lab", F.col("lab").cast("string")),
            "item", "lab", metric="interval",
        )
    with pytest.raises(ValueError, match="metric"):
        R.krippendorff_alpha(df, "item", "lab", metric="ratio")
    # magnitude guard (division-form, exact n and max|label|)
    big = spark.createDataFrame(
        [(i, 10**8 if i % 2 else 0) for i in range(4) for _ in range(2)],
        "item int, lab long",
    )
    with pytest.raises(Exception, match="interval exact-ppm"):
        R.krippendorff_alpha(
            big, "item", "lab", metric="interval"
        ).collect()


def test_agreement_family_invariances(spark):
    """Structural invariances the distance algebra must satisfy
    EXACTLY (integer arithmetic — no tolerance): nominal alpha is
    invariant under any label bijection; interval alpha and weighted
    kappa are invariant under a common label SHIFT (the (x-y)^2 /
    |x-y| distances see only differences); and Cohen's kappa is
    invariant under swapping the two raters in po (and pe, whose
    marginal product is symmetric)."""
    rng = random.Random(0x1234)
    rows = [
        (it, rng.randint(0, 4))
        for it in range(50)
        for _ in range(rng.choice([2, 3, 3, 4]))
    ]
    df = spark.createDataFrame(rows, "item int, lab int")
    # interval alpha: shift every label by +7 -> identical output
    base = R.krippendorff_alpha(
        df, "item", "lab", metric="interval"
    ).collect()[0]
    shifted = R.krippendorff_alpha(
        df.withColumn("lab", F.col("lab") + 7),
        "item", "lab", metric="interval",
    ).collect()[0]
    assert tuple(base) == tuple(shifted)
    # nominal alpha: relabel through a bijection -> identical output
    renamed = df.withColumn(
        "lab", F.expr("concat('cat_', CAST(lab * 13 + 5 AS STRING))")
    )
    a1 = R.krippendorff_alpha(df, "item", "lab").collect()[0]
    a2 = R.krippendorff_alpha(renamed, "item", "lab").collect()[0]
    assert tuple(a1) == tuple(a2)
    # weighted kappa: common shift of both raters -> identical output
    pairs = [
        (rng.randint(0, 4), rng.randint(0, 4)) for _ in range(300)
    ]
    pdf = spark.createDataFrame(pairs, "ra int, rb int")
    for weights in ("quadratic", "linear"):
        k1 = R.cohens_kappa_weighted(pdf, "ra", "rb", weights=weights)
        k2 = R.cohens_kappa_weighted(
            pdf.select(
                (F.col("ra") + 3).alias("ra"), (F.col("rb") + 3).alias("rb")
            ),
            "ra", "rb", weights=weights,
        )
        assert k1.collect() == k2.collect(), weights
    # plain kappa: rater swap leaves (n, agree, po, pe) unchanged
    spdf = spark.createDataFrame(
        [(str(a), str(b)) for a, b in pairs], "ra string, rb string"
    )
    c1 = R.cohens_kappa(spdf, "ra", "rb").collect()[0]
    c2 = R.cohens_kappa(spdf, "rb", "ra").collect()[0]
    assert tuple(c1) == tuple(c2)


def test_gwet_ac1_matches_brute_force_and_paradox(spark):
    """AC1 against a pure-Python Fraction replica (exact floor ppm),
    including: the kappa-paradox fixture where skewed prevalence
    collapses kappa but AC1 tracks the high observed agreement; a
    label used by only ONE rater (the union-marginal full-outer
    join); a single-category group (pe NULL); ungrouped mode; NULL
    exclusion."""
    from fractions import Fraction

    from kafka_dead_letter_analyzer_spark.operators import ranking as RK

    def brute(rows):
        # rows: [(a, b)] -> (n, agree, q, po_ppm, pe_ppm|None)
        n = len(rows)
        agree = sum(1 for a, b in rows if a == b)
        cats = sorted({a for a, _ in rows} | {b for _, b in rows})
        q = len(cats)
        po = (agree * 1_000_000) // n
        if q < 2:
            return (n, agree, q, po, None)
        s_m = 0
        for k in cats:
            m = sum(1 for a, _ in rows if a == k) + sum(
                1 for _, b in rows if b == k
            )
            s_m += m * (2 * n - m)
        pe = int(Fraction(s_m * 1_000_000, 4 * n * n * (q - 1)))
        return (n, agree, q, po, pe)

    # paradox group 'skew': 98 yes/yes, 1 yes/no, 1 no/yes
    skew = [("y", "y")] * 98 + [("y", "n"), ("n", "y")]
    # balanced group with a label only rater b uses
    bal = [("x", "x"), ("x", "z"), ("w", "x"), ("w", "w")]
    # degenerate single-category group
    mono = [("only", "only")] * 5
    rows = (
        [("skew", a, b) for a, b in skew]
        + [("bal", a, b) for a, b in bal]
        + [("mono", a, b) for a, b in mono]
        + [("skew", None, "y"), ("skew", "y", None)]
    )
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {
        r["g"]: (r["n"], r["agree"], r["q_cats"], r["po_ppm"], r["pe_ppm"])
        for r in RK.gwet_ac1(df, "a", "b", group_cols=["g"]).collect()
    }
    assert got["skew"] == brute(skew)
    assert got["bal"] == brute(bal)
    assert got["mono"] == brute(mono)
    assert got["mono"][4] is None  # q < 2 -> pe undefined
    # the paradox, numerically: kappa near zero, AC1 near one
    n, agree, q, po, pe = got["skew"]
    ac1 = (po - pe) / (1_000_000 - pe)
    kap = {
        r["g"]: (r["po_ppm"], r["pe_ppm"])
        for r in RK.cohens_kappa(df, "a", "b", group_cols=["g"]).collect()
    }["skew"]
    kappa = (kap[0] - kap[1]) / (1_000_000 - kap[1])
    assert ac1 > 0.9 and kappa < 0.1
    # ungrouped mode equals the single-group contraction
    one = RK.gwet_ac1(
        spark.createDataFrame(skew, "a string, b string"), "a", "b"
    ).collect()
    assert len(one) == 1
    assert (
        one[0]["n"], one[0]["agree"], one[0]["q_cats"],
        one[0]["po_ppm"], one[0]["pe_ppm"],
    ) == brute(skew)
    # empty input -> empty output (the crossJoin sentinel filter)
    empty = spark.createDataFrame([], "a string, b string")
    assert RK.gwet_ac1(empty, "a", "b").count() == 0
