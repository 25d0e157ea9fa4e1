"""Distributed analytics primitives: exact percentiles, rolling
range-frame aggregates, grouped vector centroids.

These extend the analyzer's aggregation surface (SURVEY.md §2.8's A1
family) with the ops a monitoring/training-data pipeline reaches for
next: latency percentiles per error key, rolling error rates, and
per-group embedding centroids for corpus analysis.

Scale notes are on each function; none collects to the driver.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Nearest-rank percentile targets as exact integer fractions (num, den):
# rank = ceil(num * n / den) computed in integer arithmetic so Spark and
# any oracle agree bit-for-bit (float p * n rounds differently at the
# margins; (num*n + den - 1) div den never does).
DEFAULT_PERCENTILES: Mapping[str, tuple[int, int]] = {
    "p50": (1, 2),
    "p90": (9, 10),
    "p99": (99, 100),
}


def exact_percentiles(
    df: DataFrame,
    key: str | Sequence[str],
    value_col: str,
    tiebreak: str,
    percentiles: Mapping[str, tuple[int, int]] = DEFAULT_PERCENTILES,
) -> DataFrame:
    """Exact nearest-rank percentiles per group, sort-based.

    The value at rank ceil(p*n) in the (value, tiebreak) order is the
    answer — an actual element of the column, never an interpolation, so
    the result is engine-portable and type-preserving.

    Plan shape: ONE hash Exchange on the group key. The ordered window
    computes row_number and (via an unbounded frame on the same spec) the
    group size in a single Window operator; the following groupBy(key)
    reuses the window's hash partitioning, so EnsureRequirements inserts
    no second shuffle (pinned in tests/test_plan_shapes.py). At 100 TB
    the cost is the one sort — the same envelope as any per-key window —
    and skewed keys take the usual salting answer. For sketch-based
    speed at relaxed accuracy, compose `F.percentile_approx` instead;
    the differential test bounds its error against this exact path.
    """
    keys = [key] if isinstance(key, str) else list(key)
    # NULL values are ignored, like every SQL percentile aggregate — and
    # necessarily so for engine portability: Spark orders nulls first
    # ascending, DuckDB last, so a null entering the rank arithmetic
    # would pick different elements per engine.
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*keys).orderBy(value_col, tiebreak)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = df.select(
        *keys,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(full).alias("_n"),
    )
    aggs = []
    for name, (num, den) in percentiles.items():
        target = F.expr(f"({num} * _n + {den - 1}) div {den}")
        aggs.append(
            F.max(F.when(F.col("_rn") == target, F.col(value_col))).alias(name)
        )
    return ranked.groupBy(*keys).agg(*aggs)


def rolling_range_sum(
    daily: DataFrame,
    key: str,
    order_col: str,
    value_col: str,
    preceding: int,
    alias: str,
) -> DataFrame:
    """Rolling sum over a RANGE frame of the integer order column.

    RANGE (not ROWS) so gaps in the series are windowed correctly — a
    day with no predecessor rows still looks back `preceding` units of
    *time*, not rows. Input should already be one row per (key, order)
    (pre-aggregated), so the window's state per group is bounded by the
    frame width, not the raw row count.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(order_col)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return daily.withColumn(alias, F.sum(value_col).over(w).cast("bigint"))


def grouped_centroid_sums(
    df: DataFrame,
    key: str,
    vec_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group element-wise vector sums as scaled integers.

    Emits one row per (key, pos): sum of floor(element * scale) plus the
    group count — the exact, associative formulation of a centroid
    (mean = sum_scaled / (n * scale)). Floats are floored to scaled
    BIGINT *before* the sum because float addition is order-dependent
    and a distributed sum has no deterministic order; integer sums are
    associative, so the result is partition-count-independent and
    engine-portable.

    Plan shape: posexplode multiplies rows by the dimension map-side,
    then partial aggregation combines to at most |keys| * dim rows per
    task before the single hash Exchange — the shuffle carries the
    combined partials, not the exploded elements (pinned in
    tests/test_plan_shapes.py).
    """
    return (
        df.select(key, F.posexplode(vec_col).alias("pos", "_val"))
        .groupBy(key, "pos")
        .agg(
            F.sum(F.floor(F.col("_val").cast("double") * scale))
            .cast("bigint")
            .alias("sum_scaled"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def trimmed_stats(
    df: DataFrame,
    key: str,
    value_col: str,
    tiebreak: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
    scale: int = 1_000_000,
) -> DataFrame:
    """Robust (trimmed) statistics per group: count / sum / mean over the
    rows whose nearest-rank position lies in [ceil(lo*n), floor(hi*n)] —
    the outlier-resistant aggregate monitoring dashboards want next to
    raw min/max.

    Determinism contract: the double value is scaled by ``scale`` and
    FLOORED to BIGINT before any accumulation (IEEE multiply is
    exact-rounded identically everywhere; floor has no rounding mode) —
    summing raw doubles is order-dependent and banned. The trimmed mean
    is integer division truncating toward zero — Spark ``DIV`` and
    DuckDB integer ``//`` BOTH truncate (probed: -7 DIV 3 == -7 // 3 ==
    -2 on duckdb 1.0), so the engines agree for signed value columns
    too; tests/test_analytics.py pins that with an all-negative corpus
    against a live DuckDB oracle.

    Plan shape: identical envelope to exact_percentiles — ONE hash
    Exchange; the ordered window (rank + group size) and the final
    groupBy share the group-key partitioning."""
    micros = F.floor(F.col(value_col) * scale).cast("bigint")
    w = Window.partitionBy(key).orderBy("_v", tiebreak)
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        df.filter(F.col(value_col).isNotNull())
        .select(key, micros.alias("_v"), F.col(tiebreak).alias(tiebreak))
        .select(
            key,
            "_v",
            F.row_number().over(w).alias("_rn"),
            F.count(F.lit(1)).over(full).alias("_n"),
        )
    )
    lo = F.expr(f"({lo_pct} * _n + 99) div 100")
    hi = F.expr(f"({hi_pct} * _n) div 100")
    kept = ranked.filter((F.col("_rn") >= lo) & (F.col("_rn") <= hi))
    return kept.groupBy(key).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("_v").cast("bigint").alias("sum_scaled"),
        F.expr("CAST(sum(_v) DIV count(*) AS BIGINT)").alias("trimmed_mean_scaled"),
        F.min("_v").cast("bigint").alias("lo_scaled"),
        F.max("_v").cast("bigint").alias("hi_scaled"),
    )


def mad_outliers(
    df: DataFrame,
    key: str,
    value_col: str,
    tiebreak: str,
    k_num: int = 3,
    k_den: int = 1,
    scale: int = 1_000_000,
) -> DataFrame:
    """Robust outlier detection per group by MEDIAN ABSOLUTE DEVIATION —
    ``(key, med, mad, n_outliers, n_total)``, all BIGINT (values floored
    to ``scale``-scaled integers before any statistic, the trimmed_stats
    precedent): a row is an outlier iff
    ``|v - median| * k_den > k_num * MAD``.

    Why MAD and not stddev: one corrupted sensor reading moves a mean /
    sigma rule arbitrarily far (breakdown point 0); median and MAD both
    have breakdown point 0.5, so the rule survives up to half the group
    being garbage — the property an unattended 100 TB ingest monitor
    actually needs.  The 3-MAD default is the classic Hampel
    identifier's cutoff (in MAD units rather than the 1.4826-sigma
    normalization, which would put a float in the hash gate).

    Plan: two nearest-rank passes (median of values, then median of
    deviations — :func:`exact_percentiles`' rank arithmetic), each ONE
    hash Exchange on the key with the window and groupBy sharing the
    partitioning; per-key medians re-join as broadcasts (|keys| rows).
    Everything integer — oracle-hashable (queries.py x_mad_outliers).
    """
    micros = (
        F.floor(F.col(value_col).cast("decimal(28,12)") * scale)
        .cast("bigint")
        .alias("_v")
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key), micros, F.col(tiebreak).alias("_tb")
    )
    w1 = Window.partitionBy(key).orderBy("_v", "_tb")
    f1 = w1.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    med = (
        base.select(
            key, "_v",
            F.row_number().over(w1).alias("_rn"),
            F.count(F.lit(1)).over(f1).alias("_n"),
        )
        .groupBy(key)
        .agg(
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("_v"))
            ).alias("med"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
        )
    )
    dev = base.join(F.broadcast(med), key).select(
        key, "_v", "_tb", "med", "n_total",
        F.abs(F.col("_v") - F.col("med")).alias("_d"),
    )
    w2 = Window.partitionBy(key).orderBy("_d", "_tb")
    f2 = w2.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    # med and n_total ride through the deviation pass so the final count
    # joins base against ONE combined per-key stats table — consuming
    # `med` twice would duplicate the first window sort over the data
    # (a third Window in the plan; pinned out in test_plan_shapes.py)
    stats = (
        dev.select(
            key, "_d", "med", "n_total",
            F.row_number().over(w2).alias("_rn"),
            F.count(F.lit(1)).over(f2).alias("_n"),
        )
        .groupBy(key)
        .agg(
            F.max(
                F.when(F.col("_rn") == F.expr("(_n + 1) div 2"), F.col("_d"))
            ).alias("mad"),
            F.max("med").alias("med"),
            F.max("n_total").alias("n_total"),
        )
    )
    return (
        base.join(F.broadcast(stats), key)
        .select(
            key, "med", "mad", "n_total",
            F.abs(F.col("_v") - F.col("med")).alias("_d"),
        )
        .groupBy(key)
        .agg(
            F.max("med").cast("bigint").alias("med"),
            F.max("mad").cast("bigint").alias("mad"),
            F.sum(
                F.when(
                    F.col("_d") * k_den > F.lit(k_num) * F.col("mad"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
            F.max("n_total").cast("bigint").alias("n_total"),
        )
    )


def skyline_2d(
    df: DataFrame,
    id_col: str,
    max_col: str,
    min_col: str,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows where NO other row is >= on
    ``max_col`` and <= on ``min_col`` with at least one strict — the
    multi-objective selection shape ("most diverse AND shortest"
    training docs, "cheapest AND freshest" suppliers).  Equal points
    (both coordinates tied) do not dominate each other and all survive.

    Scale-right decomposition (the naive NOT EXISTS is O(n^2); a global
    sort window is a single task over the DATA):

    1. contract to one row per distinct ``max_col`` value with its
       minimum ``min_col`` — a partial-aggregated groupBy; within a
       max-group everything above that minimum is dominated by the
       group's own minimum.
    2. the classic sort-scan over the CONTRACTION (order max desc,
       running strict-min of min over higher-max groups; survive iff
       min < that running min) — a single-task window, but over at most
       |distinct max_col| rows, which for scaled-integer scores is
       bounded by the score range (e.g. <= 1e6 for ppm scores), not by
       the corpus.  The same bounded-small-step contract as the
       CC driver union-find.
    3. semi-join the surviving (max, min) pairs back to recover ids
       (ties included).

    All comparisons integer — oracle = NOT EXISTS dominance in SQL
    (queries.py x_pareto_docs).
    """
    from pyspark.sql import Window

    pts = df.select(
        F.col(id_col), F.col(max_col).alias("_a"), F.col(min_col).alias("_b")
    )
    contracted = pts.groupBy("_a").agg(F.min("_b").alias("_b"))

    def _scan(frame, part_cols):
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.col("_a").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        # rows ordered by _a desc carry distinct _a values (post-groupBy),
        # so the preceding frame is exactly "all strictly-higher _a groups"
        return (
            frame.withColumn("_prev_min", F.min("_b").over(w))
            .filter(
                F.col("_prev_min").isNull() | (F.col("_b") < F.col("_prev_min"))
            )
            .select("_a", "_b")
        )

    # local-then-global frontier: a partition-LOCAL skyline pass first
    # (per-partition window — never a single-task sort of the
    # contraction, which is unbounded when max_col is near-unique), then
    # the exact scan over the local survivors.  Correct because every
    # globally-undominated point survives any partition-local pruning
    # (dominance only removes points, never creates dominators), so
    # skyline(union of local skylines) == skyline(all).  The global pass
    # IS single-task, but over sum-of-local-skyline rows — the pruned
    # residue, not the contraction.
    local = _scan(
        contracted.withColumn("_pid", F.spark_partition_id()), ["_pid"]
    )
    frontier = _scan(local, [])
    return (
        pts.join(F.broadcast(frontier), ["_a", "_b"], "left_semi")
        .select(
            id_col,
            F.col("_a").alias(max_col),
            F.col("_b").alias(min_col),
        )
    )


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
) -> DataFrame:
    """Association-rule strength for item PAIRS across baskets —
    ``(type_a, type_b, support BIGINT, c_a BIGINT, c_b BIGINT,
    n_baskets BIGINT, lift_e6 BIGINT, leverage_num BIGINT)`` where
    ``lift = N*support / (c_a*c_b)`` (1e6 = independence, >1e6 =
    attraction) and ``leverage_num = support*N - c_a*c_b`` (the
    INTEGER numerator of P(ab) - P(a)P(b) over N^2 — sign alone
    answers "attracted or repelled", no division at all).

    The A-priori L2 support join (distinct (basket, item) contraction,
    renamed-projection self-join with the `<` canonical order) is the
    same shape as the plain support count; this adds the two marginals
    (one groupBy over the contraction each) and the 1-row basket-count
    anchor joined broadcast-side.  lift_e6 is the two-step long
    division, exact for any numerator; int64 holds while
    ``support * N * 1000`` fits — ~9e7 baskets, shard past that.
    ``min_support`` prunes the pair table BEFORE the marginal joins
    (the A-priori downward-closure cut)."""
    b = df.select(
        F.col(basket_col).alias("u"), F.col(item_col).alias("it")
    ).distinct()
    x = b.select(F.col("u").alias("ux"), F.col("it").alias("type_a"))
    y = b.select(F.col("u").alias("uy"), F.col("it").alias("type_b"))
    pairs = (
        x.join(
            y,
            (F.col("ux") == F.col("uy"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    marg = b.groupBy("it").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    n = b.agg(
        F.count_distinct(F.col("u")).cast("bigint").alias("n_baskets")
    )
    out = (
        pairs.join(
            F.broadcast(marg.select(F.col("it").alias("type_a"),
                                    F.col("c").alias("c_a"))),
            "type_a",
        )
        .join(
            F.broadcast(marg.select(F.col("it").alias("type_b"),
                                    F.col("c").alias("c_b"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "type_a",
        "type_b",
        "support",
        "c_a",
        "c_b",
        "n_baskets",
        F.expr(
            "((support * n_baskets * 1000) DIV (c_a * c_b)) * 1000"
            " + (((support * n_baskets * 1000) % (c_a * c_b)) * 1000)"
            "   DIV (c_a * c_b)"
        ).cast("bigint").alias("lift_e6"),
        F.expr("support * n_baskets - c_a * c_b")
        .cast("bigint")
        .alias("leverage_num"),
    )


def conformal_threshold(
    df: DataFrame,
    value_col: str,
    tiebreak: str,
    group_cols: Sequence[str] | None = None,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal calibration threshold per group —
    ``(*group_cols, threshold, n BIGINT, k BIGINT)``: the value at rank
    ``k = ceil((1 - alpha) * (n + 1))`` (clamped to n) in the
    (value, tiebreak) order over the calibration set.  With
    exchangeable scores, predicting "conforming" whenever a fresh
    score is <= threshold covers with probability >= 1 - alpha
    (Vovk's split-conformal guarantee) — the (n+1) is the finite-sample
    correction that a plain quantile misses; alpha is an exact
    rational ``alpha_num/alpha_den`` so k is pure integer arithmetic:
    ``k = min(n, ceil((den - num) * (n + 1) / den))``.

    Plan shape: the same single-Exchange sorted window as
    exact_percentiles (row_number + group size in one Window
    operator); the threshold is an actual element of the column, never
    an interpolation, so the surface is engine-portable and
    type-preserving.  NULL scores are excluded (cross-engine NULL
    ordering differs); groups smaller than their own correction still
    emit (k clamps to n) — the guarantee degrades exactly as the
    theory says for tiny calibration sets."""
    if not (0 < alpha_num < alpha_den):
        raise ValueError(
            "conformal_threshold: need 0 < alpha_num < alpha_den"
        )
    groups = list(group_cols or [])
    base = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(*groups).orderBy(value_col, tiebreak)
    full = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = base.select(
        *groups,
        value_col,
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(full).alias("_n"),
    )
    num, den = int(alpha_den - alpha_num), int(alpha_den)
    k = F.expr(f"least(_n, ({num} * (_n + 1) + {den - 1}) DIV {den})")
    return ranked.filter(F.col("_rn") == k).select(
        *groups,
        F.col(value_col).alias("threshold"),
        F.col("_n").cast("bigint").alias("n"),
        F.col("_rn").cast("bigint").alias("k"),
    )
