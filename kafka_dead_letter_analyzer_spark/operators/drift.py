"""Distribution-shift diagnostics: CUSUM change-point detection and
total-variation drift.

The reference engine aggregates dead letters into per-key counts
(`ErrorAggregatingProcessor.java:38-102`) and leaves "did the error
rate CHANGE, and when?" to the dashboard reading them.  At corpus
scale that question needs to run inside the engine, and the classic
detectors (CUSUM, population-stability / total-variation distance)
are float-first in every textbook form — `log` for PSI, running
means for CUSUM — which the cross-engine hash gate cannot accept.
Both operators here are re-derived as exact integer algebra:

* ``cusum_changepoint`` uses the identity ``S_t = P_t*B - t*total``
  (the classic CUSUM statistic against the mean rate, scaled by the
  bucket count ``B`` so the reference rate ``total/B`` never becomes
  a float), and the textbook recursive ``max(0, S_{t-1} + x - ref)``
  becomes the prefix-sum-minus-running-min identity
  ``D_t = S_t - min_{j<=t} S_j`` — two windows over the per-bucket
  contraction, no recursion, no single-task stage when grouped.
* ``tvd_drift`` is the L1 half-distance between the category mix of
  the early and late halves of the stream,
  ``TVD = sum |c1/n1 - c2/n2| / 2``, cleared of denominators as
  ``sum |c1*n2 - c2*n1| / (2*n1*n2)`` — one conditional-sum scan.

Both emit ppm fixed-points via the same TWO-STEP LONG DIVISION as
``profile.gini_concentration`` (``d1 = num*1000 div nt; d2 =
(num*1000 mod nt)*1000 div nt``), so no intermediate exceeds
``nt * 1000`` and the surface stays BIGINT-exact on any engine.

Scale shapes: cusum's only full-data shuffle is the (group, bucket)
count; every window runs over the bucket contraction (per group when
grouped — parallel across groups; global form sorts the bounded
bucket domain, fine for time ranges, documented).  tvd's only
shuffle is the (group, category) conditional-count contraction; the
split point arrives as a 1-row broadcast anchor (no driver action).
Int64 bounds (all RUNTIME-GUARDED since round 8 — a zero-cost
``raise_error`` CASE over the exact per-group counts on the agg row,
so a silent wrap can never escape as a plausible number): cusum needs
``n * buckets * 1000`` to fit (9e18 — holds to ~1e10 rows x 1e5
buckets); tvd needs ``2 * n1 * n2 * 1000`` to fit (holds to ~68M
balanced rows per half per group; shard past that); wasserstein additionally
carries the value span (``n1 * n2 * span * 1000``).  Each raise names
the sharding remedy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.common import (
    null_safe_group_join,
)

__all__ = [
    "bucket_counts",
    "cusum_changepoint",
    "tvd_drift",
    "wasserstein_drift",
    "theilsen_trend",
    "leadlag_spearman",
    "hampel_outliers",
    "mann_kendall",
    "dead_letter_drift_report",
]

_BUCKET_US = {
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "minute": 60_000_000,
}

#: int64 ceiling used by the raise_error overflow guards; module-level
#: so tests can monkeypatch it down to trigger the raise cheaply.
_I64_MAX = 9223372036854775807


def _ppm2(num: str, nt: str) -> str:
    """Two-step long-division ppm — delegates to the shared
    :func:`operators.common.ppm2` (hoisted round 8; one maintained copy
    of the overflow-sensitive idiom)."""
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    return ppm2(num, nt)


def bucket_counts(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] | None = None,
    bucket: str = "day",
) -> DataFrame:
    """The sparse per-bucket event-count contraction every timeline
    detector in this module starts from —
    ``(*group_cols, t BIGINT, x BIGINT)`` with
    ``t = unix_micros(ts) DIV bucket_us`` over non-NULL timestamps
    (``DIV`` truncates toward zero, so ``t * bucket_us`` is exactly
    the ``unix_micros - unix_micros % bucket_us`` bucket start the
    CUSUM detector keys by).

    Callers composing SEVERAL detectors over the same timeline
    (queries.py::x_drift_report joins four) can build this once,
    persist it, and pass it to each detector's ``counts_df`` — paying
    the full-data scan and (group, bucket) shuffle ONCE instead of
    per detector, and letting the span-probe driver actions
    (theilsen/hampel/mann-kendall run one each at construction time)
    hit the cache instead of re-scanning the raw input."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"bucket_counts: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    return _bucket_counts(df, ts_col, list(group_cols or []), _BUCKET_US[bucket])


def _bucket_counts(
    df: DataFrame, ts_col: str, groups: list, bus: int
) -> DataFrame:
    return (
        df.filter(F.col(ts_col).isNotNull())
        .select(
            *[df[g] for g in groups],
            F.expr(f"unix_micros({ts_col}) DIV {bus}").alias("t"),
        )
        .groupBy(*groups, "t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )


_WORST_SPAN_MEMO: "weakref.WeakKeyDictionary" = None  # set below


def _worst_span_buckets(counts: DataFrame, span: DataFrame, groups: list):
    """The timeline detectors' shared guard probe — max over groups of
    ``t_hi - t_lo + 1`` collected from the span contraction.  Memoized
    per (counts frame IDENTITY, groups): when one persisted
    bucket_counts frame fans out to several detectors (the
    x_drift_report shape), the second and later detectors reuse the
    first's collected scalar instead of re-running the probe job
    (3 probe collects -> 1 at construction; measured 0.48 s of the
    report's construction).  Keyed WEAKLY on the frame object — a
    detector's own inline build is a fresh object every call, so
    standalone behavior is unchanged and entries die with the frame;
    the memoized value only feeds the max_buckets guard (each caller
    compares against its own cap), never the statistics.

    Staleness assumption (r13 driver advice): identity keying presumes
    the frame's underlying data does not change while the object lives
    — true here because frames are rebuilt through the mtime/size-keyed
    ``load_table`` relation, so a rewritten source yields a NEW frame
    object; re-collecting a live unpersisted frame over an in-place
    rewritten file would reuse the stale span scalar (guard only, never
    the statistics)."""
    import weakref

    global _WORST_SPAN_MEMO
    if _WORST_SPAN_MEMO is None:
        _WORST_SPAN_MEMO = weakref.WeakKeyDictionary()
    key = tuple(groups)
    sub = _WORST_SPAN_MEMO.get(counts)
    if sub is not None and key in sub:
        return sub[key]
    worst = span.agg(
        F.max(F.col("t_hi") - F.col("t_lo") + 1).alias("b")
    ).collect()[0]["b"]
    if sub is None:
        try:
            sub = _WORST_SPAN_MEMO.setdefault(counts, {})
        except TypeError:  # unweakrefable frame: skip memoizing
            return worst
    sub[key] = worst
    return worst


def _counts_or(
    df: DataFrame,
    counts_df: DataFrame | None,
    ts_col: str,
    groups: list,
    bus: int,
    who: str,
) -> DataFrame:
    """Resolve a detector's contraction: the caller-supplied
    ``counts_df`` (contract: built by :func:`bucket_counts` with the
    SAME ts_col/group_cols/bucket — only the column shape is checkable
    here) or the detector's own from-scratch build."""
    if counts_df is None:
        return _bucket_counts(df, ts_col, groups, bus)
    expect = groups + ["t", "x"]
    if list(counts_df.columns) != expect:
        raise ValueError(
            f"{who}: counts_df must have columns {expect}"
            f" (bucket_counts output), got {list(counts_df.columns)}"
        )
    return counts_df


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] | None = None,
    bucket: str = "hour",
    weight_expr: str | None = None,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Exact CUSUM (Page 1954) change-point scan of event RATE per
    group —
    ``(*group_cols, n BIGINT, buckets BIGINT, up_cp_ts TIMESTAMP,
    up_ppm BIGINT, down_cp_ts TIMESTAMP, down_ppm BIGINT)``: where
    did the rate most decisively rise above / fall below its own
    overall mean, and by how much (as a fraction of total mass x
    span, in ppm)?

    Derivation.  Bucket index ``t = (bucket_us - min_bucket_us) /
    bucket + 1`` over the group's own span; ``B`` = index of the last
    bucket (the max-ts bucket is nonempty by construction, so there
    are no trailing empties and ``S_B = 0`` exactly).  With ``P_t``
    the running event count, the mean-rate CUSUM scaled by ``B`` is
    ``S_t = P_t*B - t*total`` — integer, zero at both ends.  The
    upward detection statistic is ``D_t = S_t - min_{j<t} S_j``; over
    an empty stretch S falls linearly, so the running min entering
    nonempty bucket ``i`` is attained just before it, at
    ``pre_i = P_{i-1}*B - (t_i - 1)*total`` — the min runs over the
    ``pre`` values of the contraction only (``pre_1 = 0`` covers
    ``S_0``).  Peaks live at nonempty buckets' post-values ``S_i``.
    Downward is the mirror — troughs at ``pre_i`` (plus the final
    post-value, only relevant when the last bucket under-runs the
    mean), peaks at ``max(0, max_{j<i} S_j)`` (S only jumps up where
    mass lands, so its maxima live at post-values — and at ``S_0 = 0``,
    which the greatest(0, ...) keeps in the prefix even when every
    post-value is negative).  Change-point = bucket start
    attaining the max deviation, EARLIEST bucket on ties — every
    output is a pure integer function of the data.

    Use: a dead-letter burst is an upward cp on the error topic; an
    outage (producer stopped emitting) is a downward cp.  With
    ``weight_expr`` (a SQL expression yielding a NON-NEGATIVE integer
    per row) the detector watches WEIGHTED mass instead of row count —
    e.g. quantity- or cents-weighted shift, which moves when big
    orders migrate even while the order COUNT holds steady; the
    algebra is unchanged (x = per-bucket weight sum; rows with NULL
    weight are excluded; trailing zero-weight buckets cannot occur
    because weights are non-negative and S_B = 0 still holds only up
    to the last POSITIVE-mass bucket, so buckets are keyed by rows as
    before and an all-zero-weight tail keeps B at the last row-bearing
    bucket — documented: a zero-weight bucket is an observed zero, not
    a missing bucket).  ppm scale:
    ``D <= n*B``, so ``up_ppm = D*1e6 div (n*B)`` via two-step
    division; 0 = perfectly steady rate, ->1e6 = all mass on one side
    of the cp.  Groups with a single bucket report 0/0 deviations
    (S == 0 everywhere; cp = that bucket)."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"cusum_changepoint: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    bus = _BUCKET_US[bucket]
    groups = list(group_cols or [])

    if counts_df is not None:
        if weight_expr is not None:
            raise ValueError(
                "cusum_changepoint: counts_df carries plain row counts"
                " and cannot be combined with weight_expr"
            )
        # bucket_counts keys by t = unix_micros DIV bus; both DIV and %
        # truncate toward zero, so t * bus == unix_micros - unix_micros
        # % bus exactly — the same bucket starts as the inline build.
        counts = _counts_or(
            df, counts_df, ts_col, groups, bus, "cusum_changepoint"
        ).select(
            *groups, (F.col("t") * F.lit(bus)).alias("bus"), "x"
        )
    else:
        base = df.filter(F.col(ts_col).isNotNull())
        if weight_expr is not None:
            base = base.filter(
                F.expr(f"({weight_expr}) IS NOT NULL AND ({weight_expr}) >= 0")
            )
        counts = (
            base.select(
                *[base[g] for g in groups],
                (F.unix_micros(F.col(ts_col))
                 - F.unix_micros(F.col(ts_col)) % bus)
                .alias("bus"),
                *([F.expr(weight_expr).alias("__w")] if weight_expr else []),
            )
            .groupBy(*groups, "bus")
            .agg(
                (F.sum(F.expr("CAST(__w AS BIGINT)")) if weight_expr
                 else F.count(F.lit(1))).cast("bigint").alias("x")
            )
        )

    wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_ord = wg.orderBy("bus")
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = wg.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )

    # per-bucket contraction with group totals and bucket indices
    c = (
        counts.withColumn("p", F.sum("x").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("total", F.sum("x").over(w_all))
        .withColumn("min_bus", F.min("bus").over(w_all))
        .withColumn("t", F.expr(f"(bus - min_bus) DIV {bus} + 1"))
        .withColumn("b", F.max(F.expr(f"(bus - min_bus) DIV {bus} + 1"))
                    .over(w_all))
    )
    c = (
        c.withColumn("s", F.expr("p * b - t * total"))
        .withColumn("pre", F.expr("(p - x) * b - (t - 1) * total"))
        .withColumn("is_last", F.col("t") == F.col("b"))
    )
    # running extremes over the contraction (pre_1 = 0 covers S_0)
    c = (
        c.withColumn(
            "runmin_pre",
            F.min("pre").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            # S_0 = 0 is always in the prefix: maxima of S live at
            # post-values (S jumps up only where mass lands), so the
            # running max is greatest(0, max of previous posts).
            "runmax_s_prev",
            F.greatest(
                F.lit(0).cast("bigint"),
                F.coalesce(F.max("s").over(w_pre), F.lit(0).cast("bigint")),
            ),
        )
        .withColumn("up_d", F.expr("s - runmin_pre"))
        .withColumn(
            "down_d",
            F.expr(
                "CASE WHEN is_last THEN"
                " greatest(runmax_s_prev - pre,"
                "          greatest(runmax_s_prev, s) - s)"
                " ELSE runmax_s_prev - pre END"
            ),
        )
    )

    # argmax with earliest-bucket tiebreak, both directions, one pass
    w_up = w_ord.orderBy(F.desc("up_d"), F.asc("bus"))
    w_dn = w_ord.orderBy(F.desc("down_d"), F.asc("bus"))
    ranked = c.withColumn("r_up", F.row_number().over(w_up)).withColumn(
        "r_dn", F.row_number().over(w_dn)
    )
    agg = ranked.groupBy(*groups).agg(
        F.max("total").alias("n"),
        F.max("b").alias("buckets"),
        F.max(F.when(F.col("r_up") == 1, F.col("bus"))).alias("up_bus"),
        F.max(F.when(F.col("r_up") == 1, F.col("up_d"))).alias("up_d"),
        F.max(F.when(F.col("r_dn") == 1, F.col("bus"))).alias("down_bus"),
        F.max(F.when(F.col("r_dn") == 1, F.col("down_d"))).alias("down_d"),
    )
    # division-form guard (cannot itself overflow) over the EXACT
    # totals: n and buckets are plain counts/indices even when the
    # window algebra upstream has wrapped, so the raise always fires
    # before a wrapped ppm escapes
    guard = (
        f"n > {_I64_MAX} DIV 1000 DIV buckets"
    )
    raise_bigint = (
        "CAST(raise_error('cusum_changepoint: a group exceeds the"
        " n * buckets * 1000 < 2^63 exactness bound; shard the input"
        " (e.g. by time range) or coarsen the bucket') AS BIGINT)"
    )
    return agg.select(
        *groups,
        F.col("n"),
        F.col("buckets"),
        F.timestamp_micros(F.col("up_bus")).alias("up_cp_ts"),
        F.expr(
            f"CASE WHEN {guard} THEN {raise_bigint}"
            f" ELSE {_ppm2('up_d', '(n * buckets)')} END"
        ).cast("bigint").alias("up_ppm"),
        F.timestamp_micros(F.col("down_bus")).alias("down_cp_ts"),
        F.expr(
            f"CASE WHEN {guard} THEN {raise_bigint}"
            f" ELSE {_ppm2('down_d', '(n * buckets)')} END"
        ).cast("bigint").alias("down_ppm"),
    )


def tvd_drift(
    df: DataFrame,
    ts_col: str = "ts",
    cat_col: str = "event_type",
    group_cols: Sequence[str] | None = None,
    anchor: str = "global",
) -> DataFrame:
    """Total-variation distance between the categorical mix of the
    EARLY and LATE halves of the stream — ``(*group_cols, tvd_ppm
    BIGINT, n_early BIGINT, n_late BIGINT, n_cats BIGINT)`` — the
    integer-exact population-stability audit (PSI without the
    cross-engine-unsafe ``log``; TVD bounds PSI-style drift and is
    the metric with the coupling interpretation: the minimum fraction
    of rows whose category must change to turn one mix into the
    other).

    The split point is the midpoint of the observed time range,
    ``m = (min_us + max_us) DIV 2``; early = ``ts <= m``.  With
    ``anchor="global"`` (default) the midpoint is computed over the
    WHOLE frame (1-row broadcast anchor, same idiom as
    decay_weighted_counts' max anchor) — NOTE the grouped consequence:
    a group whose activity sits entirely on one side of the GLOBAL
    midpoint (e.g. an error type that only appeared recently) has an
    empty half and DROPS; that is the right semantics when the groups
    share one clock (cohorts of the same stream) and the question is
    "how did each group's mix move across the stream's own midpoint",
    but it silently excludes late-arriving groups.
    ``anchor="per_group"`` computes the midpoint per group (a grouped
    min/max aggregate joined back NULL-SAFELY — a NULL group key is a
    real group under groupBy and keeps its row; broadcast-sized for
    bounded group domains, AQE-planned otherwise), so every group with
    two distinct timestamps reports drift over ITS OWN span — use it when the
    groups are independent populations (per-topic feeds) and a
    late-born group is exactly the drifted population being hunted.
    One conditional-sum scan builds per-category half-counts (a
    category absent from a half simply contributes its whole mass),
    then ``TVD = sum |c1*n2 - c2*n1| / (2*n1*n2)`` cleared of
    denominators, emitted as ppm via two-step long division
    (``num <= nt = 2*n1*n2``; a raise_error CASE on the exact half
    counts raises past ``2*n1*n2*1000 >= 2^63`` with a sharding
    hint).  Groups where either half is empty (under "global": all
    the group's mass on one side; under "per_group": all mass on one
    timestamp) drop — drift is undefined there.  NULL categories
    count as a real category; NULL timestamps are excluded."""
    if anchor not in ("global", "per_group"):
        raise ValueError(
            f"tvd_drift: anchor must be 'global' or 'per_group',"
            f" got {anchor!r}"
        )
    groups = list(group_cols or [])
    ev = df.filter(F.col(ts_col).isNotNull())
    mid_expr = F.expr(
        f"(min(unix_micros({ts_col})) + max(unix_micros({ts_col})))"
        " DIV 2"
    ).alias("mid_us")
    if anchor == "per_group" and groups:
        mids = ev.groupBy(*groups).agg(mid_expr)
        # null-safe: groupBy kept NULL as a real group; a plain
        # USING-join would silently drop exactly that group's rows
        halved = null_safe_group_join(ev, mids, groups).withColumn(
            "is_early", F.unix_micros(F.col(ts_col)) <= F.col("mid_us")
        )
    else:
        halved = ev.crossJoin(F.broadcast(ev.agg(mid_expr))).withColumn(
            "is_early", F.unix_micros(F.col(ts_col)) <= F.col("mid_us")
        )
    per_cat = halved.groupBy(*groups, cat_col).agg(
        F.sum(F.when(F.col("is_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("is_early"), 0).otherwise(1))
        .cast("bigint")
        .alias("c2"),
    )
    wg = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored = per_cat.withColumn("n1", F.sum("c1").over(wg)).withColumn(
        "n2", F.sum("c2").over(wg)
    )
    agg = (
        scored.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy(*groups)
        .agg(
            F.sum(F.expr("abs(c1 * n2 - c2 * n1)"))
            .cast("bigint")
            .alias("num"),
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            F.count(F.lit(1)).cast("bigint").alias("n_cats"),
        )
    )
    # division-form guard over the exact half counts: fires before a
    # wrapped |c1*n2 - c2*n1| sum can escape as a plausible ppm
    return agg.filter(F.col("num").isNotNull()).select(
        *groups,
        F.expr(
            f"CASE WHEN n_early > {_I64_MAX} DIV 2000 DIV n_late THEN"
            " CAST(raise_error('tvd_drift: a group exceeds the"
            " 2 * n_early * n_late * 1000 < 2^63 exactness bound;"
            " shard the input (e.g. by a hash of the category) and"
            " report the per-shard TVD distribution') AS BIGINT)"
            f" ELSE {_ppm2('num', '(2 * n_early * n_late)')} END"
        )
        .cast("bigint")
        .alias("tvd_ppm"),
        "n_early",
        "n_late",
        "n_cats",
    )


def wasserstein_drift(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "v",
    group_cols: Sequence[str] | None = None,
    anchor: str = "global",
) -> DataFrame:
    """Exact Wasserstein-1 (earth-mover) distance between the NUMERIC
    value distribution of the early and late halves of the stream —
    ``(*group_cols, w1_e6 BIGINT, ks_ppm BIGINT, n_early BIGINT,
    n_late BIGINT, n_values BIGINT)`` — the numeric complement of
    :func:`tvd_drift` (TVD sees only category identity; W1 weighs HOW
    FAR the mass moved, in value units x 1e6).  ``ks_ppm`` is the
    two-sample Kolmogorov-Smirnov statistic max|F1 - F2| in ppm —
    computed from the SAME CDF-difference contraction (max instead of
    gap-weighted sum), so the classic distribution-equality test rides
    along at zero extra cost: W1 weighs distance, KS catches a sharp
    divergence confined to a narrow value band that W1 dilutes.

    ``value_col`` must be integer-typed (callers cast integer-valued
    measures; floats have no exact cross-engine W1).  Over the sorted
    distinct-value support, ``W1 = sum_v |F1(v) - F2(v)| * gap(v)``
    with ``gap`` the distance to the next support point (beyond the
    last point both CDFs are 1, so it contributes nothing).  Cleared
    of denominators: ``W1 = sum |cum1*n2 - cum2*n1| * gap / (n1*n2)``,
    emitted x1e6 via two-step long division (exact for ANY num, not
    just num <= nt: floor(num*1e6/nt) = d1*1000 + d2 identically).

    Scale shape: one (group, value) conditional-count contraction is
    the only full-data shuffle; cumulative sums and gaps are windows
    over the contraction (per group — parallel across groups; the
    global form sorts the bounded distinct-value domain).  The split
    anchor follows ``anchor`` exactly as in :func:`tvd_drift`:
    ``"global"`` (default) is the 1-row broadcast whole-frame
    midpoint — a group entirely on one side of it has an empty half
    and DROPS (right for cohorts of one stream, silently excludes
    late-born groups); ``"per_group"`` splits each group over its own
    span (grouped min/max joined back).  Int64 bound:
    ``n1*n2*span*1000`` must fit — holds to ~3e6 rows per half per
    group at span 1e3; a raise_error CASE over the exact half counts
    and the group's own value span raises past it (shard or
    pre-bucket values).  Groups with an empty half drop (drift
    undefined)."""
    if anchor not in ("global", "per_group"):
        raise ValueError(
            f"wasserstein_drift: anchor must be 'global' or"
            f" 'per_group', got {anchor!r}"
        )
    groups = list(group_cols or [])
    ev = df.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    mid_expr = F.expr(
        f"(min(unix_micros({ts_col})) + max(unix_micros({ts_col})))"
        " DIV 2"
    ).alias("mid_us")
    if anchor == "per_group" and groups:
        mids = ev.groupBy(*groups).agg(mid_expr)
        # null-safe: groupBy kept NULL as a real group; a plain
        # USING-join would silently drop exactly that group's rows
        halved = null_safe_group_join(ev, mids, groups).withColumn(
            "is_early", F.unix_micros(F.col(ts_col)) <= F.col("mid_us")
        )
    else:
        halved = ev.crossJoin(F.broadcast(ev.agg(mid_expr))).withColumn(
            "is_early", F.unix_micros(F.col(ts_col)) <= F.col("mid_us")
        )
    per_val = halved.groupBy(
        *groups, F.col(value_col).cast("bigint").alias("v")
    ).agg(
        F.sum(F.when(F.col("is_early"), 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("is_early"), 0).otherwise(1))
        .cast("bigint")
        .alias("c2"),
    )
    wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_ord = wg.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = wg.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_lead = wg.orderBy("v")
    scored = (
        per_val.withColumn("cum1", F.sum("c1").over(w_ord))
        .withColumn("cum2", F.sum("c2").over(w_ord))
        .withColumn("n1", F.sum("c1").over(w_all))
        .withColumn("n2", F.sum("c2").over(w_all))
        .withColumn(
            "gap",
            F.coalesce(
                F.lead("v").over(w_lead) - F.col("v"),
                F.lit(0).cast("bigint"),
            ),
        )
    )
    agg = (
        scored.filter((F.col("n1") > 0) & (F.col("n2") > 0))
        .groupBy(*groups)
        .agg(
            F.sum(F.expr("abs(cum1 * n2 - cum2 * n1) * gap"))
            .cast("bigint")
            .alias("num"),
            # the same CDF-difference contraction carries the
            # Kolmogorov-Smirnov statistic for free: max instead of
            # gap-weighted integral (here the last support point DOES
            # participate — its |F1 - F2| can be the max even though
            # its gap-weighted W1 contribution is zero)
            F.max(F.expr("abs(cum1 * n2 - cum2 * n1)"))
            .cast("bigint")
            .alias("ks_num"),
            F.max("n1").alias("n_early"),
            F.max("n2").alias("n_late"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            # the group's own value span feeds the overflow guard:
            # num <= n1 * n2 * span, so the guard must see span
            F.expr("greatest(max(v) - min(v), 1)")
            .cast("bigint")
            .alias("_span"),
        )
    )
    # division-form guard (conservative by floor rounding) over exact
    # counts and span — fires before a wrapped gap-weighted sum escapes
    guard = (
        f"n_early > {_I64_MAX} DIV 1000 DIV n_late DIV _span"
    )
    raise_bigint = (
        "CAST(raise_error('wasserstein_drift: a group exceeds the"
        " n_early * n_late * span * 1000 < 2^63 exactness bound;"
        " pre-bucket the values to a coarser integer scale or shard"
        " the input') AS BIGINT)"
    )
    return agg.filter(F.col("num").isNotNull()).select(
        *groups,
        F.expr(
            f"CASE WHEN {guard} THEN {raise_bigint}"
            f" ELSE {_ppm2('num', '(n_early * n_late)')} END"
        )
        .cast("bigint")
        .alias("w1_e6"),
        F.expr(
            f"CASE WHEN {guard} THEN {raise_bigint}"
            f" ELSE {_ppm2('ks_num', '(n_early * n_late)')} END"
        )
        .cast("bigint")
        .alias("ks_ppm"),
        "n_early",
        "n_late",
        "n_values",
    )


def theilsen_trend(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] | None = None,
    bucket: str = "day",
    max_buckets: int = 4000,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Theil-Sen (Theil 1950; Sen 1968) robust trend of the event
    rate per group —
    ``(*group_cols, slope_num BIGINT, slope_den BIGINT, n BIGINT,
    n_buckets BIGINT, n_pairs BIGINT)`` where ``slope_num/slope_den``
    is the MEDIAN pairwise slope (events per bucket per bucket) over
    the group's per-bucket counts, EMPTY BUCKETS INCLUDED as zeros
    (dropping them would bias an outage toward "no trend").  The
    median of n^2 pairwise slopes has a 29.3% breakdown point — a
    one-day ingest spike that would drag an OLS fit moves Theil-Sen
    not at all; the reference leaves trend reading to the dashboard
    over its per-key counts, this runs it inside the engine.

    Exactness: slopes are rationals dy/dx of BIGINTs and are emitted
    AS the selected pair's (dy, dx) — never divided.  Selection
    sorts by the IEEE-double quotient (exact-rounded identically on
    every engine) with (dy, dx) tiebreak, then takes the lower median
    by row_number; equal rationals with different representations
    order deterministically by the tiebreak, and the selected
    NUMERATOR/DENOMINATOR cross the hash gate as integers.

    Scale shape: the full-data shuffle is the (group, bucket) count;
    the bucket timeline densifies via ``sequence()`` explode (bounded
    by span/bucket) and pairs form by a contraction self-join within
    each group — O(B^2) rows per group, parallel across groups,
    NEVER touching row-level data.  ``max_buckets`` guards the
    quadratic fan-out: the span probe is one tiny aggregate and the
    operator RAISES past the cap (a 4000-bucket span is ~8M pairs per
    group — pre-aggregate to a coarser bucket instead)."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"theilsen_trend: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    bus = _BUCKET_US[bucket]
    groups = list(group_cols or [])

    counts = _counts_or(df, counts_df, ts_col, groups, bus, "theilsen_trend")

    span = counts.groupBy(*groups).agg(
        F.min("t").alias("t_lo"), F.max("t").alias("t_hi")
    )
    worst = _worst_span_buckets(counts, span, groups)
    if worst is not None and worst > max_buckets:
        raise ValueError(
            f"theilsen_trend: a group spans {worst} {bucket} buckets"
            f" (> max_buckets={max_buckets}); pre-aggregate to a coarser"
            " bucket or raise the cap"
        )

    # densify: every bucket in the group's span, zeros where empty
    timeline = span.select(
        *groups,
        F.explode(F.sequence("t_lo", "t_hi")).alias("t"),
    )
    # null-safe on the group key throughout (round 9): a NULL group is
    # a real group under the span/counts groupBys, and plain equality
    # silently dropped it from the trend output
    dense = null_safe_group_join(
        timeline, counts, groups, plain_keys=["t"], how="left"
    ).select(
        *groups,
        "t",
        F.coalesce("x", F.lit(0).cast("bigint")).alias("x"),
    )

    a = dense.select(
        *groups, F.col("t").alias("t1"), F.col("x").alias("x1")
    )
    b = dense.select(
        *groups, F.col("t").alias("t2"), F.col("x").alias("x2")
    )
    pairs = (
        null_safe_group_join(a, b, groups)
        if groups
        else a.crossJoin(b)
    ).filter(F.col("t2") > F.col("t1"))
    slopes = pairs.select(
        *groups,
        (F.col("x2") - F.col("x1")).alias("dy"),
        (F.col("t2") - F.col("t1")).alias("dx"),
    ).withColumn(
        "q", F.col("dy").cast("double") / F.col("dx").cast("double")
    )
    wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_med = wg.orderBy(F.asc("q"), F.asc("dy"), F.asc("dx"))
    w_all = wg.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = slopes.withColumn("r", F.row_number().over(w_med)).withColumn(
        "np", F.count(F.lit(1)).over(w_all)
    )
    med = ranked.filter(F.col("r") == F.expr("(np + 1) DIV 2"))

    totals = dense.groupBy(*groups).agg(
        F.sum("x").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
    )
    out = (
        null_safe_group_join(med, totals, groups)
        if groups
        else med.crossJoin(F.broadcast(totals))
    )
    return out.select(
        *groups,
        F.col("dy").alias("slope_num"),
        F.col("dx").alias("slope_den"),
        "n",
        "n_buckets",
        F.col("np").alias("n_pairs"),
    )


def leadlag_spearman(
    df: DataFrame,
    ts_col: str,
    cat_col: str,
    cat_a: str,
    cat_b: str,
    max_lag: int = 7,
    bucket: str = "day",
    max_buckets: int = 4000,
) -> DataFrame:
    """Lead-lag rank cross-correlation between two category RATE
    series — ``(lag BIGINT, num BIGINT, den_x BIGINT, den_y BIGINT,
    n BIGINT, rho_e6 BIGINT)``: for each lag 0..max_lag, the exact
    tie-aware Spearman correlation between ``cat_a``'s per-bucket
    count at time t and ``cat_b``'s at time t+lag.  The argmax lag
    answers "does B FOLLOW A, and by how much?" — e.g. do error
    bursts trail deploy events by two days — with rank correlation's
    monotone-transform robustness (a 10x traffic day inflates both
    series; their ranks still align).

    Both series densify over the UNION span (zeros where silent —
    dropping silent buckets would fake correlation between sparse
    series), then each lag's pairing is an equi-join of the two
    contraction-sized series offset by the lag (the lag table is a
    broadcast literal), and all lags' statistics come from ONE
    :func:`~kafka_dead_letter_analyzer_spark.operators.ranking.
    spearman_exact` call with ``lag`` as the group column — per-lag
    rank windows over at most span/bucket rows, parallel across lags.
    ``max_buckets`` guards the densified span (RAISES, same contract
    as theilsen_trend).  Lags with a constant series (e.g. the
    overlap shrank to nothing) drop, per spearman's contract."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"leadlag_spearman: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    if max_lag < 0:
        raise ValueError("leadlag_spearman: max_lag must be >= 0")
    bus = _BUCKET_US[bucket]
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        spearman_exact,
    )

    ev = df.filter(
        F.col(ts_col).isNotNull()
        & F.col(cat_col).isin([cat_a, cat_b])
    ).select(
        F.col(cat_col).alias("cat"),
        F.expr(f"unix_micros({ts_col}) DIV {bus}").alias("t"),
    )
    counts = ev.groupBy("cat", "t").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    span = counts.agg(
        F.min("t").alias("t_lo"), F.max("t").alias("t_hi")
    )
    worst = span.collect()[0]
    if worst["t_lo"] is None:
        raise ValueError(
            "leadlag_spearman: no rows for either category"
        )
    if worst["t_hi"] - worst["t_lo"] + 1 > max_buckets:
        raise ValueError(
            f"leadlag_spearman: span is"
            f" {worst['t_hi'] - worst['t_lo'] + 1} {bucket} buckets"
            f" (> max_buckets={max_buckets}); coarsen the bucket"
        )
    timeline = span.select(
        F.explode(F.sequence("t_lo", "t_hi")).alias("t")
    )

    def _dense(cat: str, out: str):
        side = counts.filter(F.col("cat") == cat).select(
            F.col("t").alias(f"{out}_t"), F.col("x").alias(out)
        )
        return timeline.join(
            side, timeline["t"] == side[f"{out}_t"], "left"
        ).select(
            timeline["t"],
            F.coalesce(out, F.lit(0).cast("bigint")).alias(out),
        )

    a = _dense(cat_a, "xa")
    b = _dense(cat_b, "xb")
    spark = df.sparkSession
    from kafka_dead_letter_analyzer_spark.operators.io import (
        local_relation_df,
    )

    lags = local_relation_df(
        spark, [(int(l),) for l in range(max_lag + 1)], "lag bigint"
    )
    # a and b both derive from the same timeline frame: qualify every
    # side explicitly or Spark's same-lineage resolution can collapse
    # the offset condition onto one side (the round-5 self-join trap)
    paired = (
        a.alias("LL_A")
        .crossJoin(F.broadcast(lags).alias("LL_L"))
        .join(
            b.select(F.col("t").alias("tb"), "xb").alias("LL_B"),
            F.col("LL_B.tb") == F.col("LL_A.t") + F.col("LL_L.lag"),
            "inner",
        )
        .select(
            F.col("LL_L.lag").alias("lag"),
            F.col("LL_A.xa").alias("x"),
            F.col("LL_B.xb").alias("y"),
        )
    )
    # two_phase=False skips spearman's auto probe job: the paired
    # series is bucket-bounded by max_buckets above, so the per-lag
    # window over at most span/bucket rows is the right plan a priori
    return spearman_exact(
        paired, "x", "y", group_cols=["lag"], two_phase=False
    )


def hampel_outliers(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] | None = None,
    bucket: str = "day",
    half_window: int = 3,
    k_num: int = 3,
    k_den: int = 1,
    max_buckets: int = 100_000,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Hampel filter (Hampel 1974's robust location/scale pair as the
    classic moving-window detector) over per-bucket event counts —
    ``(*group_cols, bucket_ts TIMESTAMP, cnt BIGINT, med BIGINT,
    mad BIGINT, flagged BOOLEAN)``: a bucket is flagged when its count
    deviates from the ROLLING median of its ±half_window neighbors by
    more than ``k * MAD`` (median absolute deviation) — the classic
    robust point-outlier detector.  CUSUM finds sustained LEVEL
    shifts; Hampel finds the single poisoned day that CUSUM absorbs
    and a mean±3sigma rule misses entirely (one 100x spike inflates
    the window's sigma enough to mask itself — the median and MAD are
    immune, breakdown 50%).

    Exactness: the window's counts collect into an array, sort, and
    index — medians are actual elements (lower median), MAD likewise
    over |x - med|, and the flag compares ``k_den * |cnt - med| >
    k_num * mad`` in integers (k as an exact rational; the default
    3/1).  MAD = 0 (constant window) flags any deviating count, the
    strict-inequality convention.  Timeline densifies with zeros via
    sequence() (a silent day IS data to the median).  Scale shape: one
    (group, bucket) count shuffle, then array ops over the DENSIFIED
    contraction — window arrays are 2*half_window+1 longs; edges use
    the available neighbors (shorter windows, same rule both engines).
    """
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"hampel_outliers: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    if half_window < 1:
        raise ValueError("hampel_outliers: half_window must be >= 1")
    if k_num < 0 or k_den < 1:
        raise ValueError("hampel_outliers: need k_num >= 0, k_den >= 1")
    bus = _BUCKET_US[bucket]
    groups = list(group_cols or [])

    counts = _counts_or(df, counts_df, ts_col, groups, bus, "hampel_outliers")
    span = counts.groupBy(*groups).agg(
        F.min("t").alias("t_lo"), F.max("t").alias("t_hi")
    )
    # densify guard: hampel's window work is LINEAR in the span (unlike
    # the quadratic pair operators, so the default cap is generous),
    # but an adversarial span — one stray 1970 timestamp at ms buckets —
    # must raise, not materialize a gigarow sequence()
    worst = _worst_span_buckets(counts, span, groups)
    if worst is not None and worst > max_buckets:
        raise ValueError(
            f"hampel_outliers: a group spans {worst} {bucket} buckets"
            f" (> max_buckets={max_buckets}); coarsen the bucket or"
            " filter the stray timestamps"
        )
    timeline = span.select(
        *groups, F.explode(F.sequence("t_lo", "t_hi")).alias("t")
    )
    # null-safe on the group key (round 9): keeps the NULL group
    dense = null_safe_group_join(
        timeline, counts, groups, plain_keys=["t"], how="left"
    ).select(
        *groups, "t",
        F.coalesce("x", F.lit(0).cast("bigint")).alias("x"),
    )
    wg = (
        Window.partitionBy(*groups) if groups else Window.partitionBy()
    ).orderBy("t").rowsBetween(-half_window, half_window)
    arr = dense.withColumn("win", F.array_sort(F.collect_list("x").over(wg)))
    scored = arr.withColumn(
        "med", F.expr("win[(size(win) + 1) DIV 2 - 1]")
    ).withColumn(
        "mad",
        F.expr(
            "array_sort(transform(win, v -> abs(v - med)))"
            "[(size(win) + 1) DIV 2 - 1]"
        ),
    )
    return scored.select(
        *groups,
        F.timestamp_micros(F.expr(f"t * {bus}")).alias("bucket_ts"),
        F.col("x").alias("cnt"),
        "med",
        "mad",
        F.expr(f"{int(k_den)} * abs(x - med) > {int(k_num)} * mad").alias(
            "flagged"
        ),
    )


def mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: Sequence[str] | None = None,
    bucket: str = "day",
    max_buckets: int = 4000,
    counts_df: DataFrame | None = None,
) -> DataFrame:
    """Mann-Kendall trend TEST statistics per group —
    ``(*group_cols, s_stat BIGINT, var18 BIGINT, n_buckets BIGINT,
    n BIGINT)``: ``S = sum_{i<j} sign(x_j - x_i)`` over the group's
    DENSIFIED per-bucket counts (Mann 1945; the hypothesis-test
    companion of :func:`theilsen_trend` — Theil-Sen says how STEEP,
    Mann-Kendall says whether a monotone trend exists at all, with a
    null distribution that is exact under exchangeability).
    ``var18 = 18 * Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5)`` with
    the standard tie correction (t = multiplicity of each repeated
    count value) — kept x18 so the surface stays integer; callers form
    z = (S -+ 1) / sqrt(var18/18) driver-side.  Zeros densify in (a
    silent stretch is evidence of decline, not missing data).

    Scale shape: identical to theilsen_trend — one (group, bucket)
    count shuffle, sequence() densify, contraction self-join for the
    sign pairs (O(B^2) per group, parallel across groups), one
    value-multiplicity contraction for the tie term; ``max_buckets``
    probes the span and RAISES (pre-aggregate to a coarser bucket)."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"mann_kendall: bucket must be one of {sorted(_BUCKET_US)},"
            f" got {bucket!r}"
        )
    bus = _BUCKET_US[bucket]
    groups = list(group_cols or [])

    counts = _counts_or(df, counts_df, ts_col, groups, bus, "mann_kendall")
    span = counts.groupBy(*groups).agg(
        F.min("t").alias("t_lo"), F.max("t").alias("t_hi")
    )
    worst = _worst_span_buckets(counts, span, groups)
    if worst is not None and worst > max_buckets:
        raise ValueError(
            f"mann_kendall: a group spans {worst} {bucket} buckets"
            f" (> max_buckets={max_buckets}); pre-aggregate to a coarser"
            " bucket or raise the cap"
        )
    timeline = span.select(
        *groups, F.explode(F.sequence("t_lo", "t_hi")).alias("t")
    )
    # null-safe on the group key throughout (round 9)
    dense = null_safe_group_join(
        timeline, counts, groups, plain_keys=["t"], how="left"
    ).select(
        *groups, "t",
        F.coalesce("x", F.lit(0).cast("bigint")).alias("x"),
    )

    a = dense.select(
        *groups, F.col("t").alias("t1"), F.col("x").alias("x1")
    )
    b = dense.select(
        *groups, F.col("t").alias("t2"), F.col("x").alias("x2")
    )
    pairs = (
        null_safe_group_join(a, b, groups) if groups else a.crossJoin(b)
    ).filter(F.col("t2") > F.col("t1"))
    s_agg = pairs.groupBy(*groups).agg(
        F.sum(F.expr("sign(x2 - x1)")).cast("bigint").alias("s_stat")
    )
    ties = (
        dense.groupBy(*groups, "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tcnt"))
        .groupBy(*groups)
        .agg(
            F.sum(F.expr("tcnt * (tcnt - 1) * (2 * tcnt + 5)"))
            .cast("bigint")
            .alias("tie_term"),
            F.sum("tcnt").cast("bigint").alias("n_buckets"),
        )
    )
    totals = dense.groupBy(*groups).agg(
        F.sum("x").cast("bigint").alias("n")
    )
    joined = (
        null_safe_group_join(
            null_safe_group_join(s_agg, ties, groups), totals, groups
        )
        if groups
        else s_agg.crossJoin(F.broadcast(ties)).crossJoin(
            F.broadcast(totals)
        )
    )
    return joined.select(
        *groups,
        "s_stat",
        F.expr(
            "n_buckets * (n_buckets - 1) * (2 * n_buckets + 5) - tie_term"
        ).cast("bigint").alias("var18"),
        "n_buckets",
        "n",
    )


def dead_letter_drift_report(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    bucket: str = "hour",
) -> DataFrame:
    """The product-level drift dashboard over a dead-letter feed — one
    row per group joining four detectors this module ships:
    CUSUM's strongest up/down level shift (+ its ppm decisiveness),
    the Theil-Sen robust trend rational, the Mann-Kendall test
    statistics, and the count of Hampel-flagged poisoned buckets.
    ``(*group_cols, n, buckets, up_cp_ts, up_ppm, down_cp_ts,
    down_ppm, slope_num, slope_den, s_stat, var18, flagged_buckets)``.

    This is what `--drift-report` in the CLI writes next to the
    reference-shaped outputs: the reference emits per-key COUNTS and
    leaves "did it change" to the dashboard; this runs the change
    question inside the engine, on the same normalized feed.  Each
    component is independently differential-tested; the join keys on
    the error-key domain (broadcast-sized by construction)."""
    cp = cusum_changepoint(
        df, ts_col=ts_col, group_cols=list(group_cols), bucket=bucket
    )
    tr = theilsen_trend(
        df, ts_col=ts_col, group_cols=list(group_cols), bucket=bucket
    ).select(*group_cols, "slope_num", "slope_den")
    mk = mann_kendall(
        df, ts_col=ts_col, group_cols=list(group_cols), bucket=bucket
    ).select(*group_cols, "s_stat", "var18")
    hp = (
        hampel_outliers(
            df, ts_col=ts_col, group_cols=list(group_cols), bucket=bucket
        )
        .groupBy(*group_cols)
        .agg(
            F.sum(F.when(F.col("flagged"), 1).otherwise(0))
            .cast("bigint")
            .alias("flagged_buckets")
        )
    )
    keys = list(group_cols)
    return cp.join(tr, keys).join(mk, keys).join(hp, keys)


def _pick_report_bucket(
    df: DataFrame, ts_col: str, max_buckets: int = 4000
) -> str:
    """Coarsest-fitting bucket for the drift report: hour when the
    feed's span fits the pair operators' cap, else day (raises only
    past ~11 years of days — filter stray timestamps instead)."""
    lo_hi = df.filter(F.col(ts_col).isNotNull()).agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col))).alias("hi"),
    ).collect()[0]
    if lo_hi["lo"] is None:
        return "hour"
    span_us = lo_hi["hi"] - lo_hi["lo"]
    if span_us // _BUCKET_US["hour"] + 1 <= max_buckets:
        return "hour"
    if span_us // _BUCKET_US["day"] + 1 <= max_buckets:
        return "day"
    raise ValueError(
        "dead_letter_drift_report: feed spans more than"
        f" {max_buckets} days; filter stray timestamps"
    )
