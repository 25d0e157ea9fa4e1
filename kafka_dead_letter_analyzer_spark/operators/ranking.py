"""Ranking / evaluation metrics — classifier audit primitives for
training-data pipelines at corpus scale.

A quality-filter pipeline lives or dies by its scorer: before a score
column gates 100 TB of documents, you measure how well it separates the
classes you care about.  The classic tool is AUC (area under the ROC
curve) — equivalently the Mann-Whitney U statistic, ``P(score_pos >
score_neg) + P(tie)/2`` — and the classic mistake at scale is computing
it with a GLOBAL rank over every row (one task sorts the corpus).

:func:`auc_exact` computes exact integer AUC sufficient statistics with
a shuffle no wider than the DISTINCT SCORE domain:

1. ``groupBy(score)`` → per-score positive/negative counts (map-side
   combined; the only full-data shuffle, width = distinct scores).
2. Cumulative negatives-below-each-score:
   - grouped: a window PARTITIONED on the group columns — per-group
     score domains sort in parallel, no global sort;
   - global: a TWO-PHASE range prefix sum — ``repartitionByRange`` on
     score, per-partition local prefix via one ``mapInPandas``, then a
     bounded (one row per partition) offset collect broadcast back.
     No single-task window at any cardinality.  The range boundaries
     Spark samples are not deterministic, but the prefix sums — and
     therefore the result — are partition-independent.
3. ``U2 = sum(pos_s * (2*cum_neg_lt + neg_s))`` — twice the
   Mann-Whitney U with the standard half-credit for ties, kept integer
   by the doubling.  ``AUC = U2 / (2 * n_pos * n_neg)``, emitted as
   ``auc_ppm = (U2 * 500_000) div (n_pos * n_neg)`` so the declared
   surface stays BIGINT-exact cross-engine (no float division).

Overflow bounds: ``U2 <= 2 * n_pos * n_neg`` fits a signed 64-bit int
while ``n_pos * n_neg < 2^62``; ``auc_ppm``'s two-step long division
(the same ``_ppm2`` shape as operators/drift.py) keeps every
intermediate within ``2 * n_pos * n_neg * 1000``, exact while
``n_pos * n_neg < 2^63/2000`` (~4.6e15 — balanced ~68M rows per class
per group).  Past that the operator RAISES (a ``raise_error`` CASE on
the exact integer counts — zero-cost, distributed, no driver probe):
compute per-group/per-shard AUCs and report the distribution — a
single global AUC over 1e8+ rows per class is statistically pointless
anyway.

:func:`rrf_fuse` is reciprocal-rank fusion (Cormack, Clarke & Buettcher,
SIGIR'09): combine N rankings of the same items by
``score = sum_r 1/(k + rank_r)``.  The reciprocal is kept integer —
``10^9 div (k + rank)`` — because float reciprocals are not the
operator's point and integer keeps the surface hash-checkable; ranks
are dense per source via a window partitioned by source (each source's
ranking sorts independently).  Items missing from a source contribute 0,
the standard RRF convention.

Reference scope note: the reference system (bakdata
kafka-dead-letter-analyzer) has no evaluation-metric surface — this
module is part of the engine's large-scale-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "auc_exact",
    "rrf_fuse",
    "global_exclusive_prefix",
    "spearman_exact",
    "kendall_tau_exact",
    "kendall_tau_quantized",
    "isotonic_calibrate",
    "roc_curve_points",
]

#: int64 ceiling used by the raise_error overflow guards; module-level
#: so tests can monkeypatch it down to trigger the raise cheaply.
_I64_MAX = 9223372036854775807

#: Largest per-group row count whose centered-rank sums stay
#: int64-exact (n^3 < 2^63); spearman_exact raises past it.
_SPEARMAN_N_MAX = 2_097_151

#: Largest per-group row count whose Kendall pair masses stay
#: int64-exact (C(n,2) < 2^63); kendall_tau_exact raises past it.
_KENDALL_N_MAX = 4_294_967_295

#: A grouped cumulative window sorts each group's value contraction in
#: ONE task.  Below this many distinct values per group that sort is
#: cheap and the window path wins the measured local A/B (docstrings
#: below); above it the single-task sort is the scale bottleneck and
#: the auto path swaps in the grouped range-partitioned prefix.  Tests
#: pass a lower value to pin the plan at fixture scale.
_TWO_PHASE_MIN_DISTINCT = 2_000_000


def _distinct_probe(
    base: DataFrame, groups: list[str], value_cols: list[str],
    frac_checks: dict[str, str] | None = None,
):
    """One partial-aggregated scan: per-group row count and
    approx-distinct per value column, reduced to their maxima over
    groups (plus optional fractional-value flags) and collected as a
    single driver row.  Feeds the window-vs-two-phase path choice —
    the plan shape must come from the DATA, and Spark plans are
    static, so a 1-row driver probe is the price of a data-dependent
    physical strategy (same contract as theilsen_trend's span probe)."""
    per_g = base.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.approx_count_distinct(c).alias(f"_d_{c}")
            for c in value_cols
        ],
        *[
            F.max(F.when(F.expr(e), 1).otherwise(0)).alias(f"_f_{c}")
            for c, e in (frac_checks or {}).items()
        ],
    )
    return per_g.agg(
        F.max("_n").alias("n"),
        # the group COUNT rides the same probe for free: it bounds the
        # two-phase offsets table (range_partitions x n_groups rows),
        # so callers can restore the broadcast hint when it is
        # provably safe instead of paying AQE's shuffle-write of the
        # contraction before the runtime broadcast conversion
        F.count(F.lit(1)).alias("n_groups"),
        *[F.max(f"_d_{c}").alias(f"d_{c}") for c in value_cols],
        *[
            F.max(f"_f_{c}").alias(f"f_{c}")
            for c in (frac_checks or {})
        ],
    ).collect()[0]


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    range_partitions: int = 32,
    two_phase: bool | None = None,
) -> DataFrame:
    """Exact AUC sufficient statistics of ``score_col`` against boolean
    ``label_col`` — ``(*group_cols, u2 BIGINT, n_pos BIGINT,
    n_neg BIGINT, auc_ppm BIGINT)``, dropping groups with an empty
    class (AUC undefined).  See the module docstring for the plan
    shape; rows with a NULL score or label are excluded.

    ``two_phase`` (grouped path only; the global path is ALWAYS the
    two-phase range prefix): ``None`` (default) probes the data — one
    partial-aggregated scan for the max per-group approx-distinct
    score count — and swaps the per-group cumulative window for the
    grouped range-partitioned prefix when any group's score domain
    exceeds ``_TWO_PHASE_MIN_DISTINCT`` (a near-continuous score would
    otherwise sort a whole group's contraction in one task at cluster
    scale).  ``True``/``False`` skip the probe and force the path.
    ``auc_ppm`` is emitted via two-step long division (exact while
    ``n_pos * n_neg < 2^63/2000``; a raise_error CASE on the exact
    class counts raises past that with a sharding hint)."""
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())

    bc_offsets = False
    if groups and two_phase is None:
        probe = _distinct_probe(base, groups, ["s"])
        two_phase = (
            probe["d_s"] is not None
            and probe["d_s"] > _TWO_PHASE_MIN_DISTINCT
        )
        bc_offsets = (
            probe["n_groups"] is not None
            and probe["n_groups"] <= _OFFSETS_BROADCAST_MAX_GROUPS
        )

    counts = base.groupBy(*groups, "s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1))
        .cast("bigint")
        .alias("neg"),
    )

    if groups and not two_phase:
        # per-group cumulative: each group's (bounded) score domain
        # sorts in its own task — parallel across groups, never global
        w = (
            Window.partitionBy(*groups)
            .orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = counts.withColumn(
            "cum_lt", F.coalesce(F.sum("neg").over(w), F.lit(0))
        )
    else:
        cum = global_exclusive_prefix(
            counts, order_col="s", sum_col="neg", out_col="cum_lt",
            range_partitions=range_partitions,
            group_cols=groups or None,
            broadcast_offsets=bc_offsets,
        )

    agg = cum.groupBy(*groups).agg(
        F.sum(
            F.col("pos") * (F.lit(2) * F.col("cum_lt") + F.col("neg"))
        )
        .cast("bigint")
        .alias("u2"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
    )
    # two-step long division keeps every intermediate within
    # 2*n_pos*n_neg*1000; the guard condition is division-form (cannot
    # itself overflow) over the EXACT class counts, so it fires even
    # when u2's sum has already wrapped
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    ppm = ppm2("u2", "(2 * n_pos * n_neg)")
    guard = (
        f"n_pos > {_I64_MAX} DIV 2000 DIV n_neg"
    )
    return agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0)).select(
        *groups,
        "u2",
        "n_pos",
        "n_neg",
        F.expr(
            f"CASE WHEN {guard} THEN CAST(raise_error('auc_exact:"
            " n_pos*n_neg exceeds the exact-ppm int64 bound (2^63/2000);"
            " shard the input (e.g. by a hash of the id) and report the"
            " per-shard AUC distribution') AS BIGINT)"
            f" ELSE {ppm} END"
        ).cast("bigint").alias("auc_ppm"),
    )


# a probe-verified group count at or under this makes the grouped
# offsets table (range_partitions x n_groups rows) safely
# broadcast-sized; above it — or unprobed — AQE decides at runtime
_OFFSETS_BROADCAST_MAX_GROUPS = 8192


def global_exclusive_prefix(
    df: DataFrame,
    order_col: str,
    sum_col: str,
    out_col: str,
    range_partitions: int = 32,
    group_cols: list[str] | None = None,
    broadcast_offsets: bool = False,
) -> DataFrame:
    """Two-phase exclusive prefix sum: ``out_col = sum(sum_col) over
    ([partition by group_cols] order by order_col rows unbounded
    preceding .. 1 preceding)`` with no single-task — and no fat
    per-group — window at any cardinality.  Range-partition on
    (*group_cols, order_col), local prefix per (partition, group) in
    one streamed pass, then broadcast the per-(partition, group)
    exclusive offsets (a bounded partitions x groups table) back onto
    the local sums.  The range boundaries Spark samples are not
    deterministic; the prefix sums are partition-independent.  With
    ``group_cols`` the offset window partitions by group and orders by
    partition id — still bounded rows, so a group whose key domain is
    near-continuous (a price column under spearman_exact) costs the
    same as a bounded one, where a plain group window would sort the
    whole group in one task.  Shared scan-width contract: the input
    should already be a distinct-key aggregation (auc_exact,
    gini_concentration, and spearman_exact feed it per-score /
    per-value count tables), so every stage's width is the key domain,
    not the row count."""
    import pandas as pd  # noqa: F401 — mapInPandas dependency

    groups = list(group_cols or [])
    ranged = (
        df.repartitionByRange(range_partitions, *groups, order_col)
        .sortWithinPartitions(*groups, order_col)
        .withColumn("pid", F.spark_partition_id())
    )

    def _local_prefix(batches):
        import numpy as np
        import pandas as pd

        def _normk(k) -> tuple:
            # a NULL group key must be ONE carry key: pandas hands a
            # nullable numeric group over as NaN, and NaN != NaN makes
            # every NaN a DISTINCT dict key (id-based fallback), which
            # would silently pin local_lt at 0 for the whole NULL
            # group (round-9 review).  Normalization runs once per
            # DISTINCT key per batch, never per row.
            kt = k if isinstance(k, tuple) else (k,)
            return tuple(None if pd.isna(x) else x for x in kt)

        # all prefix arithmetic is VECTORIZED (round-9 perf pass: the
        # per-row Python loop was ~half of spearman's exec time at
        # sf0.1 — the contraction for a near-continuous column is
        # row-count-sized).  A partition holds exactly one pid and
        # rows arrive sorted by (groups, order col), so the exclusive
        # prefix is a C-speed groupby-cumsum; only the per-DISTINCT-KEY
        # carry bookkeeping crosses into Python.
        carry: dict[tuple, int] = {}
        for pdf in batches:
            out = pdf.copy()
            if len(pdf) == 0:
                out["local_lt"] = pd.Series([], dtype="int64")
                yield out
                continue
            vals = pdf[sum_col].to_numpy(dtype=np.int64)
            if groups:
                gb = pdf.groupby(list(groups), dropna=False, sort=False)
                excl = (
                    gb[sum_col].cumsum().to_numpy(dtype=np.int64) - vals
                )
                codes = gb.ngroup().to_numpy()
                gsums = gb[sum_col].sum()  # appearance order (sort=False)
                keys = [_normk(k) for k in gsums.index]
                carr = np.array(
                    [carry.get(k, 0) for k in keys], dtype=np.int64
                )
                out["local_lt"] = pd.Series(
                    excl + carr[codes], index=pdf.index, dtype="int64"
                )
                for k, s in zip(keys, gsums.to_numpy(dtype=np.int64)):
                    carry[k] = carry.get(k, 0) + int(s)
            else:
                base_carry = carry.get((), 0)
                excl = np.cumsum(vals) - vals + base_carry
                out["local_lt"] = pd.Series(
                    excl, index=pdf.index, dtype="int64"
                )
                carry[()] = base_carry + int(vals.sum())
            yield out

    from pyspark.sql.types import StructType

    # StructType.add mutates in place — copy before extending, or the
    # input frame's schema grows the output column
    schema = StructType(list(ranged.schema.fields)).add("local_lt", "long")
    local = ranged.mapInPandas(_local_prefix, schema=schema)
    from kafka_dead_letter_analyzer_spark import cache_registry

    # local feeds both the offset aggregate and the final join — persist
    # or the upstream distinct-key shuffle runs twice
    local = local.persist()
    cache_registry.track(local)

    # one row per (range partition, group) — bounded; an exclusive
    # running total over pid order within each group (range partitions
    # are ordered by construction, and a group's rows occupy a
    # contiguous pid span under the composite range key)
    totals = local.groupBy("pid", *groups).agg(
        F.sum(sum_col).alias("part_sum")
    )
    wp = (
        (Window.partitionBy(*groups) if groups else Window)
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the window runs over range_partitions (x groups) rows — bounded,
    # not a global data sort
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("part_sum").over(wp), F.lit(0))
    ).select("pid", *groups, "offset")

    if groups:
        # null-safe on the group columns (pid can stay plain): groupBy
        # keeps NULL as a real group, so a plain equi-join here would
        # silently drop exactly the NULL-keyed group the aggregation
        # produced offsets for.  No forced broadcast BY DEFAULT:
        # offsets is range_partitions x #groups rows, which is NOT
        # bounded when the group domain is large (millions of groups)
        # — AQE picks the strategy, at the price of a shuffle-write of
        # the local frame before the runtime conversion.  Callers that
        # PROBED the group count (auc/spearman's _distinct_probe) pass
        # broadcast_offsets=True to skip that write when the table is
        # provably small.
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        joined = null_safe_group_join(
            local,
            F.broadcast(offsets) if broadcast_offsets else offsets,
            groups,
            plain_keys=["pid"],
        )
    else:
        # ungrouped: offsets is exactly range_partitions rows — a
        # genuinely bounded table, broadcast is always right
        joined = local.join(F.broadcast(offsets), ["pid"])
    return (
        joined.withColumn(out_col, F.col("offset") + F.col("local_lt"))
        .drop("pid", "local_lt", "offset")
    )


def rrf_fuse(
    rankings: DataFrame,
    item_cols: list[str],
    source_col: str,
    order_col: str,
    k: int = 60,
    descending: bool = True,
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of per-source rankings of the same items
    — ``(*item_cols, rrf_score_ppb BIGINT, n_sources BIGINT)`` with
    ``rrf_score_ppb = sum over sources of 10^9 div (k + rank)``, rank
    dense per source by ``order_col`` (ties share a rank; item columns
    break residual order nondeterminism nowhere because dense_rank is a
    pure function of the order value).  ``top_n`` contracts the fused
    output by score (TakeOrdered — each task ships its local top n).

    Plan shape: one window per source partition (each source ranks in
    its own task set, partitioned by ``source_col``), one groupBy on the
    item keys — both shuffles are id+rank-width, never payload-width."""
    if k < 1:
        raise ValueError(f"rrf_fuse: k must be >= 1, got {k}")
    order = F.desc(order_col) if descending else F.asc(order_col)
    w = Window.partitionBy(source_col).orderBy(order)
    ranked = rankings.select(
        *[rankings[c] for c in item_cols],
        F.dense_rank().over(w).alias("rk"),
    )
    fused = (
        ranked.groupBy(*item_cols)
        .agg(
            F.sum(F.expr(f"1000000000 DIV ({k} + rk)"))
            .cast("bigint")
            .alias("rrf_score_ppb"),
            F.count("*").cast("bigint").alias("n_sources"),
        )
    )
    if top_n is not None:
        fused = fused.orderBy(
            F.desc("rrf_score_ppb"), *[F.col(c) for c in item_cols]
        ).limit(int(top_n))
    return fused


def spearman_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    two_phase: bool | None = None,
) -> DataFrame:
    """Exact tie-aware Spearman rank correlation sufficient statistics —
    ``(*group_cols, num BIGINT, den_x BIGINT, den_y BIGINT, n BIGINT,
    rho_e6 BIGINT)`` with ``rho = num / sqrt(den_x * den_y)``.

    Ranks never materialize per row as floats: with ties, the average
    rank of the c rows at value v is (C_lt + (c+1)/2); DOUBLED and
    CENTERED it becomes the integer ``d = 2*C_lt + c - n`` (the doubled
    mean rank is exactly n+1, so the centered doubled ranks sum to 0
    per group and Pearson-on-ranks reduces to num = sum(dx*dy),
    den = sum(d^2) — no n*Sxy - Sx*Sy cross terms, which keeps the
    int64 bound at |d| < n => sums < n^3: exact to ~1.2e6 rows per
    group, shard past that).  rho_e6 = floor(num*1e6/sqrt(dx)/sqrt(dy) + 0.5)
    — every float op (int-to-double conversion, sqrt, divide, add,
    floor) is IEEE exact-rounded, so engines agree bit-for-bit when
    they run the same op sequence, and the +0.5 nearest-int keeps the
    extremes exact (sqrt(a)*sqrt(b) lands half an ULP off sqrt(ab), so
    a bare floor reports 999999 for perfect correlation); the integer
    triple remains the primary surface.

    Plan shape: two (group, value) count contractions with group-
    partitioned cumulative windows (the same shape as auc_exact), each
    joined back to the row set on RENAMED value keys (never the
    same-lineage attribute), then one map-side-combined aggregate.
    ``two_phase`` picks the cumulative-prefix strategy PER COLUMN:

    * ``None`` (default) probes the data — ONE partial-aggregated scan
      for per-group row count, per-column approx-distinct, and
      fractional-value flags — and swaps a column's window for the
      grouped range-partitioned prefix (global_exclusive_prefix) when
      any group's distinct-value count for THAT column exceeds
      ``_TWO_PHASE_MIN_DISTINCT``: a near-continuous column (a price in
      cents) has a row-sized contraction, and the window would sort a
      whole group in one task at cluster scale, while a bounded column
      (a 1-50 quantity) keeps the cheaper window.  The probe also
      RAISES on fractional values (see below) and on groups past the
      int64 exactness bound.
    * ``True`` / ``False`` skip the probe and force both columns onto
      the prefix / window path (the window is A/B-measured faster on
      local[32] through 6M rows/group — two Arrow map passes + a
      persist: 5.0 vs 2.7 s at sf0.1 with both columns forced — which
      is exactly why the default probes the data instead of trusting
      the local benchmark).  Differential-tested equal.

    Input contract: ``x_col``/``y_col`` must be INTEGER-VALUED (any
    numeric type whose values are whole — ranks of fractional scores
    are not preserved by the bigint cast: a double quality score in
    [0,1) would collapse to the constant 0 and silently drop the
    group).  The default probe raises ``ValueError`` on fractional
    values; explicit ``two_phase`` skips the probe, and the caller
    owns the contract (same wording as kendall_tau_exact /
    wasserstein_drift: quantize first).  Rows with a NULL in either
    column are excluded; groups where either column is constant drop
    (rho undefined).  Exactness bound: the centered-rank sums need
    ``n^3 < 2^63`` (n <= 2,097,151 rows per group) — the probe raises
    past it, and a zero-cost raise_error CASE on the exact per-group
    count backstops the explicit-``two_phase`` path; shard the input
    and report the per-shard distribution past that."""
    groups = list(group_cols or [])
    base0 = df.select(
        *[df[g] for g in groups],
        F.col(x_col).alias("x0"),
        F.col(y_col).alias("y0"),
    ).filter(F.col("x0").isNotNull() & F.col("y0").isNotNull())
    # base0 feeds FOUR evaluations of the source scan: the construction
    # probe plus the two value contractions and the join-back row set.
    # Persisting it turns the probe's eager collect into the cache fill
    # the three plan consumers then read — one source scan total
    # (interleaved A/B at sf0.1: 5.75 -> 4.56 s median warm; the
    # minhash-signature-base precedent, disk-backed at scale).
    from pyspark import StorageLevel

    from kafka_dead_letter_analyzer_spark import cache_registry

    base0 = base0.persist(StorageLevel.MEMORY_AND_DISK)
    cache_registry.track(base0)

    two_phase_x = two_phase_y = bool(two_phase)
    bc_offsets = False  # probe-verified group counts may enable it
    if two_phase is None:
        from pyspark.sql import types as T

        def _frac_check(col: str, dt) -> str | None:
            # integral types cannot carry fractional values; only
            # float/double/decimal(scale>0) need the value check
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                return f"{col} != floor({col})"
            if isinstance(dt, T.DecimalType) and dt.scale > 0:
                return f"{col} != floor({col})"
            return None

        checks = {
            c: e
            for c, dt in (("x0", base0.schema["x0"].dataType),
                          ("y0", base0.schema["y0"].dataType))
            for e in [_frac_check(c, dt)]
            if e is not None
        }
        probe = _distinct_probe(base0, groups, ["x0", "y0"], checks)
        for c, col_name in (("x0", x_col), ("y0", y_col)):
            if f"f_{c}" in probe.asDict() and probe[f"f_{c}"] == 1:
                raise ValueError(
                    f"spearman_exact: column {col_name!r} carries"
                    " fractional values — ranks are not preserved by"
                    " the bigint cast; quantize to an integer scale"
                    " first (e.g. cents / e6 fixed-point)"
                )
        if probe["n"] is not None and probe["n"] > _SPEARMAN_N_MAX:
            raise ValueError(
                f"spearman_exact: a group has {probe['n']} rows — the"
                " centered-rank sums are int64-exact only to n^3 <"
                " 2^63 (n <= 2,097,151 per group); shard the input"
                " (e.g. by a hash of the id) and report the per-shard"
                " rho distribution"
            )
        two_phase_x = (
            probe["d_x0"] is not None
            and probe["d_x0"] > _TWO_PHASE_MIN_DISTINCT
        )
        two_phase_y = (
            probe["d_y0"] is not None
            and probe["d_y0"] > _TWO_PHASE_MIN_DISTINCT
        )
        bc_offsets = (
            probe["n_groups"] is not None
            and probe["n_groups"] <= _OFFSETS_BROADCAST_MAX_GROUPS
        )

    base = base0.select(
        *[base0[g] for g in groups],
        F.col("x0").cast("bigint").alias("x"),
        F.col("y0").cast("bigint").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def _centered_map(col: str, out: str):
        col_two_phase = two_phase_x if col == "x" else two_phase_y
        counts = base.groupBy(*groups, col).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        if not col_two_phase:
            # default: per-group cumulative window over the contraction
            # (A/B-measured faster locally; see docstring)
            wg = (
                Window.partitionBy(*groups)
                if groups
                else Window.partitionBy()
            )
            w_lt = wg.orderBy(col).rowsBetween(
                Window.unboundedPreceding, -1
            )
            w_all = wg.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
            return counts.withColumn(
                "cum_lt",
                F.coalesce(
                    F.sum("c").over(w_lt), F.lit(0).cast("bigint")
                ),
            ).withColumn("nn", F.sum("c").over(w_all)).select(
                *groups,
                F.col(col).alias(f"{col}v"),
                F.expr("2 * cum_lt + c - nn").alias(out),
            )
        # two_phase=True: the cluster-scale path for near-continuous
        # columns — grouped range-partitioned prefix, every stage
        # range-partition-wide, no fat per-group sort anywhere
        cum = global_exclusive_prefix(
            counts, order_col=col, sum_col="c", out_col="cum_lt",
            group_cols=groups, broadcast_offsets=bc_offsets,
        )
        totals = counts.groupBy(*groups).agg(
            F.sum("c").cast("bigint").alias("nn")
        )
        # grouped: NULL-SAFE join (groupBy keeps NULL as a real group;
        # plain equality would drop it here only on the two-phase
        # path — the auc/kendall asymmetry, round 9), broadcast hint
        # only when the probe verified the group count (a forced
        # broadcast would be wrong at millions of groups); global:
        # the totals frame is one row, broadcast it
        if groups:
            from kafka_dead_letter_analyzer_spark.operators.common import (
                null_safe_group_join,
            )

            withn = null_safe_group_join(
                cum,
                F.broadcast(totals) if bc_offsets else totals,
                groups,
            )
        else:
            withn = cum.crossJoin(F.broadcast(totals))
        return withn.select(
            *groups,
            F.col(col).alias(f"{col}v"),
            F.expr("2 * cum_lt + c - nn").alias(out),
        )

    xm = _centered_map("x", "dx")
    ym = _centered_map("y", "dy")
    import functools

    def _conj(conds):
        return functools.reduce(lambda a, c: a & c, conds)

    # eqNullSafe on the group key (round 9): a NULL group is a real
    # group under the contraction groupBys, and plain equality here
    # silently dropped it from the final statistics
    joined = base.alias("b").join(
        xm.alias("xm"),
        _conj([*(F.col(f"b.{g}").eqNullSafe(F.col(f"xm.{g}"))
                 for g in groups),
               F.col("b.x") == F.col("xm.xv")]),
        "inner",
    ).join(
        ym.alias("ym"),
        _conj([*(F.col(f"b.{g}").eqNullSafe(F.col(f"ym.{g}"))
                 for g in groups),
               F.col("b.y") == F.col("ym.yv")]),
        "inner",
    )
    agg = joined.groupBy(*[F.col(f"b.{g}") for g in groups]).agg(
        F.sum(F.expr("dx * dy")).cast("bigint").alias("num"),
        F.sum(F.expr("dx * dx")).cast("bigint").alias("den_x"),
        F.sum(F.expr("dy * dy")).cast("bigint").alias("den_y"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    # zero-cost distributed backstop for the explicit-two_phase path
    # (the default probe raises earlier): n is an exact count even when
    # the n^3-bounded sums have wrapped.  The guard lives INSIDE den_x,
    # BEFORE the undefined-rho filter — a wrapped den_x can land <= 0,
    # and filtering first would silently drop the past-bound group
    # instead of raising (the kendall n0 placement, same reason).
    guarded = agg.withColumn(
        "den_x",
        F.expr(
            f"CASE WHEN n > {_SPEARMAN_N_MAX} THEN"
            " CAST(raise_error('spearman_exact: a group exceeds the"
            " n^3 < 2^63 exactness bound (n <= 2,097,151 rows per"
            " group); shard the input and report the per-shard rho"
            " distribution') AS BIGINT) ELSE den_x END"
        ),
    )
    return guarded.filter(
        (F.col("den_x") > 0) & (F.col("den_y") > 0)
    ).select(
        *groups,
        "num",
        "den_x",
        "den_y",
        "n",
        F.expr(
            "CAST(floor(num * 1000000.0 /"
            " (sqrt(CAST(den_x AS DOUBLE)) * sqrt(CAST(den_y AS DOUBLE)))"
            " + 0.5) AS BIGINT)"
        ).alias("rho_e6"),
    )


def kendall_tau_exact(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    max_cells: int = 2000,
) -> DataFrame:
    """Exact Kendall tau-b concordance statistics —
    ``(*group_cols, nc BIGINT, nd BIGINT, tx_pairs BIGINT,
    ty_pairs BIGINT, n BIGINT, tau_e6 BIGINT)`` with
    ``tau_b = (nc - nd) / sqrt((n0 - tx)(n0 - ty))``, ``n0 = C(n,2)``.

    Spearman asks "are the RANKS linearly related"; Kendall asks the
    sharper ordinal question "for a random pair, do the two columns
    agree on the order" — robust to any monotone transform and the
    standard effect size for ordinal-vs-ordinal audits.  The textbook
    O(n^2) pair scan (or the sequential O(n log n) merge count, which
    does not distribute) is re-shaped around the JOINT (x, y) value
    contraction: concordant/discordant mass is
    ``sum(c_i * c_j * sign((x_j-x_i)(y_j-y_i)))`` over DISTINCT cell
    pairs — a self-join of contraction-sized frames per group, never
    row-level pairs (550 cells -> 150k cell pairs regardless of
    whether n is 60k or 60 billion).  Marginal tie masses come from
    the two 1-D contractions as ``sum C(c,2)``.  ``max_cells`` probes
    the joint domain with one aggregate and RAISES past the cap —
    Kendall over two near-continuous columns (cells ~ n) is the wrong
    tool; quantize or use spearman_exact.

    All six statistics are integers; ``tau_e6`` is the IEEE
    exact-rounded floor(x + 0.5) fixed point (same contract as
    spearman_exact's rho_e6).  NULL rows are excluded; groups where
    either column is constant drop (tau undefined).  Exactness bound:
    pair masses need ``C(n,2) < 2^63`` (n <= ~4.29e9 rows per group) —
    a zero-cost raise_error CASE on the exact per-group count raises
    past it with a sharding hint."""
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    cells = base.groupBy(*groups, "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # the cap probe materializes cells anyway; the pair join consumes
    # it twice and both tie masses derive from it — persist the
    # (bounded, <= max_cells per group) contraction so the base scans
    # once, not five times
    from kafka_dead_letter_analyzer_spark import cache_registry

    cells = cells.persist()
    cache_registry.track(cells)
    probe = (
        cells.groupBy(*groups).count().agg(F.max("count").alias("m"))
    ).collect()[0]["m"]
    if probe is not None and probe > max_cells:
        raise ValueError(
            f"kendall_tau_exact: a group has {probe} distinct (x, y)"
            f" cells (> max_cells={max_cells}); quantize the columns or"
            " use spearman_exact"
        )

    a = cells.select(
        *groups, F.col("x").alias("x1"), F.col("y").alias("y1"),
        F.col("c").alias("c1"),
    )
    b = cells.select(
        *groups, F.col("x").alias("x2"), F.col("y").alias("y2"),
        F.col("c").alias("c2"),
    )
    import functools

    # eqNullSafe on the group key: a NULL group is a real group under
    # the cells groupBy and must pair with itself here
    cond = functools.reduce(
        lambda acc, c: acc & c,
        [*(a[g].eqNullSafe(b[g]) for g in groups), F.lit(True)],
    ) & (
        (b["x2"] > a["x1"])
        | ((b["x2"] == a["x1"]) & (b["y2"] > a["y1"]))
    )
    pairs = a.join(b, cond, "inner") if groups else a.crossJoin(b).filter(
        (F.col("x2") > F.col("x1"))
        | ((F.col("x2") == F.col("x1")) & (F.col("y2") > F.col("y1")))
    )
    cd = pairs.groupBy(*[a[g] for g in groups]).agg(
        F.sum(
            F.when(
                F.expr("(x2 - x1) * (y2 - y1) > 0"), F.expr("c1 * c2")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("nc"),
        F.sum(
            F.when(
                F.expr("(x2 - x1) * (y2 - y1) < 0"), F.expr("c1 * c2")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("nd"),
    )

    def _tie_mass(col: str, out: str):
        # marginal multiplicities from the persisted joint contraction
        # (sum of cell counts), not another base scan
        return (
            cells.groupBy(*groups, col)
            .agg(F.sum("c").cast("bigint").alias("cc"))
            .groupBy(*groups)
            .agg(
                F.sum(F.expr("cc * (cc - 1) DIV 2"))
                .cast("bigint")
                .alias(out),
                F.sum("cc").cast("bigint").alias(f"_n_{out}"),
            )
        )

    tx = _tie_mass("x", "tx_pairs")
    ty = _tie_mass("y", "ty_pairs").drop("_n_ty_pairs")
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        # null-safe: groupBy keeps NULL as a real group, so a plain
        # equi-join here would drop exactly the NULL-keyed group
        joined = null_safe_group_join(
            null_safe_group_join(cd, tx, groups), ty, groups
        )
    else:
        joined = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    # the guard lives INSIDE n0 (evaluated by the undefined-tau filter
    # below, before any row could be silently dropped by a wrapped
    # n*(n-1)): n is an exact count even when the C(n,2)-bounded pair
    # masses have wrapped, so the raise always precedes a wrapped
    # statistic escaping (zero cost: a CASE on the agg row)
    out = joined.withColumnRenamed("_n_tx_pairs", "n").withColumn(
        "n0",
        F.expr(
            f"CASE WHEN n > {_KENDALL_N_MAX} THEN"
            " CAST(raise_error('kendall_tau_exact: a group exceeds the"
            " C(n,2) < 2^63 exactness bound (n <= 4,294,967,295 rows"
            " per group); shard the input and report the per-shard tau"
            " distribution') AS BIGINT)"
            # parity-split C(n,2): n*(n-1) alone wraps for n > ~3.04e9
            # even INSIDE the guarded range, so halve the even factor
            # BEFORE multiplying — intermediates equal the result
            " ELSE CASE WHEN n % 2 = 0 THEN (n DIV 2) * (n - 1)"
            "      ELSE n * ((n - 1) DIV 2) END END"
        ),
    )
    return out.filter(
        (F.col("n0") > F.col("tx_pairs")) & (F.col("n0") > F.col("ty_pairs"))
    ).select(
        *groups,
        "nc",
        "nd",
        "tx_pairs",
        "ty_pairs",
        "n",
        F.expr(
            "CAST(floor((nc - nd) * 1000000.0 /"
            " (sqrt(CAST(n0 - tx_pairs AS DOUBLE))"
            "  * sqrt(CAST(n0 - ty_pairs AS DOUBLE))) + 0.5) AS BIGINT)"
        ).alias("tau_e6"),
    )


def _kendall_grid_kernel_stats(
    cells: DataFrame, groups: list[str], max_grid: int
) -> DataFrame:
    """Per-group (nc, nd, tx_pairs, ty_pairs, n) from the (x, y) cell
    contraction in ONE grouped Arrow kernel: the dense int64 count
    matrix M (|xs| x |ys| <= max_grid, re-checked in-worker) gives
    A = exclusive cumsum along x, D_ll/D_lg = exclusive cumsums of A
    along +/-y, nc = sum(M*D_ll), nd = sum(M*D_lg); marginal tie
    masses are the row/column sums.  Bit-identical to the densified
    grid windows (same int64 ops in the same C(n,2) < 2^63 envelope;
    pinned by the cross-impl differential test and the declared
    query's DuckDB oracle)."""
    from pyspark.sql.types import StructType

    out_schema = StructType([cells.schema[g] for g in groups])
    for cname in ("nc", "nd", "tx_pairs", "ty_pairs", "n"):
        out_schema = out_schema.add(cname, "long")

    def _grid_kernel(pdf):
        import numpy as np
        import pandas as pd

        x = pdf["x"].to_numpy(dtype=np.int64)
        y = pdf["y"].to_numpy(dtype=np.int64)
        c = pdf["c"].to_numpy(dtype=np.int64)
        xs_u, xi = np.unique(x, return_inverse=True)
        ys_u, yi = np.unique(y, return_inverse=True)
        if len(xs_u) * len(ys_u) > max_grid:
            raise ValueError(
                f"kendall_tau_quantized: a group has a"
                f" {len(xs_u) * len(ys_u)}-point (x, y-bucket) grid"
                f" (> max_grid={max_grid}); quantize x too (x_buckets)"
                " or lower the bucket counts"
            )
        m = np.zeros((len(xs_u), len(ys_u)), dtype=np.int64)
        m[xi, yi] = c  # cells are unique per (x, y) by construction
        a = np.cumsum(m, axis=0) - m  # points with x' < x in column yb
        d_ll = np.cumsum(a, axis=1) - a
        rev = a[:, ::-1]
        d_lg = (np.cumsum(rev, axis=1) - rev)[:, ::-1]
        nc = int((m * d_ll).sum())
        nd = int((m * d_lg).sum())
        rx = m.sum(axis=1)
        ry = m.sum(axis=0)
        # marginal C(cc,2): vectorized int64 is exact while cc*(cc-1)
        # fits (cc < ~3.04e9); past that use Python ints — same values
        # the SQL path's guarded envelope documents
        if rx.size and int(rx.max()) >= 3_000_000_000:
            tx = sum(int(v) * (int(v) - 1) // 2 for v in rx)
        else:
            tx = int((rx * (rx - 1) // 2).sum())
        if ry.size and int(ry.max()) >= 3_000_000_000:
            ty = sum(int(v) * (int(v) - 1) // 2 for v in ry)
        else:
            ty = int((ry * (ry - 1) // 2).sum())
        head = {g: [pdf[g].iloc[0]] for g in groups}
        head.update(
            nc=[nc],
            nd=[nd],
            tx_pairs=[tx],
            ty_pairs=[ty],
            n=[int(m.sum())],
        )
        return pd.DataFrame(head)

    return cells.groupBy(*groups).applyInPandas(
        _grid_kernel, schema=out_schema
    )


def _kendall_grid_sql_stats(
    cells: DataFrame, xs: DataFrame, ys: DataFrame, groups: list[str]
) -> DataFrame:
    """The original relational dominance algebra (retained as the
    impl='sql' differential path): densified grid, three cumulative
    windows, two marginal tie contractions, null-safe assembly."""
    if groups:
        # null-safe on the group key: a NULL group is a real group
        # under the contraction groupBys and must survive every join
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        grid = null_safe_group_join(xs, ys, groups)
        # same NULL-group hazard as the grid build: plain equality on
        # the group columns would leave every cell of a NULL-keyed
        # group unmatched (c=0 across the board — a silent wrong tau)
        gridc = null_safe_group_join(
            grid, cells, groups, plain_keys=["x", "y"], how="left"
        ).select(
            *groups, "x", "y",
            F.coalesce("c", F.lit(0).cast("bigint")).alias("c"),
        )
    else:
        grid = xs.crossJoin(ys)
        gridc = grid.join(cells, ["x", "y"], "left").select(
            "x", "y",
            F.coalesce("c", F.lit(0).cast("bigint")).alias("c"),
        )
    wg_yb = Window.partitionBy(*groups, "y") if groups else (
        Window.partitionBy("y")
    )
    w_a = wg_yb.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    wg_x = Window.partitionBy(*groups, "x") if groups else (
        Window.partitionBy("x")
    )
    w_ll = wg_x.orderBy(F.asc("y")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_lg = wg_x.orderBy(F.desc("y")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    dom = (
        gridc.withColumn(
            "a", F.coalesce(F.sum("c").over(w_a), F.lit(0).cast("bigint"))
        )
        .withColumn(
            "d_ll",
            F.coalesce(F.sum("a").over(w_ll), F.lit(0).cast("bigint")),
        )
        .withColumn(
            "d_lg",
            F.coalesce(F.sum("a").over(w_lg), F.lit(0).cast("bigint")),
        )
    )
    cd = dom.groupBy(*groups).agg(
        F.sum(F.expr("c * d_ll")).cast("bigint").alias("nc"),
        F.sum(F.expr("c * d_lg")).cast("bigint").alias("nd"),
    )

    def _tie_mass(col: str, out: str):
        # marginal multiplicities come from the persisted cells
        # contraction (sum of joint-cell counts), never another base
        # scan
        return (
            cells.groupBy(*groups, col)
            .agg(F.sum("c").cast("bigint").alias("cc"))
            .groupBy(*groups)
            .agg(
                F.sum(F.expr("cc * (cc - 1) DIV 2"))
                .cast("bigint")
                .alias(out),
                F.sum("cc").cast("bigint").alias(f"_n_{out}"),
            )
        )

    tx = _tie_mass("x", "tx_pairs")
    ty = _tie_mass("y", "ty_pairs").drop("_n_ty_pairs")
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        # null-safe: groupBy keeps NULL as a real group, so a plain
        # equi-join here would drop exactly the NULL-keyed group
        joined = null_safe_group_join(
            null_safe_group_join(cd, tx, groups), ty, groups
        )
    else:
        joined = cd.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    return joined.withColumnRenamed("_n_tx_pairs", "n")


def kendall_tau_quantized(
    df: DataFrame,
    x_col: str,
    y_col: str,
    group_cols: list[str] | None = None,
    x_buckets: int = 0,
    y_buckets: int = 256,
    max_grid: int = 1_000_000,
    impl: str = "kernel",
) -> DataFrame:
    """Kendall tau-b over QUANTIZED near-continuous columns — the same
    output schema as :func:`kendall_tau_exact` (``nc nd tx_pairs
    ty_pairs n tau_e6``), exact for the quantized data, computed by
    GRID-PREFIX dominance counting instead of the cell-pair self-join:
    O(grid) per group where the exact operator is O(cells^2).

    Why it exists: ``kendall_tau_exact`` RAISES past ``max_cells``
    because its concordance self-join is quadratic in the joint value
    domain — correct for genuinely ordinal columns (a 50 x 11 grid),
    hopeless for a price-in-cents column where cells ~ n.  Quantizing
    the continuous column into ``y_buckets`` equi-width buckets over
    each group's own [min, max] span (``q = ((v - lo) * B) DIV
    (hi - lo + 1)``, integer-exact, q in [0, B-1]) bounds the grid at
    ``D_x * B``; the dominance masses then come from PREFIX SUMS over
    the densified (x-value x y-bucket) grid rather than cell pairs:

    * ``A(x, yb)`` = points with x' < x in column yb — one cumulative
      window partitioned by (group, yb) ordered by x;
    * ``D_ll(x, yb) = sum_{yb' < yb} A(x, yb')`` (concordant-below
      mass) and ``D_lg`` (discordant-above, the reversed window) —
      windows partitioned by (group, x) over the B-bounded bucket
      axis;
    * ``nc = sum c * D_ll``, ``nd = sum c * D_lg`` — every pair
      counted once at its greater-x cell; equal-x and equal-bucket
      pairs are ties, handled by tau-b's marginal corrections.

    Every stage is grid-wide (<= ``max_grid``, probed and RAISED past
    — same contract as theilsen_trend), never pair-wide: the plan
    survives any row count the buckets can absorb.

    Bias bound (quantization is MONOTONE, so no pair's order ever
    inverts — near pairs can only merge into ties): with ``S = nc -
    nd`` and ``D`` the tau-b denominator, only pairs sharing a bucket
    change status, so ``|S_q - S| <= P_w`` (the within-bucket pair
    count) and ``|tau_q - tau| <= P_w / D_q + |tau| * (D - D_q) / D_q
    <= 2 * P_w / D_q``.  For B equi-width buckets over a
    density-bounded column, ``P_w / C(n,2) = O(1/B)`` — at the default
    B = 256 the bias is under ~1% of the pair mass, and doubling B
    halves it.  ``x_buckets = 0`` (default) leaves x unquantized (use
    for an already-ordinal x); int64 bound is kendall_tau_exact's
    ``C(n,2) < 2^63`` with the same raise_error backstop.

    ``impl`` (r13 optimization): ``'kernel'`` (default) runs the whole
    dominance algebra downstream of the persisted cells contraction in
    ONE grouped Arrow kernel — the per-group dense (x, y-bucket) int64
    matrix (<= ``max_grid`` cells, the probed bound) with two exclusive
    ``cumsum`` passes IS ``A``/``D_ll``/``D_lg``, and the marginal tie
    masses are its row/column sums (bleu/chrf r13.1 precedent: the
    relational form cost 13 exchanges and ~20 broadcast-joined
    grid-sized frames per evaluation, pure plan overhead at any scale
    because everything below the contraction is grid-bounded).
    ``'sql'`` keeps the original densified-grid window formulation —
    retained as the cross-implementation differential; both emit
    bit-identical integers (tested).  Task memory: 8 bytes x
    ``max_grid`` = 8 MB at the default cap, parallel across groups
    (the global form is one grid-bounded task, like the windows'
    per-axis tasks it replaces).

    Reference scope note: like the rest of this module, an extension —
    the reference (bakdata kafka-dead-letter-analyzer) has no
    evaluation-metric surface."""
    if y_buckets < 2 and x_buckets < 2:
        raise ValueError(
            "kendall_tau_quantized: need at least one of"
            " x_buckets/y_buckets >= 2 (else use kendall_tau_exact)"
        )
    if impl not in ("kernel", "sql"):
        raise ValueError(
            f"kendall_tau_quantized: impl={impl!r} must be kernel|sql"
        )
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(x_col).cast("bigint").alias("x"),
        F.col(y_col).cast("bigint").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())

    def _quantize(frame: DataFrame, col: str, b: int) -> DataFrame:
        if b < 2:
            return frame
        mm = frame.groupBy(*groups).agg(
            F.min(col).alias("_lo"), F.max(col).alias("_hi")
        )
        # broadcast-sized per-group span table joined back BEFORE the
        # contraction, so quantization is map-side and the contraction
        # shuffle is already bucket-width
        if groups:
            from kafka_dead_letter_analyzer_spark.operators.common import (
                null_safe_group_join,
            )

            # null-safe: a NULL group key is a real group under groupBy
            joined = null_safe_group_join(frame, mm, groups)
        else:
            joined = frame.crossJoin(F.broadcast(mm))
        # the guard must not form the span itself: _hi - _lo wraps
        # int64 when _lo is very negative and _hi very positive, and a
        # wrapped (possibly negative) span would sail past the
        # comparison.  Wrap is only possible when the signs differ, so
        # arm 1 catches span > int64 without any subtraction that can
        # overflow ({_I64_MAX} + _lo is exact for _lo < 0); once arm 1
        # is false the span fits int64 and arm 2's `_hi - _lo > T-1`
        # phrasing (no +1) is exact.  CASE arms evaluate sequentially,
        # so arm 2's subtraction never runs on a wrapping pair.
        msg = (
            f"kendall_tau_quantized: value span of {col} too wide for"
            f" {b} buckets (span * buckets must fit int64); rescale"
            " the column first"
        )
        raise_b = f"CAST(raise_error('{msg}') AS BIGINT)"
        q = (
            f"CASE WHEN _lo < 0 AND _hi > {_I64_MAX} + _lo THEN {raise_b}"
            f" WHEN _hi - _lo > {_I64_MAX // b - 1} THEN {raise_b}"
            f" ELSE (({col} - _lo) * {b}) DIV (_hi - _lo + 1) END"
        )
        return joined.withColumn(col, F.expr(q)).drop("_lo", "_hi")

    q = _quantize(_quantize(base, "y", int(y_buckets)), "x", int(x_buckets))

    cells = q.groupBy(*groups, "x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # the grid-size probe materializes cells anyway, and FIVE downstream
    # consumers (grid x/y distincts, the dominance windows, both tie
    # masses) re-derive it — without the persist each re-derivation is
    # a full base scan + quantize join (measured 2.5 s at sf0.1, ~6
    # scans); with it, one scan builds the bucket-bounded contraction
    # and everything after is contraction-sized
    from kafka_dead_letter_analyzer_spark import cache_registry

    cells = cells.persist()
    cache_registry.track(cells)
    xs = cells.select(*groups, "x").distinct()
    ys = cells.select(*groups, "y").distinct()
    # grid-size probe WITHOUT materializing grid rows: per-group
    # |xs| * |ys| products (doubles for the compare — exact to 2^53,
    # far past any sane max_grid, and wrap-proof where a bigint
    # product of two huge axis counts is not); doubles as the cache
    # fill for the persisted cells both paths then consume
    xc = xs.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("double").alias("_nx")
    )
    yc = ys.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("double").alias("_ny")
    )
    if groups:
        # null-safe on the group key: a NULL group survives the
        # quantize join (null_safe_group_join) and must survive here
        # too, or its grid — and the whole group — silently vanishes
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        gsz = null_safe_group_join(xc, yc, groups)
    else:
        gsz = xc.crossJoin(F.broadcast(yc))
    probe = gsz.agg(F.max(F.expr("_nx * _ny")).alias("m")).collect()[0][
        "m"
    ]
    if probe is not None and probe > max_grid:
        raise ValueError(
            f"kendall_tau_quantized: a group has a {int(probe)}-point"
            f" (x, y-bucket) grid (> max_grid={max_grid}); quantize x"
            " too (x_buckets) or lower the bucket counts"
        )

    if impl == "kernel":
        stats = _kendall_grid_kernel_stats(cells, groups, int(max_grid))
    else:
        stats = _kendall_grid_sql_stats(cells, xs, ys, groups)
    out = stats.withColumn(
        "n0",
        F.expr(
            f"CASE WHEN n > {_KENDALL_N_MAX} THEN"
            " CAST(raise_error('kendall_tau_quantized: a group exceeds"
            " the C(n,2) < 2^63 exactness bound (n <= 4,294,967,295"
            " rows per group); shard the input and report the"
            " per-shard tau distribution') AS BIGINT)"
            # parity-split C(n,2): n*(n-1) alone wraps for n > ~3.04e9
            # even INSIDE the guarded range, so halve the even factor
            # BEFORE multiplying — intermediates equal the result
            " ELSE CASE WHEN n % 2 = 0 THEN (n DIV 2) * (n - 1)"
            "      ELSE n * ((n - 1) DIV 2) END END"
        ),
    )
    return out.filter(
        (F.col("n0") > F.col("tx_pairs")) & (F.col("n0") > F.col("ty_pairs"))
    ).select(
        *groups,
        "nc",
        "nd",
        "tx_pairs",
        "ty_pairs",
        "n",
        F.expr(
            "CAST(floor((nc - nd) * 1000000.0 /"
            " (sqrt(CAST(n0 - tx_pairs AS DOUBLE))"
            "  * sqrt(CAST(n0 - ty_pairs AS DOUBLE))) + 0.5) AS BIGINT)"
        ).alias("tau_e6"),
    )


def isotonic_calibrate(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    max_buckets: int = 200_000,
) -> DataFrame:
    """Isotonic (PAV) calibration of a classifier score against a
    boolean label — ``(*group_cols, s BIGINT, n BIGINT, pos BIGINT,
    cal_num BIGINT, cal_den BIGINT)``: one row per distinct score,
    where ``cal_num / cal_den`` is the isotonic-regression estimate of
    ``P(label | score)`` — the least-squares non-decreasing fit to the
    per-score positive rates, computed by pool-adjacent-violators
    (Ayer et al. 1955; Robertson, Wright & Dykstra 1988).  The missing
    piece of the scorer-audit family next to :func:`auc_exact` (AUC
    says the score RANKS well; calibration says whether 0.9 MEANS
    ninety percent) and ``x_conformal_threshold``.

    Exactness: the calibrated rate is emitted AS the pooled block's
    integer ``(sum pos, sum n)`` rational — never divided, so the
    surface is BIGINT-exact and deterministic (the PAV fit is the
    unique isotonic least-squares solution; pooling compares rates by
    cross-multiplication, no floats anywhere).  ROWS-ONLY like the KLL
    sketches: the pooling recursion (merge-while-violating over an
    ordered stack) is not SQL-expressible, so there is no DuckDB
    oracle — correctness is differential-tested against an independent
    fixed-point NumPy reference plus the isotonic/mass-preservation
    invariants.

    Scale shape: ONE full-data shuffle builds the (group, score)
    contraction (map-side combined); the PAV stack then runs inside
    ``applyInPandas`` over each group's contraction — O(buckets) time
    and memory per group (each bucket is pushed and popped at most
    once), parallel across groups, bounded by ``max_buckets`` (the
    worker RAISES past it: quantize the score first, the calibration
    of a near-continuous score is per-bucket anyway).  The global form
    is one task over its own contraction — inherently sequential, same
    bound.  Scores cast to bigint (quantize fractional scores to a
    fixed-point grid first, as everywhere in this module)."""
    from pyspark.sql.types import StructType

    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    counts = base.groupBy(*groups, "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
    )
    schema = (
        StructType(list(counts.schema.fields))
        .add("cal_num", "long")
        .add("cal_den", "long")
    )
    cap = int(max_buckets)

    def _pav(pdf):
        if len(pdf) > cap:
            raise ValueError(
                f"isotonic_calibrate: a group has {len(pdf)} distinct"
                f" scores (> max_buckets={cap}); quantize the score to"
                " a coarser fixed-point grid first"
            )
        pdf = pdf.sort_values("s").reset_index(drop=True)
        # PAV stack: blocks of (sum pos, sum n, buckets swallowed);
        # merge while the incoming rate undercuts the stack top
        # (cross-multiplied integer compare — no float rates)
        blocks: list[list[int]] = []
        for pos, n in zip(pdf["pos"], pdf["n"]):
            b = [int(pos), int(n), 1]
            # <= merges EQUAL rates too: a no-op for the fit, but it
            # canonicalizes the emitted rational (2/4 becomes pooled)
            while blocks and b[0] * blocks[-1][1] <= blocks[-1][0] * b[1]:
                t = blocks.pop()
                b = [b[0] + t[0], b[1] + t[1], b[2] + t[2]]
            blocks.append(b)
        cal_num: list[int] = []
        cal_den: list[int] = []
        for bpos, bn, c in blocks:
            cal_num.extend([bpos] * c)
            cal_den.extend([bn] * c)
        out = pdf.copy()
        out["cal_num"] = cal_num
        out["cal_den"] = cal_den
        return out

    return counts.groupBy(*groups).applyInPandas(_pav, schema=schema)


def roc_curve_points(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    max_points: int = 2_000_000,
) -> DataFrame:
    """The full ROC operating table of a score against a boolean label
    — one row per DISTINCT SCORE treated as the decision threshold
    ("predict positive when score >= s"): ``(*group_cols, s, tp, fp,
    fn, tn)``, all BIGINT.  AUC (:func:`auc_exact`) compresses the
    curve to one number; threshold SELECTION — "what do precision and
    recall look like if we gate the corpus at s?" — needs the curve
    itself, and every point is exact integer arithmetic over the same
    per-score contraction AUC uses:

    ``tp(s) = n_pos - cum_pos_lt(s)`` and ``fp(s) = n_neg -
    cum_neg_lt(s)`` — one groupBy(score) contraction (the only
    full-data shuffle, map-side combined), one cumulative window per
    group carrying BOTH class sums, two broadcast-joined (grouped:
    AQE-planned) class totals.  Precision/recall/F-beta are ratios of
    these integers — left to the caller so the surface stays
    division-free and hash-exact.

    The OUTPUT is contraction-sized by construction, so there is no
    two-phase escape hatch here: if the distinct-score domain is too
    big to sort per group, it is also too big to RETURN — quantize the
    score first (the kendall_tau_quantized precedent); ``max_points``
    probes the worst group and RAISES past the cap.  Rows with NULL
    score or label are excluded; groups with an empty class are kept
    (the curve is still defined — one of tp/fp is identically 0)."""
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(score_col).alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    counts = base.groupBy(*groups, "s").agg(
        F.sum(F.when(F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos"),
        F.sum(F.when(F.col("y"), 0).otherwise(1))
        .cast("bigint")
        .alias("neg"),
    )
    probe = (
        counts.groupBy(*groups).count().agg(F.max("count").alias("m"))
    ).collect()[0]["m"]
    if probe is not None and probe > max_points:
        raise ValueError(
            f"roc_curve_points: a group has {probe} distinct scores"
            f" (> max_points={max_points}) — the curve itself would be"
            " that large; quantize the score to a coarser grid first"
        )
    wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
    w_lt = wg.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    w_all = wg.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        counts.withColumn(
            "cum_pos_lt",
            F.coalesce(F.sum("pos").over(w_lt), F.lit(0).cast("bigint")),
        )
        .withColumn(
            "cum_neg_lt",
            F.coalesce(F.sum("neg").over(w_lt), F.lit(0).cast("bigint")),
        )
        .withColumn("n_pos", F.sum("pos").over(w_all))
        .withColumn("n_neg", F.sum("neg").over(w_all))
    )
    return cum.select(
        *groups,
        "s",
        F.expr("n_pos - cum_pos_lt").cast("bigint").alias("tp"),
        F.expr("n_neg - cum_neg_lt").cast("bigint").alias("fp"),
        F.expr("cum_pos_lt").cast("bigint").alias("fn"),
        F.expr("cum_neg_lt").cast("bigint").alias("tn"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    bins: int = 10,
    mode: str = "width",
) -> DataFrame:
    """Reliability-diagram table — the calibration member of the
    scorer-audit family (AUC says "does the score RANK well"; this
    says "does a bin of the score MEAN what it claims"): one row per
    non-empty ``(*group_cols, bin)`` with ``(bin BIGINT, bin_lo
    BIGINT, n BIGINT, n_pos BIGINT, pos_rate_ppm BIGINT)``, where
    ``pos_rate_ppm = floor(n_pos * 1e6 / n)`` (two-step long division,
    BIGINT-exact cross-engine) and ``bin_lo`` is the bin's inclusive
    integer lower score edge.

    ``mode='width'``: equal-width bins over each group's observed
    score span — ``bin = ((s - lo) * bins) DIV span``, ``bin_lo = lo +
    (bin * span) DIV bins``.  Plan: one per-group min/max contraction
    joined back NULL-SAFELY (broadcast when ungrouped, AQE otherwise —
    the kendall_tau_quantized quantize shape, including its WRAP-PROOF
    span guard: the span itself never forms when the sign-split arm
    already proves it exceeds int64/bins), then ONE map-side-combined
    aggregate on (group, bin).

    ``mode='mass'``: equal-mass (quantile) bins — the standard
    reliability-diagram convention when the score is long-tailed.
    Built on the SAME per-score contraction the ROC family uses: a
    per-group cumulative window assigns each DISTINCT score value the
    bin of its first rank, ``bin = (cum_lt * bins) DIV n_group`` —
    deterministic under ties (a tied value lands whole in one bin; a
    row-level ntile would split ties nondeterministically), and
    ``bin_lo`` is the bin's minimum score.  The window sorts only the
    per-group DISTINCT-score contraction (roc_curve_points' shape and
    caveat); n_group is guarded against ``n * bins`` int64 wrap.

    Both modes: output is bins-bounded per group; rows with NULL
    score or label are excluded."""
    if bins < 2:
        raise ValueError(f"calibration_bins: bins must be >= 2, got {bins}")
    if mode not in ("width", "mass"):
        raise ValueError(
            f"calibration_bins: unknown mode {mode!r} ('width' | 'mass')"
        )
    groups = list(group_cols or [])
    b = int(bins)
    base = df.select(
        *[df[g] for g in groups],
        F.col(score_col).cast("bigint").alias("s"),
        F.col(label_col).cast("boolean").alias("y"),
    ).filter(F.col("s").isNotNull() & F.col("y").isNotNull())
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    if mode == "mass":
        counts = base.groupBy(*groups, "s").agg(
            F.count(F.lit(1)).cast("bigint").alias("c"),
            F.sum(F.when(F.col("y"), 1).otherwise(0))
            .cast("bigint")
            .alias("cp"),
        )
        wg = Window.partitionBy(*groups) if groups else Window.partitionBy()
        w_lt = wg.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
        w_all = wg.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        cum = counts.withColumn(
            "cum_lt",
            F.coalesce(F.sum("c").over(w_lt), F.lit(0).cast("bigint")),
        ).withColumn("n_all", F.sum("c").over(w_all))
        msg = (
            f"calibration_bins: a group row count times {b} bins"
            " exceeds int64; shard the input"
        )
        bin_expr = (
            f"CASE WHEN n_all > {_I64_MAX // b} THEN"
            f" CAST(raise_error('{msg}') AS BIGINT)"
            f" ELSE (cum_lt * {b}) DIV n_all END"
        )
        binned = cum.withColumn("bin", F.expr(bin_expr))
        agg = binned.groupBy(*groups, "bin").agg(
            F.sum("c").cast("bigint").alias("n"),
            F.sum("cp").cast("bigint").alias("n_pos"),
            F.min("s").cast("bigint").alias("bin_lo"),
        )
        return agg.select(
            *groups,
            F.col("bin").cast("bigint").alias("bin"),
            "bin_lo",
            "n",
            "n_pos",
            F.expr(ppm2("n_pos", "n")).cast("bigint").alias("pos_rate_ppm"),
        )

    mm = base.groupBy(*groups).agg(
        F.min("s").alias("_lo"), F.max("s").alias("_hi")
    )
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        joined = null_safe_group_join(base, mm, groups)
    else:
        joined = base.crossJoin(F.broadcast(mm))
    msg = (
        f"calibration_bins: score span too wide for {b} bins"
        " (span * bins must fit int64); rescale the score first"
    )
    raise_b = f"CAST(raise_error('{msg}') AS BIGINT)"
    bin_expr = (
        f"CASE WHEN _lo < 0 AND _hi > {_I64_MAX} + _lo THEN {raise_b}"
        f" WHEN _hi - _lo > {_I64_MAX // b - 1} THEN {raise_b}"
        f" ELSE ((s - _lo) * {b}) DIV (_hi - _lo + 1) END"
    )
    binned = joined.withColumn("bin", F.expr(bin_expr))
    agg = binned.groupBy(*groups, "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.min("_lo").alias("_lo"),
        F.min("_hi").alias("_hi"),
    )
    return agg.select(
        *groups,
        F.col("bin").cast("bigint").alias("bin"),
        F.expr(f"_lo + (bin * (_hi - _lo + 1)) DIV {b}")
        .cast("bigint")
        .alias("bin_lo"),
        "n",
        "n_pos",
        F.expr(ppm2("n_pos", "n")).cast("bigint").alias("pos_rate_ppm"),
    )


# guard bound for cohens_kappa: pe's two-step ppm needs S*1000 <= 2^63
# with S <= n^2, i.e. n <= sqrt(2^63/2000) ~ 6.79e7 rows per group
_KAPPA_N_MAX = 67_900_000


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Cohen's kappa sufficient statistics — chance-corrected agreement
    between two categorical labelings of the same rows (two quality
    classifiers before one replaces the other in the gate, a heuristic
    lang-id against a reference column, two dedup strategies' flags):
    ``(*group_cols, n BIGINT, agree BIGINT, po_ppm BIGINT, pe_ppm
    BIGINT)`` with ``po = agree/n`` (observed agreement), ``pe =
    sum_k(rowtot_k * coltot_k)/n^2`` (chance agreement from the
    marginals), both exact two-step-division ppm;
    ``kappa = (po - pe) / (1 - pe)`` is left to the caller — it can be
    negative, and a truncating DIV and a flooring ``//`` disagree on
    negatives, so the declared surface stays non-negative integers
    (the repo's cross-engine rule).

    Plan shape: ONE full-data contraction shuffle on (groups, a, b) —
    map-side combined, output bounded by the label-pair domain — then
    contraction-sized marginal aggregations joined back null-safely on
    the category; nothing downstream scales with the row count.
    Exactness bound: pe's ppm needs ``n <= ~6.79e7`` rows per group
    (sum(r_k*c_k)*1000 <= 2^63); a division-form raise_error CASE on
    the exact n fires past it — even if the marginal-product sum
    already wrapped — with a sharding hint.  Rows with a NULL label on
    either side are excluded; NULL GROUP keys are real groups."""
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(rater_a).cast("string").alias("a"),
        F.col(rater_b).cast("string").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    cells = base.groupBy(*groups, "a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from kafka_dead_letter_analyzer_spark import cache_registry

    # cells feeds totals, agreement, and both marginals — one scan
    cells = cells.persist()
    cache_registry.track(cells)
    tot = cells.groupBy(*groups).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    rows_m = cells.groupBy(*groups, "a").agg(
        F.sum("c").cast("bigint").alias("r")
    ).withColumnRenamed("a", "cat")
    cols_m = cells.groupBy(*groups, "b").agg(
        F.sum("c").cast("bigint").alias("cc")
    ).withColumnRenamed("b", "cat")
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        marg = null_safe_group_join(rows_m, cols_m, groups, plain_keys=["cat"])
    else:
        marg = rows_m.join(cols_m, ["cat"])
    s = marg.groupBy(*groups).agg(
        F.sum(F.expr("r * cc")).cast("bigint").alias("s_rc")
    )
    # LEFT join + coalesce (round-9 review): when the two raters share
    # NO category in a group, the marginal join is empty and pe is
    # mathematically 0 — an inner join here silently dropped exactly
    # the total-disagreement group a kappa audit exists to surface
    # (ungrouped, the global agg yields one NULL s_rc row instead).
    # crossJoin invariant (r9 VERDICT): `s` AND `tot` are UNGROUPED
    # aggregates here, so each yields EXACTLY one row always — global
    # aggs never return zero rows, even on empty input — making the
    # broadcast cross join a 1x1 product, never a fan-out.  On EMPTY
    # input that one row is the SQL sentinel (n = sum() over nothing
    # = NULL); the n-isNotNull filter below removes it so the
    # operator's contract is empty-in -> empty-out like the grouped
    # path, instead of one all-NULL row.  Pinned by
    # test_kappa_ungrouped_crossjoin_invariant.
    if groups:
        joined = null_safe_group_join(tot, s, groups, how="left")
    else:
        joined = tot.crossJoin(F.broadcast(s)).filter(
            F.col("n").isNotNull()
        )
    joined = joined.withColumn(
        "s_rc", F.coalesce("s_rc", F.lit(0).cast("bigint"))
    )
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    guard = f"n > {_KAPPA_N_MAX}"
    return joined.select(
        *groups,
        "n",
        "agree",
        F.expr(ppm2("agree", "n")).cast("bigint").alias("po_ppm"),
        F.expr(
            f"CASE WHEN {guard} THEN CAST(raise_error('cohens_kappa:"
            " a group exceeds the exact-ppm bound (n <= ~6.79e7 rows"
            " per group: sum of marginal products must fit int64);"
            " shard the input and report the per-shard kappa"
            " distribution') AS BIGINT)"
            f" ELSE {ppm2('s_rc', '(n * n)')} END"
        ).cast("bigint").alias("pe_ppm"),
    )


_AC1_N_MAX = 48_000_000


def gwet_ac1(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Gwet's AC1 sufficient statistics (Gwet 2008, "Computing
    inter-rater reliability and its variance in the presence of high
    agreement") — the chance-corrected agreement that stays STABLE
    under skewed label prevalence, where Cohen's kappa collapses (the
    'kappa paradox': two raters agreeing 99% on a 99%-one-class task
    get near-zero kappa; AC1 reports the high agreement an auditor
    expects).  Output per group: ``(*group_cols, n BIGINT, agree
    BIGINT, q_cats BIGINT, po_ppm BIGINT, pe_ppm BIGINT)`` with
    ``pe = sum_k pi_k (1 - pi_k) / (q - 1)``, ``pi_k = (a_k + b_k) /
    (2n)`` over the UNION of both raters' categories — computed as
    the exact integer ``sum_k m_k (2n - m_k) / (4 n^2 (q - 1))`` in
    two-step floor ppm; ``AC1 = (po - pe)/(1 - pe)`` stays
    caller-side (can be negative — the repo's non-negative declared
    surface rule, same as kappa).  ``pe_ppm`` is NULL when the group
    has a single category (q < 2: the formula divides by zero and
    agreement is degenerate).

    Plan shape: identical to :func:`cohens_kappa` — ONE (groups, a,
    b) contraction, marginal aggregations FULL-OUTER-joined on the
    category (unlike kappa's product, AC1's ``m_k`` needs categories
    present on only ONE side).  Exactness bound: ``4 n^2 (q - 1)``
    must fit the ppm2 ``nt * 1000`` ceiling — a raise_error CASE
    fires past ``n > 4.8e7`` (q = 2) or the joint n/q bound, with a
    sharding hint.  NULL labels excluded; NULL group keys are real
    groups."""
    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(rater_a).cast("string").alias("a"),
        F.col(rater_b).cast("string").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    cells = base.groupBy(*groups, "a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    from kafka_dead_letter_analyzer_spark import cache_registry

    cells = cells.persist()
    cache_registry.track(cells)
    tot = cells.groupBy(*groups).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("agree"),
    )
    rows_m = cells.groupBy(*groups, "a").agg(
        F.sum("c").cast("bigint").alias("r")
    ).withColumnRenamed("a", "cat")
    cols_m = cells.groupBy(*groups, "b").agg(
        F.sum("c").cast("bigint").alias("cc")
    ).withColumnRenamed("b", "cat")
    # FULL outer on the category: a label used by only one rater still
    # contributes m_k = r_k + 0 to pi_k (kappa's r*c product made the
    # inner join correct there; AC1's SUM does not)
    join_keys = groups + ["cat"]
    if groups:
        cond = [rows_m[k].eqNullSafe(cols_m[k]) for k in groups] + [
            rows_m["cat"] == cols_m["cat"]
        ]
        marg = rows_m.alias("L").join(
            cols_m.alias("R"), cond, "full_outer"
        ).select(
            *[
                F.coalesce(F.col(f"L.{g}"), F.col(f"R.{g}")).alias(g)
                for g in groups
            ],
            F.coalesce(F.col("L.cat"), F.col("R.cat")).alias("cat"),
            (
                F.coalesce(F.col("L.r"), F.lit(0))
                + F.coalesce(F.col("R.cc"), F.lit(0))
            ).cast("bigint").alias("m"),
        )
    else:
        marg = rows_m.join(cols_m, join_keys, "full_outer").select(
            "cat",
            (
                F.coalesce(F.col("r"), F.lit(0))
                + F.coalesce(F.col("cc"), F.lit(0))
            ).cast("bigint").alias("m"),
        )
    # s_m needs n; n is per group — join tot's n onto the marginals
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        mn = null_safe_group_join(
            marg, tot.select(*groups, "n"), groups
        )
    else:
        mn = marg.crossJoin(
            F.broadcast(tot.select("n").filter(F.col("n").isNotNull()))
        )
    s = mn.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("q_cats"),
        F.sum(F.expr("m * (2 * n - m)")).cast("bigint").alias("s_m"),
    )
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join as _nsgj,
        )

        joined = _nsgj(tot, s, groups, how="left")
    else:
        joined = tot.crossJoin(F.broadcast(s)).filter(
            F.col("n").isNotNull()
        )
    joined = joined.withColumn(
        "q_cats", F.coalesce("q_cats", F.lit(0).cast("bigint"))
    ).withColumn("s_m", F.coalesce("s_m", F.lit(0).cast("bigint")))
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    # nt * 1000 <= 2^63: 4n^2(q-1) <= 9.2e15; n-only bound at q = 2
    guard = (
        f"n > {_AC1_N_MAX} OR (q_cats > 1 AND"
        " (q_cats - 1) > 9200000000000000 DIV (4 * n * n))"
    )
    return joined.select(
        *groups,
        "n",
        "agree",
        "q_cats",
        F.expr(ppm2("agree", "n")).cast("bigint").alias("po_ppm"),
        F.expr(
            "CASE WHEN q_cats < 2 THEN CAST(NULL AS BIGINT)"
            f" WHEN {guard} THEN CAST(raise_error('gwet_ac1: a group"
            " exceeds the exact-ppm bound (4*n^2*(q-1) must fit the"
            " int64 ppm ceiling; n <= ~4.8e7 rows per group at q=2);"
            " shard the input and report the per-shard AC1"
            " distribution') AS BIGINT)"
            f" ELSE {ppm2('s_m', '(4 * n * n * (q_cats - 1))')} END"
        ).cast("bigint").alias("pe_ppm"),
    )


def fleiss_kappa(
    df: DataFrame,
    item_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    n_raters: int | None = None,
) -> DataFrame:
    """Fleiss' kappa sufficient statistics — chance-corrected agreement
    among ANY number of raters (Fleiss 1971), the >=2-annotator
    generalization :func:`cohens_kappa` can't express: a labeling
    round with 3+ annotators, an ensemble of quality classifiers, or
    N dedup strategies voting per document.  Input is LONG format —
    one row per RATING ``(item_col, label_col)`` — because Fleiss'
    statistic is rater-anonymous by construction (only the per-item
    category counts n_ij matter, not which rater said what; that is
    its defining difference from averaged pairwise Cohen's).

    Emits ``(*group_cols, n_items BIGINT, n_items_dropped BIGINT,
    n_raters BIGINT, po_ppm BIGINT, pe_ppm BIGINT)`` where, over the
    CONFORMING items (exactly ``n_raters`` ratings each):
    ``po = (sum_ij n_ij^2 - N*n) / (N*n*(n-1))`` (mean per-item
    observed agreement) and ``pe = sum_j c_j^2 / (N*n)^2`` (squared
    category shares), both exact two-step-division ppm;
    ``kappa = (po - pe)/(1 - pe)`` stays caller-side (it can be
    negative — the repo's non-negative declared-surface rule, same as
    cohens_kappa).  With ``n_raters=None`` the expected count is
    inferred PER GROUP as ``max(n_i)``; items with fewer ratings (an
    annotator skipped them) are DROPPED from the statistic and
    surfaced in ``n_items_dropped`` — attrition is visible, never
    silent.  An explicit ``n_raters`` drops items with MORE ratings
    too (accidental double-rating).  Groups with ZERO conforming
    items vanish from the output (there is no n to divide by);
    NULL-item or NULL-label rows are excluded; NULL GROUP keys are
    real groups.

    Plan shape: ONE full-data contraction shuffle on (groups, item,
    label) — map-side combined, bounded by items x categories — then
    item-level and group-level contractions of it; nothing downstream
    rescans the ratings.  Exactness bounds (division-form runtime
    guards, hash-neutral): pe needs ``N*n <= ~6.79e7`` conforming
    ratings per group ((N*n)^2 * 1000 <= 2^63); inferred ``n < 2``
    raises (agreement over one rating per item is undefined —
    po's denominator is N*n*(n-1))."""
    if n_raters is not None and n_raters < 2:
        raise ValueError(
            f"fleiss_kappa: n_raters={n_raters} must be >= 2 (po"
            " divides by n*(n-1))"
        )
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators.common import (
        null_safe_group_join,
        ppm2,
    )

    groups = list(group_cols or [])
    base = df.select(
        *[df[g] for g in groups],
        F.col(item_col).alias("_it"),
        F.col(label_col).cast("string").alias("_lab"),
    ).filter(F.col("_it").isNotNull() & F.col("_lab").isNotNull())
    cells = base.groupBy(*groups, "_it", "_lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # cells feeds the item counts AND the conforming category totals
    cells = cells.persist()
    cache_registry.track(cells)
    item = cells.groupBy(*groups, "_it").agg(
        F.sum("c").cast("bigint").alias("ni"),
        F.sum(F.expr("c * c")).cast("bigint").alias("ssq"),
    )
    if n_raters is None:
        nexp = item.groupBy(*groups).agg(
            F.max("ni").cast("bigint").alias("n_r")
        )
        if groups:
            item = null_safe_group_join(item, nexp, groups)
        else:
            # same 1-row broadcast cross-join invariant as
            # cohens_kappa: nexp is an ungrouped aggregate — exactly
            # one row when item has rows; empty item => empty product
            item = item.crossJoin(F.broadcast(nexp))
    else:
        item = item.withColumn(
            "n_r", F.lit(int(n_raters)).cast("bigint")
        )
    conform = item.filter(F.col("ni") == F.col("n_r"))
    gstat = conform.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("ssq").cast("bigint").alias("sum_sq"),
        F.max("n_r").cast("bigint").alias("n_raters"),
    )
    alls = item.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items_all")
    )
    # category totals over CONFORMING items only: prune cells by the
    # conforming item set (null-safe on groups, plain on the item id
    # — non-null by construction), then contract to category sums
    conf_keys = conform.select(*groups, "_it")
    kept = null_safe_group_join(
        cells, conf_keys, groups, plain_keys=["_it"]
    ) if groups else cells.join(conf_keys, ["_it"])
    cat = kept.groupBy(*groups, "_lab").agg(
        F.sum("c").cast("bigint").alias("cj")
    )
    scc = cat.groupBy(*groups).agg(
        F.sum(F.expr("cj * cj")).cast("bigint").alias("s_cc")
    )
    if groups:
        joined = null_safe_group_join(gstat, alls, groups)
        joined = null_safe_group_join(joined, scc, groups)
    else:
        joined = gstat.crossJoin(F.broadcast(alls)).crossJoin(
            F.broadcast(scc)
        )
    # division-form guards (never overflow themselves); N*n > M is
    # equivalent to N > M DIV n for positive integer n
    ratings = "(n_items * n_raters)"
    overflow = f"n_items > {_KAPPA_N_MAX} DIV n_raters"
    degenerate = "n_raters < 2"
    po_num = f"(sum_sq - {ratings})"
    po_den = f"({ratings} * (n_raters - 1))"
    pe_den = f"({ratings} * {ratings})"
    err = (
        "CASE WHEN {d} THEN CAST(raise_error('fleiss_kappa: a group"
        " inferred n_raters < 2 — po divides by n*(n-1); filter"
        " single-rating items or pass n_raters explicitly') AS BIGINT)"
        " WHEN {o} THEN CAST(raise_error('fleiss_kappa: a group"
        " exceeds the exact-ppm bound (n_items * n_raters <= ~6.79e7"
        " conforming ratings per group: (N*n)^2 * 1000 must fit"
        " int64); shard the items and report the per-shard kappa"
        " distribution') AS BIGINT) ELSE {e} END"
    )
    # drop the ungrouped empty-input sentinel (global aggs always
    # yield one row; with no conforming items n_items counts 0):
    # empty-in -> empty-out, matching "zero-conforming groups vanish"
    joined = joined.filter(F.col("n_items") > 0)
    return joined.select(
        *groups,
        "n_items",
        (F.col("n_items_all") - F.col("n_items"))
        .cast("bigint")
        .alias("n_items_dropped"),
        "n_raters",
        F.expr(
            err.format(d=degenerate, o=overflow, e=ppm2(po_num, po_den))
        ).cast("bigint").alias("po_ppm"),
        F.expr(
            err.format(d=degenerate, o=overflow, e=ppm2("s_cc", pe_den))
        ).cast("bigint").alias("pe_ppm"),
    )


# LCM(1..11): the fixed common denominator that makes Krippendorff's
# per-item 1/(n_u - 1) weights integer for any item with <= 12 ratings.
_KRIPP_LCM = 27_720
_KRIPP_MAX_RATINGS_PER_ITEM = 12


def krippendorff_alpha(
    df: DataFrame,
    item_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
    metric: str = "nominal",
) -> DataFrame:
    """Krippendorff's alpha sufficient statistics — chance-corrected
    agreement that, unlike :func:`fleiss_kappa`, KEEPS items with
    missing ratings: an annotation panel where raters abstain leaves
    items with 2 ratings next to items with 3, and Krippendorff
    (1970/2004) weights each item's disagreeing pairs by
    ``1/(n_u - 1)`` instead of dropping it.  Input is LONG format —
    one row per rating ``(item_col, label_col)`` — and, like Fleiss,
    the statistic is rater-anonymous.  ``metric='nominal'`` treats
    labels as categories (any-disagreement distance);
    ``metric='interval'`` treats them as INTEGER magnitudes with
    squared-difference distance ``(x - y)^2`` — the missing-data
    counterpart of :func:`cohens_kappa_weighted`'s quadratic weights
    (integral dtype required, same silent-cast rationale).

    Emits ``(*group_cols, n_ratings BIGINT, n_items BIGINT,
    n_items_dropped BIGINT, do_ppm BIGINT, de_ppm BIGINT)`` over the
    PAIRABLE items (>= 2 ratings; singletons contribute no pairs and
    are counted in ``n_items_dropped``):

    - observed disagreement ``Do = (1/n) * sum_u D_u / (n_u - 1)``
      over pairable items, where nominal ``D_u = n_u^2 - sum_c
      n_uc^2`` (ordered disagreeing pairs) and interval ``D_u =
      sum over ordered pairs (x - y)^2 = 2*(n_u*S2_u - S1_u^2)``
      (the pair-sum identity — no per-item pair join needed);
    - expected disagreement from the pooled pairable ratings:
      nominal ``De = (n^2 - sum_c n_c^2) / (n*(n-1))``, interval
      ``De = 2*(n*S2 - S1^2) / (n*(n-1))``;
    - ``alpha = 1 - Do/De`` stays caller-side (it can be negative —
      the repo's non-negative declared-surface rule, same as both
      kappas).  ``De = 0`` (a unanimous group) makes alpha undefined;
      the caller sees ``do_ppm = de_ppm = 0`` and decides.

    EXACTNESS: the per-item ``1/(n_u - 1)`` weights are made integer
    by the fixed common denominator ``L = lcm(1..11) = 27720``:
    ``do_num = sum_u D_u * (L div (n_u - 1))`` is exact for any item
    with ``n_u <= 12`` ratings, and ``do_ppm = ppm2(do_num, L * n)``.
    A division-form runtime guard raises past 12 ratings per item
    (annotation panels are small; a 13-rater panel should use
    :func:`fleiss_kappa` on the conforming subset or shard raters).
    Nominal needs ``n <= ~6.79e7`` pairable ratings per group (the
    kappas' int64 ppm bound); interval additionally bounds the label
    magnitude M = max|label|: ``n * M <= ~6.7e7`` (De's ``2*n^2*M^2 *
    1000`` must fit int64) and ``n * M^2 <= ~8.3e10`` (Do's
    LCM-inflated sum) — both division-form guarded against the exact
    per-group n and M with a rescale/shard hint.

    Plan shape: ONE full-data contraction shuffle on (groups, item,
    label) — map-side combined, bounded by items x categories — then
    item-level and group-level contractions of it; the interval
    metric needs NO pooled-category join at all (its pooled De terms
    are sums of the item sums).  Rows with a NULL item or label are
    excluded (an abstention IS a missing rating — the case this
    operator exists for); NULL GROUP keys are real groups; groups
    with zero pairable items vanish (empty-in -> empty-out, pinned
    like the kappas' ungrouped sentinel filter)."""
    if metric not in ("nominal", "interval"):
        raise ValueError(
            f"krippendorff_alpha: metric={metric!r} must be 'nominal'"
            " or 'interval'"
        )
    if metric == "interval":
        dt = dict(df.dtypes).get(label_col)
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"krippendorff_alpha: column {label_col!r} has type"
                f" {dt!r}; interval labels must be integral (cast"
                " explicitly — a silent cast would hide unparseable"
                " labels as excluded NULLs)"
            )
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators.common import (
        null_safe_group_join,
        ppm2,
    )

    groups = list(group_cols or [])
    lab = (
        F.col(label_col).cast("string")
        if metric == "nominal"
        else F.col(label_col).cast("bigint")
    )
    base = df.select(
        *[df[g] for g in groups],
        F.col(item_col).alias("_it"),
        lab.alias("_lab"),
    ).filter(F.col("_it").isNotNull() & F.col("_lab").isNotNull())
    cells = base.groupBy(*groups, "_it", "_lab").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # cells feeds the item stats AND (nominal) the pooled category
    # totals
    cells = cells.persist()
    cache_registry.track(cells)
    if metric == "nominal":
        item = cells.groupBy(*groups, "_it").agg(
            F.sum("c").cast("bigint").alias("ni"),
            F.sum(F.expr("c * c")).cast("bigint").alias("ssq"),
        )
        du = f"(ni * ni - ssq) * ({_KRIPP_LCM} DIV (ni - 1))"
        extra_g = []
    else:
        item = cells.groupBy(*groups, "_it").agg(
            F.sum("c").cast("bigint").alias("ni"),
            F.sum(F.expr("c * _lab")).cast("bigint").alias("s1"),
            F.sum(F.expr("c * _lab * _lab")).cast("bigint").alias("s2"),
            F.max(F.expr("abs(_lab)")).cast("bigint").alias("ab"),
        )
        du = (
            f"2 * (ni * s2 - s1 * s1) * ({_KRIPP_LCM} DIV (ni - 1))"
        )
        extra_g = [
            F.max("ab").cast("bigint").alias("max_abs"),
            F.sum("s1").cast("bigint").alias("s1_all"),
            F.sum("s2").cast("bigint").alias("s2_all"),
        ]
    pair = item.filter(F.col("ni") >= 2)
    # D_u * (L div (n_u - 1)) is exact iff (n_u - 1) divides L, i.e.
    # n_u <= 12; the max_nu guard below raises before an inexact sum
    # can escape (same fire-at-emit pattern as fleiss' wrap guard)
    gstat = pair.groupBy(*groups).agg(
        F.sum("ni").cast("bigint").alias("n_ratings"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.max("ni").cast("bigint").alias("max_nu"),
        F.sum(F.expr(du)).cast("bigint").alias("do_num"),
        *extra_g,
    )
    alls = item.groupBy(*groups).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items_all")
    )
    if groups:
        joined = null_safe_group_join(gstat, alls, groups)
    else:
        joined = gstat.crossJoin(F.broadcast(alls))
    if metric == "nominal":
        # pooled category totals over PAIRABLE items only
        pair_keys = pair.select(*groups, "_it")
        kept = null_safe_group_join(
            cells, pair_keys, groups, plain_keys=["_it"]
        ) if groups else cells.join(pair_keys, ["_it"])
        cat = kept.groupBy(*groups, "_lab").agg(
            F.sum("c").cast("bigint").alias("cj")
        )
        scc = cat.groupBy(*groups).agg(
            F.sum(F.expr("cj * cj")).cast("bigint").alias("s_cc")
        )
        if groups:
            joined = null_safe_group_join(joined, scc, groups)
        else:
            joined = joined.crossJoin(F.broadcast(scc))
    # ungrouped empty-input sentinel: gstat's global agg yields one
    # row with n_items = 0 on empty/unpairable input; drop it so
    # empty-in -> empty-out matches the grouped path
    joined = joined.filter(F.col("n_items") > 0)
    too_wide = f"max_nu > {_KRIPP_MAX_RATINGS_PER_ITEM}"
    if metric == "nominal":
        too_big = f"n_ratings > {_KAPPA_N_MAX}"
        big_msg = (
            "a group exceeds the exact-ppm bound (<= ~6.79e7 pairable"
            " ratings per group: n^2 * 1000 must fit int64); shard the"
            " items and report the per-shard alpha distribution"
        )
        de_num = "(n_ratings * n_ratings - s_cc)"
    else:
        # De needs 2*n^2*M^2*1000 <= 2^63 (n*M <= ~6.78e7); Do's
        # LCM-inflated sum needs ~110880*n*M^2*1000 <= 2^63
        # (n*M^2 <= ~8.3e10) — both division-form on exact n and M
        too_big = (
            "(max_abs > 0 AND (max_abs > 67800000 DIV n_ratings"
            " OR max_abs * max_abs > 83000000000 DIV n_ratings))"
            f" OR n_ratings > {_KAPPA_N_MAX}"
        )
        big_msg = (
            "a group exceeds the interval exact-ppm bounds"
            " (n * max|label| <= ~6.7e7 and n * max|label|^2 <="
            " ~8.3e10 per group); rescale the label domain or shard"
            " the items"
        )
        de_num = (
            "(2 * (n_ratings * s2_all - s1_all * s1_all))"
        )
    err = (
        "CASE WHEN {w} THEN CAST(raise_error('krippendorff_alpha: an"
        " item has > 12 ratings — the exact 1/(n_u-1) weighting uses"
        " the fixed denominator lcm(1..11); cap ratings per item or"
        " use fleiss_kappa on a conforming subset') AS BIGINT)"
        " WHEN {b} THEN CAST(raise_error('krippendorff_alpha: "
        + big_msg
        + "') AS BIGINT) ELSE {e} END"
    )
    do_den = f"({_KRIPP_LCM} * n_ratings)"
    de_den = "(n_ratings * (n_ratings - 1))"
    return joined.select(
        *groups,
        "n_ratings",
        "n_items",
        (F.col("n_items_all") - F.col("n_items"))
        .cast("bigint")
        .alias("n_items_dropped"),
        F.expr(
            err.format(w=too_wide, b=too_big, e=ppm2("do_num", do_den))
        ).cast("bigint").alias("do_ppm"),
        F.expr(
            err.format(w=too_wide, b=too_big, e=ppm2(de_num, de_den))
        ).cast("bigint").alias("de_ppm"),
    )


def cohens_kappa_weighted(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
    group_cols: list[str] | None = None,
    weights: str = "quadratic",
) -> DataFrame:
    """Weighted Cohen's kappa sufficient statistics — chance-corrected
    agreement between two ORDINAL labelings where disagreeing by one
    grade is better than disagreeing by four (two 0-4 quality scorers
    before one replaces the other in the gate, severity triage levels,
    star ratings).  Cohen (1968); ``weights='quadratic'`` penalizes
    ``(a-b)^2`` (the ICC-equivalent default), ``'linear'`` penalizes
    ``|a-b|``.  Both weights are INTEGER on integer ordinals, so the
    whole statistic stays int64-exact:

    ``kappa_w = 1 - (n * swo) / swe`` with ``swo = sum_ab w(a,b) *
    O_ab`` (observed weighted disagreement) and ``swe = sum_ab w(a,b)
    * r_a * c_b`` (expected from the marginals).  Emits
    ``(*group_cols, n BIGINT, swo BIGINT, ratio_ppm BIGINT)`` where
    ``ratio_ppm = ppm2(n * swo, swe)`` is the exact ppm of
    ``Do_w/De_w`` — it EXCEEDS 1e6 exactly when kappa_w is negative,
    and ``kappa_w = 1 - ratio_ppm/1e6`` caller-side (the declared
    surface stays non-negative integers, the repo's cross-engine
    rule).  ``swe = 0`` (both marginals unanimous on one category —
    zero-entropy raters, agreement undefined) emits NULL ratio_ppm
    rather than dividing by zero; the zero-information case is the
    caller's policy call, not an error.

    Both raters must already be INTEGRAL columns — a silent
    string-to-int cast would turn unparseable labels into excluded
    NULLs, hiding data problems the audit exists to find; non-integral
    dtypes raise at construction.

    Plan shape: identical to :func:`cohens_kappa` — ONE full-data
    contraction shuffle on (groups, a, b), then contraction-sized
    marginal products (the weighted cross term needs the r_a x c_b
    grid, bounded by the label-domain square, never the row count).
    Exactness bounds (division-form guards per group): ``n <= ~6.79e7``
    rows (the same cap as the unweighted kappa — it bounds ppm2's
    re-multiplied first quotient, since the ratio is <= n because
    ``swe >= swo`` always), ``n * swo * 1000 <= 2^63``, and
    ``swe * 1000 <= 2^63``.  NULL labels on either side are excluded;
    NULL GROUP keys are real groups."""
    if weights not in ("quadratic", "linear"):
        raise ValueError(
            f"cohens_kappa_weighted: weights={weights!r} must be"
            " 'quadratic' or 'linear'"
        )
    integral = ("tinyint", "smallint", "int", "bigint")
    for c in (rater_a, rater_b):
        dt = dict(df.dtypes).get(c)
        if dt not in integral:
            raise ValueError(
                f"cohens_kappa_weighted: column {c!r} has type {dt!r};"
                " ordinal raters must be integral (cast explicitly —"
                " a silent cast would hide unparseable labels as"
                " excluded NULLs)"
            )
    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators.common import (
        null_safe_group_join,
        ppm2,
    )

    groups = list(group_cols or [])
    w = (
        "(a - b) * (a - b)"
        if weights == "quadratic"
        else "abs(a - b)"
    )
    base = df.select(
        *[df[g] for g in groups],
        F.col(rater_a).cast("bigint").alias("a"),
        F.col(rater_b).cast("bigint").alias("b"),
    ).filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    cells = base.groupBy(*groups, "a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    # cells feeds totals, the weighted observed sum, and both
    # marginals — one scan
    cells = cells.persist()
    cache_registry.track(cells)
    tot = cells.groupBy(*groups).agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.expr(f"({w}) * c")).cast("bigint").alias("swo"),
    )
    rows_m = cells.groupBy(*groups, "a").agg(
        F.sum("c").cast("bigint").alias("r")
    )
    cols_m = cells.groupBy(*groups, "b").agg(
        F.sum("c").cast("bigint").alias("cc")
    )
    # the weighted expected term needs the FULL r_a x c_b grid (w is
    # nonzero off-diagonal), not the diagonal join plain kappa uses:
    # a per-group cross of two label-domain-sized contractions
    if groups:
        grid = null_safe_group_join(rows_m, cols_m, groups)
    else:
        grid = rows_m.crossJoin(F.broadcast(cols_m))
    s = grid.groupBy(*groups).agg(
        F.sum(F.expr(f"({w}) * r * cc")).cast("bigint").alias("swe")
    )
    if groups:
        joined = null_safe_group_join(tot, s, groups, how="left")
    else:
        # same 1-row invariant as cohens_kappa: both are ungrouped
        # aggregates (exactly one row each; the empty-input sentinel
        # row has NULL n and is filtered)
        joined = tot.crossJoin(F.broadcast(s)).filter(
            F.col("n").isNotNull()
        )
    joined = joined.withColumn(
        "swe", F.coalesce("swe", F.lit(0).cast("bigint"))
    )
    # three division-form bounds: num*1000 = n*swo*1000 fits int64;
    # nt*1000 = swe*1000 fits; and ppm2's first quotient re-multiplied
    # (ratio is <= n since swe >= swo whenever every occupied cell has
    # r_a, c_b >= its own count — always true — so d1*1000 <= n*1e6,
    # bounded by the same n <= ~6.79e7 cap the unweighted kappa uses)
    maxd = 9_223_372_036_854_775_807 // 1000
    guard = (
        f"n > {_KAPPA_N_MAX} OR (swo > 0 AND n > {maxd} DIV swo)"
        f" OR swe > {maxd}"
    )
    return joined.select(
        *groups,
        "n",
        "swo",
        F.expr(
            f"CASE WHEN {guard} THEN"
            " CAST(raise_error('cohens_kappa_weighted: a group"
            " exceeds the exact-ppm bound (n * swo * 1000 and"
            " swe * 1000 must fit int64); shard the input and report"
            " the per-shard kappa distribution') AS BIGINT)"
            " WHEN swe = 0 THEN CAST(NULL AS BIGINT)"
            f" ELSE {ppm2('(n * swo)', 'swe')} END"
        ).cast("bigint").alias("ratio_ppm"),
    )
