"""One-pass data profiling: per-column null and distinct counts.

The data-quality audit every ingest pipeline runs before trusting a new
drop: which columns are sparse, which are near-constant, which exploded
in cardinality. The whole profile is ONE aggregation over ONE scan —
Catalyst plans the multiple count(DISTINCT col) aggregates with a single
Expand (one projection per distinct group), partial-aggregates each
map-side, and shuffles only the combined partials. Profiling 100 TB
costs one pass, not one pass per column.

The wide single-row aggregate is then unpivoted JVM-side (stack) into
the long (column, metric) shape dashboards join against.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Per-column profile: rows (column, n_nulls, n_distinct).

    n_nulls = count(*) - count(col); n_distinct is EXACT (the audit
    use-case wants exact answers for low-cardinality dimension checks;
    swap in approx_count_distinct for billion-cardinality id columns
    where a 2% sketch is acceptable and one Expand branch matters).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args: list = []
    for c in cols:
        stack_args += [
            F.lit(c),
            (F.col("_total") - F.col(f"_nn_{c}")).cast("bigint"),
            F.col(f"_nd_{c}").cast("bigint"),
        ]
    return wide.select(
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "column", "n_nulls", "n_distinct"
        )
    )


def key_skew_profile(df: DataFrame, key: str) -> DataFrame:
    """Join-key skew diagnostics: ONE row summarizing the per-key row-count
    distribution of ``key`` — the audit a pipeline runs BEFORE shuffling
    100 TB on that key (decides: plain hash join vs salting vs AQE skew
    hints).

    Emitted columns (all BIGINT, integer-exact cross-engine):
      distinct_keys, total_rows, max_cnt, p50_cnt / p90_cnt / p99_cnt
      (exact nearest-rank percentiles of the per-key count), and
      skew_ratio_ppm = max_cnt / mean_cnt in parts-per-million
      (= max_cnt * distinct_keys * 1e6 div total_rows).

    Scale shape — THREE nested aggregations, each a reduction:
      1. count per key: the only full-data shuffle (map-side combined);
      2. histogram of counts (count-of-counts): |distinct count values|
         rows — tiny even when |keys| is 1e9, so the percentile step
         never sorts the per-key table;
      3. nearest-rank selection via a cumulative sum over the ascending
         count values (single-partition window over the tiny histogram)
         + one global aggregate row.
    A naive row_number-over-all-keys percentile would single-partition
    sort 1e9 key rows; the count-of-counts contraction is the design
    that survives the scale-up.
    """
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    hist = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("keys"))
    from pyspark.sql import Window

    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        F.col("cnt"),
        F.col("keys"),
        F.sum("keys").over(w).alias("cum_keys"),
    )
    # nearest-rank target ranks: ceil(p * n) as integer arithmetic
    # ((num*n + den - 1) div den) — mirrors analytics.exact_percentiles
    totals = cum.agg(
        F.sum(F.col("keys")).cast("bigint").alias("distinct_keys"),
        F.sum(F.col("cnt") * F.col("keys")).cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
    )
    ranked = cum.crossJoin(F.broadcast(totals))
    # smallest cnt whose cumulative key coverage reaches the target rank
    def pick(num: int, den: int):
        target = (F.lit(num) * F.col("distinct_keys") + F.lit(den - 1)) / F.lit(den)
        target = F.floor(target).cast("bigint")
        return F.min(F.when(F.col("cum_keys") >= target, F.col("cnt"))).cast("bigint")

    return ranked.groupBy("distinct_keys", "total_rows", "max_cnt").agg(
        pick(1, 2).alias("p50_cnt"),
        pick(9, 10).alias("p90_cnt"),
        pick(99, 100).alias("p99_cnt"),
    ).select(
        "distinct_keys",
        "total_rows",
        "max_cnt",
        "p50_cnt",
        "p90_cnt",
        "p99_cnt",
        # Integer floor-division on BOTH engines (Spark DIV truncates a
        # double cast while DuckDB CAST rounds — the house rule is
        # floor/DIV only across engines). The numerator runs in
        # DECIMAL(38,0): max_cnt*distinct_keys*1e6 wraps int64 silently
        # (non-ANSI Spark) near 1e9 keys x 1e9 max-count, while
        # decimal38 holds ~1e38 — the oracle mirrors with HUGEINT.
        F.expr(
            "CAST(CAST(max_cnt AS DECIMAL(38,0)) * distinct_keys"
            " * 1000000 DIV total_rows AS BIGINT)"
        ).alias("skew_ratio_ppm"),
    )


def check_constraints(df: DataFrame, constraints: Sequence[tuple]) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ/
    great-expectations shape): evaluate EVERY constraint in ONE
    aggregation over ONE scan, emit one row per constraint —
    ``(check_name STRING, observed BIGINT, bound BIGINT, passed INT)``.

    Supported constraint tuples:

    - ``("not_null", col)`` — observed = null count, passes at 0.
    - ``("unique", col)`` — observed = duplicated-value surplus
      (count(col) - count_distinct(col)), passes at 0.
    - ``("min_at_least", col, lo)`` / ``("max_at_most", col, hi)`` —
      observed = violation count, passes at 0 (comparisons are exact;
      numeric bounds are caller-typed).
    - ``("matches", col, regex)`` — observed = count of non-NULL values
      NOT matching, passes at 0.
    - ``("row_count_at_least", n)`` — observed = row count, passes at
      >= n.

    Why one pass matters: a 100 TB audit that runs k constraints as k
    queries scans 100k TB; this plans every check as another aggregate
    expression over the same scan — Catalyst fuses them into a single
    HashAggregate pair (one Expand only if ``unique`` checks force
    distinct branches), so the audit costs one pass regardless of suite
    size.  All observables are integers — the suite is oracle-hashable
    (queries.py x_data_quality).
    """
    aggs = []
    rows = []  # (name, observed_col_name, bound, pass_expr builder)
    for i, c in enumerate(constraints):
        kind = c[0]
        name = f"_c{i}"
        if kind == "not_null":
            _, col = c
            aggs.append(
                (F.count(F.lit(1)) - F.count(col)).cast("bigint").alias(name)
            )
            rows.append((f"not_null:{col}", name, 0, "eq"))
        elif kind == "unique":
            _, col = c
            aggs.append(
                (F.count(col) - F.count_distinct(F.col(col)))
                .cast("bigint")
                .alias(name)
            )
            rows.append((f"unique:{col}", name, 0, "eq"))
        elif kind == "min_at_least":
            _, col, lo = c
            aggs.append(
                F.sum(F.when(F.col(col) < lo, 1).otherwise(0))
                .cast("bigint")
                .alias(name)
            )
            rows.append((f"min_at_least:{col}", name, 0, "eq"))
        elif kind == "max_at_most":
            _, col, hi = c
            aggs.append(
                F.sum(F.when(F.col(col) > hi, 1).otherwise(0))
                .cast("bigint")
                .alias(name)
            )
            rows.append((f"max_at_most:{col}", name, 0, "eq"))
        elif kind == "matches":
            _, col, pattern = c
            aggs.append(
                F.sum(
                    F.when(
                        F.col(col).isNotNull()
                        & ~F.col(col).rlike(pattern),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(name)
            )
            rows.append((f"matches:{col}", name, 0, "eq"))
        elif kind == "row_count_at_least":
            _, n = c
            aggs.append(F.count(F.lit(1)).cast("bigint").alias(name))
            rows.append(("row_count_at_least", name, int(n), "ge"))
        else:
            raise ValueError(f"check_constraints: unknown constraint {c!r}")
    wide = df.agg(*aggs)
    stack_args: list = []
    for label, name, bound, op in rows:
        passed = (
            (F.col(name) >= bound) if op == "ge" else (F.col(name) == bound)
        )
        stack_args += [
            F.lit(label),
            F.col(name),
            F.lit(bound).cast("bigint"),
            passed.cast("int"),
        ]
    return wide.select(
        F.stack(F.lit(len(rows)), *stack_args).alias(
            "check_name", "observed", "bound", "passed"
        )
    )


def fd_profile(
    named_frames: dict[str, DataFrame],
    fds: Sequence[tuple[str, str, Sequence[str], str]],
) -> DataFrame:
    """Functional-dependency profiling: for each declared candidate FD
    ``lhs -> rhs``, ONE summary row — ``(fd, lhs_groups,
    violating_groups, violating_rows, max_rhs_variants)`` — where a
    violating group is an lhs value with more than one distinct
    non-null rhs.  The schema-discovery primitive next to the
    constraint suite (x_data_quality checks declared invariants;
    this MEASURES whether a dependency holds and how badly it fails —
    the Deequ/TANE-style profiling step that decides which columns can
    key a dimension table before a 100 TB backfill assumes it).

    ``fds`` entries are ``(fd_name, frame_key, lhs_cols, rhs_col)``
    against ``named_frames``.  Scale shape per FD: one map-side-combined
    groupBy on its lhs (the minimal shuffle any exact FD check needs —
    partials carry (count, distinct-rhs set) per lhs key), then a
    1-row reduction; the result is |fds| rows unioned.  NULL rhs rows
    never violate (count DISTINCT ignores nulls — same rule both
    engines); NULL lhs values group like any other value."""
    from functools import reduce

    outs = []
    for fd_name, frame_key, lhs, rhs in fds:
        df = named_frames[frame_key]
        g = df.groupBy(*list(lhs)).agg(
            F.count(F.lit(1)).alias("_rows"),
            F.count_distinct(F.col(rhs)).alias("_nd"),
        )
        outs.append(
            g.agg(
                F.count(F.lit(1)).alias("_groups"),
                # coalesce: SUM over an empty frame is NULL on both
                # engines; an empty table has zero violations
                F.coalesce(
                    F.sum(F.when(F.col("_nd") > 1, 1).otherwise(0)),
                    F.lit(0),
                ).alias("_vg"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("_nd") > 1, F.col("_rows")).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("_vr"),
                F.max("_nd").alias("_mx"),
            ).select(
                F.lit(fd_name).alias("fd"),
                F.col("_groups").cast("bigint").alias("lhs_groups"),
                F.col("_vg").cast("bigint").alias("violating_groups"),
                F.col("_vr").cast("bigint").alias("violating_rows"),
                F.col("_mx").cast("bigint").alias("max_rhs_variants"),
            )
        )
    if not outs:
        raise ValueError("fd_profile: no FDs declared")
    return reduce(DataFrame.unionAll, outs)


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
    range_partitions: int = 32,
) -> DataFrame:
    """Exact Gini coefficient of a non-negative integer ``value_col`` —
    ``(*group_cols, gini_ppm BIGINT, n BIGINT, total BIGINT)`` — the
    corpus-mixing concentration diagnostic: how unequally are
    tokens/bytes/documents distributed (0 = uniform, ->1e6 = one row
    holds everything).

    Exact at distinct-value width: aggregate to per-value counts (the
    only full-data shuffle), take the cumulative count below each value
    — a group-partitioned window (grouped) or the shared two-phase
    range prefix sum (global; ranking.py::global_exclusive_prefix, no
    single-task window) — then the rank-sum identity: the ``c`` rows at
    value ``v`` occupy ranks ``C+1 .. C+c``, so
    ``S1 = sum(v * (c*C + c*(c+1) div 2))`` equals
    ``sum(rank_i * x_(i))`` without materializing per-row ranks.
    ``G = 2*S1/(n*total) - (n+1)/n``.

    The ppm fixed-point is computed by TWO-STEP LONG DIVISION —
    ``d1 = (num*1000) div nt; d2 = ((num*1000) mod nt)*1000 div nt;
    gini_ppm = d1*1000 + d2`` with ``num = 2*S1 - (n+1)*total <= nt =
    n*total`` — so no intermediate exceeds ``nt*1000``: exact ppm
    without the ``num*10^6`` overflow (num*1e6 would blow past int64
    at ~1e13 value-mass, i.e. already at single-digit-TB corpora).
    Remaining bound: ``nt = n*total`` must fit int64 (~9e18; at
    1e10 rows x 1e8 mean mass, compute per group/shard — a single
    global Gini past that scale is not a useful number anyway).
    Rows with NULL value are excluded; values must be >= 0 for the
    coefficient to mean anything (not enforced — audit first)."""
    from kafka_dead_letter_analyzer_spark.operators.ranking import (
        global_exclusive_prefix,
    )
    from pyspark.sql import Window

    groups = list(group_cols or [])
    counts = (
        df.select(*[df[g] for g in groups],
                  F.col(value_col).cast("bigint").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy(*groups, "v")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    if groups:
        w = (
            Window.partitionBy(*groups)
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = counts.withColumn(
            "cum_lt", F.coalesce(F.sum("c").over(w), F.lit(0))
        )
    else:
        cum = global_exclusive_prefix(
            counts, order_col="v", sum_col="c", out_col="cum_lt",
            range_partitions=range_partitions,
        )
    agg = cum.groupBy(*groups).agg(
        F.sum(
            F.col("v")
            * (F.col("c") * F.col("cum_lt")
               + F.expr("(c * (c + 1)) DIV 2"))
        ).cast("bigint").alias("s1"),
        F.sum("c").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("c")).cast("bigint").alias("total"),
    )
    return (
        agg.filter(F.col("total") > 0)
        .withColumn("num", F.expr("2 * s1 - (n + 1) * total"))
        .withColumn("nt", F.expr("n * total"))
        .select(
            *groups,
            F.expr(
                "((num * 1000) DIV nt) * 1000"
                " + (((num * 1000) % nt) * 1000) DIV nt"
            ).cast("bigint").alias("gini_ppm"),
            "n",
            "total",
        )
    )


# log10(1 + 1/d) in exact ppm (floor): the Benford first-digit law.
# Fixed public constants (they sum to exactly 1_000_000), so the audit
# needs no log() anywhere near the cross-engine hash gate.
BENFORD_PPM = {
    1: 301_030,
    2: 176_091,
    3: 124_939,
    4: 96_910,
    5: 79_181,
    6: 66_947,
    7: 57_992,
    8: 51_153,
    9: 45_757,
}


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """First-significant-digit audit against Benford's law —
    ``(*group_cols, digit BIGINT, cnt BIGINT, obs_ppm BIGINT,
    exp_ppm BIGINT, dev_ppm BIGINT)``, one row per digit 1..9 that
    occurs (plus every digit's expected share via the constant table;
    absent digits still emit with cnt=0 so a suspiciously MISSING
    digit is visible).

    Fabricated or defaulted numeric columns (prices typed in by hand,
    constants injected by a broken producer) flunk Benford; organic
    multi-scale measures follow it.  ``value_col`` must be a POSITIVE
    integer column (callers pre-scale money to cents via the exact
    DECIMAL cast; zero/negative/NULL rows are excluded and counted by
    the caller's own profile if needed).  The first digit is the
    leading character of the decimal rendering — a pure integer/string
    function, identical on every engine, no log10.

    obs_ppm is the two-step-division exact floor(cnt*1e6/n);
    dev_ppm = |obs - exp|.  The only full-data shuffle is the
    (group, digit) count; the digit domain (9) then joins the constant
    table broadcast-side.  Total L1 distance = sum(dev_ppm)/2e6 per
    group, derivable from the emitted rows."""
    groups = list(group_cols or [])
    spark = df.sparkSession
    from kafka_dead_letter_analyzer_spark.operators.io import (
        local_relation_df,
    )

    const = local_relation_df(
        spark,
        [(d, p) for d, p in sorted(BENFORD_PPM.items())],
        "digit bigint, exp_ppm bigint",
    )
    obs = (
        df.filter(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(
            *[df[g] for g in groups],
            F.substring(F.col(value_col).cast("string"), 1, 1)
            .cast("bigint")
            .alias("digit"),
        )
        .groupBy(*groups, "digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    if groups:
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        domains = obs.select(*groups).distinct().crossJoin(
            F.broadcast(const)
        )
        # null-safe on the group key (round 9): keeps the NULL group
        full = null_safe_group_join(
            domains, obs, groups, plain_keys=["digit"], how="left"
        )
    else:
        full = F.broadcast(const).join(obs, ["digit"], "left")
    wg = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    scored = full.withColumn(
        "cnt", F.coalesce("cnt", F.lit(0).cast("bigint"))
    ).withColumn("n", F.sum("cnt").over(wg))
    return scored.filter(F.col("n") > 0).select(
        *groups,
        "digit",
        "cnt",
        F.expr(
            "((cnt * 1000) DIV n) * 1000"
            " + (((cnt * 1000) % n) * 1000) DIV n"
        ).cast("bigint").alias("obs_ppm"),
        "exp_ppm",
        F.expr(
            "abs(((cnt * 1000) DIV n) * 1000"
            " + (((cnt * 1000) % n) * 1000) DIV n - exp_ppm)"
        ).cast("bigint").alias("dev_ppm"),
    )


def contingency_profile(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Exact contingency-table association profile between two
    categorical columns — one row per observed cell:
    ``(row_cat, col_cat, observed BIGINT, row_total BIGINT,
    col_total BIGINT, n BIGINT, leverage_num BIGINT)`` with
    ``leverage_num = observed*n - row_total*col_total`` — the integer
    numerator of P(r,c) - P(r)P(c) over n^2.  Its sign answers
    "over- or under-represented vs independence" per cell with NO
    division anywhere, its magnitude ranks the cells, and the
    chi-square statistic is derivable caller-side as
    ``sum(leverage_num^2 / (row_total*col_total)) / n`` — kept out of
    the engine because per-cell division floors don't sum exactly.

    Use: "is the error-type mix hour-of-day dependent?" — the
    independence audit over any two discrete dimensions.  Plan: one
    (row, col) count contraction is the full-data shuffle; the two
    marginals are groupBys OVER THE CONTRACTION joined back broadcast
    (category domains are small by definition — for a near-continuous
    dimension quantize first, as with kendall_tau_exact); the 1-row n
    anchor joins broadcast.  NULL categories count as real categories
    (a NULL-heavy cell is exactly the kind of skew this audits)."""
    cells = df.groupBy(
        F.col(row_col).alias("row_cat"), F.col(col_col).alias("col_cat")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    rows_m = cells.groupBy("row_cat").agg(
        F.sum("observed").cast("bigint").alias("row_total")
    )
    cols_m = cells.groupBy("col_cat").agg(
        F.sum("observed").cast("bigint").alias("col_total")
    )
    n = cells.agg(F.sum("observed").cast("bigint").alias("n"))
    # null-SAFE joins: a NULL category is a real cell by contract, and
    # a null-unsafe key join would silently drop exactly the skew rows
    # this operator exists to audit
    joined = (
        cells.alias("c")
        .join(
            F.broadcast(rows_m).alias("r"),
            F.expr("c.row_cat <=> r.row_cat"),
        )
        .join(
            F.broadcast(cols_m).alias("m"),
            F.expr("c.col_cat <=> m.col_cat"),
        )
        .crossJoin(F.broadcast(n))
    )
    return joined.select(
        F.col("c.row_cat").alias("row_cat"),
        F.col("c.col_cat").alias("col_cat"),
        "observed",
        "row_total",
        "col_total",
        "n",
        F.expr("observed * n - row_total * col_total")
        .cast("bigint")
        .alias("leverage_num"),
    )
