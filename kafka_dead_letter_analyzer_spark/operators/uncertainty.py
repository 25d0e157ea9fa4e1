"""Uncertainty quantification for distributed aggregates: multiplier
bootstrap and block jackknife, both deterministic and hash-gate exact.

The reference engine reports point statistics per error key
(`ErrorAggregatingProcessor.java:38-102`); at corpus scale the next
question is "how STABLE is that number — is this week's quality-score
mean actually different from last week's, or within resampling noise?"
Classic answers (Poisson bootstrap, BLB) draw Poisson(1) weights, which
needs `log` of a uniform — unusable under the cross-engine hash gate
and irreproducible across retries. Both operators here are exact
integer algebra on deterministic md5 draws:

* ``bootstrap_moments`` is the Rademacher MULTIPLIER bootstrap: weight
  w = 0 or 2 with probability 1/2 each (one md5 bit per (row, b)), so
  E[w] = 1 and Var[w] = 1 — the same first two weight moments as the
  Poisson bootstrap, hence the same first-order validity (van der
  Vaart & Wellner's multiplier CLT), with integer weights.  Emits per
  (group, b) the exact resampled sufficient statistics (n_eff, sum_v);
  the spread of sum_v/n_eff across b IS the sampling noise of the
  mean.  Cost: the resample axis explodes B-fold BEFORE the partial
  aggregate — B·rows map-side rows, contracted to B·groups by
  map-side combine in the same stage; no extra scan, no shuffle
  growth beyond B x group cardinality.
* ``jackknife_blocks`` is the delete-one-BLOCK jackknife: rows hash
  into nb blocks, one groupBy builds per-block sums, and each
  leave-one-out replicate is (total - block) — derived by a window
  over the BLOCK CONTRACTION, so the whole estimate family costs ONE
  scan and one nb-by-group-wide shuffle regardless of nb.  The
  block form (delete-n/nb) is the scale-correct jackknife: delete-ONE
  at 1e11 rows is 1e11 replicates of nothing.

Both keep division out of the engine: the surfaces are exact integer
(numerator, denominator) pairs per replicate; callers divide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.sampling import (
    hash_uniform_u32,
)

__all__ = ["bootstrap_moments", "jackknife_blocks"]


def bootstrap_moments(
    df: DataFrame,
    key: str,
    value_col: str,
    group_cols: list[str] | None = None,
    n_resamples: int = 16,
    salt: str = "boot:",
) -> DataFrame:
    """Rademacher multiplier bootstrap of a column's sum/mean —
    ``(*group_cols, b BIGINT, n_eff BIGINT, sum_v BIGINT)``, one row
    per (group, resample): the exact sufficient statistics of resample
    ``b`` where every row independently carries weight 0 or 2 by one
    deterministic md5 bit of ``key || ':' || b`` (salted).  E[w]=1,
    Var[w]=1 matches the Poisson bootstrap's first two moments, so
    stderr(mean) estimates follow the multiplier CLT; the draw being
    per-(row, b) deterministic makes the whole family reproducible
    across retries, partitionings, and engines.  Resamples where no
    row survives (n_eff = 0) are emitted and left to the caller —
    dropping them silently would bias small-group spreads.  NULL
    values are excluded before weighting."""
    if n_resamples < 1:
        raise ValueError("bootstrap_moments: n_resamples must be >= 1")
    groups = list(group_cols or [])
    base = df.filter(F.col(value_col).isNotNull()).select(
        *[df[g] for g in groups],
        F.col(key).cast("string").alias("k"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    exploded = base.select(
        *groups,
        "k",
        "v",
        F.explode(
            F.sequence(
                F.lit(0).cast("bigint"),
                F.lit(int(n_resamples) - 1).cast("bigint"),
            )
        ).alias("b"),
    ).withColumn(
        # one md5 bit per (row, resample): w in {0, 2}
        "w",
        (
            hash_uniform_u32(
                F.concat(F.col("k"), F.lit(":"), F.col("b")), salt
            )
            % 2
        )
        * 2,
    )
    return exploded.groupBy(*groups, "b").agg(
        F.sum("w").cast("bigint").alias("n_eff"),
        F.sum(F.expr("w * v")).cast("bigint").alias("sum_v"),
    )


def jackknife_blocks(
    df: DataFrame,
    key: str,
    value_col: str,
    group_cols: list[str] | None = None,
    n_blocks: int = 32,
    salt: str = "jack:",
) -> DataFrame:
    """Delete-one-block jackknife of a column's sum/mean —
    ``(*group_cols, blk BIGINT, loo_n BIGINT, loo_sum BIGINT,
    blk_n BIGINT, blk_sum BIGINT)``: rows hash deterministically into
    ``n_blocks`` blocks (md5 of the salted key), and each output row
    carries the LEAVE-THAT-BLOCK-OUT totals next to the block's own.
    The classic delete-one jackknife is a degenerate n-replicate scan
    at scale; the block form keeps the estimator family at ONE scan +
    one (group, block) shuffle, with the leave-one-out totals derived
    by a full-frame window over the block contraction (n_blocks rows
    per group — never the data).  Variance recipe (caller-side):
    stderr^2(mean) ~ (nb-1)/nb * sum_b (loo_mean_b - mean)^2.  Blocks
    that happen to be empty simply do not appear (md5 uniformity makes
    that vanishingly rare past a few hundred rows); NULL values are
    excluded."""
    if n_blocks < 2:
        raise ValueError("jackknife_blocks: n_blocks must be >= 2")
    groups = list(group_cols or [])
    base = df.filter(F.col(value_col).isNotNull()).select(
        *[df[g] for g in groups],
        (hash_uniform_u32(F.col(key).cast("string"), salt)
         % int(n_blocks)).alias("blk"),
        F.col(value_col).cast("bigint").alias("v"),
    )
    per_blk = base.groupBy(*groups, "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("blk_n"),
        F.sum("v").cast("bigint").alias("blk_sum"),
    )
    wg = (
        Window.partitionBy(*groups)
        if groups
        else Window.partitionBy()
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per_blk.withColumn(
        "loo_n", (F.sum("blk_n").over(wg) - F.col("blk_n")).cast("bigint")
    ).withColumn(
        "loo_sum",
        (F.sum("blk_sum").over(wg) - F.col("blk_sum")).cast("bigint"),
    ).select(*groups, "blk", "loo_n", "loo_sum", "blk_n", "blk_sum")
