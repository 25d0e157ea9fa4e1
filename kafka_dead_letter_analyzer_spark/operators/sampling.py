"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is seed-dependent PER PARTITIONING — repartition the input
and the sample changes, which is unacceptable for reproducible dataset
builds. These operators derive the keep/drop decision from a HASH OF THE
ROW KEY, so the sample is a pure function of the data: stable across
partitionings, cluster sizes, retries, and engines (the md5-based rank is
reproduced bit-for-bit by the DuckDB oracles in queries.py).

- ``hash_bernoulli_sample``: keep a row iff the first 8 hex digits of
  ``md5(key)`` (unsalted; ``md5(key || ':' || salt)`` when a salt is
  given) — a uniform 32-bit integer — fall below ``rate * 2^32``. Pure
  projection + filter — no shuffle, pushes down to the scan's
  post-filter, scales trivially.
- ``stratified_quota``: exactly ``k`` rows per stratum (e.g. per
  language), chosen by md5 rank — a uniform random-but-deterministic
  quota. One shuffle on the stratum column for the rank window; at scale
  prefer heavy strata pre-filtering with ``hash_bernoulli_sample`` at
  ~2k/|stratum| to cut the sorted volume (documented two-phase pattern),
  which keeps the window input per stratum O(k) with high probability.

md5 (not xxhash64) is deliberate: it is the cross-engine-reproducible
choice (NOTES.md md5-prefix trick); xxhash64 would be cheaper JVM-side
but has no DuckDB analog, and sampling decisions are worth pinning to an
engine-independent function so a dataset build can be audited anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_uniform_u32",
    "hash_bernoulli_sample",
    "weighted_bernoulli_sample",
    "mixture_sample",
    "hash_split",
    "stratified_quota",
    "stratified_quota_weighted",
    "global_order_index",
    "weighted_reservoir_topk",
]


def _salted_key(key: Column, salt: str) -> Column:
    """The hashed key string: ``key`` bare when unsalted (keeps the draw
    reproducible from md5(key) alone — the DuckDB oracles and docs depend
    on this), ``key + ':' + salt`` when a salt is given. The single
    definition both samplers share — change the scheme HERE only."""
    return (
        F.concat(key.cast("string"), F.lit(f":{salt}"))
        if salt
        else key.cast("string")
    )


def hash_uniform_u32(key: Column, salt: str = "") -> Column:
    """Uniform deterministic 32-bit integer from a row key: first 8 hex
    digits of md5(salted key) as a BIGINT in [0, 2^32)."""
    return F.conv(F.substring(F.md5(_salted_key(key, salt)), 1, 8), 16, 10).cast(
        "bigint"
    )


def hash_bernoulli_sample(
    df: DataFrame, key: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row with probability ``rate``, decided by the row key
    alone — reproducible under any repartitioning. Filter-only plan."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * (1 << 32))
    return df.filter(hash_uniform_u32(F.col(key), salt) < threshold)


def weighted_bernoulli_sample(
    df: DataFrame, key: str, weight_col: str, rate_per_unit: float, salt: str = ""
) -> DataFrame:
    """Keep each row with probability ``min(1, weight * rate_per_unit)``
    — inclusion proportional to a per-row weight (doc length, quality
    score, domain priority), capped at certainty. The corpus-mixture
    primitive: "sample long documents proportionally more" without a
    shuffle or a global pass.

    Determinism contract matches ``hash_bernoulli_sample``: the draw is
    the md5-u32 of the row key, the threshold is INTEGER arithmetic
    (``least(2^32, weight * floor(rate_per_unit * 2^32))``), so the
    decision is a pure function of (key, weight) — reproducible under
    any partitioning, engine, or retry, and exactly auditable in SQL.
    Filter-only plan: no shuffle, evaluated at the scan. Weights must be
    non-negative integers (raise on negative at evaluation is not
    possible in a projection; rows with NULL/negative weight drop out,
    matching SQL comparison semantics).
    """
    if not 0.0 <= rate_per_unit <= 1.0:
        raise ValueError(f"rate_per_unit must be in [0, 1], got {rate_per_unit}")
    per_unit = int(rate_per_unit * (1 << 32))
    w = F.col(weight_col).cast("bigint")
    # least() IGNORES nulls on every engine (returns the other operand),
    # which would keep NULL-weight rows with certainty — the opposite of
    # the contract. Gate on non-null explicitly so a NULL weight yields a
    # NULL threshold and the comparison filters the row out.
    threshold = F.when(
        w.isNotNull(),
        F.least(F.lit(1 << 32).cast("bigint"), w * F.lit(per_unit).cast("bigint")),
    )
    return df.filter(hash_uniform_u32(F.col(key), salt) < threshold)


def stratified_quota(
    df: DataFrame, stratum: str, key: str, k: int, salt: str = ""
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, selected by md5
    rank over the row key (ties broken by the key itself, so the result
    is total-order deterministic). Adds ``sample_rank`` (1-based)."""
    order_hash = F.md5(_salted_key(F.col(key), salt))
    w = Window.partitionBy(stratum).orderBy(order_hash, F.col(key))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_sample(
    df: DataFrame,
    key: str,
    mix_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-component corpus-mixture sampling: keep each row with the rate
    configured for its mixture component (source, language, domain) —
    the "web 50% / books 100% / low-quality 10%" reweighting every
    pre-training data build runs. Unlisted components fall back to
    ``default_rate``.

    Same determinism contract as the other samplers: md5-u32 draw vs an
    integer threshold looked up from a literal map — a pure function of
    (key, component), repartition/engine-stable, filter-only plan (the
    literal map is a codegen'd CASE, no join against a rates table; at
    thousands of components broadcast-join a rates dim instead).
    """
    for comp, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {comp!r} must be in [0, 1], got {rate}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thresh = F.lit(int(default_rate * (1 << 32)))
    col = F.col(mix_col)
    for comp, rate in sorted(rates.items()):
        thresh = F.when(col == comp, F.lit(int(rate * (1 << 32)))).otherwise(thresh)
    return df.filter(hash_uniform_u32(F.col(key), salt) < thresh)


def mixture_rates_for_budget(
    available: dict[str, int],
    target: dict[str, float],
    budget: int,
    max_rate: float = 1.0,
) -> dict:
    """Solve the per-component keep-rates that :func:`mixture_sample`
    needs, from a token budget and target mixture proportions — the
    planning step of every pre-training data build ("30% web, 30%
    code, 40% books into a 500B-token budget") with the constraint
    real corpora always violate: a component can only supply
    ``available * max_rate`` tokens.  Classic WATER-FILLING: allocate
    the budget proportionally to the target mix over UNSATURATED
    components, cap any component at its supply, redistribute the
    deficit over the remaining headroom by renormalized proportions,
    repeat — terminates in <= len(components) rounds, and the result
    is the unique allocation that is target-proportional among
    unsaturated components (tested as an exact invariant).

    Exact rational arithmetic throughout (``fractions.Fraction`` — no
    float drift in the solver; only the RETURNED rates are floats for
    mixture_sample's threshold).  Pure driver-side math over the
    component table (bounded by construction: sources/domains number
    thousands, not billions) — the lsh_tune precedent.

    Returns ``{"rates": {comp: float}, "allocated": {comp: int},
    "shortfall": int}`` — ``allocated`` the integer token allocation
    (floor), ``shortfall`` > 0 when total capacity cannot fill the
    budget (every component saturated).  ``max_rate`` < 1 reserves
    headroom (e.g. 0.9 keeps a holdout margin); upsampling (> 1
    epochs) is out of scope for a SAMPLER — repeat-epoch planning is a
    training-loop concern."""
    from fractions import Fraction

    if budget < 0:
        raise ValueError(f"budget={budget} must be >= 0")
    if not (0.0 < max_rate <= 1.0):
        raise ValueError(f"max_rate={max_rate} must be in (0, 1]")
    if set(target) - set(available):
        raise ValueError(
            "target components missing from available: "
            f"{sorted(set(target) - set(available))}"
        )
    if any(v < 0 for v in available.values()):
        raise ValueError("available counts must be >= 0")
    if any(v < 0 for v in target.values()) or sum(target.values()) <= 0:
        raise ValueError("target proportions must be >= 0, sum > 0")

    mr = Fraction(max_rate).limit_denominator(10**9)
    cap = {c: Fraction(available[c]) * mr for c in target}
    alloc = {c: Fraction(0) for c in target}
    remaining = Fraction(budget)
    open_set = {c for c in target if target[c] > 0 and cap[c] > 0}
    while remaining > 0 and open_set:
        tot_prop = sum(Fraction(target[c]).limit_denominator(10**9)
                       for c in open_set)
        saturated = set()
        spent = Fraction(0)
        for c in open_set:
            share = remaining * Fraction(
                target[c]
            ).limit_denominator(10**9) / tot_prop
            room = cap[c] - alloc[c]
            take = min(share, room)
            alloc[c] += take
            spent += take
            if alloc[c] >= cap[c]:
                saturated.add(c)
        remaining -= spent
        if not saturated:
            break  # everyone took the full share: budget satisfied
        open_set -= saturated
    allocated = {c: int(alloc[c]) for c in target}
    rates = {
        c: float(alloc[c] / Fraction(available[c]))
        if available[c]
        else 0.0
        for c in target
    }
    # shortfall from the EXACT unallocated remainder, not the floored
    # per-component ints (flooring a fully-filled fractional split
    # must not read as a shortfall)
    return {
        "rates": rates,
        "allocated": allocated,
        "shortfall": int(remaining),
    }


def hash_split(
    df: DataFrame,
    key: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column
    from consecutive md5-u32 ranges sized by ``fractions`` (insertion
    order defines range order). The draw is salted (default "split") so
    the split is INDEPENDENT of any sampling decision made with the bare
    key hash — the classic leakage bug this column-level determinism
    avoids. Pure projection: no shuffle, no state; a row's split never
    changes when the corpus grows, which is what makes eval sets stable
    across dataset versions.
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform_u32(F.col(key), salt)
    expr = None
    hi = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        hi += int(frac * (1 << 32))
        cond = u < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    salt: str = "split",
) -> DataFrame:
    """Near-dup-LEAKAGE-safe train/val/test assignment — the strong
    form of :func:`hash_split`: every member of a near-duplicate
    cluster receives the SAME split, because the hash draw is taken on
    the cluster REPRESENTATIVE (the connected component's min id over
    the ``pairs`` edge set — any dedup family output: minhash, simhash,
    embedding, winnowing), not on the row's own id.  Key-level splits
    leak evaluation signal whenever a test document has a near-twin in
    train (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better" — test-set near-dups inflate eval);
    splitting by component closes exactly that channel, with a
    verifiable guarantee: ``pair in pairs => split(a) == split(b)``.

    Documents in no pair are their own representative, so their
    assignment is IDENTICAL to ``hash_split(df, id_col, fractions,
    salt)`` — adding edges never reshuffles untouched rows, which
    keeps eval sets stable as dedup coverage improves.  Output = input
    columns + ``cluster_rep`` (the representative id) + ``split``.

    Scale shape: one connected-components pass over the PAIR set (the
    dedup output, far smaller than the corpus; distributed label
    propagation with the bounded driver fast path), one equi-join of
    the corpus against the |docs-in-any-pair| component table (AQE
    broadcasts it when small), then the same pure-projection range
    assignment as hash_split — no window, no corpus shuffle beyond
    the one join."""
    from kafka_dead_letter_analyzer_spark.operators.graph import (
        connected_components,
    )

    comps = connected_components(pairs, src=src, dst=dst).select(
        F.col("id").alias(id_col), "component"
    )
    withrep = df.join(comps, id_col, "left").withColumn(
        "cluster_rep",
        F.coalesce(F.col("component"), F.col(id_col)),
    ).drop("component")
    return hash_split(withrep, "cluster_rep", fractions, salt=salt)


def global_order_index(
    df: DataFrame,
    key: str,
    partitions: int | None = None,
    salt: str = "shuffle",
    out_col: str = "global_idx",
) -> DataFrame:
    """Deterministic global training order: every row gets its 1-based
    position in the total order (md5(salted key), key) — the corpus
    "shuffle" step before sequence packing / sharded export, with the
    order a pure function of the data (stable across partitionings,
    cluster sizes, and reruns; salted so it is independent of the
    sampling/split draws).

    The scale design — a naive ``row_number() OVER (ORDER BY hash)``
    funnels 100 TB through ONE task. Instead:
      1. DETERMINISTIC equal-width bucketing on the hash's u32 prefix:
         bucket i covers _h in [i*2^32/n, (i+1)*2^32/n). Because md5 is
         uniform this IS balanced range partitioning on _h — with
         closed-form bounds, so (unlike ``repartitionByRange``, which
         SAMPLES bounds per execution) the count job and the enumerate
         job agree with NO persist pinning a materialization. Hex
         string order == numeric order (lowercase hex), so buckets are
         contiguous slices of the (_h, key) total order.
      2. per-bucket row counts off a key-only projection: ONE tiny
         driver collect (≤ |buckets| longs — the bounded action);
      3. global_idx = (broadcast) bucket offset + local position
         within the bucket, enumerated by an Arrow-batched mapInPandas
         over bucket-clustered, (_bkt, _h, key)-sorted partitions —
         counters reset per bucket, so a physical partition may hold
         several whole buckets (plain hash repartition on _bkt).

    Persist-free by construction: round 4 measured a 2.4x bench
    regression when two queries each left a persisted copy of this
    frame in executor storage.
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    from kafka_dead_letter_analyzer_spark.operators.io import shuffle_partitions

    n = partitions or shuffle_partitions(spark)
    h = F.md5(_salted_key(F.col(key), salt))
    bkt = (
        (F.conv(F.substring(F.col("_h"), 1, 8), 16, 10).cast("bigint") * n)
        / F.lit(1 << 32)
    ).cast("int")
    counts = {
        r["_bkt"]: r["c"]
        for r in df.select(h.alias("_h"))
        .select(bkt.alias("_bkt"))
        .groupBy("_bkt")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    from kafka_dead_letter_analyzer_spark.operators.io import (
        local_relation_df,
    )

    # VALUES-backed LocalRelation (not createDataFrame): this is a
    # broadcast dim re-built per execution as an ExistingRDD otherwise
    off_df = F.broadcast(
        local_relation_df(
            spark,
            [(int(b), int(o)) for b, o in offsets.items()],
            "_bkt int, _off bigint",
        )
    )
    clustered = (
        df.withColumn("_h", h)
        .withColumn("_bkt", bkt)
        .repartition(n, "_bkt")
        .sortWithinPartitions("_bkt", "_h", key)
    )
    schema = T.StructType(
        [f for f in clustered.schema.fields if f.name != "_h"]
        + [T.StructField("_local", T.LongType())]
    )
    keep = [f.name for f in clustered.schema.fields if f.name != "_h"]

    def enumerate_sorted(iterator):
        import pandas as pd

        cur_bkt, i = None, 0
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            out = pdf[keep].copy()
            loc = []
            for b in pdf["_bkt"]:
                if b != cur_bkt:
                    cur_bkt, i = b, 0
                loc.append(i)
                i += 1
            out["_local"] = pd.array(loc, dtype="int64")
            yield out

    local = clustered.mapInPandas(enumerate_sorted, schema)
    return (
        local.join(off_df, "_bkt")
        .withColumn(out_col, (F.col("_off") + F.col("_local") + 1).cast("bigint"))
        .drop("_bkt", "_off", "_local")
    )


def stratified_quota_weighted(
    df: DataFrame,
    stratum: str,
    key: str,
    quotas: dict[str, int],
    default_quota: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum quotas with DIFFERENT targets per stratum (the
    mixture-building form of ``stratified_quota``: "50k en, 30k zh,
    5k everything else"). Selection is the same deterministic md5 rank;
    the per-row threshold is a literal CASE on the stratum — unlisted
    strata get ``default_quota`` (0 = drop entirely).

    Same scale shape as the fixed-k quota: ONE shuffle for the rank
    window, WindowGroupLimit pruning at max(quota) before the exchange;
    the two-phase bernoulli prefilter pattern applies per stratum when
    quotas are tiny relative to strata.
    """
    for s_, q in quotas.items():
        if q < 0:
            raise ValueError(f"quota for {s_!r} must be >= 0, got {q}")
    if default_quota < 0:
        raise ValueError(f"default_quota must be >= 0, got {default_quota}")
    order_hash = F.md5(_salted_key(F.col(key), salt))
    w = Window.partitionBy(stratum).orderBy(order_hash, F.col(key))
    thresh = F.lit(default_quota)
    col = F.col(stratum)
    for s_, q in sorted(quotas.items()):
        thresh = F.when(col == s_, F.lit(q)).otherwise(thresh)
    # The LITERAL max-quota conjunct is what lets Catalyst insert
    # WindowGroupLimit (rank pruning BEFORE the window's exchange) —
    # the per-stratum CASE threshold alone defeats the optimizer's
    # rank<=literal pattern match (verified in the plan pin), and
    # without pruning every stratum's full population sorts through
    # the window at scale. The CASE then refines within the pruned set.
    max_q = max([default_quota, *quotas.values()])
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter((F.col("sample_rank") <= F.lit(max_q)) & (F.col("sample_rank") <= thresh))
    )


def weighted_reservoir_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "wrs",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of exactly
    ``k`` rows, inclusion probability increasing in ``weight_col`` —
    sequential Poisson / priority sampling (Ohlsson 1998; Duffield-
    Lund-Thorup priority sampling): each row draws u ~ U and the k
    smallest ``u / w`` win.

    The classic A-Res reservoir key ``u^(1/w)`` needs log/pow — NOT
    exact-rounded, so never bit-stable across engines (the round-4 NOTES
    hash-risk). This design replaces it with ``u / w`` where BOTH
    operands are exact integers (u = md5-u32 + 1 in [1, 2^32], w a
    positive integer weight < 2^52) and IEEE double division IS
    exact-rounded — every engine computes the identical double, making
    the selection a pure function of the data and oracle-checkable.
    Same order statistics family as A-Res (u/w is the exponential race
    with the exponential replaced by the uniform — the standard
    sequential-Poisson approximation of strict PPS-without-replacement).

    Plan: filter + project + global top-k = TakeOrderedAndProject — no
    full sort, no shuffle of the corpus; every executor ships only its
    local k candidates. At 100 TB with k in the thousands this is the
    only acceptable physical shape.

    Rows with NULL or non-positive weight never qualify. Output: the
    input columns + ``wrs_rank`` (1-based selection order). The draw
    column itself stays internal (a double — exact, but kept out of
    declared surfaces per the no-float-output house rule)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = hash_uniform_u32(F.col(key), salt) + F.lit(1)
    pri = u.cast("double") / F.col(weight_col).cast("double")
    ranked = (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("_pri", pri)
        .orderBy(F.col("_pri").asc(), F.col(key).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("_pri").asc(), F.col(key).asc())
    return (
        ranked.withColumn("wrs_rank", F.row_number().over(w).cast("int"))
        .drop("_pri")
    )
