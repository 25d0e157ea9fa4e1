"""Mergeable cardinality / frequency sketches — fixed-size distributed
state for the questions that get expensive at 100 TB.

At scale, ``count(DISTINCT user)`` per slice and ``top tokens by count``
stop being exact-aggregation problems: the distinct shuffle carries one
row per distinct value, and a per-token groupBy carries the full token
stream.  The sketch algebra replaces both with BOUNDED state that merges
associatively, so map-side partial aggregation collapses each task to a
few KB before any exchange — the same contract Spark's own
``approx_count_distinct`` (HLL++) exploits, re-built here on the engine's
cross-engine-reproducible md5 hash so every sketch is (a) mergeable
across days/partitions/clusters by plain SQL (max / sum / min-k), and
(b) oracle-checkable bit-for-bit in DuckDB (integer-only state; the
float ESTIMATES derived from that state stay in helper functions outside
the hash gate).

Three classic sketches, one registered query surface each:

- :func:`kmv_distinct_sketch` — K-Minimum-Values distinct sketch
  (Bar-Yossef et al. 2002): the k smallest 60-bit hashes of the key
  set.  Union-merge = min-k of the union of sketches.
- :func:`cms_sketch` — Count-Min (Cormode & Muthukrishnan 2005): a
  depth x width grid of counters; merge = cell-wise sum; point query =
  min over depth (:func:`cms_lookup`), always an OVER-estimate.
- :func:`hll_register_maxima` — HyperLogLog register state (Flajolet
  et al. 2007): per-register max leading-zero rank; merge = cell-wise
  max.  The register table IS the sketch; :func:`hll_estimate` applies
  the float bias-corrected harmonic mean driver-side.

Scale notes (the point of the module): every sketch here is a single
shuffle whose width is the SKETCH size, not the data size — k rows
(KMV), depth x width cells (CMS), 2^p registers (HLL) — because Spark's
partial HashAggregate combines per task first.  The 60-bit hash uses the
repo's md5-prefix idiom (sampling.py:61, NOTES.md) so DuckDB reproduces
it with the strpos-hex sum; 60 bits keeps the value strictly inside a
signed BIGINT on both engines (no UBIGINT leak into the hash gate).

Reference scope note: the reference system (bakdata
kafka-dead-letter-analyzer) has no sketch surface — this module is part
of the engine's large-scale-pipeline extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "md5_u60",
    "kmv_distinct_sketch",
    "kmv_estimate",
    "kmv_jaccard_estimate",
    "kmv_set_algebra",
    "kmv_setops_estimates",
    "cms_sketch",
    "cms_lookup",
    "hll_register_maxima",
    "hll_estimate",
    "bloom_sketch",
    "bloom_contains",
    "mg_summary",
    "mg_merge",
    "ss_summary",
]

# 60 bits: 15 hex digits of md5.  Wide enough that collisions are
# negligible for any corpus this engine will see (birthday bound ~2^30
# keys), narrow enough to stay positive in a signed 64-bit int on both
# engines.
_HASH_BITS = 60
_HASH_SPACE = 1 << _HASH_BITS


def md5_u60(key: Column) -> Column:
    """First 15 hex digits of md5(key) as a BIGINT in [0, 2^60).

    The 60-bit widening of the engine's md5-u32 idiom
    (operators/sampling.py:61); DuckDB oracles reproduce it with the
    strpos-hex positional sum (see queries.py ``_HEX15_POWS``)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")


# ---------------------------------------------------------------------------
# KMV — k minimum values
# ---------------------------------------------------------------------------


def kmv_distinct_sketch(
    df: DataFrame,
    key: str,
    k: int = 128,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``df[key]`` —
    ``(rank BIGINT, h60 BIGINT)``, rank 1..k ascending; with
    ``group_cols`` one sketch PER GROUP (``(*group_cols, rank, h60)``,
    per-group rank) — e.g. per-source document sketches whose UNION,
    re-limited to the k smallest, is exactly the sketch of any source
    subset (rollup law tested in tests/test_sketches.py).

    This IS the mergeable distinct-count state: the union of two
    corpora's sketches, re-limited to the k smallest, is exactly the
    sketch of the union (min-k is an idempotent, commutative,
    associative set reduction) — so per-day sketches roll up to
    per-month by a k-row-per-day union, never a re-scan.

    Plan shape: hash projection -> partial-distinct HashAggregate
    (map-side: each task holds at most its local distincts) -> exchange
    of distinct hashes -> TakeOrderedAndProject(k) — each task ships
    only its local k smallest, the driver merges k-sized heaps.  The
    row_number ranking runs AFTER the limit, on k rows in one task —
    a window over the sketch, not the data.
    """
    if not 1 <= k <= 1 << 20:
        raise ValueError(f"kmv_distinct_sketch: unreasonable k={k}")
    # no spread_for_cpu here: measured at sf0.1 (round 6, idle-box A/B
    # x2) the round-robin shuffle LOSES 57% on this op — one md5 per row
    # plus a partial agg is cheaper than the extra exchange; at real
    # scan widths the spread is a no-op anyway, so it was pure local tax
    groups = list(group_cols or [])
    if groups:
        # per-group min-k: distinct (group, hash) contraction, then a
        # rank window PER GROUP — partitioned, so no single-task sort;
        # each group's sketch is k rows.
        hashes = (
            df.select(
                *groups, md5_u60(F.col(key).cast("string")).alias("h60")
            )
            .distinct()
            .withColumn(
                "rank",
                F.row_number()
                .over(Window.partitionBy(*groups).orderBy("h60"))
                .cast("bigint"),
            )
            .filter(F.col("rank") <= k)
        )
        return hashes.select(*groups, "rank", "h60")
    hashes = (
        df.select(md5_u60(F.col(key).cast("string")).alias("h60"))
        .distinct()
        .orderBy("h60")
        .limit(k)
    )
    w = Window.orderBy("h60")
    return hashes.select(
        F.row_number().over(w).cast("bigint").alias("rank"), "h60"
    )


def kmv_estimate(sketch_rows: list, k: int) -> float:
    """Distinct-count estimate from a collected KMV sketch: with the
    k-th smallest hash at fraction ``F = h_k / 2^60`` of the hash space,
    the unbiased estimator is ``(k - 1) / F`` (Bar-Yossef et al.).  If
    the sketch holds fewer than k values, the count was exact.

    Float math — deliberately OUTSIDE the oracle-hash surface; the
    sketch rows themselves are the cross-engine-checked state."""
    rows = sorted(r["h60"] if not isinstance(r, (int, float)) else r for r in sketch_rows)
    if len(rows) < k:
        return float(len(rows))
    h_k = rows[k - 1]
    return (k - 1) * _HASH_SPACE / h_k


def kmv_jaccard_estimate(rows_a: list, rows_b: list, k: int) -> float:
    """Jaccard similarity estimate between two key SETS from their KMV
    sketches alone (Beyer et al. SIGMOD'07 / the theta-sketch set
    algebra): take the k smallest hashes of the UNION of the two
    sketches; the fraction of those present in BOTH sketches estimates
    ``|A ∩ B| / |A ∪ B|``.  With :func:`kmv_estimate` of the union this
    prices a join's output cardinality BEFORE running it — the sketch
    use-case a planner cares about at 100 TB (collect two k-row
    sketches, never scan either side again).

    Float math, driver-side, outside the oracle-hash surface."""

    def _vals(rows):
        return {r["h60"] if not isinstance(r, (int, float)) else r for r in rows}

    sa, sb = _vals(rows_a), _vals(rows_b)
    union_k = sorted(sa | sb)[:k]
    if not union_k:
        return 0.0
    both = sum(1 for h in union_k if h in sa and h in sb)
    return both / len(union_k)


def kmv_set_algebra(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """Theta-sketch set composition of two KMV sketches (Beyer et al.
    SIGMOD'07 / the Apache DataSketches theta algebra) —
    ``(rank BIGINT, h60 BIGINT, in_a INT, in_b INT)``: the k smallest
    union hashes inside the VALID REGION, flagged by side membership.
    Jaccard / union / intersection cardinality estimates all derive
    from these rows driver-side (:func:`kmv_setops_estimates`) — the
    join-output-cardinality pricing a planner wants from two k-row
    sketches without rescanning either input.

    The valid region is ``h60 <= min(theta_a, theta_b)`` where a
    side's theta is its k-th smallest hash if the sketch is FULL and
    the whole hash space otherwise: beyond its theta a side's sketch
    is silent, so a union row out there could be wrongly flagged
    absent.  Inside the region both sketches are complete membership
    oracles, which makes the flags exact — integer state, hash-gate
    checkable (declared as x_kmv_setops).

    Plan shape: every input here is already a <= k-row sketch; the
    full-outer hash join, the two 1-row theta aggregates (broadcast),
    and the k-row rank window are all sketch-sized — the raw corpora
    are never touched."""
    a = sketch_a.select("h60").withColumn("in_a", F.lit(1))
    b = sketch_b.select("h60").withColumn("in_b", F.lit(1))

    def _theta(sk: DataFrame) -> DataFrame:
        # k-th smallest if full, else the whole space (sketch == set)
        return sk.agg(
            F.when(F.count(F.lit(1)) >= k, F.max("h60"))
            .otherwise(F.lit(_HASH_SPACE))
            .cast("bigint")
            .alias("th")
        )

    thetas = (
        _theta(a).select(F.col("th").alias("th_a"))
        .crossJoin(_theta(b).select(F.col("th").alias("th_b")))
        .select(F.least("th_a", "th_b").alias("theta"))
    )
    u = (
        a.join(b, "h60", "full_outer")
        .select(
            "h60",
            F.coalesce("in_a", F.lit(0)).cast("int").alias("in_a"),
            F.coalesce("in_b", F.lit(0)).cast("int").alias("in_b"),
        )
        .crossJoin(F.broadcast(thetas))
        .filter(F.col("h60") <= F.col("theta"))
        .orderBy("h60")
        .limit(k)
    )
    w = Window.orderBy("h60")
    return u.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "h60",
        "in_a",
        "in_b",
    )


def kmv_setops_estimates(rows: list, k: int) -> dict:
    """Set-cardinality estimates from collected :func:`kmv_set_algebra`
    rows: ``jaccard`` (fraction of valid-region union hashes present in
    both sides), ``union`` (KMV estimate over the union rows),
    ``intersection`` (their product — the theta-sketch identity), and
    the asymmetric DIFFERENCES ``a_minus_b`` / ``b_minus_a`` (fraction
    of valid-region hashes in exactly one side, times the union
    estimate — the same identity; completes the theta set algebra so a
    planner can price an anti-join the way the intersection prices a
    semi-join).  Float math, driver-side, outside the hash gate."""
    if not rows:
        return {
            "jaccard": 0.0,
            "union": 0.0,
            "intersection": 0.0,
            "a_minus_b": 0.0,
            "b_minus_a": 0.0,
        }
    both = sum(1 for r in rows if r["in_a"] and r["in_b"])
    only_a = sum(1 for r in rows if r["in_a"] and not r["in_b"])
    only_b = sum(1 for r in rows if r["in_b"] and not r["in_a"])
    jac = both / len(rows)
    union = kmv_estimate([r["h60"] for r in rows], k)
    return {
        "jaccard": jac,
        "union": union,
        "intersection": jac * union,
        "a_minus_b": only_a / len(rows) * union,
        "b_minus_a": only_b / len(rows) * union,
    }


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    key: str,
    depth: int = 4,
    width: int = 256,
    weight: str | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch of ``df[key]`` (optionally weighted) —
    ``(d INT, bucket INT, cnt BIGINT)``, one row per non-empty cell;
    with ``group_cols`` one sketch per group, coarser granularities
    derived by summing cells over the finer ones (rollup law tested).

    Row ``(d, b)`` holds ``sum(weight)`` over keys with
    ``md5_u60(key || '#' || d) % width == b``.  Merging two sketches is
    cell-wise ``sum`` — a groupBy over at most ``depth*width`` rows.
    Point estimates (:func:`cms_lookup`) take the min over depth and
    are guaranteed >= the true count (one-sided error; over-estimate
    bounded by ~ N * e / width per the standard analysis).

    Plan shape: the depth replication is a ``posexplode`` of a
    ``depth``-element literal array (no join, no shuffle), then ONE
    HashAggregate pair on (d, bucket) — partial combine bounds every
    task's output at depth*width rows regardless of input size.  That
    bound is the whole point: a trillion-row corpus shuffles at most
    ``tasks * depth * width`` counter rows.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"cms_sketch: bad depth={depth} width={width}")
    # no spread_for_cpu: the depth-fold md5 looked expensive enough to
    # spread, but the sf0.1 A/B (round 6) measured the shuffle neutral-
    # to-negative (+3.5% without) — removed per the measure-don't-guess
    # rule; real scans are already wide
    groups = list(group_cols or [])
    wcol = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    salted = F.concat(F.col(key).cast("string"), F.lit("#"), F.col("d").cast("string"))
    return (
        df.select(*groups, F.col(key), wcol.alias("w"))
        .select(*groups, F.explode(seeds).alias("d"), key, "w")
        .select(
            *groups,
            F.col("d").cast("int").alias("d"),
            (md5_u60(salted) % width).cast("int").alias("bucket"),
            "w",
        )
        .groupBy(*groups, "d", "bucket")
        .agg(F.sum("w").cast("bigint").alias("cnt"))
    )


def cms_lookup(sketch: DataFrame, keys: DataFrame, key: str, width: int) -> DataFrame:
    """Point-query a CMS sketch for each row of ``keys[key]`` —
    ``(key, est BIGINT)`` with ``est = min over d`` of the matching
    cell (0 when a row's cell is absent — impossible for keys that were
    counted, possible for never-seen keys).

    The sketch is depth*width rows — always broadcast; the probe is a
    broadcast LEFT join per (key, d) then a min-agg, no wide shuffle."""
    depth = _probe_depth(sketch)
    probes = (
        keys.select(F.col(key).cast("string").alias("k")).distinct()
        .select(
            "k",
            F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
        )
        .select(
            "k", "d",
            (md5_u60(F.concat(F.col("k"), F.lit("#"), F.col("d").cast("string"))) % width)
            .cast("int")
            .alias("bucket"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("est"))
        .withColumnRenamed("k", key)
    )


def _probe_depth(sketch: DataFrame) -> int:
    # depth is recoverable from the sketch itself (max d + 1); collected
    # bound: one int — the sketch is depth*width rows by construction.
    row = sketch.agg(F.max("d").alias("m")).collect()[0]
    return int(row["m"]) + 1


# ---------------------------------------------------------------------------
# HyperLogLog registers
# ---------------------------------------------------------------------------


def hll_register_maxima(
    df: DataFrame,
    key: str,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """HyperLogLog register state for ``df[key]`` —
    ``(register INT, max_rho INT)``, one row per non-empty register;
    with ``group_cols`` one sketch PER GROUP (``(*group_cols, register,
    max_rho)``) — e.g. daily active-user sketches that roll up to any
    coarser granularity by ``groupBy(coarser).agg(max(max_rho))``
    without touching the raw data again (rollup law differential-tested
    in tests/test_sketches.py).

    Hash layout over the 60-bit space: the TOP ``p`` bits select the
    register (``h DIV 2^(60-p)``), the remaining ``60-p`` bits carry the
    geometric observable ``rho = (60-p) - msb(w) + 1`` (position of the
    highest set bit; ``w == 0`` gives the maximal rho).  ``msb`` is
    computed as ``length(bin(w))`` — both engines print binary without
    leading zeros, so the length IS the MSB position; the ``w = 0`` edge
    is a CASE on both sides (DuckDB's ``bin(0) = '0'`` would read as
    length 1).

    Merging two corpora's registers is cell-wise ``max`` — the register
    table (<= 2^p rows) is the complete, mergeable distinct-count state;
    :func:`hll_estimate` turns a collected table into the float
    estimate.  Plan shape: one HashAggregate pair on register — partial
    max bounds every task at 2^p rows."""
    if not 4 <= p <= 16:
        raise ValueError(f"hll_register_maxima: p={p} outside [4, 16]")
    # no spread_for_cpu: sf0.1 A/B (round 6) measured it 46% SLOWER with
    # the spread — single md5 + 2^p-bounded partial agg needs no fan-out
    tail_bits = _HASH_BITS - p
    tail_space = 1 << tail_bits
    groups = list(group_cols or [])
    h = md5_u60(F.col(key).cast("string"))
    hashed = df.select(*groups, h.alias("h"))
    reg = F.expr(f"h DIV {tail_space}").cast("int")
    w = (F.col("h") % tail_space).cast("bigint")
    rho = (
        F.when(w == 0, F.lit(tail_bits + 1))
        .otherwise(F.lit(tail_bits) - F.length(F.bin(w)) + 1)
        .cast("int")
    )
    return (
        hashed.select(*groups, reg.alias("register"), rho.alias("rho"))
        .groupBy(*groups, "register")
        .agg(F.max("rho").cast("int").alias("max_rho"))
    )


def hll_estimate(register_rows: list, p: int = 8) -> float:
    """Bias-corrected harmonic-mean estimate from collected registers
    (Flajolet et al. 2007), with the standard small-range linear
    counting correction.  Float math — outside the hash gate."""
    m = 1 << p
    maxima = {int(r["register"]): int(r["max_rho"]) for r in register_rows}
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    z = sum(2.0 ** -maxima.get(j, 0) for j in range(m))
    raw = alpha * m * m / z
    zeros = m - len(maxima)
    if raw <= 2.5 * m and zeros:
        import math

        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# Bloom filter
# ---------------------------------------------------------------------------

_BLOOM_BITS_PER_WORD = 63  # avoid the sign bit: 1<<63 overflows DuckDB
                           # and wraps negative in Spark — 63 keeps every
                           # word a non-negative BIGINT on both engines


def bloom_sketch(
    df: DataFrame,
    key: str,
    num_hashes: int = 4,
    num_words: int = 64,
) -> DataFrame:
    """Bloom-filter bitmap of ``df[key]`` — ``(word INT, bits BIGINT)``,
    one row per non-zero 63-bit word (m = 63 * num_words bits total).

    The fourth member of the sketch family: where KMV/HLL answer "how
    many distinct" and CMS answers "how often", the Bloom bitmap
    answers MEMBERSHIP — "might this key be in that corpus?" with no
    false negatives.  Merge = word-wise ``bit_or`` (set union);
    :func:`bloom_contains` probes a collected sketch driver-side (e.g.
    ship a 64-row bitmap of yesterday's doc fingerprints to every
    ingest worker instead of a billion-row anti-join).

    Plan shape: hash -> (word, 1<<bit) projection replicated
    ``num_hashes``x by a literal-array explode, then ONE HashAggregate
    pair with map-side partial bit_or — every task's output is bounded
    at ``num_words`` rows regardless of input size (the CMS bound, for
    bitmaps).  False-positive rate follows the standard
    ``(1 - e^{-kn/m})^k``; property-tested, not hash-gated (the BITMAP
    is the oracle-checked integer state).
    """
    if num_hashes < 1 or num_words < 1:
        raise ValueError(
            f"bloom_sketch: bad num_hashes={num_hashes} num_words={num_words}"
        )
    # no spread_for_cpu: sf0.1 A/B (round 6) measured 16% slower with it
    m = _BLOOM_BITS_PER_WORD * num_words
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    salted = F.concat(
        F.col(key).cast("string"), F.lit("!"), F.col("d").cast("string")
    )
    return (
        df.select(F.col(key))
        .select(F.explode(seeds).alias("d"), key)
        .select((md5_u60(salted) % m).alias("h"))
        .select(
            F.expr(f"h DIV {_BLOOM_BITS_PER_WORD}").cast("int").alias("word"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(h % {_BLOOM_BITS_PER_WORD} AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(b)").cast("bigint").alias("bits"))
    )


def bloom_contains(
    sketch_rows: list,
    value,
    num_hashes: int = 4,
    num_words: int = 64,
) -> bool:
    """Probe a collected Bloom bitmap for ``value`` — True means "maybe
    present" (false positives possible at the standard rate), False
    means DEFINITELY absent.  Reproduces the engine's md5-u60 hash in
    pure Python so a collected sketch is usable anywhere."""
    import hashlib

    words = {int(r["word"]): int(r["bits"]) for r in sketch_rows}
    m = _BLOOM_BITS_PER_WORD * num_words
    for d in range(num_hashes):
        h = int(
            hashlib.md5(f"{value}!{d}".encode()).hexdigest()[:15], 16
        ) % m
        if not (words.get(h // _BLOOM_BITS_PER_WORD, 0) >> (h % _BLOOM_BITS_PER_WORD)) & 1:
            return False
    return True


def bloom_probe(
    df: DataFrame,
    sketch: DataFrame,
    key: str,
    num_hashes: int = 4,
    num_words: int = 64,
) -> DataFrame:
    """DISTRIBUTED Bloom membership probe — ``(key, maybe_member
    BOOLEAN)`` for every distinct probe key: True = possibly in the
    sketched set (false positives at the standard rate), False =
    definitely absent.  The scale complement of
    :func:`bloom_contains` (which probes a COLLECTED bitmap
    driver-side): here the bitmap stays a DataFrame and the probe set
    can be billions of rows — the "filter the corpus against
    yesterday's fingerprints" prefilter in front of an exact
    anti-join, shrinking its build side by the true-negative rate.

    Plan shape: distinct probe keys fan out ``num_hashes``x (literal
    explode, same as the build), each (word, bit) lookup LEFT-joins
    the BROADCAST bitmap (num_words rows — always broadcast-sized by
    construction; a missing word is an unset bit), and one map-side
    combined ``min(bit)`` per key ANDs the probes back together.  The
    only full-width shuffle is the final per-key aggregate, carrying
    one flag per probe row.  Hash recipe and word layout are exactly
    the build's (md5-u60, 63-bit words), so no-false-negatives is
    structural."""
    if num_hashes < 1 or num_words < 1:
        raise ValueError(
            f"bloom_probe: bad num_hashes={num_hashes}"
            f" num_words={num_words}"
        )
    m = _BLOOM_BITS_PER_WORD * num_words
    seeds = F.array(*[F.lit(i) for i in range(num_hashes)])
    salted = F.concat(
        F.col(key).cast("string"), F.lit("!"), F.col("d").cast("string")
    )
    probes = (
        df.select(F.col(key)).distinct()
        .select(F.explode(seeds).alias("d"), key)
        .select(
            F.col(key),
            (md5_u60(salted) % m).alias("h"),
        )
        .select(
            F.col(key),
            F.expr(f"h DIV {_BLOOM_BITS_PER_WORD}")
            .cast("int")
            .alias("word"),
            F.expr(f"CAST(h % {_BLOOM_BITS_PER_WORD} AS INT)").alias(
                "bit"
            ),
        )
    )
    looked = probes.join(F.broadcast(sketch), "word", "left").select(
        F.col(key),
        F.expr(
            "CAST(shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit)"
            " & 1 AS INT)"
        ).alias("hit"),
    )
    return looked.groupBy(key).agg(
        (F.min("hit") == 1).alias("maybe_member")
    )


# ---------------------------------------------------------------------------
# Misra-Gries — deterministic heavy-hitter summary
# ---------------------------------------------------------------------------


def mg_summary(
    df: DataFrame,
    key: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Misra-Gries heavy-hitter summary of ``df[key]`` — at most ``k``
    rows ``(item STRING, count_lower BIGINT)`` with the classic
    DETERMINISTIC guarantees (Misra & Gries 1982; mergeability:
    Agarwal et al., PODS'12 "Mergeable Summaries"):

    - ``count_lower <= true_count`` for every emitted item (a certified
      LOWER bound — the dual of CMS, whose estimates only ever
      over-count), and
    - ``true_count - count_lower <= (n - sum(count_lower)) / (k+1)``,
      an error bound computable FROM THE SUMMARY ITSELF (n = total
      rows), so every emitted count self-certifies its precision and
      every item with true frequency above that bound is guaranteed
      present.  No hashing, no probability — the deterministic
      complement to :func:`cms_sketch`.

    Scale shape: one ``mapInPandas`` pass builds a k-bounded summary
    per partition — per Arrow batch a vectorized ``value_counts`` is
    folded into the running counter dict and decremented back to k
    entries (batch-fold IS the MG merge operation, so the per-batch
    work is dict-sized, never per-row Python).  The ``tasks x k``
    partial rows then merge with BUILT-IN ops: groupBy-sum, a
    row_number window over the (bounded, <= tasks*k rows) combined set,
    subtract the (k+1)-th largest combined count (the m-way MG merge —
    after subtraction at most k counts stay positive), filter.  Every
    stage's width is the SUMMARY size, not the data size.

    The summary's CONTENT in the decrement regime depends on partition
    layout (inherent to MG; the bounds above hold regardless — property
    -tested).  With ``k`` at least the number of distinct keys no
    decrement ever fires and the result is EXACTLY the per-key counts —
    the declared oracle query runs in that regime so the full machinery
    is hash-checked cross-engine.
    """
    if k < 1:
        raise ValueError(f"mg_summary: k must be >= 1, got {k}")
    kk = int(k)
    groups = list(group_cols or [])

    def _mg_partition(batches):
        import pandas as pd

        summaries: dict = {}

        def _fold(counts: dict, vc) -> None:
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > kk:
                # decrement to k entries: subtract the (k+1)-th largest
                # (the m-way merge step; at most k stay positive)
                thr = sorted(counts.values(), reverse=True)[kk]
                small = {i: c - thr for i, c in counts.items() if c > thr}
                counts.clear()
                counts.update(small)

        for pdf in batches:
            if groups:
                for gv, grp in pdf.groupby(groups, sort=False, dropna=False):
                    gv = gv if isinstance(gv, tuple) else (gv,)
                    _fold(
                        summaries.setdefault(gv, {}),
                        grp["item"].value_counts(),
                    )
            else:
                _fold(
                    summaries.setdefault((), {}),
                    pdf["item"].value_counts(),
                )
        rows = [
            (*gv, item, c)
            for gv, counts in summaries.items()
            for item, c in counts.items()
        ]
        yield pd.DataFrame(rows, columns=[*groups, "item", "c"])

    # NULL keys are excluded by contract (value_counts drops them; a
    # null heavy hitter is a data-quality finding, not a frequency one)
    gexprs = [df[g] for g in groups]
    schema_parts = [
        f"{g} {df.schema[g].dataType.simpleString()}" for g in groups
    ]
    partials = (
        df.select(*gexprs, F.col(key).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .mapInPandas(
            _mg_partition,
            schema=", ".join([*schema_parts, "item string", "c long"]),
        )
    )
    from kafka_dead_letter_analyzer_spark import cache_registry

    # comb feeds both the threshold contraction and the final subtract;
    # without the persist the full-scan MG partition pass (the
    # expensive upstream) would run twice — the triangle_counts rule
    comb = partials.groupBy(*groups, "item").agg(F.sum("c").alias("c"))
    comb = comb.persist()
    cache_registry.track(comb)
    return _mg_contract(comb, kk, groups)


def _mg_contract(comb: DataFrame, kk: int, groups: list[str]) -> DataFrame:
    """Subtract the per-group (k+1)-th largest combined count and keep
    the positive remainder — the m-way MG merge step over an
    already-bounded ``(*groups, item, c)`` contraction."""
    if groups:
        # per-group threshold: a rank window PARTITIONED on the groups
        # over the bounded per-group contraction — never a global sort
        w = Window.partitionBy(*groups).orderBy(F.desc("c"), F.col("item"))
        ranked = comb.withColumn("rn", F.row_number().over(w))
        thr = ranked.filter(F.col("rn") == kk + 1).select(
            *groups, F.col("c").alias("thr")
        )
        from kafka_dead_letter_analyzer_spark.operators.common import (
            null_safe_group_join,
        )

        # null-safe on the group key (round 9): keeps the NULL group
        return (
            null_safe_group_join(comb, thr, groups, how="left")
            .select(
                *groups,
                "item",
                (F.col("c") - F.coalesce("thr", F.lit(0)))
                .cast("bigint")
                .alias("count_lower"),
            )
            .filter(F.col("count_lower") > 0)
        )
    # global: (k+1)-th largest as a TakeOrdered contraction (each task
    # ships its local top k+1; no single-partition window, no global
    # sort) — min of the top k+1 rows, or 0 if fewer exist
    thr1 = (
        comb.orderBy(F.desc("c"), F.col("item"))
        .limit(kk + 1)
        .agg(
            F.expr(
                f"CASE WHEN count(1) >= {kk + 1} THEN min(c) "
                "ELSE CAST(0 AS BIGINT) END AS thr"
            )
        )
    )
    return (
        comb.crossJoin(F.broadcast(thr1))
        .select(
            "item",
            (F.col("c") - F.col("thr")).cast("bigint").alias("count_lower"),
        )
        .filter(F.col("count_lower") > 0)
    )


def mg_merge(
    summaries: DataFrame,
    k: int,
    group_cols: list[str] | None = None,
    item_col: str = "item",
    count_col: str = "count_lower",
) -> DataFrame:
    """Merge Misra-Gries summaries — e.g. roll per-day summaries up to
    one per remaining ``group_cols`` (or one global summary): sum the
    partial counts per item, then subtract the per-group (k+1)-th
    largest combined count (the m-way MG merge).  The self-certifying
    error bound SURVIVES merging: the decrement removes at least
    ``t*(k+1)`` mass, so the merged summary's own certificate
    ``(n - sum(counts))/(k+1)`` still dominates the accumulated error
    (Agarwal et al., PODS'12) — property-tested in
    tests/test_sketches.py."""
    if k < 1:
        raise ValueError(f"mg_merge: k must be >= 1, got {k}")
    groups = list(group_cols or [])
    comb = (
        summaries.select(
            *groups,
            F.col(item_col).alias("item"),
            F.col(count_col).alias("c"),
        )
        .groupBy(*groups, "item")
        .agg(F.sum("c").alias("c"))
    )
    return _mg_contract(comb, int(k), groups)


def ss_summary(
    df: DataFrame,
    key: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Space-Saving heavy-hitter summary of ``df[key]`` — at most ``k``
    rows ``(item STRING, count_upper BIGINT, err_upper BIGINT)`` per
    group, the UPPER-bound dual of :func:`mg_summary` (Metwally,
    Agrawal & El Abbadi, ICDT'05 "Efficient computation of frequent and
    top-k elements in data streams"; merge rule per Agarwal et al.,
    PODS'12 "Mergeable Summaries"):

    - ``count_upper >= true_count`` for every emitted item (a certified
      UPPER bound — MG certifies lower bounds, CMS over-counts only
      probabilistically; Space-Saving over-counts deterministically and
      carries the slack), and
    - ``count_upper - err_upper <= true_count``, so each row brackets
      its item's true frequency from BOTH sides using only its own two
      integers.

    Algorithm per partition (one ``mapInPandas`` pass, k-bounded
    state): maintain k counters ``(count, err)``; a batch's
    ``value_counts`` folds item-at-a-time over the DICT-sized batch
    summary (never per input row) in a deterministic ``(-count, item)``
    order; an unseen item evicts the minimum counter ``m`` and enters
    as ``(m + c, m)`` — the classic stream-summary replacement.  Each
    partition also emits its residual ``r_p`` (its minimum count if the
    summary is full, else 0): the upper bound on ANY absent item's
    count in that partition.

    Merge with BUILT-IN ops only: per item, present partitions
    contribute their ``(count, err)`` sums and each absent partition
    contributes ``r_p`` to both — computed as ``sum(count) +
    (total_residual - sum(r_p over present partitions))`` without
    enumerating absences.  The merged set then contracts to the k
    largest by ``count_upper`` (dropping a row never weakens the
    retained rows' bounds).  Every post-scan stage's width is the
    summary size (``tasks x (k+1)`` rows), not the data size.

    Like MG, the summary CONTENT in the eviction regime depends on
    partition layout (inherent; the bounds hold regardless —
    property-tested in tests/test_sketches.py).  With ``k`` at least
    the per-partition distinct count no eviction fires, every residual
    is 0, ``err_upper = 0``, and the result is EXACTLY the top-k
    per-key counts — the declared oracle query runs in that regime so
    the full machinery is hash-checked cross-engine.
    """
    if k < 1:
        raise ValueError(f"ss_summary: k must be >= 1, got {k}")
    kk = int(k)
    groups = list(group_cols or [])

    def _ss_partition(batches):
        import pandas as pd

        summaries: dict = {}

        def _fold(state: dict, vc) -> None:
            # deterministic fold order: largest batch-count first, item
            # as tie-break — partition content fixes the outcome
            for item, c in sorted(vc.items(), key=lambda t: (-t[1], t[0])):
                c = int(c)
                if item in state:
                    cnt, err = state[item]
                    state[item] = (cnt + c, err)
                elif len(state) < kk:
                    state[item] = (c, 0)
                else:
                    victim = min(
                        state.items(), key=lambda t: (t[1][0], t[0])
                    )[0]
                    m = state[victim][0]
                    del state[victim]
                    state[item] = (m + c, m)

        for pdf in batches:
            if groups:
                for gv, grp in pdf.groupby(groups, sort=False, dropna=False):
                    gv = gv if isinstance(gv, tuple) else (gv,)
                    _fold(
                        summaries.setdefault(gv, {}),
                        grp["item"].value_counts(),
                    )
            else:
                _fold(
                    summaries.setdefault((), {}),
                    pdf["item"].value_counts(),
                )
        rows = []
        for gv, state in summaries.items():
            r_p = (
                min(cnt for cnt, _ in state.values())
                if len(state) >= kk
                else 0
            )
            for item, (cnt, err) in state.items():
                rows.append((*gv, item, cnt, err, r_p))
            # one residual marker per (group, partition-summary): item
            # NULL carries r_p into the total-residual aggregate
            rows.append((*gv, None, 0, 0, r_p))
        yield pd.DataFrame(
            rows, columns=[*groups, "item", "cnt", "err", "res"]
        )

    gexprs = [df[g] for g in groups]
    schema_parts = [
        f"{g} {df.schema[g].dataType.simpleString()}" for g in groups
    ]
    partials = (
        df.select(*gexprs, F.col(key).cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .mapInPandas(
            _ss_partition,
            schema=", ".join(
                [*schema_parts, "item string", "cnt long", "err long",
                 "res long"]
            ),
        )
    )
    from kafka_dead_letter_analyzer_spark import cache_registry

    # partials feeds both the total-residual aggregate and the per-item
    # merge — persist or the full-scan SS pass runs twice (mg_summary's
    # comb rule, one stage earlier because SS needs the marker split)
    partials = partials.persist()
    cache_registry.track(partials)

    total_res = (
        partials.filter(F.col("item").isNull())
        .groupBy(*groups)
        .agg(F.sum("res").alias("total_res"))
    )
    merged = (
        partials.filter(F.col("item").isNotNull())
        .groupBy(*groups, "item")
        .agg(
            F.sum("cnt").alias("c"),
            F.sum("err").alias("e"),
            F.sum("res").alias("rp"),
        )
    )
    if groups:
        joined = merged.join(F.broadcast(total_res), groups)
    else:
        joined = merged.crossJoin(F.broadcast(total_res))
    bounded = joined.select(
        *groups,
        "item",
        (F.col("c") + F.col("total_res") - F.col("rp"))
        .cast("bigint")
        .alias("count_upper"),
        (F.col("e") + F.col("total_res") - F.col("rp"))
        .cast("bigint")
        .alias("err_upper"),
    )
    if groups:
        # per-group top-k: rank window PARTITIONED on the groups over
        # the bounded (tasks x k per group) merged set — no global sort
        w = Window.partitionBy(*groups).orderBy(
            F.desc("count_upper"), F.col("item")
        )
        return (
            bounded.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= kk)
            .drop("rn")
        )
    # global: TakeOrdered contraction (each task ships its local top k)
    return bounded.orderBy(F.desc("count_upper"), F.col("item")).limit(kk)
