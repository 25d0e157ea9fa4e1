"""Temporal join/window operators: as-of join, session windows, range join.

The reference engine is a Kafka-Streams topology and has no temporal join
surface; these are the extension operators a training-data/event pipeline
needs (build brief: "as-of join, range join, hypertable rollup" as
operators Spark lacks natively). All three are expressed as compositions
of built-in DataFrame ops — no Python in the hot path — and each is
designed around ONE hash-partition shuffle so the plan survives a 100 TB
input:

- ``asof_join``: the classic union + running-``last(ignorenulls)`` window
  dialect. Both sides are unioned into one relation, hash-partitioned by
  key ONCE, sorted by (ts, side-tag), and each left row picks up the most
  recent right payload with ``last(_rpayload, ignorenulls=True)`` over
  ``rowsBetween(unboundedPreceding, currentRow)``. Cost at scale: one
  Exchange + one in-partition sort, identical to the cost of the
  aggregation Spark would plan for a plain ``groupBy`` — there is no
  per-row probe and no broadcast requirement on either side. DuckDB's
  ``ASOF JOIN`` is the oracle (queries.py). For hot keys whose events
  would overwhelm one window task, ``asof_join_sliced`` bounds task size
  by time-slicing (identical output, differential-tested).
- ``sessionize``: gaps-and-islands with window functions (lag -> boundary
  flag -> running sum). One shuffle on the session key; boundary
  comparisons are integer microsecond math so engines agree exactly.
- ``session_stats``: the same sessions via Spark's native
  ``F.session_window`` aggregation. A new session starts iff the gap
  EXCEEDS ``gap`` (an event landing exactly at the previous session's
  end merges); ``sessionize`` mirrors this inclusive boundary, so the
  two paths agree row-for-row (pinned in tests/test_temporal.py).
- ``range_join_bucketed``: interval join (point ts IN [start, end]) as an
  equi-join on (key, time-bucket): intervals are exploded to the buckets
  they cover, the join is a plain hash join on (key, bucket), and the
  precise bound filter runs post-join. At scale this avoids the
  BroadcastNestedLoopJoin Spark plans for a bare range predicate; bucket
  width trades explode factor against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "asof_join",
    "asof_join_sliced",
    "sessionize",
    "session_stats",
    "range_join_bucketed",
    "event_transitions",
    "state_history",
    "series_similarity_topk",
    "funnel_steps",
]


def _asof_check_columns(
    opname: str, left: DataFrame, right: DataFrame, on: str, right_ts: str
) -> tuple[list[str], list[str], None]:
    """Shared column validation: no non-key overlap, and the generated
    output column ``asof_ts`` must not collide with either input (a left
    ``asof_ts`` — e.g. from a previous as-of join — would emit two
    same-named columns; a right one would make ``_picked.asof_ts``
    ambiguous). Rename before chaining."""
    lcols = left.columns
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    clash = set(rcols) & set(lcols)
    if clash:
        raise ValueError(f"{opname}: overlapping non-key columns {sorted(clash)}")
    if "asof_ts" in lcols or "asof_ts" in rcols:
        raise ValueError(
            f"{opname}: 'asof_ts' is the reserved output column — rename it "
            "on the input (e.g. from a previous as-of join) before joining"
        )
    return lcols, rcols, None


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (ties at equal
    timestamps match, like DuckDB/kdb as-of semantics).

    ``tolerance_us`` bounds the lookback: a match older than
    ``tolerance_us`` microseconds is treated as no match (pandas
    ``merge_asof(tolerance=...)`` semantics) — for joins against feeds
    that go stale, e.g. a quote older than a second is not a quote.

    Right rows must be unique per (key, ts) — with duplicates the winner
    is unspecified (same caveat as DuckDB's ASOF JOIN).

    Output: all left columns plus every non-key right column (right's ts
    surfaced as ``asof_ts``). ``how='inner'`` drops unmatched left rows.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join: how must be 'left' or 'inner', got {how!r}")
    lcols, rcols, _ = _asof_check_columns("asof_join", left, right, on, right_ts)

    # one relation, one shuffle: (key, ts, tag, left-payload, right-payload)
    lpay = F.struct(*[F.col(c) for c in lcols]).alias("_lpay")
    rpay = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in rcols]
    ).alias("_rpay")
    lpay_t = left.select(lpay).schema[0].dataType.simpleString()
    rpay_t = right.select(rpay).schema[0].dataType.simpleString()
    l2 = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        lpay,
        F.lit(None).cast(rpay_t).alias("_rpay"),
    )
    r2 = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(lpay_t).alias("_lpay"),
        rpay,
    )
    # right (tag 0) sorts before left (tag 1) at equal ts => ties match
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        l2.unionByName(r2)
        .withColumn("_picked", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_picked.asof_ts"))
        ) <= int(tolerance_us)
        joined = joined.withColumn(
            "_picked", F.when(fresh, F.col("_picked"))
        )
    if how == "inner":
        joined = joined.filter(F.col("_picked").isNotNull())
    return joined.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols],
        F.col("_picked.asof_ts").alias("asof_ts"),
        *[F.col(f"_picked.{c}").alias(c) for c in rcols],
    )


def _gap_boundary(ts_col: str, key_cols: list[str], order_cols: list[str], gap_us: int) -> Column:
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    prev = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    # inclusive boundary: F.session_window merges an event landing exactly
    # at the previous session's end (gap == `gap`), so a new session
    # starts only when the gap EXCEEDS `gap` (verified empirically in
    # tests/test_temporal.py::test_session_stats_matches_sessionize)
    return F.when(
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - prev) > gap_us), 1
    ).otherwise(0)


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key session index (1-based, in time order) to every
    row: a new session starts when the gap since the previous row EXCEEDS
    ``gap_us`` microseconds (F.session_window's inclusive boundary).
    Integer microsecond math -> bit-identical to the DuckDB
    gaps-and-islands oracle. One shuffle on ``key``; the two stacked
    windows share a single partitioning + sort."""
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    boundary = _gap_boundary(ts_col, [key], order, gap_us)
    wrun = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("session_idx", F.sum(boundary).over(wrun))


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Per-session aggregates via Spark's NATIVE session-window aggregation
    (``F.session_window``): one partial-aggregating shuffle, no row-level
    window sort — this is the form to prefer at scale and the one the
    streaming engine shares. Emits (key, session_start, session_end,
    n_events) where start/end are the min/max event timestamps."""
    gap_expr = f"INTERVAL {gap_us} MICROSECOND"
    return (
        df.groupBy(key, F.session_window(F.col(ts_col), gap_expr).alias("_w"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("_w")
    )


def range_join_bucketed(
    left: DataFrame,
    intervals: DataFrame,
    on: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_us: int = 3_600 * 1_000_000,
) -> DataFrame:
    """Join point rows to the intervals containing them
    (``start <= ts <= end``, same key) as an EQUI-join.

    Intervals explode to every ``bucket_us``-wide time bucket they touch;
    points map to their single bucket; the join key is (key, bucket) and
    the exact bound check is a post-join filter. Catalyst plans a plain
    hash join (shuffled or broadcast) instead of the
    BroadcastNestedLoopJoin it would use for a bare range predicate —
    the difference between O(|L|·|R|) compares and O(|L| + |R|·spread)
    at 100 TB. Inner-join semantics; a point in k overlapping intervals
    yields k rows.
    """
    lb = left.withColumn(
        "_bucket", (F.unix_micros(F.col(ts_col)) / bucket_us).cast("long")
    )
    ib = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_micros(F.col(start_col)) / bucket_us).cast("long"),
                (F.unix_micros(F.col(end_col)) / bucket_us).cast("long"),
            )
        ),
    )
    cond = (
        (lb[on] == ib[on])
        & (lb["_bucket"] == ib["_bucket"])
        & (lb[ts_col] >= ib[start_col])
        & (lb[ts_col] <= ib[end_col])
    )
    out = lb.join(ib, cond, "inner")
    return out.select(
        *[lb[c] for c in left.columns],
        *[ib[c] for c in intervals.columns if c not in (on,)],
    )


def asof_join_sliced(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "left",
    tolerance_us: int | None = None,
    slice_us: int = 24 * 3_600 * 1_000_000,
) -> DataFrame:
    """:func:`asof_join` with bounded task size for HOT KEYS.

    The plain union dialect windows over ``partitionBy(key)`` — at 100 TB
    a hot key (one entity with billions of events) lands in ONE task. This
    variant additionally slices time into ``slice_us`` buckets:

    1. in-slice pick: the running ``last(ignorenulls)`` window runs per
       (key, slice) — task size is bounded by slice width, not key volume;
    2. carry-forward: per (key, slice), the latest right payload in the
       slice is aggregated (``max_by``, partial-aggregable), and a second
       window over the per-slice rows (|slices| rows per key, tiny) carries
       the latest payload from STRICTLY EARLIER slices;
    3. every left row takes ``coalesce(in-slice pick, carry)``.

    Output is identical to :func:`asof_join` (differential-tested); cost is
    two extra bounded shuffles — the price of skew immunity.
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join_sliced: how must be 'left'/'inner', got {how!r}")
    lcols, rcols, _ = _asof_check_columns(
        "asof_join_sliced", left, right, on, right_ts
    )

    lpay = F.struct(*[F.col(c) for c in lcols]).alias("_lpay")
    rpay = F.struct(
        F.col(right_ts).alias("asof_ts"), *[F.col(c) for c in rcols]
    ).alias("_rpay")
    lpay_t = left.select(lpay).schema[0].dataType.simpleString()
    rpay_t = right.select(rpay).schema[0].dataType.simpleString()
    sl = (F.unix_micros(F.col("_ts")) / int(slice_us)).cast("long").alias("_slice")
    l2 = left.select(
        F.col(on).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"), lpay, F.lit(None).cast(rpay_t).alias("_rpay"),
    ).withColumn("_slice", sl)
    r2 = right.select(
        F.col(on).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"), F.lit(None).cast(lpay_t).alias("_lpay"), rpay,
    ).withColumn("_slice", sl)
    u = l2.unionByName(r2)

    w_in = (
        Window.partitionBy("_k", "_slice")
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked_in = u.withColumn("_pick", F.last("_rpay", ignorenulls=True).over(w_in))

    # latest right payload per (key, slice); carried into LATER slices
    slice_last = (
        u.filter(F.col("_tag") == 0)
        .groupBy("_k", "_slice")
        .agg(F.max_by("_rpay", "_ts").alias("_slice_pick"))
    )
    all_slices = u.select("_k", "_slice").distinct()
    w_carry = (
        Window.partitionBy("_k")
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        all_slices.join(slice_last, ["_k", "_slice"], "left")
        .withColumn("_carry", F.last("_slice_pick", ignorenulls=True).over(w_carry))
        .select("_k", "_slice", "_carry")
    )

    joined = (
        picked_in.filter(F.col("_tag") == 1)
        .join(carry, ["_k", "_slice"], "left")
        .withColumn("_picked", F.coalesce(F.col("_pick"), F.col("_carry")))
    )
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col("_ts"))
            - F.unix_micros(F.col("_picked.asof_ts"))
        ) <= int(tolerance_us)
        joined = joined.withColumn("_picked", F.when(fresh, F.col("_picked")))
    if how == "inner":
        joined = joined.filter(F.col("_picked").isNotNull())
    return joined.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in lcols],
        F.col("_picked.asof_ts").alias("asof_ts"),
        *[F.col(f"_picked.{c}").alias(c) for c in rcols],
    )


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """First-order transition counts over per-key event sequences: for
    each consecutive (state -> next_state) step in (ts, tiebreak) order,
    the global count — the Markov transition matrix a behavioral model
    or anomaly detector starts from.

    Plan: one per-key window (lead) + one map-side-combined count
    shuffle on the (from, to) pair — the window and the groupBy key
    differ, so two Exchanges is the floor for this computation."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    steps = events.select(
        F.col(state_col).alias("from_state"),
        F.lead(state_col).over(w).alias("to_state"),
    ).filter(F.col("to_state").isNotNull())
    return steps.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


def state_history(
    events: DataFrame,
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """SCD2-style validity compaction of a change stream: consecutive
    equal states per key collapse into one row with a [valid_from,
    valid_to) interval; the current state's valid_to is NULL. The
    standard change-log -> dimension-history materialization.

    Plan: one per-key ordered window computes the change flags AND the
    run ids (running sum over the same spec — no second Exchange); the
    run groupBy and the interval lead reuse the key partitioning."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    flagged = events.select(
        F.col(key).alias(key),
        F.col(state_col).alias(state_col),
        F.col(ts_col).alias(ts_col),
        F.col(tiebreak).alias(tiebreak),  # the running sum re-sorts on it
        F.when(
            F.lag(state_col).over(w).isNull()
            | (F.lag(state_col).over(w) != F.col(state_col)),
            1,
        )
        .otherwise(0)
        .alias("_brk"),
    )
    runs = flagged.withColumn(
        "_run",
        F.sum("_brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = runs.groupBy(key, "_run").agg(
        F.min(state_col).alias(state_col),
        F.min(ts_col).alias("_from"),
    )
    w2 = Window.partitionBy(key).orderBy("_run")
    return spans.select(
        key,
        F.col("_run").cast("int").alias("run_idx"),
        state_col,
        F.col("_from").alias("_from"),
        F.lead("_from").over(w2).alias("_to"),
    )


def series_similarity_topk(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    k: int = 3,
    strategy: str = "auto",
    dense_budget_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Time-series similarity search over per-key daily activity series
    (the distributed-systems streaming-similarity problem, EDBT 2019
    "Time Series Similarity Search for Streaming Data" recast for batch):
    for each key, the k nearest OTHER keys by squared euclidean distance
    between daily event-count vectors, among keys sharing at least one
    active day. All arithmetic is int64 — bit-exact on any engine.

    Two physical strategies behind one contract (identical output,
    differential-tested), selected by a bounded probe under ``auto``
    (the default): one aggregation collects exactly THREE longs —
    min day, max day, distinct-key count — and dense is chosen only
    when the dense matrix footprint ``|keys| * day_span * 8 bytes``
    fits ``dense_budget_bytes`` (default 256 MB). A single outlier
    timestamp (one epoch-zero row in a 2026 corpus) inflates the day
    span to ~20k and flips the probe to sparse instead of OOMing the
    driver; a 100x key corpus does the same. Explicit
    ``strategy="dense"`` over budget raises rather than materializes
    (fail-fast beats a driver OOM).

    - ``dense``: per-key dense count vector over the global
      day range (map lookup + transform, codegen), self-compared via a
      BROADCAST nested-loop with ``zip_with``/``aggregate`` dot
      products — NO pair rows ever shuffle; the only exchanges are the
      (key, day) contraction and the final rank window. Right for the
      common monitoring corpus: bounded day range, key set that fits a
      broadcast (~100 B x |keys|). Measured 23 s -> ~1 s at bench scale
      vs the sparse path on a dense corpus.
    - ``sparse``: inverted index on the day — dist2 = n_u + n_v - 2*dot
      with dots from a salted day-keyed self-join of (key, day, count)
      triples. Right when activity is SPARSE (most keys touch few days)
      and the key set exceeds broadcast; on dense corpora the day join
      materializes sum(users_per_day^2) rows (measured 53M rows / 30
      days at bench scale — the motivation for ``dense``).

    Keys with no co-active partner emit nothing under BOTH strategies
    (the dense path filters dot > 0) — the standard candidate
    restriction of similarity search."""
    if strategy not in ("auto", "dense", "sparse"):
        raise ValueError(
            f"strategy must be auto|dense|sparse, got {strategy!r}"
        )
    day = F.expr(f"unix_micros({ts_col}) DIV 86400000000")
    cnt = (
        events.select(F.col(key).alias("k"), day.alias("d"))
        .groupBy("k", "d")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    if strategy != "sparse":
        # Bounded probe: one job, three longs to the driver. The dense
        # matrix the driver would build is |keys| x day_span int64s;
        # gate on that BEFORE any toPandas.
        d0, d1, nkeys = cnt.agg(
            F.min("d"), F.max("d"), F.count_distinct("k")
        ).first()
        span = 0 if d0 is None else int(d1) - int(d0) + 1
        footprint = int(nkeys) * span * 8
        if footprint > dense_budget_bytes:
            if strategy == "dense":
                raise ValueError(
                    f"series_similarity_topk dense matrix would be "
                    f"{footprint} bytes ({nkeys} keys x {span} days) > "
                    f"budget {dense_budget_bytes}; use strategy='sparse' "
                    f"or raise dense_budget_bytes"
                )
            strategy = "sparse"
        else:
            strategy = "dense"
    if strategy == "dense":
        bounds = cnt.agg(
            F.min("d").alias("_d0"), F.max("d").alias("_d1")
        )
        vec = (
            cnt.groupBy("k")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("d", "c"))
                ).alias("_m"),
            )
            .crossJoin(F.broadcast(bounds))
            .select(
                "k",
                F.expr(
                    "transform(sequence(_d0, _d1),"
                    " dd -> coalesce(element_at(_m, dd), 0L))"
                ).alias("v"),
            )
        )
        # The pair compute is a blocked int64 matmul: the b side (compact
        # (key, vector) table — ~8*(1+days) bytes per key) broadcasts to
        # every a-side task, which evaluates its chunk's distances with
        # numpy and emits only k rows per key. zip_with/aggregate lambdas
        # were measured 10x slower here (higher-order functions evaluate
        # per element, outside whole-stage codegen); no pair row ever
        # shuffles either way. Exact: products/sums stay in int64.
        import pandas as pd

        bpdf = vec.toPandas()  # bounded: probed against dense_budget_bytes
        spark = events.sparkSession
        bc = spark.sparkContext.broadcast(
            (bpdf["k"].to_numpy(), list(bpdf["v"]))
        )
        key_type = events.schema[key].dataType.simpleString()
        out_schema = f"ka {key_type}, kb {key_type}, dist2 bigint, rank int"

        def topk(batches):
            import numpy as np

            kb_arr, vb_list = bc.value
            B = np.stack([np.asarray(v, dtype=np.int64) for v in vb_list])
            nb = (B * B).sum(axis=1)
            # Arrow batches can be ~10k rows; an unchunked A @ B.T is a
            # |batch| x |keys| int64 block — gigabytes per task at 100x
            # keys (measured: OOM-killed the round-5 rehearsal JVM in
            # local mode). Chunk the A side so the live block stays
            # ~128 MB; answers are per-row, so chunking is exact.
            chunk = max(1, (128 << 20) // (max(1, len(kb_arr)) * 8))
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                A_all = np.stack(
                    [np.asarray(v, dtype=np.int64) for v in pdf["v"]]
                )
                ka_all = pdf["k"].to_numpy()
                rows_a, rows_b, rows_d, rows_r = [], [], [], []
                for c0 in range(0, len(ka_all), chunk):
                    A = A_all[c0:c0 + chunk]
                    ka_arr = ka_all[c0:c0 + chunk]
                    na = (A * A).sum(axis=1)
                    dot = A @ B.T
                    d2 = na[:, None] + nb[None, :] - 2 * dot
                    for i in range(len(ka_arr)):
                        cand = np.where(
                            (dot[i] > 0) & (kb_arr != ka_arr[i])
                        )[0]
                        if len(cand) == 0:
                            continue
                        order = cand[
                            np.lexsort((kb_arr[cand], d2[i, cand]))
                        ][:k]
                        for r, j in enumerate(order, start=1):
                            rows_a.append(ka_arr[i])
                            rows_b.append(kb_arr[j])
                            rows_d.append(d2[i, j])
                            rows_r.append(r)
                # key columns stay untyped (Arrow casts to the declared
                # schema) so string / int keys both round-trip
                yield pd.DataFrame(
                    {
                        "ka": pd.Series(rows_a),
                        "kb": pd.Series(rows_b),
                        "dist2": pd.array(rows_d, dtype="int64"),
                        "rank": pd.array(rows_r, dtype="int32"),
                    }
                )

        from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

        ranked = spread_for_cpu(vec).mapInPandas(topk, out_schema)
        return ranked.select(
            F.col("ka").alias(key),
            F.col("kb").alias("neighbor"),
            "dist2",
            F.col("rank").cast("int").alias("rank"),
        )
    else:
        norms = cnt.groupBy("k").agg(
            F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2")
        )
        a = cnt.select(F.col("k").alias("ka"), "d", F.col("c").alias("ca"))
        b = cnt.select(F.col("k").alias("kb"), "d", F.col("c").alias("cb"))
        # salt the low-cardinality day key so one day's pair fan-out
        # spreads across tasks instead of melting one
        from kafka_dead_letter_analyzer_spark.operators.joins import salted_join

        dots = (
            salted_join(a, b, key="d", salt_on="ka", salt_factor=32)
            .filter(F.col("ka") != F.col("kb"))
            .groupBy("ka", "kb")
            .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("dot"))
        )
        na = norms.select(F.col("k").alias("ka"), F.col("n2").alias("na"))
        nb = norms.select(F.col("k").alias("kb"), F.col("n2").alias("nb"))
        paired = (
            dots.join(na, "ka")
            .join(nb, "kb")
            .select(
                "ka", "kb",
                (F.col("na") + F.col("nb") - 2 * F.col("dot"))
                .cast("bigint")
                .alias("dist2"),
            )
        )
    w = Window.partitionBy("ka").orderBy("dist2", "kb")
    return (
        paired.select(
            "ka", "kb", "dist2", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= k)
        .select(
            F.col("ka").alias(key),
            F.col("kb").alias("neighbor"),
            "dist2",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def decay_weighted_counts(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str = "ts",
    half_life_days: int = 7,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Recency-weighted event pressure per group — ``(*group_cols,
    n_events BIGINT, weighted_pressure BIGINT)`` where each event
    contributes ``weight_scale DIV 2^(age_days DIV half_life_days)``
    and ``age_days`` is whole days behind the corpus max timestamp.

    The integer-exact exponential decay trick: true ``0.5^(age/h)``
    needs float ``pow`` (whose rounding differs across engines — the
    hash-gate killer), but STEPPED decay in exact powers of two —
    halve the weight once per full half-life elapsed — is pure integer
    arithmetic (``DIV``, shift) that any engine reproduces bit-for-bit
    while keeping the operational meaning (a 5-week-old error burst at
    h=7d weighs 1/32 of today's).  The shift exponent is capped (a
    >62-half-life age would overflow Java's wrapping ``shiftleft``;
    DuckDB would raise) — beyond the cap the weight is exactly 0.

    Dashboard use in the reference's own domain: plain A1 counts rank a
    long-dead error storm above a small active one; decay weighting is
    the standard fix, and the deterministic form keeps it inside the
    engine's oracle contract.

    Scale shape: one scan; the anchor (max ts) is a 1-row broadcast agg
    (no driver action, same idiom as the containment df-cap); weights
    are a per-row projection; one map-side-combined groupBy.
    """
    if half_life_days < 1:
        raise ValueError(
            f"decay_weighted_counts: half_life_days must be >= 1, got "
            f"{half_life_days}"
        )
    anchor = df.agg(F.max(F.unix_micros(F.col(ts_col))).alias("mx_us"))
    us_day = 86_400_000_000
    aged = df.crossJoin(F.broadcast(anchor)).withColumn(
        "_hl",
        F.expr(
            f"((mx_us - unix_micros({ts_col})) DIV {us_day})"
            f" DIV {half_life_days}"
        ),
    )
    # integer division throughout: a float "/" here would round-trip the
    # weight through double math — DIV + shiftleft keep it exact
    weight = F.when(F.col("_hl") > 62, F.lit(0).cast("bigint")).otherwise(
        F.expr(f"CAST({weight_scale} AS BIGINT) DIV shiftleft(CAST(1 AS BIGINT), CAST(_hl AS INT))")
    )
    return (
        aged.withColumn("_w", weight)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("_w").cast("bigint").alias("weighted_pressure"),
        )
    )


# strategy-probe threshold: when the steps' rows cover at most this
# fraction of the event table, the per-stage parquet-pushdown join
# chain reads k slivers instead of one big scan and wins; above it the
# single-scan window chain wins.  Monkeypatch target for tests (the
# spearman _TWO_PHASE_MIN_DISTINCT pattern).
_FUNNEL_SELECTIVE_MAX_FRAC = 0.2


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: how many keys reached step 1, then
    step 2 STRICTLY AFTER their step 1, then step 3 after that, ... —
    ``(step_idx BIGINT, step STRING, users BIGINT, conv_ppm BIGINT)``
    with ``conv_ppm = floor(users_i * 1e6 / users_1)`` via two-step
    long division (step 1 emits exactly 1e6; an empty funnel emits 0s).
    The classic behavioral query a dead-letter feed turns into "how
    many producers hit parse-error -> retry -> gave-up", and a training
    pipeline into acquisition funnels over event logs.

    Semantics: FIRST-TOUCH anchoring — each step's time is the
    EARLIEST event of that type strictly later than the previous
    step's anchor, and ``within_us`` additionally bounds each step to
    at most that many microseconds after the PREVIOUS anchor.  Without
    a time bound the greedy chain provably maximizes completion
    (earliest feasible anchors dominate), so the counts are the true
    "could complete" numbers.  WITH ``within_us`` this is the standard
    product-analytics first-touch convention, NOT a search over
    anchors: a user whose earliest step-1 event is stale but who would
    convert via a LATER step-1 event is counted as non-converting
    (view@0, view@100, click@150 with a 100-bound anchors at view@0
    and reports no click).  An exhaustive any-anchor funnel is a
    different, quadratic-per-key operator — if you need it, pre-filter
    the anchor step to the relevant recency window instead.  Ties at
    the exact same microsecond do not advance the funnel
    (strictly-after).

    Plan shape: ONE hash exchange on the key, then k chained
    UNORDERED window minima over it (each step's conditional min
    consumes the previous step's column; no orderBy, so no sort — the
    plan is exchange + k WindowExec + one per-key aggregate + a 1-row
    total), then a k-row stack.  Nothing in the plan scales with
    anything but the event count; per-key state is k longs.

    Strategy (``strategy``): the two physical plans for the same
    semantics are the WINDOW CHAIN (read the matching events once,
    one key exchange, k chained unordered window minima) and the JOIN
    CHAIN (``queries.py::x_event_funnel``'s shape: one fact scan PER
    STAGE with that stage's type predicate pushed to parquet, chained
    user-keyed equi-joins carrying the previous anchor — the
    ``within_us`` bound rides the post-join filter, no range join
    needed).  ``None`` (default) PROBES the data — one column-pruned
    partial-agg scan counting the steps' coverage of the table — and
    picks the join chain when coverage <= ``_FUNNEL_SELECTIVE_MAX_FRAC``
    (each pushdown scan reads a sliver of 100 TB, k slivers beat one
    60%-scan), the window chain otherwise (one scan beats k
    near-full scans); the spearman/auc probe pattern, and like them
    the probe job is the documented price of the scale-correct plan.
    The probe is EAGER: it runs a Spark job when ``funnel_steps`` is
    CALLED, not when the returned frame executes — batch-only, and
    skipped for streaming inputs (``events.isStreaming`` forces the
    window chain, the only shape with no pushdown to win back).
    ``'window'`` / ``'joins'`` force a side (the probe-free paths for
    callers that know their data).  Both strategies are
    differential-equal (tests/test_temporal.py) and keep one
    timestamp per (key, stage), never an event list."""
    if len(steps) < 2:
        raise ValueError("funnel_steps: need at least 2 steps")
    if within_us is not None and within_us <= 0:
        raise ValueError("funnel_steps: within_us must be positive")
    if strategy not in (None, "window", "joins"):
        raise ValueError(
            f"funnel_steps: unknown strategy {strategy!r}"
            " (None | 'window' | 'joins')"
        )
    k = len(steps)
    if strategy is None and events.isStreaming:
        # a streaming frame can neither run the probe (collect() on an
        # unbounded source throws) nor benefit from it (there is no
        # parquet pushdown to win back) — the single-pass window chain
        # is the only sensible shape; callers wanting the join chain
        # on a stream must say so explicitly
        strategy = "window"
    if strategy is None:
        # ONE partial-aggregated, column-pruned scan: total valid rows
        # and how many belong to any step — the coverage ratio decides
        # whether k pushdown slivers beat one combined scan.  CALLER
        # CONTRACT: this probe is an EAGER Spark job at DataFrame-
        # construction time (r9 ADVICE) — batch callers building plans
        # without executing them pay one column-pruned partial-agg
        # scan per call; pass strategy='window'/'joins' to stay lazy
        probe = events.filter(
            F.col(ts_col).isNotNull() & F.col(key).isNotNull()
        ).agg(
            F.count(F.lit(1)).alias("_tot"),
            F.sum(
                F.when(F.col(state_col).isin(list(steps)), 1).otherwise(0)
            ).alias("_hit"),
        ).collect()[0]
        tot, hit = probe["_tot"] or 0, probe["_hit"] or 0
        strategy = (
            "joins"
            if tot > 0 and hit <= _FUNNEL_SELECTIVE_MAX_FRAC * tot
            else "window"
        )
    if strategy == "joins":
        totals = _funnel_join_chain_totals(
            events, steps, key, state_col, ts_col, within_us
        )
        return _funnel_emit(totals, steps)
    ev = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(state_col).isin(list(steps))
        & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("k"),
        F.col(state_col).alias("st"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    w = Window.partitionBy("k").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cur = ev
    for i, s in enumerate(steps):
        if i == 0:
            cond = F.col("st") == s
        else:
            cond = (F.col("st") == s) & (
                F.col("us") > F.col(f"t{i - 1}")
            )
            if within_us is not None:
                cond = cond & (
                    F.col("us") <= F.col(f"t{i - 1}") + int(within_us)
                )
        cur = cur.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("us"))).over(w)
        )
    per_key = cur.groupBy("k").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(k)]
    )
    totals = per_key.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"u{i}")
            for i in range(k)
        ]
    )
    return _funnel_emit(totals, steps)


def _funnel_join_chain_totals(
    events: DataFrame,
    steps: list[str],
    key: str,
    state_col: str,
    ts_col: str,
    within_us: int | None,
) -> DataFrame:
    """Join-chain funnel totals — a 1-row (u0..u{k-1}) frame with the
    same first-touch semantics as the window chain: stage i's anchor
    is the earliest type-s_i event strictly after (and within
    ``within_us`` of) stage i-1's anchor.  Each stage is its own fact
    scan with the type equality pushed to parquet; every join and
    aggregate keys on the funnel key, so one partitioning threads the
    chain.  Stage frames persist (each feeds its own count AND the
    next stage's join; one (key, anchor) row per qualifying key)."""
    from kafka_dead_letter_analyzer_spark import cache_registry

    valid = events.filter(
        F.col(ts_col).isNotNull() & F.col(key).isNotNull()
    )
    prev: DataFrame | None = None
    counts = []
    for i, s in enumerate(steps):
        st = valid.filter(F.col(state_col) == s).select(
            F.col(key).alias("k"), F.unix_micros(F.col(ts_col)).alias("us")
        )
        if prev is not None:
            st = st.join(prev, "k").filter(F.col("us") > F.col("t"))
            if within_us is not None:
                st = st.filter(
                    F.col("us") <= F.col("t") + int(within_us)
                )
            st = st.drop("t")
        stage = st.groupBy("k").agg(F.min("us").alias("t"))
        if i < len(steps) - 1:
            stage = cache_registry.track(stage.persist())
        counts.append(
            stage.agg(
                F.count(F.lit(1)).cast("bigint").alias(f"u{i}")
            )
        )
        prev = stage
    totals = counts[0]
    for c in counts[1:]:
        # 1-row aggregates: broadcast cross joins by construction
        totals = totals.crossJoin(F.broadcast(c))
    return totals


def funnel_steps_any_anchor(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    within_us: int | None = None,
    max_events_per_key: int = 100_000,
    method: str = "window",
) -> DataFrame:
    """EXHAUSTIVE ordered-funnel conversion — ``(step_idx, step,
    users, conv_ppm)`` like :func:`funnel_steps`, but a key reaches
    step i if ANY chain of anchors does, not just the first-touch
    chain: step i's feasible anchors are every type-s_i event strictly
    after (and within ``within_us`` of) SOME feasible step-(i-1)
    anchor.  The variant for "would this user convert at all"
    audits: first-touch counts a user whose earliest anchor is stale
    as non-converting even when a later anchor chain completes
    (view@0, view@100, click@150 under a 100-bound converts HERE and
    not there).  Without ``within_us`` the two agree (the greedy
    earliest chain provably dominates unbounded) — this operator
    exists for the bounded case.

    ``method='window'`` (default) is the JVM-only LATEST-ANCHOR DP: a
    candidate t for step i is feasible iff SOME feasible step-(i-1)
    anchor lies in ``[t - W, t)``, and because every feasible anchor
    p satisfies ``p + W >= t  <=>  p >= t - W`` monotonically, the
    LATEST feasible anchor strictly before t decides it exactly — so
    feasibility chains through k ``max`` windows over
    ``rangeBetween(unboundedPreceding, -1)`` on the integer
    microsecond axis (range -1 = strictly earlier, the tie rule).
    ONE key exchange + one sort reused by all k windows; per-key
    state never materializes.  ``method='pandas'`` is the original
    sorted-array set-propagation sweep (``applyInPandas``) kept as an
    independently-derived reference — both are differential-equal to
    exhaustive DFS, and to each other, in tests.
    ``max_events_per_key`` applies to the pandas path only (its
    per-key event list materializes in one task; the kendall
    max_cells pattern).  Totals and ppm reuse the shared funnel
    tail."""
    import pandas as pd  # noqa: F401

    if len(steps) < 2:
        raise ValueError("funnel_steps_any_anchor: need at least 2 steps")
    if within_us is not None and within_us <= 0:
        raise ValueError(
            "funnel_steps_any_anchor: within_us must be positive"
        )
    if max_events_per_key < 1:
        raise ValueError(
            "funnel_steps_any_anchor: max_events_per_key must be >= 1"
        )
    if method not in ("window", "pandas"):
        raise ValueError(
            f"funnel_steps_any_anchor: unknown method {method!r}"
            " ('window' | 'pandas')"
        )
    k = len(steps)
    ev = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(state_col).isin(list(steps))
        & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("k"),
        F.col(state_col).alias("st"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    step_list = list(steps)
    cap = int(max_events_per_key)
    bound = None if within_us is None else int(within_us)

    if method == "window":
        w = (
            Window.partitionBy("k")
            .orderBy("us")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        cur = ev
        for i, s in enumerate(step_list):
            if i == 0:
                feas = F.col("st") == s
            else:
                feas = (F.col("st") == s) & F.col(f"m{i - 1}").isNotNull()
                if bound is not None:
                    feas = feas & (
                        F.col("us") <= F.col(f"m{i - 1}") + bound
                    )
            cur = cur.withColumn(f"f{i}", F.when(feas, F.col("us")))
            if i < k - 1:
                cur = cur.withColumn(f"m{i}", F.max(f"f{i}").over(w))
        per_key = cur.groupBy("k").agg(
            *[
                F.max(
                    F.when(F.col(f"f{i}").isNotNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias(f"r{i}")
                for i in range(k)
            ]
        )
        totals = per_key.agg(
            *[
                F.coalesce(F.sum(f"r{i}"), F.lit(0))
                .cast("bigint")
                .alias(f"u{i}")
                for i in range(k)
            ]
        )
        return _funnel_emit(totals, steps)

    def _reach(pdf):
        import numpy as np
        import pandas as pd

        if len(pdf) > cap:
            raise ValueError(
                "funnel_steps_any_anchor: a key has"
                f" {len(pdf)} step-typed events"
                f" (> max_events_per_key={cap}); pre-filter the anchor"
                " steps to the relevant recency window or raise the cap"
            )
        us = pdf["us"].to_numpy(dtype=np.int64)
        st = pdf["st"].to_numpy()
        feas = np.sort(us[st == step_list[0]])
        reached = [1 if len(feas) else 0]
        for s in step_list[1:]:
            if len(feas) == 0:
                reached.append(0)
                continue
            cand = np.sort(us[st == s])
            if bound is None:
                # unbounded: anything after the earliest feasible
                # anchor is feasible
                feas = cand[cand > feas[0]]
            else:
                # t is feasible iff some feasible t' lies in [t-W, t)
                lt = np.searchsorted(feas, cand, side="left")
                ge = np.searchsorted(feas, cand - bound, side="left")
                feas = cand[lt > ge]
            reached.append(1 if len(feas) else 0)
        return pd.DataFrame(
            [reached], columns=[f"r{i}" for i in range(k)]
        )

    schema = ", ".join(f"r{i} int" for i in range(k))
    flags = ev.groupBy("k").applyInPandas(_reach, schema=schema)
    totals = flags.agg(
        *[
            F.coalesce(F.sum(f"r{i}"), F.lit(0))
            .cast("bigint")
            .alias(f"u{i}")
            for i in range(k)
        ]
    )
    return _funnel_emit(totals, steps)


def _funnel_emit(totals: DataFrame, steps: list[str]) -> DataFrame:
    """Shared funnel tail: stack the 1-row (u0..u{k-1}) totals into
    ``(step_idx, step, users, conv_ppm)`` with two-step-division ppm
    vs step 1."""
    k = len(steps)

    def _sql_str(s: str) -> str:
        # step names are data, not SQL — escape for the literal
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    stack_args = ", ".join(
        f"CAST({i + 1} AS BIGINT), {_sql_str(s)}, u{i}"
        for i, s in enumerate(steps)
    )
    stacked = totals.selectExpr(
        f"stack({k}, {stack_args}) AS (step_idx, step, users)",
        "u0 AS base",
    )
    return stacked.select(
        "step_idx",
        "step",
        "users",
        F.expr(
            "CASE WHEN base = 0 THEN CAST(0 AS BIGINT) ELSE"
            " ((users * 1000) DIV base) * 1000"
            " + (((users * 1000) % base) * 1000) DIV base END"
        ).cast("bigint").alias("conv_ppm"),
    )


def funnel_steps_sessionized(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    gap_us: int = 30 * 60 * 1_000_000,
    within_us: int | None = None,
) -> DataFrame:
    """Session-scoped ordered funnel: :func:`funnel_steps`'s
    first-touch chain restarted per SESSION — a new session begins
    when the gap since the key's previous step event EXCEEDS
    ``gap_us`` (the :func:`sessionize` boundary), and each session
    runs its own funnel from scratch.  The counting unit is the
    (key, session) pair: ``(step_idx BIGINT, step STRING, sessions
    BIGINT, conv_ppm BIGINT)`` with ``conv_ppm`` vs step-1 sessions —
    the "how many VISITS converted" question, where
    :func:`funnel_steps` answers "how many users ever did".  A user
    who views in the morning and buys at night counts as two sessions
    (one converting at step 1 only, one... none — the purchase
    session never saw a view), which is exactly the behavioral
    distinction sessionization exists to make.

    SESSION SCOPE CONTRACT: sessions are defined over the funnel's
    OWN step events (rows whose ``state_col`` is in ``steps``, after
    null filtering) — an unrelated event type between two step events
    does NOT hold a session open.  If sessions must span other
    activity, sessionize upstream and call funnel_steps grouped by
    (key, session) instead.  ``within_us`` additionally bounds each
    step to that many microseconds after the previous anchor, WITHIN
    the session, exactly as in funnel_steps.

    Plan shape: ONE hash exchange on the key; the gaps-and-islands
    session index (lag + running sum, one (k, us) sort) and the k
    chained UNORDERED window minima over (k, sess) all reuse it —
    hash(k) already clusters (k, sess), so Catalyst inserts only a
    local re-sort, no second exchange (pinned in
    tests/test_plan_shapes.py).  Then one per-(key, session)
    aggregate and a 1-row total; per-session state is k longs.
    The streaming twin is
    ``streaming/engine.py::streaming_funnel_sessions`` (same
    semantics, emit-per-advance, differential-tested)."""
    if len(steps) < 2:
        raise ValueError("funnel_steps_sessionized: need at least 2 steps")
    if gap_us <= 0:
        raise ValueError("funnel_steps_sessionized: gap_us must be positive")
    if within_us is not None and within_us <= 0:
        raise ValueError(
            "funnel_steps_sessionized: within_us must be positive"
        )
    k = len(steps)
    ev = events.filter(
        F.col(ts_col).isNotNull()
        & F.col(state_col).isin(list(steps))
        & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("k"),
        F.col(state_col).alias("st"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    )
    # gaps-and-islands on integer microseconds (sessionize semantics:
    # boundary only when the gap EXCEEDS gap_us; ties share a session
    # regardless of lag order among equal us)
    wlag = Window.partitionBy("k").orderBy("us")
    boundary = F.when(
        F.lag("us").over(wlag).isNull()
        | ((F.col("us") - F.lag("us").over(wlag)) > int(gap_us)),
        1,
    ).otherwise(0)
    cur = ev.withColumn(
        "sess",
        F.sum(boundary).over(
            wlag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    wks = Window.partitionBy("k", "sess").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    for i, s in enumerate(steps):
        if i == 0:
            cond = F.col("st") == s
        else:
            cond = (F.col("st") == s) & (
                F.col("us") > F.col(f"t{i - 1}")
            )
            if within_us is not None:
                cond = cond & (
                    F.col("us") <= F.col(f"t{i - 1}") + int(within_us)
                )
        cur = cur.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("us"))).over(wks)
        )
    per_sess = cur.groupBy("k", "sess").agg(
        *[F.max(f"t{i}").alias(f"t{i}") for i in range(k)]
    )
    totals = per_sess.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias(f"u{i}")
            for i in range(k)
        ]
    )
    return _funnel_emit(totals, steps).withColumnRenamed(
        "users", "sessions"
    )
