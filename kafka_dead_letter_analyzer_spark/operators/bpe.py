"""Distributed BPE merge training — learn a byte-pair-encoding merge
list from a corpus, the tokenizer-training pass of an LLM data pipeline.

Each merge round is the textbook algorithm, distributed:
  1. count adjacent symbol pairs across the corpus — the shifted-slice
     arrays_zip pair fan-out (same vectorized shape as the co-occurrence
     operator) into ONE map-side-combined count shuffle;
  2. pick the most frequent pair — a 1-row driver collect (the bounded
     driver action per round, like connected components' convergence
     check);
  3. rewrite every document's symbol array, merging that pair — a pure
     per-row aggregate() fold (left-to-right, non-overlapping: "a a a"
     with merge (a,a) -> ["aa", "a"], matching the reference BPE
     semantics).

State across rounds lives in the symbol arrays; each round re-plans on
the previous round's frame with a localCheckpoint to truncate lineage
(N merges = N shuffles + N tiny collects — the iterative shape, like
graph.py's label propagation). For real vocab sizes (32k merges) run
rounds in batches against a persisted corpus sample; the per-round cost
is one combiner-collapsed count shuffle regardless of corpus size.

Tie-break: highest count, then lexicographic (left, right) — fully
deterministic, differential-tested against a from-scratch Python BPE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_apply", "bpe_pair_counts", "merge_pair_in_arrays"]


def _symbols(text):
    """Initial symbol arrays: whitespace tokens split to characters would
    be the byte-level variant; the word-level trainer (this one) merges
    whole tokens — swap the seeding to chars for byte-BPE."""
    from kafka_dead_letter_analyzer_spark.operators.dedup import _tokens

    return _tokens(text)


def bpe_pair_counts(symbols: DataFrame, col: str = "syms") -> DataFrame:
    """Adjacent-pair counts over all symbol arrays: one vectorized zip,
    one map-side-combined shuffle. Returns (left, right, n)."""
    s = F.col(col)
    n = F.greatest(F.size(s) - 1, F.lit(0))
    z = F.arrays_zip(F.slice(s, 1, n), F.slice(s, 2, n))
    pairs = symbols.select(F.explode(z).alias("p"))
    return pairs.groupBy(
        F.col("p").getField("0").alias("left"),
        F.col("p").getField("1").alias("right"),
    ).agg(F.count(F.lit(1)).alias("n"))


def merge_pair_in_arrays(col, left: str, right: str, merged: str):
    """Rewrite a symbol array, merging every non-overlapping (left,
    right) adjacency left-to-right — a pure aggregate() fold: carry the
    rewritten prefix and whether the previous element was consumed."""
    init = F.struct(
        F.array().cast("array<string>").alias("acc"),
        F.lit(False).alias("ate"),
    )

    def step(st, x):
        # try_element_at: plain element_at RAISES on the empty array
        # (Spark 4 invalid-index semantics); NULL is the wanted "no
        # previous element" signal here
        prev = F.try_element_at(st["acc"], F.lit(-1))
        can_merge = (
            (~st["ate"])
            & prev.isNotNull()
            & (prev == F.lit(left))
            & (x == F.lit(right))
        )
        replaced = F.concat(
            F.slice(st["acc"], 1, F.size(st["acc"]) - 1),
            F.array(F.lit(merged)),
        )
        return F.struct(
            F.when(can_merge, replaced)
            .otherwise(F.concat(st["acc"], F.array(x)))
            .alias("acc"),
            can_merge.alias("ate"),
        )

    return F.aggregate(col, init, step, lambda st: st["acc"])


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    list [(left, right, count)] in training order. Stops early when no
    pair reaches ``min_count``."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    syms = docs.select(_symbols(F.col(text_col)).alias("syms")).filter(
        F.size("syms") > 0
    )
    merges: list[tuple[str, str, int]] = []
    spark = docs.sparkSession
    # Two generations are live at any instant: the collect in round k
    # materializes checkpoint k (created in round k-1) — only THEN is
    # checkpoint k-1 (grand-prev) freeable. Freeing earlier would lose
    # data: a localCheckpoint has no lineage left to recompute from.
    cur_ids: set[int] = set()
    old_ids: set[int] = set()
    for _ in range(n_merges):
        top = (
            bpe_pair_counts(syms)
            .orderBy(F.col("n").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        _unpersist_rdd_ids(spark, old_ids)  # grand-prev: now truly unneeded
        if not top or top[0]["n"] < min_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["n"]
        merges.append((left, right, cnt))
        merged = f"{left} {right}"
        before = _persistent_rdd_ids(spark)
        syms = syms.select(
            merge_pair_in_arrays(F.col("syms"), left, right, merged).alias("syms")
        ).localCheckpoint(eager=False)
        # localCheckpoint registers its persist immediately (materialized
        # lazily), so the id diff identifies exactly this round's
        # checkpoint RDD — DataFrame.rdd would be a fresh javaToPython
        # wrapper that was never persisted (unpersisting it is a no-op).
        old_ids, cur_ids = cur_ids, _persistent_rdd_ids(spark) - before
    _unpersist_rdd_ids(spark, old_ids | cur_ids)
    return merges


def _persistent_rdd_ids(spark) -> set[int]:
    """ids of RDDs currently registered persistent in the JVM."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _unpersist_rdd_ids(spark, ids: set[int]) -> None:
    """Release the storage of specific persistent RDDs by id (the JVM-side
    handle — the only route to a localCheckpoint's blocks from PySpark)."""
    if not ids:
        return
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in ids:
            jrdd = jmap.get(rid)
            if jrdd is not None:
                jrdd.unpersist(False)
    except Exception:
        pass  # best-effort: storage pressure, never correctness


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_syms",
) -> DataFrame:
    """Encode documents with a learned merge list: apply every merge in
    training order (each a non-overlapping left-to-right rewrite — the
    exact semantics training used, so train->apply round-trips). Returns
    (id, out_col array<string>).

    Each merge is one aggregate() fold, composed as nested expressions —
    a pure projection, no shuffle and no state, so encoding streams
    through a scan at any corpus size. Expression depth grows with the
    merge count; beyond a few hundred merges move the loop into an
    Arrow-batched mapInPandas with the same per-row algorithm (the
    documented escape hatch — codegen compile time, not correctness,
    is the limit).
    """
    syms = _symbols(F.col(text_col))
    for m in merges:
        left, right = m[0], m[1]
        syms = merge_pair_in_arrays(syms, left, right, f"{left} {right}")
    return docs.select(id_col, syms.alias(out_col))
