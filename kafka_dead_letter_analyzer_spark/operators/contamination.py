"""Benchmark-contamination detection: which corpus documents share
n-token grams with a held-out evaluation set.

The standard pre-training hygiene pass (n-gram decontamination, as in
GPT-3/PaLM/Llama data cards): any training document that contains an
n-gram (n~8..13 tokens) also present in a benchmark document is flagged
(and typically dropped or split). Shingling reuses the exact tokenizer
and gram semantics of the dedup family (operators/dedup.py::_tokens /
token_shingles), so "contaminated" here is consistent with "duplicate"
there.

Scale shape: the benchmark side is by definition tiny relative to the
corpus (thousands of eval documents vs billions of training docs), so
its distinct-gram set is BROADCAST — the corpus side streams through a
map-side hash join with no shuffle of corpus grams; only the per-doc
match counts aggregate (doc_id-keyed partial agg). If the benchmark
outgrows broadcast range, pass ``broadcast_benchmark=False`` for a
plain shuffled equi-join on the gram string (or pre-hash grams to int64
with xxhash64 to shrink the shuffle — see shingle_hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.dedup import token_shingles


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per corpus document: how many of its distinct n-token grams also
    appear anywhere in the benchmark set. Emits only contaminated docs
    (shared_ngrams >= 1); a left-anti join against this result is the
    decontaminated corpus."""
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

    # shingling is CPU-per-row heavy: spread a narrow input across cores
    # first (no-op when the corpus scan is already wide — the 100 TB case)
    c = spread_for_cpu(corpus).select(
        id_col, F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    )
    b = benchmark.select(
        F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    if broadcast_benchmark:
        b = F.broadcast(b)
    return (
        c.join(b, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


def ngram_overlap_prefiltered(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    num_hashes: int = 4,
    num_words: int | None = None,
    target_fp: float = 0.01,
    max_words: int = 1 << 22,
    saturation_bound: float | None = 0.5,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """:func:`ngram_overlap` with a Bloom PREFILTER in front of the
    exact join — BYTE-IDENTICAL output (the filter has no false
    negatives; its false positives are removed by the exact join that
    follows), which the declared query pins by passing the same
    DuckDB oracle as the unfiltered operator.

    Why it exists at 100 TB: when the benchmark's distinct gram set
    outgrows the broadcast threshold, the exact join becomes a
    shuffle join over EVERY corpus gram string.  The Bloom bitmap
    stays broadcast-sized no matter how many grams it absorbs
    (``num_words`` rows), so probing the corpus' DISTINCT grams
    against it first — one broadcast lookup join plus a semi join —
    cuts the expensive exact join's probe side to the benchmark-hit
    grams plus the Bloom FP rate, BEFORE any gram string shuffles.

    Bitmap sizing (the theilsen_trend pattern — probe, then refuse to
    run a silently-degenerate plan): ``num_words=None`` (default)
    COUNTS the benchmark's distinct grams (one tiny benchmark-side
    job; the gram set is persisted and reused by the sketch build and
    the exact join) and sizes the bitmap for ``target_fp`` via the
    standard ``m = -k*n / ln(1 - fp^(1/k))``, raising past
    ``max_words`` (2^22 words = 32 MB — comfortably broadcastable;
    beyond it, pass ``broadcast_benchmark=False`` and skip the
    prefilter).  An EXPLICIT ``num_words`` is validated against the
    same count: when the expected fill ``1 - e^{-kn/m}`` exceeds
    ``saturation_bound`` the prefilter would approach a no-op that
    still pays the probe (FP rate -> 1), so it RAISES with the
    auto-size hint instead of silently degrading.
    ``saturation_bound=None`` (r9 ADVICE opt-out) SKIPS the count job
    entirely when ``num_words`` is explicit — the fully-lazy path for
    callers who sized the bitmap themselves and would rather risk a
    saturated (correct-but-useless) prefilter than pay a
    construction-time benchmark scan.

    Plan (optimization r14, guide §3/§6): ONE corpus gram pass, zero
    corpus-gram shuffles before the final per-doc count.  Each gram
    instance probes the broadcast bitmap with ``num_hashes`` INLINE
    left joins (a word lookup each, no row fan-out), filtering after
    every lookup so a miss on hash d short-circuits the remaining
    hash evaluations (a true-negative gram evaluates ~1/(1-fill)
    hashes, not k).  The earlier shape — distinct-gram
    ``bloom_probe`` (shuffle over corpus gram strings) + left-semi
    prune against a SECOND expansion of the corpus gram explode —
    paid two corpus-gram shuffles and re-shingled the corpus twice;
    measured 0.75x after the rewrite at sf0.1, and at scale the map-
    only shape is the one that survives a benchmark near the
    broadcast bound.  The bloom family here is ``xxhash64(sh, d)``
    (codegen) rather than the sketch module's md5-u60: the bitmap is
    INTERNAL to this operator (build and probe share the family; the
    exact join downstream is what the oracle checks), so the cheaper
    hash changes nothing observable."""
    import math

    from kafka_dead_letter_analyzer_spark import cache_registry
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        _BLOOM_BITS_PER_WORD,
    )

    if not (0.0 < target_fp < 1.0):
        raise ValueError(
            f"ngram_overlap_prefiltered: target_fp={target_fp} must be"
            " in (0, 1)"
        )
    if saturation_bound is not None and not (0.0 < saturation_bound <= 1.0):
        raise ValueError(
            "ngram_overlap_prefiltered:"
            f" saturation_bound={saturation_bound} must be in (0, 1]"
            " or None (skip validation)"
        )
    c = spread_for_cpu(corpus).select(
        id_col, F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    )
    b = benchmark.select(
        F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    # the gram set feeds the sizing count, the sketch build, and the
    # exact join — persist or the benchmark shingles three times
    b = b.persist()
    cache_registry.track(b)
    k = int(num_hashes)
    if num_words is not None and saturation_bound is None:
        n_grams = None  # fully-lazy opt-out: no construction-time job
    else:
        n_grams = b.count()
    if num_words is None:
        if n_grams == 0:
            num_words = 1
        else:
            bits = -k * n_grams / math.log(1.0 - target_fp ** (1.0 / k))
            num_words = max(
                1, int(math.ceil(bits / _BLOOM_BITS_PER_WORD))
            )
        if num_words > max_words:
            raise ValueError(
                f"ngram_overlap_prefiltered: {n_grams} benchmark grams"
                f" need {num_words} bitmap words for"
                f" target_fp={target_fp} (> max_words={max_words},"
                " the broadcast-safety bound); raise max_words, relax"
                " target_fp, or skip the prefilter"
                " (broadcast_benchmark=False + ngram_overlap)"
            )
    elif n_grams is not None:
        m = _BLOOM_BITS_PER_WORD * int(num_words)
        fill = 1.0 - math.exp(-k * n_grams / m)
        if fill > saturation_bound:
            raise ValueError(
                f"ngram_overlap_prefiltered: num_words={num_words}"
                f" saturates on {n_grams} benchmark grams (expected"
                f" fill {fill:.3f} > {saturation_bound}) — the"
                " prefilter would pass ~everything while still paying"
                " the probe; pass num_words=None to auto-size for"
                f" target_fp={target_fp}"
            )
    m = _BLOOM_BITS_PER_WORD * int(num_words)
    seeds = F.array(*[F.lit(i) for i in range(k)])
    sk = (
        b.select(F.explode(seeds).alias("d"), "sh")
        .select(F.pmod(F.xxhash64("sh", "d"), F.lit(m)).alias("h"))
        .select(
            F.expr(f"CAST(h DIV {_BLOOM_BITS_PER_WORD} AS INT)").alias(
                "word"
            ),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(h % {_BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("bword"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bword)").cast("bigint").alias("bits"))
    )
    # the bitmap feeds k lookup joins below; unpersisted, Catalyst
    # re-expands the sketch build once per lookup
    sk = sk.persist()
    cache_registry.track(sk)
    pruned = c
    for d in range(k):
        pruned = (
            pruned.withColumn(
                f"_h{d}", F.pmod(F.xxhash64("sh", F.lit(d)), F.lit(m))
            )
            .withColumn(
                f"_w{d}",
                F.expr(f"CAST(_h{d} DIV {_BLOOM_BITS_PER_WORD} AS INT)"),
            )
            .withColumn(
                f"_b{d}",
                F.expr(f"CAST(_h{d} % {_BLOOM_BITS_PER_WORD} AS INT)"),
            )
            .join(
                F.broadcast(
                    sk.select(
                        F.col("word").alias(f"_skw{d}"),
                        F.col("bits").alias(f"_bits{d}"),
                    )
                ),
                F.col(f"_w{d}") == F.col(f"_skw{d}"),
                "left",
            )
            # filter IMMEDIATELY: a miss on hash d short-circuits the
            # remaining (k-1-d) hash evaluations for that gram instance
            .filter(
                F.expr(
                    f"CAST(shiftright(coalesce(_bits{d},"
                    f" CAST(0 AS BIGINT)), _b{d}) & 1 AS INT) = 1"
                )
            )
        )
    pruned = pruned.select(id_col, "sh")
    bb = F.broadcast(b) if broadcast_benchmark else b
    return (
        pruned.join(bb, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
