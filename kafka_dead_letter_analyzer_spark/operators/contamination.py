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
    num_words: int = 4096,
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

    Plan: corpus grams -> distinct-gram bloom_probe (num_hashes-way
    fan-out against the broadcast bitmap) -> left-semi prune of the
    gram table (AQE broadcasts the surviving gram set when small) ->
    the original exact join + per-doc count."""
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu
    from kafka_dead_letter_analyzer_spark.operators.sketches import (
        bloom_probe,
        bloom_sketch,
    )

    c = spread_for_cpu(corpus).select(
        id_col, F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    )
    b = benchmark.select(
        F.explode(token_shingles(F.col(text_col), n)).alias("sh")
    ).distinct()
    sk = bloom_sketch(b, key="sh", num_hashes=num_hashes, num_words=num_words)
    maybe = bloom_probe(
        c.select("sh"), sk, key="sh",
        num_hashes=num_hashes, num_words=num_words,
    ).filter(F.col("maybe_member")).select("sh")
    pruned = c.join(maybe, "sh", "left_semi")
    bb = F.broadcast(b) if broadcast_benchmark else b
    return (
        pruned.join(bb, "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )
