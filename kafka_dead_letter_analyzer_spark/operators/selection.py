"""DSIR-style data selection: hashed n-gram importance weights over a
document corpus (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling") — the standard way to slice a web-scale raw
corpus toward a small target distribution (a quality set, a domain)
without training a classifier: featurize both corpora into a BOUNDED
hashed n-gram space, fit two bag-of-buckets distributions, and weight
every raw document by its log importance ratio.

Three-layer design, the repo's eval-family discipline applied to
selection:

- :func:`hashed_ngram_counts` is the ORACLE-HASHABLE surface: per-doc
  hashed n-gram bucket counts as int64 — the feature extraction both
  distributions and the per-doc weights are built from.  The bucket
  hash has the simhash split: ``xxhash64`` is the cheap JVM scale
  default, ``md5`` (u32 hex-prefix, the NOTES.md md5-prefix trick) is
  the cross-engine-reproducible mode the declared oracle query uses.
- :func:`dsir_log_weights` is the RANKER SUBSTRATE: per-doc
  ``log w = sum_b cnt_b * (ln p_target(b) - ln p_raw(b))`` with
  Laplace-smoothed bucket probabilities.  ``ln`` is transcendental, so
  the declared query is rows-only with a from-scratch differential
  (the bm25_topk / ndcg precedent); the float sum runs in sorted
  bucket order (fixed summation order, partitioning-independent).
- :func:`dsir_select` is the SELECTION: top-k raw documents by weight
  via the shared salted two-phase top-k — no corpus-wide window.

100 TB shape: the raw corpus is scanned ONCE into the per-doc feature
contraction (persisted — it feeds both the raw distribution and the
per-doc weights; the bm25 doc_terms precedent), the target corpus is
small by contract (a curated set) and contracts to <= num_buckets
rows, and the log-ratio table is BOUNDED by num_buckets — it
broadcasts, so the per-doc weight join never shuffles the corpus side
beyond the one (doc, bucket) contraction.

No reference-repo counterpart — this is part of the LLM-pipeline
extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.text import (
    TYPICALITY_TOKEN_RE,
)

__all__ = [
    "dsir_log_weights",
    "dsir_resample",
    "dsir_select",
    "hashed_ngram_counts",
]


def _bucket_expr(g: Column, num_buckets: int, bucket_hash: str) -> Column:
    if bucket_hash == "xxhash64":
        return F.pmod(F.xxhash64(g), F.lit(num_buckets)).cast("int")
    if bucket_hash == "md5":
        # md5-u32 hex prefix: reproducible in DuckDB/Python from
        # md5(gram)[:8] (the sampling.py / md5_token_hash64 trick)
        u32 = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
        return F.pmod(u32, F.lit(num_buckets)).cast("int")
    raise ValueError(
        f"bucket_hash={bucket_hash!r} must be 'xxhash64' or 'md5'"
    )


def hashed_ngram_counts(
    docs: DataFrame,
    n_max: int = 2,
    num_buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """Per-document hashed n-gram counts —
    ``(id_col, bucket INT, cnt BIGINT)`` with one row per (doc,
    bucket) that has at least one feature: all 1..n_max-gram strings
    (tokens = lowercase alnum runs, TYPICALITY_TOKEN_RE, shared with
    the eval/retrieval families; grams joined by single spaces) hash
    into ``num_buckets`` buckets and their occurrences sum.  Bucket
    collisions are the POINT (feature hashing — Weinberger et al.
    2009): the space is fixed and bounded regardless of vocabulary,
    which is what makes the downstream distributions broadcastable.
    Documents with NULL id are excluded; NULL/empty text yields no
    rows (zero features carry no selection signal).

    Plan: one scan, the eval-family pre-explosion rebalance (AQE
    sizes partitions by pre-explosion BYTES, so a windowed/joined
    pair input would coalesce and serialize the ~n_max-x explosion),
    one Generate, ONE (doc, bucket) contraction — map-side combined,
    and the contraction's width is capped by min(doc grams,
    num_buckets) per doc."""
    if n_max < 1:
        raise ValueError(
            f"hashed_ngram_counts: n_max={n_max} must be >= 1"
        )
    if num_buckets < 1:
        raise ValueError(
            f"hashed_ngram_counts: num_buckets={num_buckets}"
            " must be >= 1"
        )
    from kafka_dead_letter_analyzer_spark.operators.io import (
        shuffle_partitions,
    )

    toks = (
        f"regexp_extract_all(lower(coalesce({text_col}, '')),"
        f" '{TYPICALITY_TOKEN_RE}', 0)"
    )

    def grams(n: int) -> str:
        return (
            f"CASE WHEN size(_t) >= {n} THEN"
            f" transform(sequence(1, size(_t) - {n - 1}),"
            f" i -> array_join(slice(_t, i, {n}), ' '))"
            " ELSE array() END"
        )

    base = docs.filter(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.expr(toks).alias("_t")
    )
    base = base.repartition(shuffle_partitions(docs.sparkSession), "_id")
    all_grams = ", ".join(grams(n) for n in range(1, n_max + 1))
    exploded = base.select(
        "_id",
        F.explode(F.expr(f"flatten(array({all_grams}))")).alias("_g"),
    )
    return (
        exploded.select(
            "_id",
            _bucket_expr(F.col("_g"), num_buckets, bucket_hash).alias(
                "bucket"
            ),
        )
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(F.col("_id").alias(id_col), "bucket", "cnt")
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame | None = None,
    n_max: int = 2,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    bucket_hash: str = "xxhash64",
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR log importance weights —
    ``(id_col, n_features BIGINT, log_weight DOUBLE)`` with
    ``log_weight = sum over buckets of cnt_b * (ln p_target(b) -
    ln p_raw(b))`` rounded to 6 places, where each corpus's bucket
    distribution is Laplace-smoothed over the FULL hashed space:
    ``p(b) = (c_b + alpha) / (C + alpha * num_buckets)`` — so a
    bucket unseen in the target still has finite (small) probability
    and the log ratio never diverges.  A higher weight means the
    document looks more like the target corpus than like the raw
    corpus average; importance RESAMPLING is then caller-side
    (:func:`dsir_select` for deterministic top-k, or the sampling.py
    weighted samplers for stochastic selection).

    Documents with zero features (NULL/empty text) are EXCLUDED —
    they carry no selection signal either way; route them through
    quality filters instead.  Determinism: the per-doc float sum
    runs in sorted bucket order via
    ``aggregate(array_sort(collect_list(struct(bucket, contrib))))``
    — fixed summation order, partitioning-independent; ``ln`` itself
    is libm-dependent cross-engine, which is why the declared query
    is rows-only with a from-scratch differential.

    Scale shape: the raw corpus featurizes ONCE into the (doc,
    bucket) contraction, which is PERSISTED (cache_registry-tracked
    — it feeds both the raw distribution and the per-doc weight join,
    and the two consumers prune different columns, so an unpersisted
    branch would re-scan and re-explode the corpus; the bm25
    doc_terms precedent).  Both bucket distributions and the fused
    log-ratio table are <= num_buckets rows — broadcast; the weight
    join adds NO shuffle beyond the feature contraction itself."""
    if not (float(alpha) > 0):
        raise ValueError(
            f"dsir_log_weights: alpha={alpha} must be > 0"
        )
    from kafka_dead_letter_analyzer_spark import cache_registry

    tcol = target_text_col or text_col
    feats = hashed_ngram_counts(
        docs,
        n_max=n_max,
        num_buckets=num_buckets,
        id_col=id_col,
        text_col=text_col,
        bucket_hash=bucket_hash,
    ).select(F.col(id_col).alias("_id"), "bucket", "cnt")
    feats = cache_registry.track(feats.persist())
    raw_dist = feats.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("_rc")
    )
    # the target needs no per-doc resolution — only its bucket
    # distribution.  Two sources for it:
    # * ``target_ids`` (the target is a SUBSET of ``docs``, named by
    #   id): derive it from the single persisted featurization — the
    #   per-doc counts summed over the subset equal the subset corpus's
    #   bucket counts exactly, so the whole second gram-explosion pass
    #   (and its hashing) disappears.  ``feats`` is already hash-
    #   partitioned by ``_id``, so the semi-join shuffles only the id
    #   set, and the (bucket) re-sum collapses map-side to
    #   <= num_buckets rows.  (Measured at sf0.1: the separate target
    #   featurization was +0.75 s of 2.6 — and single-task, see below.)
    # * ``target`` (arbitrary corpus): featurize it separately.  The
    #   synthetic id keeps one code path (the final distribution
    #   re-sums anyway) but must VARY per row: a constant id would make
    #   hashed_ngram_counts' pre-explosion rebalance hash every target
    #   row to one partition and run the explode+hash single-task
    #   (guide §2.5 synthetic-key skew); xxhash64 of the text spreads
    #   it, and collisions are harmless under the re-sum.
    if (target is None) == (target_ids is None):
        raise ValueError(
            "dsir_log_weights: pass exactly one of target / target_ids"
        )
    if target_ids is not None:
        tgt_dist = (
            feats.join(
                target_ids.select(
                    F.col(id_col).alias("_id")
                ).distinct(),
                "_id",
            )
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("bigint").alias("_tc"))
        )
    else:
        tgt_dist = (
            hashed_ngram_counts(
                target.select(
                    F.xxhash64(F.col(tcol)).alias("_tid"),
                    F.col(tcol).alias("_ttext"),
                ),
                n_max=n_max,
                num_buckets=num_buckets,
                id_col="_tid",
                text_col="_ttext",
                bucket_hash=bucket_hash,
            )
            .groupBy("bucket")
            .agg(F.sum("cnt").cast("bigint").alias("_tc"))
        )
    raw_tot = raw_dist.agg(
        F.coalesce(F.sum("_rc"), F.lit(0)).cast("bigint").alias("_rt")
    )
    tgt_tot = tgt_dist.agg(
        F.coalesce(F.sum("_tc"), F.lit(0)).cast("bigint").alias("_tt")
    )
    a = float(alpha)
    ab = a * num_buckets
    # every bucket a raw DOC can hit appears in raw_dist by
    # construction, so raw_dist LEFT-joined with the target
    # distribution covers the weight join's whole key space
    # (target-only buckets can never meet a document feature);
    # smoothing fills the gaps, and unlike a full outer this join
    # broadcasts (full outer cannot build a broadcast hash side)
    ratio = (
        raw_dist.join(F.broadcast(tgt_dist), "bucket", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(a))
                    / (F.col("_tt") + F.lit(ab))
                )
                - F.log(
                    (F.coalesce(F.col("_rc"), F.lit(0)) + F.lit(a))
                    / (F.col("_rt") + F.lit(ab))
                )
            ).alias("_lr"),
        )
    )
    per_bucket = feats.join(F.broadcast(ratio), "bucket").select(
        "_id",
        "bucket",
        "cnt",
        (F.col("cnt") * F.col("_lr")).alias("_c"),
    )
    return (
        per_bucket.groupBy("_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_features"),
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("bucket", F.col("_c")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["_c"],
            ).alias("_w"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_features",
            F.round("_w", 6).alias("log_weight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame | None,
    k: int,
    n_max: int = 2,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    bucket_hash: str = "xxhash64",
    n_salts: int | None = None,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """Deterministic DSIR selection: the ``k`` raw documents most like
    the target distribution — ``(id_col, rank INT, n_features BIGINT,
    log_weight DOUBLE)`` ordered by log_weight desc with ascending-id
    tiebreak.  The top-k runs the shared salted two-phase pattern
    (:func:`retrieval.salted_topk`): the candidate set is the WHOLE
    raw corpus, exactly the unbounded case a bare window would
    single-task.  Phase 1 spreads the corpus over ``n_salts`` bounded
    tasks; phase 2 IS one task, but over only the ``<= n_salts * k``
    salt-bucket survivors — O(n_salts * k) by construction, trivially
    small for default n_salts (shuffle partitions) and practical k —
    so "no corpus-wide window" means phase 2's single task is bounded
    by the salt arithmetic, never by corpus size.  (The paper's
    stochastic Gumbel-top-k resampling is :func:`dsir_resample`; this
    is the deterministic head used for fixed selection budgets.)"""
    if k < 1:
        raise ValueError(f"dsir_select: k={k} must be >= 1")
    from kafka_dead_letter_analyzer_spark.operators.retrieval import (
        salted_topk,
    )

    w = dsir_log_weights(
        docs,
        target,
        n_max=n_max,
        num_buckets=num_buckets,
        alpha=alpha,
        id_col=id_col,
        text_col=text_col,
        target_text_col=target_text_col,
        bucket_hash=bucket_hash,
        target_ids=target_ids,
    )
    return salted_topk(
        w,
        k,
        partition_by=[],
        order_by=[F.col("log_weight").desc(), F.col(id_col).asc()],
        salt_src=id_col,
        n_salts=n_salts,
    ).select(id_col, "rank", "n_features", "log_weight")


def dsir_resample(
    docs: DataFrame,
    target: DataFrame | None,
    k: int,
    n_max: int = 2,
    num_buckets: int = 8192,
    alpha: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    bucket_hash: str = "xxhash64",
    salt: str = "dsir",
    n_salts: int | None = None,
    target_ids: DataFrame | None = None,
) -> DataFrame:
    """STOCHASTIC DSIR selection — the paper's actual importance
    RESAMPLING step (Xie et al. 2023 §2: sample k documents without
    replacement with probability proportional to the importance
    weights), completing the family next to :func:`dsir_select`'s
    deterministic head.  Implemented as the Gumbel-top-k trick
    (Vieira 2014; Kool, van Hoof & Welling, ICML 2019): each doc
    draws ``g = -ln(-ln u)`` with ``u`` uniform in (0, 1) and the k
    largest ``log_weight + g`` are EXACTLY a weight-proportional
    sample without replacement from ``softmax(log_weight)`` — no
    rejection loop, no sequential pass, one ranking.

    The draw is DETERMINISTIC-seeded, the house md5-rank discipline
    (``sampling.hash_uniform_u32``): ``u = (md5_u32(id :salt) + 0.5)
    / 2^32`` — strictly inside (0, 1) so both logs are finite — so
    the sample is a pure function of (data, salt), reproducible under
    any partitioning, cluster size, or retry; change ``salt`` to
    redraw.  ``ln`` is libm-dependent cross-engine, so the declared
    query is rows-only with a from-scratch differential (the
    dsir_log_weights / bm25_topk precedent).

    Output: ``(id_col, rank INT, n_features BIGINT, log_weight
    DOUBLE, gumbel_key DOUBLE)`` — rank 1-based by gumbel key desc
    with ascending-id tiebreak; gumbel_key rounded to 6 places (the
    ranking uses the unrounded key).

    Scale shape: :func:`dsir_log_weights`'s single-featurization plan
    (ONE corpus scan, broadcast ratio table), then the shared salted
    two-phase top-k over the whole weighted corpus — phase 1 bounded
    per (salt) bucket, phase 2 one task over <= n_salts * k
    survivors, never a corpus-wide window."""
    if k < 1:
        raise ValueError(f"dsir_resample: k={k} must be >= 1")
    from kafka_dead_letter_analyzer_spark.operators.retrieval import (
        salted_topk,
    )
    from kafka_dead_letter_analyzer_spark.operators.sampling import (
        hash_uniform_u32,
    )

    w = dsir_log_weights(
        docs,
        target,
        n_max=n_max,
        num_buckets=num_buckets,
        alpha=alpha,
        id_col=id_col,
        text_col=text_col,
        target_text_col=target_text_col,
        bucket_hash=bucket_hash,
        target_ids=target_ids,
    )
    # u in (0,1) strictly: (u32 + 0.5) / 2^32 — both endpoints
    # excluded, so -ln(-ln u) is always finite
    u = (
        hash_uniform_u32(F.col(id_col), salt).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 32))
    gk = F.col("log_weight") - F.log(-F.log(u))
    ranked = salted_topk(
        w.withColumn("_gk", gk),
        k,
        partition_by=[],
        order_by=[F.col("_gk").desc(), F.col(id_col).asc()],
        salt_src=id_col,
        n_salts=n_salts,
    )
    return ranked.select(
        id_col,
        "rank",
        "n_features",
        "log_weight",
        F.round("_gk", 6).alias("gumbel_key"),
    )
