"""BM25 retrieval over a document corpus — the training-data-pipeline
primitive for query-driven corpus slicing (pull the documents most
relevant to a topic probe), eval-set retrieval baselines, and RAG-style
candidate generation.

Two-layer design, the repo's eval-family discipline applied to IR:

- :func:`bm25_stats` is the ORACLE-HASHABLE surface: every quantity BM25
  needs — per-(query, doc, term) tf, per-term df, per-doc dl, corpus
  n_docs / sum_dl — as int64 counts, no float anywhere, so the whole
  retrieval substrate is cross-engine hash-exact (the bleu_stats
  pattern: integer sufficient statistics gated end-to-end, float steps
  caller-side).
- :func:`bm25_topk` is the RANKER: Lucene-variant BM25 scoring
  (``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, always positive) over
  those statistics with a deterministic-order float sum and a SALTED
  two-phase top-k.  The score is float (ln is transcendental — no
  integer-exact formulation exists), so the declared query is rows-only
  with a from-scratch differential test, the KLL/PCA/semdedup-clustered
  precedent.

100 TB shape (both): the query set is SMALL by contract (a probe list,
not a second corpus) — it broadcasts, and its vocabulary PRUNES the
exploded token stream BEFORE anything shuffles, so the one real exchange
is the (doc, term) contraction of matched terms only.  Corpus scalars
(n_docs, sum_dl) ride a broadcast 1-row cross join, never the driver.
The top-k never runs a corpus-wide window: phase 1 ranks within
(query, salt) buckets — bounded tasks even when a stopword query matches
every document — and phase 2 ranks the surviving ``n_salts * k`` rows
per query.

References: Robertson & Zaragoza 2009 (BM25 and beyond); the Lucene
idf variant (non-negative smoothing).  No reference-repo counterpart —
this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators.text import (
    TYPICALITY_TOKEN_RE,
)

__all__ = ["bm25_stats", "bm25_topk", "rrf_fuse", "retrieval_metrics"]


def _tokens(col: str) -> Column:
    return F.expr(
        f"regexp_extract_all(lower(coalesce({col}, '')),"
        f" '{TYPICALITY_TOKEN_RE}', 0)"
    )


def bm25_stats(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    corpus_stats: tuple | None = None,
) -> DataFrame:
    """Integer-exact BM25 sufficient statistics: one row per
    (query, doc, term) where the doc contains a query term —
    ``(query_id, doc_id, term STRING, tf BIGINT, df BIGINT, dl BIGINT,
    n_docs BIGINT, sum_dl BIGINT)``.  ``tf`` = the term's occurrences
    in the doc, ``df`` = number of docs containing the term
    (corpus-wide), ``dl`` = the doc's token count, ``n_docs`` /
    ``sum_dl`` = corpus size and total token count (``avgdl = sum_dl /
    n_docs`` stays a caller-side division, keeping the surface int64).
    Any idf/tf weighting — BM25, TF-IDF, plain counts — is a caller
    expression over these columns.  Query terms are DISTINCT per query
    (standard short-query BM25 ignores query-side tf); docs sharing no
    term with a query emit no row.  NULL ids/texts excluded on both
    sides; tokens are lowercase alnum runs (TYPICALITY_TOKEN_RE, shared
    with the eval family).

    Plan: tokenize docs once (dl computed BEFORE the explosion and
    carried), explode, broadcast-semi-prune against the query
    vocabulary, then ONE (doc, term) contraction of the matched stream
    — the only full-data exchange.  The contracted doc_terms is
    PERSISTED (cache_registry-tracked, released by the session owner —
    the e3/minhash precedent): its two consumers prune different
    columns, so ReusedExchange never fires and an unpersisted df
    branch re-scans and re-explodes the whole corpus (measured 3
    scans -> 2 with the persist; the persisted form is the COMPACT
    one — query-vocab terms only, one row per (doc, term)).  df
    contracts from it (tiny) and broadcasts back;
    (n_docs, sum_dl) is a 1-row global aggregate broadcast-cross-joined
    on.  The query side explodes client-small and broadcasts
    everywhere.  At 100 TB the unmatched tokens — almost everything —
    die between the scan and the first exchange.

    ``corpus_stats``: the (n_docs, sum_dl) scalars as precomputed
    ints.  By default they are computed here, which costs a SECOND
    scan+tokenize of the corpus (Spark re-executes a branched
    lineage; the repo's persist-free discipline rules out caching the
    token stream).  They are corpus CONSTANTS a production pipeline
    computes once per snapshot — pass them at 100 TB and the operator
    is single-scan."""
    toks = docs.filter(
        F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
    ).select(
        F.col(id_col).alias("_did"),
        _tokens(text_col).alias("_t"),
    )
    qterms = (
        queries.filter(
            F.col(query_id_col).isNotNull()
            & F.col(query_text_col).isNotNull()
        )
        .select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_tokens(query_text_col)).alias("term"),
        )
        .distinct()
    )
    vocab = qterms.select("term").distinct()
    # dl before the explosion; the explosion carries (_did, dl, term)
    exploded = toks.select(
        "_did",
        F.size("_t").cast("bigint").alias("dl"),
        F.explode("_t").alias("term"),
    )
    # broadcast-semi prune: kills every non-query token pre-shuffle
    matched = exploded.join(F.broadcast(vocab), "term", "left_semi")
    doc_terms = matched.groupBy("_did", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.max("dl").alias("dl"),
    )
    # doc_terms feeds BOTH the output join and the df contraction; the
    # two branches prune different columns, so Spark builds two
    # non-identical subplans and ReusedExchange never fires — without
    # a persist the df branch RE-SCANS and RE-EXPLODES the whole
    # corpus (measured: 3 scans).  doc_terms is the natural
    # materialization boundary: pruned to query-vocab terms and
    # contracted to one row per (doc, term) — the compact form, and
    # the cache_registry owner releases it at the consumption boundary
    # (the e3 / minhash-collapse precedent).
    from kafka_dead_letter_analyzer_spark import cache_registry

    doc_terms = cache_registry.track(doc_terms.persist())
    dfreq = doc_terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    if corpus_stats is not None:
        n_docs, sum_dl = corpus_stats
        corpus = docs.sparkSession.createDataFrame(
            [(int(n_docs), int(sum_dl))], "n_docs bigint, sum_dl bigint"
        )
    else:
        corpus = toks.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.size("_t")), F.lit(0))
            .cast("bigint")
            .alias("sum_dl"),
        )
    return (
        doc_terms.join(F.broadcast(qterms), "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .select(
            "query_id",
            F.col("_did").alias(id_col),
            "term",
            "tf",
            "df",
            "dl",
            "n_docs",
            "sum_dl",
        )
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    n_salts: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """Top-k documents per query by BM25 (Lucene idf variant):
    ``(query_id, doc_id, rank INT, score DOUBLE)`` with ``score``
    rounded to 6 places and rank ties broken by ascending doc id
    (deterministic output).  ``score = sum over matched terms of
    ln(1 + (N - df + 0.5)/(df + 0.5)) * tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl))``.

    Determinism: the per-(query, doc) float sum runs in SORTED TERM
    ORDER via ``aggregate(array_sort(collect_list(struct(term,
    contrib))))`` — a fixed summation order, so the score is
    partitioning-independent (the repo's doubles-never-accumulate rule
    bent as far as a float metric allows: the ORDER is pinned even
    though the addends are floats).  ``ln`` itself is libm-dependent in
    the last ulp across engines, which is why this operator is
    differential-tested against a from-scratch replica rather than
    DuckDB-hash-gated.

    Top-k WITHOUT a corpus-wide window (the one-task-per-key bound the
    r10 verdict flagged on the typicality window): phase 1 ranks
    within ``(query, salt)`` — ``salt = xxhash64(doc) % n_salts``
    spreads a stopword query's full-corpus candidate set across
    ``n_salts`` bounded tasks — and phase 2 ranks the surviving
    ``<= n_salts * k`` rows per query.  ``n_salts`` defaults to the
    session's shuffle-partition count (scales with configured cluster
    width); correctness is salt-count-independent (every true top-k
    row survives its salt bucket)."""
    if k < 1:
        raise ValueError(f"bm25_topk: k={k} must be >= 1")
    if n_salts is None:
        from kafka_dead_letter_analyzer_spark.operators.io import (
            shuffle_partitions,
        )

        n_salts = shuffle_partitions(docs.sparkSession)
    if n_salts < 1:
        raise ValueError(f"bm25_topk: n_salts={n_salts} must be >= 1")
    from pyspark.sql import Window

    stats = bm25_stats(
        docs,
        queries,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    # avgdl = sum_dl / n_docs, folded so the expression never divides
    # by a pre-rounded float: tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl*N/S)
    tff = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1 * (1.0 - b))
        + F.lit(k1 * b)
        * F.col("dl")
        * F.col("n_docs")
        / F.col("sum_dl")
    )
    contrib = stats.select(
        "query_id",
        F.col(id_col),
        "term",
        (idf * tff).alias("_c"),
    )
    scored = (
        contrib.groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct("term", F.col("_c")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["_c"],
            ).alias("_score")
        )
        .select(
            "query_id",
            id_col,
            F.round("_score", 6).alias("score"),
        )
    )
    salted = scored.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    )
    w1 = Window.partitionBy("query_id", "_salt").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    survivors = salted.withColumn(
        "_r1", F.row_number().over(w1)
    ).filter(F.col("_r1") <= k)
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "score",
        )
    )


def rrf_fuse(
    rankings: DataFrame,
    k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    top_k: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR
    2009): combine multiple rankers' top-k lists into one ranking
    using ONLY the ranks — ``rrf(d) = sum over rankers of
    1 / (k + rank_i(d))`` — the standard way to fuse BM25 with an
    embedding retriever (hybrid search) without score calibration.

    Integer-exact by construction, unlike the scores it fuses: each
    contribution is ``floor(1e9 / (k + rank))`` (parts-per-billion —
    fine enough that distinct rank multisets stay distinct for any
    practical k) and the fusion is an int64 sum, so the operator is
    cross-engine hash-exact end-to-end even when the upstream rankers
    were float-scored.  Output: ``(query_col, id_col, n_rankers
    BIGINT, rrf_ppb BIGINT, fused_rank INT)`` — fused_rank ordered by
    rrf_ppb desc with ascending-id tiebreak; ``top_k`` truncates.

    Input contract: ``rankings`` is the UNION of the rankers' top-k
    outputs (each row one (query, doc, rank) claim; a ranker column
    is unnecessary — RRF only uses ranks).  Scale shape: the input is
    already top-k-truncated per ranker, so a query's partition holds
    at most ``sum of the rankers' k`` rows — the per-query window
    here is BOUNDED BY CONSTRUCTION, not by data (contrast bm25_topk,
    which salts precisely because its candidate set is unbounded).
    One contraction on (query, doc) + one bounded window."""
    if k < 1:
        raise ValueError(f"rrf_fuse: k={k} must be >= 1")
    from pyspark.sql import Window

    scored = (
        rankings.filter(
            F.col(query_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(rank_col).isNotNull()
        )
        .groupBy(query_col, id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rankers"),
            F.sum(
                F.expr(
                    f"CAST(1000000000 DIV ({k} + {rank_col}) AS BIGINT)"
                )
            )
            .cast("bigint")
            .alias("rrf_ppb"),
        )
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_ppb").desc(), F.col(id_col).asc()
    )
    out = scored.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )
    if top_k is not None:
        out = out.filter(F.col("fused_rank") <= top_k)
    return out


def retrieval_metrics(
    rankings: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval quality against binary relevance judgments
    — the eval step that closes the retrieval loop (stats -> rank ->
    fuse -> EVALUATE), integer-exact throughout: reciprocal rank is
    rational (``floor(1e9 / first_rel_rank)``) and recall is the
    repo's exact floor-ppm, so unlike nDCG (log2 discount) the whole
    surface is cross-engine hash-exact.  Corpus MRR / mean recall are
    caller-side means over the returned per-query rows (sum int64,
    divide once).

    Inputs: ``rankings`` — (query, doc, rank) from any ranker or
    fusion; ``qrels`` — (query, doc) binary relevance pairs.  Output
    per query (queries present in EITHER input):
    ``(query_col, n_ranked BIGINT, n_rel BIGINT, first_rel_rank
    BIGINT nullable, rr_ppb BIGINT, hits_at_k BIGINT, recall_at_k_ppm
    BIGINT nullable)`` — ``rr_ppb = 0`` and ``first_rel_rank`` NULL
    when no relevant doc was ranked; ``recall_at_k_ppm`` NULL when
    the query has no judgments (0/0 is undefined, not zero).

    Scale shape: one (query, doc) equi-join (both sides pre-keyed;
    AQE splits a skewed query), then ONE (query) contraction whose
    per-group state is five longs — no window, no per-query task
    bound.  Judgments joined on the COMPOSITE key never fan out."""
    if k < 1:
        raise ValueError(f"retrieval_metrics: k={k} must be >= 1")
    from kafka_dead_letter_analyzer_spark.operators.common import ppm2

    r = rankings.filter(
        F.col(query_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(rank_col).isNotNull()
    ).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rank_col).cast("bigint").alias("_r"),
    )
    j = qrels.filter(
        F.col(query_col).isNotNull() & F.col(id_col).isNotNull()
    ).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.lit(True).alias("_rel"),
    ).distinct()
    joined = r.join(j, ["_q", "_d"], "full_outer")
    per_q = joined.groupBy("_q").agg(
        F.count(F.col("_r")).cast("bigint").alias("n_ranked"),
        F.count(F.when(F.col("_rel"), 1)).cast("bigint").alias("n_rel"),
        F.min(F.when(F.col("_rel"), F.col("_r")))
        .cast("bigint")
        .alias("first_rel_rank"),
        F.count(
            F.when(F.col("_rel") & (F.col("_r") <= k), 1)
        ).cast("bigint").alias("hits_at_k"),
    )
    return per_q.select(
        F.col("_q").alias(query_col),
        "n_ranked",
        "n_rel",
        "first_rel_rank",
        F.coalesce(
            F.expr("1000000000 DIV first_rel_rank"), F.lit(0)
        ).cast("bigint").alias("rr_ppb"),
        "hits_at_k",
        F.expr(
            "CASE WHEN n_rel = 0 THEN CAST(NULL AS BIGINT)"
            f" ELSE {ppm2('hits_at_k', 'n_rel')} END"
        ).cast("bigint").alias("recall_at_k_ppm"),
    )
