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

__all__ = [
    "bm25_stats",
    "bm25_topk",
    "corpus_token_stats",
    "ndcg_at_k",
    "retrieval_metrics",
    "rrf_fuse",
    "salted_topk",
]


def _tokens(col: str) -> Column:
    return F.expr(
        f"regexp_extract_all(lower(coalesce({col}, '')),"
        f" '{TYPICALITY_TOKEN_RE}', 0)"
    )


def corpus_token_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int, int]:
    """The ``(n_docs, sum_dl)`` corpus snapshot constants that
    :func:`bm25_stats` needs, computed in ONE pass (count + token-count
    sum, no explode) and returned as Python ints — a bounded 2-scalar
    collect, the documented production pattern: compute once per corpus
    snapshot, pass ``corpus_stats=`` to every retrieval call against
    that snapshot, and every call is single-scan.  Tokenization
    (TYPICALITY_TOKEN_RE over lowercased text) and the NULL-exclusion
    contract match :func:`bm25_stats` exactly."""
    row = (
        docs.filter(
            F.col(id_col).isNotNull() & F.col(text_col).isNotNull()
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.size(_tokens(text_col))), F.lit(0))
            .cast("bigint")
            .alias("sum_dl"),
        )
        .first()
    )
    return int(row["n_docs"]), int(row["sum_dl"])


def salted_topk(
    df: DataFrame,
    k: int,
    partition_by: list[str],
    order_by: list[Column],
    salt_src: str,
    n_salts: int | None = None,
    rank_name: str = "rank",
) -> DataFrame:
    """Exact per-group top-k WITHOUT a group-wide window — the salted
    two-phase pattern shared by :func:`bm25_topk`, :func:`ndcg_at_k`'s
    ideal-gain stage, and the declared-query fixture rankers.  Phase 1
    ranks within ``(partition_by..., salt)`` where ``salt =
    xxhash64(salt_src) % n_salts`` — a group whose candidate set is a
    constant fraction of the corpus (a stopword query) spreads across
    ``n_salts`` bounded tasks instead of ONE window task AQE cannot
    split — and phase 2 ranks the surviving ``<= n_salts * k`` rows per
    group.

    ``order_by`` must be a TOTAL order within each group (tiebreak on a
    unique column, conventionally ``salt_src`` ascending): every true
    global top-k row then survives its salt bucket's top-k, phase 2
    sees all of them, and the output is BIT-IDENTICAL to a single
    group-wide window for any ``n_salts`` (salt-count independence is
    tested).  ``n_salts`` defaults to the session's shuffle-partition
    count.  Output = input columns + ``rank_name`` (int, 1-based,
    ``<= k``)."""
    if k < 1:
        raise ValueError(f"salted_topk: k={k} must be >= 1")
    if n_salts is None:
        from kafka_dead_letter_analyzer_spark.operators.io import (
            shuffle_partitions,
        )

        n_salts = shuffle_partitions(df.sparkSession)
    if n_salts < 1:
        raise ValueError(
            f"salted_topk: n_salts={n_salts} must be >= 1"
        )
    # withColumn REPLACES same-named columns, so a collision on the
    # internal scratch names (or the output rank) would silently
    # corrupt caller data — refuse loudly, like _check_group_cols
    clash = {"_skt_salt", "_skt_r1", rank_name} & set(df.columns)
    if clash:
        raise ValueError(
            f"salted_topk: input columns {sorted(clash)} collide with"
            " reserved scratch/output names ('_skt_salt', '_skt_r1',"
            f" rank_name={rank_name!r}) — rename them first"
        )
    from pyspark.sql import Window

    salted = df.withColumn(
        "_skt_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*partition_by, "_skt_salt").orderBy(
        *order_by
    )
    survivors = (
        salted.withColumn("_skt_r1", F.row_number().over(w1))
        .filter(F.col("_skt_r1") <= k)
        .drop("_skt_salt", "_skt_r1")
    )
    w2 = Window.partitionBy(*partition_by).orderBy(*order_by)
    return survivors.withColumn(
        rank_name, F.row_number().over(w2).cast("int")
    ).filter(F.col(rank_name) <= k)


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
    out = doc_terms.join(F.broadcast(qterms), "term").join(
        F.broadcast(dfreq), "term"
    )
    if corpus_stats is not None:
        # known snapshot constants enter as LITERAL columns — no join
        # at all.  (r12 shipped these via createDataFrame, which plans
        # as Scan ExistingRDD: a Python-RDD-backed leaf OUTSIDE
        # whole-stage codegen that pays Python serialization setup on
        # EVERY execution — the r13 ab_r13_bm25_isolated.json A/B
        # measured it at ~0.25 s/exec, the entire r12 bm25 regression.)
        n_docs, sum_dl = corpus_stats
        out = out.withColumns(
            {
                "n_docs": F.lit(int(n_docs)).cast("bigint"),
                "sum_dl": F.lit(int(sum_dl)).cast("bigint"),
            }
        )
    else:
        corpus = toks.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.coalesce(F.sum(F.size("_t")), F.lit(0))
            .cast("bigint")
            .alias("sum_dl"),
        )
        out = out.crossJoin(F.broadcast(corpus))
    return (
        out
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
    corpus_stats: tuple | None = None,
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
    row survives its salt bucket).

    ``corpus_stats``: forwarded to :func:`bm25_stats` — pass the
    :func:`corpus_token_stats` snapshot constants and the whole ranker
    is single-scan (by default the (n_docs, sum_dl) branch re-scans
    and re-tokenizes the corpus)."""
    if k < 1:
        raise ValueError(f"bm25_topk: k={k} must be >= 1")

    stats = bm25_stats(
        docs,
        queries,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        corpus_stats=corpus_stats,
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
    return salted_topk(
        scored,
        k,
        partition_by=["query_id"],
        order_by=[F.col("score").desc(), F.col(id_col).asc()],
        salt_src=id_col,
        n_salts=n_salts,
    ).select("query_id", id_col, "rank", "score")


def _validated_rank(rank_col: str) -> Column:
    """Non-null ``rank_col`` as bigint, RAISING at runtime (inside the
    codegen'd CASE, lazily per row) on ranks that would otherwise
    corrupt silently: non-integral values (1.5 would truncate to 1)
    and non-positive values (rank <= -k nulls rrf denominators; rank
    <= 0 makes ndcg's log2 discount 0 or undefined).  Shared by
    :func:`rrf_fuse` and :func:`ndcg_at_k` (driver-ADVICE r12: the
    old cast was commented 'validated' but validated nothing)."""
    raw = F.col(rank_col)
    big = raw.cast("bigint")
    ok = raw.isNotNull() & (big >= 1) & (big.cast("double") == raw.cast("double"))
    return F.when(ok, big).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"rank column {rank_col!r} must be a positive"
                    " integer, got: "
                ),
                F.coalesce(raw.cast("string"), F.lit("NULL")),
            )
        ).cast("bigint")
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

    # contribution built from Column expressions, never an interpolated
    # identifier (driver-ADVICE r11: a rank_col needing backticks broke
    # the raw-SQL string, and a non-integral rank type failed on DIV):
    # rank is VALIDATED-cast to bigint (raises on fractional or
    # non-positive ranks — _validated_rank, r12 ADVICE), then exact
    # integer division via try_divide-free arithmetic — floor(a/b) over
    # int64s <= 1e9 is exact in double only by accident, so keep true
    # DIV semantics with (a - pmod(a, b)) / b on bigints.  NULL ranks
    # are filtered (not raised) below, the documented contract.
    rank_big = _validated_rank(rank_col)
    denom = F.lit(k).cast("bigint") + rank_big
    num = F.lit(1_000_000_000).cast("bigint")
    contribution = (
        (num - F.pmod(num, denom)) / denom
    ).cast("bigint")
    scored = (
        rankings.filter(
            F.col(query_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(rank_col).isNotNull()
        )
        .groupBy(query_col, id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rankers"),
            F.sum(contribution).cast("bigint").alias("rrf_ppb"),
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


def ndcg_at_k(
    rankings: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    exponential: bool = False,
    n_salts: int | None = None,
) -> DataFrame:
    """Per-query nDCG@k against GRADED relevance judgments — the third
    leg of the standard IR eval triple (MRR / recall@k in
    :func:`retrieval_metrics` are integer-exact; nDCG's log2 discount
    makes this one irreducibly float, so the declared query is
    rows-only with a from-scratch differential, the bm25_topk
    precedent).  ``dcg = sum over ranked positions i <= k of
    gain(rel_i) / log2(i + 1)`` with unjudged documents contributing
    0; ``idcg`` is the dcg of the query's judgments re-ranked ideally
    (gain desc), truncated at k; ``ndcg = dcg / idcg``.  ``gain`` is
    linear (``rel``) by default, ``2^rel - 1`` with
    ``exponential=True`` (both standard; Järvelin & Kekäläinen 2002).

    Output per query (queries present in EITHER input):
    ``(query_col, n_ranked BIGINT, n_judged BIGINT, dcg DOUBLE, idcg
    DOUBLE, ndcg DOUBLE)`` — dcg/idcg/ndcg rounded to 6 places; ndcg
    NULL when the query has no positive-gain judgments (0/0 is
    undefined — unjudged queries), 0.0 when judged but nothing
    relevant was ranked.  Duplicate judgments collapse to max rel.

    Determinism: both float sums run in rank order via
    ``aggregate(array_sort(collect_list(struct(rank, contrib))))`` —
    <= k addends each, fixed order, partitioning-independent.

    Scale shape: the dcg side is one (query, doc) equi-join (rankings
    are top-k lists by contract) + one (query) contraction; the ideal
    side ranks the judgment table with :func:`salted_topk` — NO
    group-wide window even for a query with millions of judgments —
    then the same bounded contraction.  No corpus scan anywhere: both
    inputs are already reduced surfaces."""
    if k < 1:
        raise ValueError(f"ndcg_at_k: k={k} must be >= 1")

    def _gain(col: Column) -> Column:
        g = col.cast("double")
        return (
            F.pow(F.lit(2.0), g) - F.lit(1.0) if exponential else g
        )

    def _ordered_sum(pairs: Column) -> Column:
        # fixed-order float sum: sort by (position, value) and fold
        return F.aggregate(
            F.array_sort(pairs), F.lit(0.0), lambda a, s: a + s["c"]
        )

    j = (
        qrels.filter(
            F.col(query_col).isNotNull()
            & F.col(id_col).isNotNull()
            & F.col(rel_col).isNotNull()
        )
        .groupBy(
            F.col(query_col).alias("_q"), F.col(id_col).alias("_d")
        )
        .agg(F.max(F.col(rel_col)).alias("_rel"))
    )
    r = rankings.filter(
        F.col(query_col).isNotNull()
        & F.col(id_col).isNotNull()
        & F.col(rank_col).isNotNull()
    ).select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        # raises on fractional / non-positive ranks (_validated_rank)
        _validated_rank(rank_col).alias("_r"),
    )
    # dcg: judged docs actually ranked within k; unjudged contribute 0
    dcg_q = (
        r.filter(F.col("_r") <= k)
        .join(j, ["_q", "_d"])
        .select(
            "_q",
            "_r",
            (_gain(F.col("_rel")) / F.log2(F.col("_r") + 1)).alias(
                "_c"
            ),
        )
        .groupBy("_q")
        .agg(
            _ordered_sum(
                F.collect_list(F.struct(F.col("_r").alias("r"),
                                        F.col("_c").alias("c")))
            ).alias("_dcg")
        )
    )
    # ideal side: top-k judgments by gain desc WITHOUT a group-wide
    # window (a well-judged query can carry an unbounded judgment set)
    ideal = salted_topk(
        j,
        k,
        partition_by=["_q"],
        order_by=[F.col("_rel").desc(), F.col("_d").asc()],
        salt_src="_d",
        n_salts=n_salts,
        rank_name="_ir",
    )
    idcg_q = (
        ideal.select(
            "_q",
            F.col("_ir").cast("bigint").alias("_r"),
            (_gain(F.col("_rel")) / F.log2(F.col("_ir") + 1)).alias(
                "_c"
            ),
        )
        .groupBy("_q")
        .agg(
            _ordered_sum(
                F.collect_list(F.struct(F.col("_r").alias("r"),
                                        F.col("_c").alias("c")))
            ).alias("_idcg")
        )
    )
    n_judged_q = j.groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_judged")
    )
    n_ranked_q = r.groupBy("_q").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ranked")
    )
    out = (
        n_ranked_q.join(n_judged_q, "_q", "full_outer")
        .join(dcg_q, "_q", "left")
        .join(idcg_q, "_q", "left")
    )
    dcg = F.coalesce(F.col("_dcg"), F.lit(0.0))
    idcg = F.col("_idcg")
    return out.select(
        F.col("_q").alias(query_col),
        F.coalesce(F.col("n_ranked"), F.lit(0)).cast("bigint").alias(
            "n_ranked"
        ),
        F.coalesce(F.col("n_judged"), F.lit(0)).cast("bigint").alias(
            "n_judged"
        ),
        F.round(dcg, 6).alias("dcg"),
        F.round(idcg, 6).alias("idcg"),
        F.when(
            idcg.isNotNull() & (idcg > 0), F.round(dcg / idcg, 6)
        ).alias("ndcg"),
    )


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
        # raises on fractional / non-positive ranks (_validated_rank)
        _validated_rank(rank_col).alias("_r"),
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
