"""BM25 retrieval family: from-scratch differentials and contracts.

bm25_stats is oracle-gated by the driver (x_bm25_stats); these tests are
the independent replica for the stats AND the full gate for the float
ranker (x_bm25_topk is rows-only — ln() is libm-dependent cross-engine).
"""

from __future__ import annotations

import math
import re

import pytest

from kafka_dead_letter_analyzer_spark.operators import retrieval as RV

DOCS = [
    (1, "the fast cat sat on the fast table"),
    (2, "a slow scan of the big table"),
    (3, "fast fast fast scan scan"),
    (4, "nothing relevant whatsoever here"),
    (5, ""),  # zero tokens: counts toward n_docs, never matches
    (6, "table scan table scan table"),
]
QUERIES = [(10, "fast table"), (20, "scan"), (30, "zzz-absent term scan")]


def _tok(s):
    return re.findall(r"[a-z0-9]+", (s or "").lower())


def _brute_stats():
    toks = {i: _tok(t) for i, t in DOCS}
    n_docs = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    qterms = {(q, t) for q, s in QUERIES for t in _tok(s)}
    vocab = {t for _, t in qterms}
    dfreq = {
        t: sum(1 for ts in toks.values() if t in ts) for t in vocab
    }
    rows = set()
    for qid, term in qterms:
        for did, ts in toks.items():
            tf = ts.count(term)
            if tf:
                rows.add(
                    (qid, did, term, tf, dfreq[term], len(ts),
                     n_docs, sum_dl)
                )
    return rows


def _brute_topk(k=10, k1=1.2, b=0.75):
    toks = {i: _tok(t) for i, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for qid, qs in QUERIES:
        scores = []
        for did, ts in toks.items():
            s = 0.0
            for term in sorted(set(_tok(qs))):
                tf = ts.count(term)
                if not tf:
                    continue
                df = sum(1 for v in toks.values() if term in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(ts) / avgdl)
                )
            if s > 0.0:
                scores.append((round(s, 6), did))
        scores.sort(key=lambda x: (-x[0], x[1]))
        out[qid] = [(d, r + 1, sc) for r, (sc, d) in enumerate(scores[:k])]
    return out


@pytest.fixture()
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, query_text string")
    return docs, qs


def test_bm25_stats_matches_brute_force(spark, frames):
    """tf/df/dl/corpus scalars against a pure-Python replica: query
    terms distinct per query, empty docs count toward n_docs/avgdl,
    absent query terms emit nothing, NULL handling implicit in the
    fixture shapes."""
    docs, qs = frames
    got = {
        tuple(r)
        for r in RV.bm25_stats(docs, qs).collect()
    }
    assert got == _brute_stats()
    # precomputed corpus_stats short-circuit: same output
    n_docs = len(DOCS)
    sum_dl = sum(len(_tok(t)) for _, t in DOCS)
    got2 = {
        tuple(r)
        for r in RV.bm25_stats(
            docs, qs, corpus_stats=(n_docs, sum_dl)
        ).collect()
    }
    assert got2 == got


def test_bm25_topk_matches_python_replica(spark, frames):
    """Ranks and round-6 scores equal the from-scratch replica; the
    result is salt-count-independent (n_salts=1 vs 16) and
    partitioning-independent (the deterministic-order float sum)."""
    docs, qs = frames
    want = _brute_topk()

    def read(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["rank"], r["score"])
            )
        return {
            q: sorted(v, key=lambda x: x[1]) for q, v in out.items()
        }

    got = read(RV.bm25_topk(docs, qs, k=10))
    assert got == {q: v for q, v in want.items() if v}
    assert read(RV.bm25_topk(docs, qs, k=10, n_salts=1)) == got
    assert read(
        RV.bm25_topk(docs.repartition(7), qs, k=10, n_salts=16)
    ) == got
    # k truncates with deterministic doc-id tiebreak
    got1 = read(RV.bm25_topk(docs, qs, k=1))
    for q, rows in got1.items():
        assert rows == want[q][:1]
    with pytest.raises(ValueError, match="k="):
        RV.bm25_topk(docs, qs, k=0)
    with pytest.raises(ValueError, match="n_salts"):
        RV.bm25_topk(docs, qs, n_salts=0)


def test_bm25_topk_no_corpus_wide_window(spark, frames):
    """The salted two-phase plan contract: NO window partitioned by
    the query alone over the full candidate set — phase 1's window
    keys include the salt (bounded tasks even for a stopword query),
    phase 2 sees <= n_salts*k rows per query; and the query side
    reaches the token stream through broadcast joins only (no
    SortMergeJoin anywhere)."""
    import contextlib
    import io

    docs, qs = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        RV.bm25_topk(docs, qs, k=5).explain("formatted")
    s = buf.getvalue()
    assert "SortMergeJoin" not in s
    assert "BroadcastHashJoin" in s
    # two windows: (query_id, _salt) then (query_id); the salted one
    # must come first in the plan text top-down order is phase 2 then
    # phase 1, so just assert both key sets appear
    assert "_salt" in s
    assert s.count("row_number()") >= 2


def test_rrf_fuse_matches_brute_force(spark):
    """Floor-ppb reciprocal contributions and fused ranks against a
    pure-Python replica: docs ranked by several lists, docs present in
    only one list, k sensitivity, top_k truncation, NULL exclusion,
    deterministic id tiebreak on equal sums."""
    rankings = [
        # (query, doc, rank): two rankers for q1, one for q2
        (1, 100, 1), (1, 101, 2), (1, 102, 3),
        (1, 101, 1), (1, 100, 2), (1, 103, 3),
        (2, 200, 1), (2, 201, 2),
    ]
    rows = rankings + [(None, 1, 1), (1, None, 1), (1, 104, None)]
    df = spark.createDataFrame(
        rows, "query_id long, doc_id long, rank long"
    )

    def brute(k=60, top_k=None):
        agg = {}
        for q, d, r in rankings:
            key = (q, d)
            n, s = agg.get(key, (0, 0))
            agg[key] = (n + 1, s + 1_000_000_000 // (k + r))
        out = {}
        for (q, d), (n, s) in agg.items():
            out.setdefault(q, []).append((d, n, s))
        res = {}
        for q, lst in out.items():
            lst.sort(key=lambda x: (-x[2], x[0]))
            if top_k is not None:
                lst = lst[:top_k]
            res[q] = [
                (d, n, s, i + 1) for i, (d, n, s) in enumerate(lst)
            ]
        return res

    def read(out):
        res = {}
        for r in out.collect():
            res.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["n_rankers"], r["rrf_ppb"],
                 r["fused_rank"])
            )
        return {
            q: sorted(v, key=lambda x: x[3]) for q, v in res.items()
        }

    assert read(RV.rrf_fuse(df)) == brute()
    assert read(RV.rrf_fuse(df, k=7)) == brute(k=7)
    assert read(RV.rrf_fuse(df, top_k=2)) == brute(top_k=2)
    # doc 100 and 101 both have ranks {1,2} for q1 -> equal sums ->
    # ascending-id tiebreak must put 100 first
    fused = read(RV.rrf_fuse(df))[1]
    assert fused[0][0] == 100 and fused[1][0] == 101
    assert fused[0][2] == fused[1][2]
    with pytest.raises(ValueError, match="k="):
        RV.rrf_fuse(df, k=0)


def test_retrieval_metrics_matches_brute_force(spark):
    """MRR/recall sufficient statistics against a hand-computed
    fixture: relevant-but-unranked docs count toward n_rel only,
    ranked-but-unjudged queries get NULL recall (0/0 is undefined),
    judged-but-unranked queries appear with n_ranked 0 and rr_ppb 0,
    hits respect the k cutoff, and the reciprocal rank is the exact
    floor ppb of 1/first_rel_rank."""
    rankings = [
        (1, 100, 1), (1, 101, 2), (1, 102, 3),
        (2, 200, 1), (2, 201, 2),
        (4, 400, 1),
    ]
    qrels = [
        (1, 101), (1, 102), (1, 999),  # 999 never ranked
        (3, 300),                      # query 3 never ranked
        # query 2 ranked but unjudged; query 4 judged irrelevant-free
    ]
    rdf = spark.createDataFrame(
        rankings, "query_id long, doc_id long, rank long"
    )
    qdf = spark.createDataFrame(qrels, "query_id long, doc_id long")
    got = {
        r["query_id"]: (
            r["n_ranked"], r["n_rel"], r["first_rel_rank"],
            r["rr_ppb"], r["hits_at_k"], r["recall_at_k_ppm"],
        )
        for r in RV.retrieval_metrics(rdf, qdf, k=2).collect()
    }
    assert got[1] == (3, 3, 2, 1_000_000_000 // 2, 1, 333333)
    assert got[2] == (2, 0, None, 0, 0, None)
    assert got[3] == (0, 1, None, 0, 0, 0)
    assert got[4] == (1, 0, None, 0, 0, None)
    with pytest.raises(ValueError, match="k="):
        RV.retrieval_metrics(rdf, qdf, k=0)


def test_retrieval_metrics_plan_no_window(spark):
    """The metrics contraction has NO window (a per-query window would
    reintroduce the single-task bound the salted ranker avoided) —
    just the composite-key join and the (query) aggregate."""
    import contextlib
    import io

    rdf = spark.createDataFrame(
        [(1, 100, 1)], "query_id long, doc_id long, rank long"
    )
    qdf = spark.createDataFrame([(1, 100)], "query_id long, doc_id long")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        RV.retrieval_metrics(rdf, qdf).explain("formatted")
    s = buf.getvalue()
    assert "Window" not in s
    assert "HashAggregate" in s


def test_rrf_fuse_partitioning_independent(spark):
    """Physical layout invariance: the fused ranking is identical at 1
    and 13 input partitions (int64 sums commute; the window orders by
    (rrf_ppb, id) totally)."""
    rankings = [
        (q, d, r)
        for q in (1, 2, 3)
        for r, d in enumerate(
            [(q * 100 + i) % 17 + 100 for i in range(10)], start=1
        )
    ]
    df = spark.createDataFrame(
        rankings, "query_id long, doc_id long, rank long"
    )
    one = sorted(map(tuple, RV.rrf_fuse(df.coalesce(1)).collect()))
    many = sorted(map(tuple, RV.rrf_fuse(df.repartition(13)).collect()))
    assert one == many


def test_corpus_token_stats_one_pass_constants(spark, frames):
    """The snapshot-constant helper returns exactly the (n_docs,
    sum_dl) bm25_stats computes internally — same tokenizer, same
    NULL exclusion — so passing them back is output-neutral (the
    single-scan contract's correctness half)."""
    docs, qs = frames
    n_docs, sum_dl = RV.corpus_token_stats(docs)
    assert n_docs == len(DOCS)
    assert sum_dl == sum(len(_tok(t)) for _, t in DOCS)
    row = RV.bm25_stats(docs, qs).select("n_docs", "sum_dl").first()
    assert (row["n_docs"], row["sum_dl"]) == (n_docs, sum_dl)
    # NULL rows excluded on both paths
    docs_n = spark.createDataFrame(
        DOCS + [(None, "xx"), (9, None)], "doc_id long, text string"
    )
    assert RV.corpus_token_stats(docs_n) == (n_docs, sum_dl)


def test_salted_topk_bit_identical_to_global_window(spark):
    """The shared two-phase pattern equals a single group-wide window
    for ANY salt count when order_by is total — exact ranks, exact
    survivors, at 1/4/64 salts and under input repartitioning."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = [
        (q, d, (d * 7 + q * 3) % 13)
        for q in (1, 2) for d in range(40)
    ] + [(3, 0, 5)]  # singleton group
    df = spark.createDataFrame(rows, "q long, d long, v long")
    w = Window.partitionBy("q").orderBy(F.col("v").desc(), F.col("d"))
    want = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 5)
            .collect(),
        )
    )
    for n_salts in (1, 4, 64):
        got = sorted(
            map(
                tuple,
                RV.salted_topk(
                    df.repartition(7),
                    5,
                    partition_by=["q"],
                    order_by=[F.col("v").desc(), F.col("d")],
                    salt_src="d",
                    n_salts=n_salts,
                ).collect(),
            )
        )
        assert got == want, n_salts
    with pytest.raises(ValueError, match="k="):
        RV.salted_topk(df, 0, ["q"], [F.col("v")], "d")
    with pytest.raises(ValueError, match="n_salts"):
        RV.salted_topk(df, 1, ["q"], [F.col("v")], "d", n_salts=0)


def test_bm25_topk_single_scan_with_corpus_stats(spark, frames):
    """corpus_stats forwards through the ranker (driver-ADVICE r11):
    identical output, and the plan drops to one distinct scan of the
    docs source."""
    docs, qs = frames
    n_docs, sum_dl = RV.corpus_token_stats(docs)
    base = sorted(map(tuple, RV.bm25_topk(docs, qs, k=10).collect()))
    single = sorted(
        map(
            tuple,
            RV.bm25_topk(
                docs, qs, k=10, corpus_stats=(n_docs, sum_dl)
            ).collect(),
        )
    )
    assert single == base


def test_rrf_fuse_awkward_rank_column_names_and_types(spark):
    """The contribution is built from Column expressions (driver-ADVICE
    r11): a rank column whose name needs backticks works, and a
    non-bigint (int/double-integral) rank type is cast, not a DIV
    analysis error."""
    df = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2)],
        "query_id long, doc_id long, `rank order` int",
    )
    got = {
        (r["doc_id"], r["rrf_ppb"])
        for r in RV.rrf_fuse(df, rank_col="rank order").collect()
    }
    assert got == {
        (100, 1_000_000_000 // 61),
        (101, 1_000_000_000 // 62),
    }
    dfd = spark.createDataFrame(
        [(1, 100, 1.0)], "query_id long, doc_id long, rank double"
    )
    assert RV.rrf_fuse(dfd).first()["rrf_ppb"] == 1_000_000_000 // 61


def _brute_ndcg(rankings, qrels, k=10, exponential=False):
    """From-scratch nDCG replica: dict (query) -> row tuple."""
    import math as _m

    best = {}
    for q, d, rel in qrels:
        if q is None or d is None or rel is None:
            continue
        best[(q, d)] = max(best.get((q, d), rel), rel)
    ranked = [
        (q, d, r)
        for q, d, r in rankings
        if q is not None and d is not None and r is not None
    ]
    queries = {q for q, _, _ in ranked} | {q for (q, _) in best}

    def g(rel):
        return (2.0 ** rel - 1.0) if exponential else float(rel)

    out = {}
    for q in queries:
        mine = sorted(
            (r, d) for (qq, d, r) in ranked if qq == q
        )
        n_ranked = len(mine)
        judged = {d: rel for (qq, d), rel in best.items() if qq == q}
        dcg = 0.0
        for r, d in mine:
            if r <= k and d in judged:
                dcg += g(judged[d]) / _m.log2(r + 1)
        ideal = sorted(
            judged.items(), key=lambda x: (-x[1], x[0])
        )[:k]
        idcg = sum(
            g(rel) / _m.log2(i + 2) for i, (_, rel) in enumerate(ideal)
        )
        ndcg = round(dcg / idcg, 6) if idcg > 0 else None
        out[q] = (
            n_ranked, len(judged), round(dcg, 6),
            round(idcg, 6) if judged else None, ndcg,
        )
    return out


def test_ndcg_matches_python_replica(spark):
    """Graded-relevance nDCG@k against a from-scratch replica: linear
    and exponential gain, duplicate judgments collapse to max rel,
    unjudged-query NULL, judged-but-unranked 0.0, k cutoff on both
    the dcg and ideal sides, salt-count independence, NULL-row
    exclusion."""
    rankings = [
        (1, 100, 1), (1, 101, 2), (1, 102, 3), (1, 103, 4),
        (2, 200, 1), (2, 201, 2),
        (4, 400, 1),
        (None, 1, 1), (1, None, 1), (1, 998, None),
    ]
    qrels = [
        (1, 101, 3), (1, 102, 1), (1, 999, 2),  # 999 unranked
        (1, 101, 1),                            # dup -> max(3, 1)
        (3, 300, 2),                            # judged, never ranked
        (4, 400, 0),                            # zero-gain judgment
        (None, 1, 1), (2, None, 1), (1, 997, None),
    ]
    rdf = spark.createDataFrame(
        rankings, "query_id long, doc_id long, rank long"
    )
    qdf = spark.createDataFrame(
        qrels, "query_id long, doc_id long, rel long"
    )
    for expo in (False, True):
        want = _brute_ndcg(
            [r for r in rankings if None not in r],
            [r for r in qrels if None not in r],
            k=3, exponential=expo,
        )
        got = {
            r["query_id"]: (
                r["n_ranked"], r["n_judged"], r["dcg"], r["idcg"],
                r["ndcg"],
            )
            for r in RV.ndcg_at_k(
                rdf, qdf, k=3, exponential=expo
            ).collect()
        }
        # judged-set-empty queries carry idcg NULL in Spark; replica
        # encodes the same contract
        assert got == want, expo
    # salt independence: n_salts=1 vs 16 bit-identical
    a = sorted(map(tuple, RV.ndcg_at_k(rdf, qdf, k=3, n_salts=1).collect()))
    b = sorted(map(tuple, RV.ndcg_at_k(rdf, qdf, k=3, n_salts=16).collect()))
    assert a == b
    with pytest.raises(ValueError, match="k="):
        RV.ndcg_at_k(rdf, qdf, k=0)


def test_ndcg_semantics_hand_checked(spark):
    """One fully hand-computed case: perfect ranking -> ndcg 1.0;
    reversed ranking -> the known closed-form value."""
    import math as _m

    qrels = [(1, 10, 3), (1, 11, 2), (1, 12, 1)]
    perfect = [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
    reverse = [(1, 12, 1), (1, 11, 2), (1, 10, 3)]
    qdf = spark.createDataFrame(
        qrels, "query_id long, doc_id long, rel long"
    )

    def run(rk):
        rdf = spark.createDataFrame(
            rk, "query_id long, doc_id long, rank long"
        )
        return RV.ndcg_at_k(rdf, qdf, k=10).first()

    p = run(perfect)
    assert p["ndcg"] == 1.0 and p["dcg"] == p["idcg"]
    r = run(reverse)
    idcg = 3 / _m.log2(2) + 2 / _m.log2(3) + 1 / _m.log2(4)
    dcg = 1 / _m.log2(2) + 2 / _m.log2(3) + 3 / _m.log2(4)
    assert r["ndcg"] == round(dcg / idcg, 6)


def test_salted_topk_global_window_equivalence_property(spark):
    """Property (r12): for random (group, value) datasets and random
    salt counts, salted_topk is BIT-IDENTICAL to the single group-wide
    window under the same total order — the correctness claim every
    consumer (bm25_topk, ndcg ideal side, dsir_select, the fixture
    rankers) rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # group
                st.integers(min_value=-50, max_value=50),  # value
            ),
            min_size=1,
            max_size=60,
        ),
        st.integers(min_value=1, max_value=40),  # n_salts
        st.integers(min_value=1, max_value=7),   # k
    )
    def check(rows, n_salts, k):
        data = [(g, i, v) for i, (g, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "g long, d long, v long")
        order = [F.col("v").desc(), F.col("d").asc()]
        w = Window.partitionBy("g").orderBy(*order)
        want = sorted(
            map(
                tuple,
                df.withColumn(
                    "rank", F.row_number().over(w).cast("int")
                ).filter(F.col("rank") <= k).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                RV.salted_topk(
                    df, k, ["g"], order, "d", n_salts=n_salts
                ).collect(),
            )
        )
        assert got == want, (n_salts, k)

    check()


def test_ndcg_replica_property(spark):
    """Property (r12): ndcg_at_k equals the from-scratch replica on
    random rankings/qrels with duplicate judgments, partial overlap,
    and graded 0..3 relevance — both gains."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(  # rankings: (query, doc); rank = position+1
            st.tuples(st.integers(0, 2), st.integers(0, 15)),
            min_size=0, max_size=30, unique=True,
        ),
        st.lists(  # qrels: (query, doc, rel)
            st.tuples(
                st.integers(0, 2), st.integers(0, 15), st.integers(0, 3)
            ),
            min_size=0, max_size=30,
        ),
        st.booleans(),
    )
    def check(ranked_pairs, qrels, expo):
        # per-query consecutive ranks from the pair order
        seen: dict = {}
        rankings = []
        for q, d in ranked_pairs:
            seen[q] = seen.get(q, 0) + 1
            rankings.append((q, d, seen[q]))
        if not rankings and not qrels:
            return
        rdf = spark.createDataFrame(
            rankings or [(None, None, None)],
            "query_id long, doc_id long, rank long",
        )
        qdf = spark.createDataFrame(
            qrels or [(None, None, None)],
            "query_id long, doc_id long, rel long",
        )
        want = _brute_ndcg(rankings, qrels, k=5, exponential=expo)
        got = {
            r["query_id"]: (
                r["n_ranked"], r["n_judged"], r["dcg"], r["idcg"],
                r["ndcg"],
            )
            for r in RV.ndcg_at_k(
                rdf, qdf, k=5, exponential=expo
            ).collect()
        }
        assert got == want

    check()
