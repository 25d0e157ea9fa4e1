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
