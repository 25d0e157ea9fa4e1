"""DSIR selection family: from-scratch differentials and contracts.

hashed_ngram_counts is oracle-gated by the driver
(x_dsir_hashed_counts); these tests are the independent replica for the
counts AND the full gate for the float weight ranker (x_dsir_weights is
rows-only — ln() is libm-dependent cross-engine).
"""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from kafka_dead_letter_analyzer_spark.operators import selection as SEL

RAW = [
    (1, "the fast cat sat on the fast table"),
    (2, "a slow scan of the big table"),
    (3, "fast fast fast scan scan"),
    (4, "nothing relevant whatsoever here"),
    (5, ""),        # zero features: excluded from every surface
    (6, None),      # NULL text: same
    (7, "fast table scan fast table"),
]
TARGET = [
    (100, "fast table"),
    (101, "fast scan table table"),
]
B = 64
NMAX = 2


def _tok(s):
    return re.findall(r"[a-z0-9]+", (s or "").lower())


def _grams(toks, n_max=NMAX):
    out = []
    for n in range(1, n_max + 1):
        out += [
            " ".join(toks[i : i + n])
            for i in range(len(toks) - n + 1)
        ]
    return out


def _bucket(gram, b=B):
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % b


def _brute_counts(rows, b=B):
    out = {}
    for i, t in rows:
        if i is None:
            continue
        for g in _grams(_tok(t)):
            key = (i, _bucket(g, b))
            out[key] = out.get(key, 0) + 1
    return {(i, bk, c) for (i, bk), c in out.items()}


def _brute_weights(raw, target, b=B, alpha=1.0):
    rc, tc = {}, {}
    for i, t in raw:
        if i is None:
            continue
        for g in _grams(_tok(t)):
            rc[_bucket(g, b)] = rc.get(_bucket(g, b), 0) + 1
    for _, t in target:
        for g in _grams(_tok(t)):
            tc[_bucket(g, b)] = tc.get(_bucket(g, b), 0) + 1
    R, T = sum(rc.values()), sum(tc.values())
    out = {}
    for i, t in raw:
        if i is None:
            continue
        per_doc = {}
        for g in _grams(_tok(t)):
            per_doc[_bucket(g, b)] = per_doc.get(_bucket(g, b), 0) + 1
        if not per_doc:
            continue
        # fixed order: sorted buckets, like the engine's array_sort
        w = 0.0
        for bk in sorted(per_doc):
            lr = math.log((tc.get(bk, 0) + alpha) / (T + alpha * b)) - \
                 math.log((rc.get(bk, 0) + alpha) / (R + alpha * b))
            w += per_doc[bk] * lr
        out[i] = (sum(per_doc.values()), round(w, 6))
    return out


@pytest.fixture()
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, tgt


def test_hashed_ngram_counts_matches_replica(spark, frames):
    """md5-bucket counts against a pure-Python replica: uni+bigram
    generation, bucket collisions summed, NULL id/text exclusion,
    empty docs emit nothing; validation raises."""
    raw, _ = frames
    got = {
        tuple(r)
        for r in SEL.hashed_ngram_counts(
            raw, n_max=NMAX, num_buckets=B, bucket_hash="md5"
        ).collect()
    }
    assert got == _brute_counts(RAW)
    rows_n = RAW + [(None, "xx yy")]
    dfn = spark.createDataFrame(rows_n, "doc_id long, text string")
    got_n = {
        tuple(r)
        for r in SEL.hashed_ngram_counts(
            dfn, n_max=NMAX, num_buckets=B, bucket_hash="md5"
        ).collect()
    }
    assert got_n == got
    with pytest.raises(ValueError, match="n_max"):
        SEL.hashed_ngram_counts(raw, n_max=0)
    with pytest.raises(ValueError, match="num_buckets"):
        SEL.hashed_ngram_counts(raw, num_buckets=0)
    with pytest.raises(ValueError, match="bucket_hash"):
        SEL.hashed_ngram_counts(raw, bucket_hash="sha1")


def test_hashed_ngram_counts_xxhash_mode_bucket_invariants(spark, frames):
    """The scale-default xxhash64 mode can't be replicated in pure
    Python, but bucketing never changes the TOTAL feature count: per-
    doc sum(cnt) equals the md5 mode's (and the gram count), and every
    bucket is in [0, B)."""
    raw, _ = frames
    a = SEL.hashed_ngram_counts(
        raw, n_max=NMAX, num_buckets=B, bucket_hash="xxhash64"
    )
    per_doc = {
        r["doc_id"]: r["tot"]
        for r in a.groupBy("doc_id")
        .agg(F.sum("cnt").alias("tot"))
        .collect()
    }
    want = {
        i: len(_grams(_tok(t)))
        for i, t in RAW
        if i is not None and _grams(_tok(t))
    }
    assert per_doc == want
    assert a.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= B)
    ).count() == 0


def test_dsir_log_weights_matches_replica(spark, frames):
    """Per-doc log importance weights against the from-scratch replica
    (exact round-6): Laplace smoothing over the full bucket space,
    featureless docs excluded, and a doc made of target-typical grams
    outweighs an unrelated doc.  Partitioning-independent (fixed
    bucket-order summation)."""
    raw, tgt = frames
    want = _brute_weights(RAW, TARGET)

    def read(df):
        return {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in df.collect()
        }

    got = read(
        SEL.dsir_log_weights(
            raw, tgt, n_max=NMAX, num_buckets=B, bucket_hash="md5"
        )
    )
    assert got == want
    assert 5 not in got and 6 not in got  # featureless: excluded
    # doc 7 is built from target-typical grams; doc 4 shares nothing
    # with the target — per-FEATURE (the weight is a sum over the
    # doc's features, so raw totals scale with length)
    assert got[7][1] / got[7][0] > got[4][1] / got[4][0]
    # physical-layout invariance
    got13 = read(
        SEL.dsir_log_weights(
            raw.repartition(13),
            tgt.repartition(3),
            n_max=NMAX,
            num_buckets=B,
            bucket_hash="md5",
        )
    )
    assert got13 == got
    with pytest.raises(ValueError, match="alpha"):
        SEL.dsir_log_weights(raw, tgt, alpha=0.0)


def test_dsir_select_is_the_weight_head(spark, frames):
    """dsir_select == the top-k of dsir_log_weights under (weight
    desc, id asc), exact ranks, salt-count-independent."""
    raw, tgt = frames
    want = sorted(
        _brute_weights(RAW, TARGET).items(),
        key=lambda kv: (-kv[1][1], kv[0]),
    )

    def read(df):
        return [
            (r["doc_id"], r["rank"], r["n_features"], r["log_weight"])
            for r in df.orderBy("rank").collect()
        ]

    got = read(
        SEL.dsir_select(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B, bucket_hash="md5"
        )
    )
    assert got == [
        (i, rk + 1, nf, w)
        for rk, (i, (nf, w)) in enumerate(want[:3])
    ]
    assert read(
        SEL.dsir_select(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B,
            bucket_hash="md5", n_salts=1,
        )
    ) == got
    with pytest.raises(ValueError, match="k="):
        SEL.dsir_select(raw, tgt, k=0)


def test_dsir_weights_plan_broadcast_ratio_single_featurize(spark, frames):
    """The 100 TB contract: the log-ratio table reaches the per-doc
    features through a BROADCAST join (<= num_buckets rows — a
    SortMergeJoin would shuffle the corpus-side features against a
    256-row dim), the raw featurization is persisted (InMemoryTableScan
    present; its two consumers would otherwise re-explode the corpus),
    and no window exists anywhere in the weight plan."""
    import contextlib
    import io

    from kafka_dead_letter_analyzer_spark import cache_registry

    raw, tgt = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SEL.dsir_log_weights(
            raw, tgt, n_max=NMAX, num_buckets=B
        ).explain("formatted")
    s = buf.getvalue()
    assert "BroadcastHashJoin" in s
    assert "InMemoryTableScan" in s
    assert "Window" not in s
    # the corpus-side feature stream must never SortMergeJoin the
    # bounded ratio dim
    assert "SortMergeJoin" not in s
    cache_registry.release_all()


def test_dsir_weights_replica_property(spark):
    """Property (r12): dsir_log_weights equals the from-scratch
    md5-bucket replica on random corpora — random vocab mixes, random
    bucket counts (collisions), random smoothing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    text = st.lists(st.sampled_from(words), max_size=10).map(" ".join)

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(text, min_size=1, max_size=8),
        st.lists(text, min_size=1, max_size=4),
        st.integers(min_value=2, max_value=32),
        st.floats(min_value=0.25, max_value=4.0),
    )
    def check(raw_texts, tgt_texts, b, alpha):
        raw = [(i, t) for i, t in enumerate(raw_texts)]
        tgt = [(100 + i, t) for i, t in enumerate(tgt_texts)]
        rdf = spark.createDataFrame(raw, "doc_id long, text string")
        tdf = spark.createDataFrame(tgt, "doc_id long, text string")
        want = _brute_weights(raw, tgt, b=b, alpha=alpha)
        got = {
            r["doc_id"]: (r["n_features"], r["log_weight"])
            for r in SEL.dsir_log_weights(
                rdf, tdf, n_max=NMAX, num_buckets=b, alpha=alpha,
                bucket_hash="md5",
            ).collect()
        }
        assert got == want, (b, alpha)

    check()


def _brute_resample(raw, target, k, b=B, alpha=1.0, salt="dsir"):
    """From-scratch Gumbel-top-k replica: round-6 weights (the
    engine's dsir_log_weights output), md5-u32 seeded uniform, key =
    log_weight - ln(-ln u), top-k by (key desc, id asc)."""
    w = _brute_weights(raw, target, b=b, alpha=alpha)
    keyed = []
    for i, (nf, lw) in w.items():
        u32 = int(
            hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:8], 16
        )
        u = (u32 + 0.5) / 2**32
        gk = lw - math.log(-math.log(u))
        keyed.append((i, nf, lw, gk))
    keyed.sort(key=lambda t: (-t[3], t[0]))
    return [
        (i, rk + 1, nf, lw, round(gk, 6))
        for rk, (i, nf, lw, gk) in enumerate(keyed[:k])
    ]


def test_dsir_resample_matches_replica(spark, frames):
    """Gumbel-top-k importance resampling against the from-scratch
    replica: exact ranks, round-6 gumbel keys, salt-count
    independence, and a different draw salt changes the draw but
    stays a valid weight-proportional sample over the same docs."""
    raw, tgt = frames
    want = _brute_resample(RAW, TARGET, k=3)

    def read(df):
        return [
            (
                r["doc_id"], r["rank"], r["n_features"],
                r["log_weight"], r["gumbel_key"],
            )
            for r in df.orderBy("rank").collect()
        ]

    got = read(
        SEL.dsir_resample(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B,
            bucket_hash="md5",
        )
    )
    assert got == want
    # salt-count independence (the salted_topk contract)
    assert read(
        SEL.dsir_resample(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B,
            bucket_hash="md5", n_salts=1,
        )
    ) == got
    # a different DRAW salt redraws deterministically
    got2 = read(
        SEL.dsir_resample(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B,
            bucket_hash="md5", salt="other",
        )
    )
    assert got2 == _brute_resample(RAW, TARGET, k=3, salt="other")
    # k >= population: every weighted doc selected, ranks complete
    all_rows = read(
        SEL.dsir_resample(
            raw, tgt, k=100, n_max=NMAX, num_buckets=B,
            bucket_hash="md5",
        )
    )
    assert [r[0] for r in all_rows] == [
        t[0] for t in _brute_resample(RAW, TARGET, k=100)
    ]
    with pytest.raises(ValueError, match="k="):
        SEL.dsir_resample(raw, tgt, k=0)


def test_dsir_resample_invariance_property(spark):
    """Property (r13, the verdict's done-bar): the resample is a pure
    function of (data, salt) — identical under any input partitioning
    AND any n_salts, on random corpora."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    text = st.lists(
        st.sampled_from(words), min_size=1, max_size=8
    ).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(text, min_size=2, max_size=8),
        st.lists(text, min_size=1, max_size=3),
        st.integers(min_value=1, max_value=7),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=2, max_value=9),
    )
    def check(raw_texts, tgt_texts, k, n_salts, n_parts):
        raw = [(i, t) for i, t in enumerate(raw_texts)]
        tgt = [(100 + i, t) for i, t in enumerate(tgt_texts)]
        rdf = spark.createDataFrame(raw, "doc_id long, text string")
        tdf = spark.createDataFrame(tgt, "doc_id long, text string")

        def read(df):
            return [tuple(r) for r in df.orderBy("rank").collect()]

        base = read(
            SEL.dsir_resample(
                rdf, tdf, k=k, n_max=NMAX, num_buckets=16,
                bucket_hash="md5",
            )
        )
        assert base == _brute_resample(raw, tgt, k=k, b=16)
        assert read(
            SEL.dsir_resample(
                rdf.repartition(n_parts), tdf, k=k, n_max=NMAX,
                num_buckets=16, bucket_hash="md5", n_salts=n_salts,
            )
        ) == base

    check()


def test_dsir_resample_plan_salted_no_corpus_window(spark, frames):
    """Plan pin (r13): the resample plan has EXACTLY the two
    salted_topk windows — phase 1 partitioned by the salt, phase 2
    over the bounded survivor set — plus the broadcast ratio join and
    the persisted featurization; never a corpus-wide ranking window
    and never a SortMergeJoin against the bounded dims."""
    import contextlib
    import io

    from kafka_dead_letter_analyzer_spark import cache_registry

    raw, tgt = frames
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        SEL.dsir_resample(
            raw, tgt, k=3, n_max=NMAX, num_buckets=B
        ).explain("formatted")
    s = buf.getvalue()
    import re as _re

    assert len(_re.findall(r"\(\d+\) Window\b", s)) == 2, s
    assert "_skt_salt" in s
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s
    assert "InMemoryTableScan" in s
    cache_registry.release_all()
