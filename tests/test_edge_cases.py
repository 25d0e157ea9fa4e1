"""Differential edge-case tests: the engine's scalar operators vs direct
Python reimplementations of the reference semantics, over one batch of
adversarial inputs (empty strings, unicode, exotic whitespace, regex
metacharacters, huge values). One Spark job per operator family.

The Python oracles are deliberately independent reimplementations of the
reference logic (StackTraceClassifier.java:36-67, HeaderHelper.java:36-64,
token semantics of operators/text.py) — differential testing, not
self-comparison.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

NASTY = [
    "",
    " ",
    "\n",
    "\t",
    "\n\n\n",
    "x",
    "j",  # single char, matches EXCEPTION_RE
    "java.lang.RuntimeException",
    "java.lang.RuntimeException: boom",
    "java.lang.RuntimeException: boom\n\tat com.example.App.run(App.java:12)",
    "\tat com.example.App.run(App.java:12)",  # frame on first line
    "\tat com.example.App.run(App.java:12)\n\tat other.Frame.go(Frame.java:1)",
    "NoColonFirstLine\n\tat a.b.C.d(C.java:9)",
    "ünïcödé exception: ärger\nzweite zeile",
    "$Lambda$123/0x00: weird\n\tat a.B.c(B.java:3)",
    "a: b\n\tat not_a_frame(",
    "(parens) first [brackets]",
    "multi word first line with trailing tab\t\nsecond",
    "x" * 10_000,
    "line1\r\nline2",  # carriage return is NOT a split char in either impl
    "  leading spaces\n\tat p.Q.r(Q.java:5)",
    "\tat bad.java:12)\nfallback.Class",
    "日本語のエラー: 失敗\n\tat jp.co.Ex.run(Ex.java:7)",
]

# re.ASCII: Java regex \w is ASCII-only (no UNICODE_CHARACTER_CLASS) — the
# reference's semantics, which Spark (Java regex) and DuckDB (RE2) share.
STACK_FRAME_RE = re.compile(r"(?:\n|^)\tat ([.\w]+\(\w+.java:\d+\))(?:\n|$)", re.ASCII)
EXCEPTION_RE = re.compile(r"^([.\w$]+).*", re.ASCII)


def classify_py(st: str) -> str:
    """Reference StackTraceClassifier.java:42-45 reimplemented directly."""
    first = st.split("\n")[0]
    m = STACK_FRAME_RE.search(st)
    if m and m.group(1):
        return m.group(1)
    m = EXCEPTION_RE.match(first)
    if m and m.group(1):
        return m.group(1)
    return first


def token_count_py(t: str) -> int:
    return len(t.split())  # == count of \S+ runs


@pytest.fixture(scope="module")
def nasty_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(NASTY)], "i int, s string"
    )


def test_classifier_matches_reference_reimplementation(spark, nasty_df):
    from kafka_dead_letter_analyzer_spark.functions.classify import (
        classify_stack_trace,
    )

    got = {
        r["i"]: r["c"]
        for r in nasty_df.select("i", classify_stack_trace("s").alias("c")).collect()
    }
    for i, s in enumerate(NASTY):
        assert got[i] == classify_py(s), f"case {i}: {s[:60]!r}"


def test_classifier_null_input_is_null(spark):
    from kafka_dead_letter_analyzer_spark.functions.classify import (
        classify_stack_trace,
    )

    df = spark.createDataFrame([(None,)], "s string")
    [row] = df.select(classify_stack_trace("s").alias("c")).collect()
    assert row["c"] is None


def test_token_count_matches_python(spark, nasty_df):
    from kafka_dead_letter_analyzer_spark.operators.text import token_count

    got = {
        r["i"]: r["n"]
        for r in nasty_df.select("i", token_count("s").alias("n")).collect()
    }
    for i, s in enumerate(NASTY):
        assert got[i] == token_count_py(s), f"case {i}: {s[:60]!r}"


def test_fingerprint_normalization_invariance(spark):
    """Same content modulo case/punctuation/whitespace -> same fingerprint;
    different content -> different."""
    from kafka_dead_letter_analyzer_spark.operators.text import fingerprint

    variants = [
        "Hello, World! 42",
        "hello world 42",
        "HELLO... world?! 42",
        "  hello\tworld\n42  ",
    ]
    other = "hello world 43"
    df = spark.createDataFrame([(s,) for s in variants + [other]], "s string")
    fps = [r["f"] for r in df.select(fingerprint("s").alias("f")).collect()]
    assert len(set(fps[:4])) == 1
    assert fps[4] != fps[0]


def test_header_multimap_last_wins(spark):
    """Duplicate header keys: the LAST occurrence wins
    (HeaderHelper.java:54-56), including a later null value shadowing an
    earlier non-null one."""
    from kafka_dead_letter_analyzer_spark.functions.headers import (
        header_string,
        headers_to_map,
    )

    df = spark.createDataFrame(
        [
            ([("k", b"first"), ("k", b"second")],),
            ([("k", b"value"), ("k", None)],),
            ([("k", None), ("k", b"recovered")],),
        ],
        "headers array<struct<key:string,value:binary>>",
    )
    hm = headers_to_map("headers")
    rows = df.select(header_string(hm, "k").alias("v")).collect()
    assert [r["v"] for r in rows] == ["second", None, "recovered"]


def test_lang_id_deterministic_tiebreak(spark):
    """All-zero scores -> 'und'; equal nonzero scores -> alphabetically
    first language (documented determinism rule)."""
    from kafka_dead_letter_analyzer_spark.operators.text import lang_id

    df = spark.createDataFrame(
        [
            ("zzz qqq xxx",),  # no stopwords at all
            ("the der",),  # en and de tie at 1 -> 'de' (alphabetical)
            ("",),
        ],
        "s string",
    )
    rows = df.select(lang_id("s").alias("l")).collect()
    assert [r["l"] for r in rows] == ["und", "de", "und"]


def test_wordpiece_count_matches_python(spark, nasty_df):
    from kafka_dead_letter_analyzer_spark.operators.text import (
        WORDPIECE_RE,
        wordpiece_count,
    )

    got = {
        r["i"]: r["n"]
        for r in nasty_df.select("i", wordpiece_count("s").alias("n")).collect()
    }
    pat = re.compile(WORDPIECE_RE, re.ASCII)  # Java \s / class semantics
    for i, s in enumerate(NASTY):
        assert got[i] == len(pat.findall(s)), f"case {i}: {s[:60]!r}"


def test_quality_ratios_bounded_and_safe(spark, nasty_df):
    """Ratios never NaN/negative, even for empty/blank/huge inputs."""
    from kafka_dead_letter_analyzer_spark.operators.text import quality_features

    feats = quality_features("s")
    rows = nasty_df.select(
        "i",
        feats["mean_token_len"].alias("mtl"),
        feats["punct_ratio"].alias("pr"),
        feats["stopword_ratio"].alias("sr"),
    ).collect()
    assert len(rows) == len(NASTY)
    for r in rows:
        for c in ("mtl", "pr", "sr"):
            v = r[c]
            assert v is not None and v == v and v >= 0, (r["i"], c, v)
        assert r["pr"] <= 1.0


def test_repetition_stats_match_python_counter(spark, nasty_df):
    """token_grams + max-multiplicity (sorted-run aggregate) vs a direct
    Python Counter reimplementation, over the adversarial batch."""
    from collections import Counter

    from kafka_dead_letter_analyzer_spark.operators.text import repetition_stats

    def py_stats(s: str):
        # Faithful to the engine's tokenizer (dedup.py::_tokens), which
        # is deliberately IDENTICAL across Spark and the DuckDB oracles:
        # F.trim strips ASCII SPACES only (a "\n" doc is not blank), and
        # F.split uses limit=-1, which KEEPS empty fields — python
        # re.split has the same semantics, so no post-processing.
        t = s.lower().strip(" ")
        if t == "":
            return None
        toks = re.split(r"\s+", t)
        if not toks:
            return None
        if len(toks) >= 3:
            grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        else:
            grams = [" ".join(toks)]
        c = Counter(grams)
        return (len(grams), max(c.values()), len(c))

    out = {
        r["i"]: (r["n_grams"], r["max_gram_count"], r["distinct_grams"])
        for r in repetition_stats(nasty_df, id_col="i", text_col="s").collect()
    }
    for row in nasty_df.collect():
        expect = py_stats(row["s"])
        assert out.get(row["i"]) == expect, (row["s"][:40], out.get(row["i"]), expect)


# ---------------------------------------------------------------------------
# session-3 operators: null/blank/degenerate inputs
# ---------------------------------------------------------------------------


def test_weighted_sample_null_and_negative_weights_drop(spark):
    from kafka_dead_letter_analyzer_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [(1, None), (2, -5), (3, 10_000_000)], "k bigint, w bigint"
    )
    kept = {r["k"] for r in SA.weighted_bernoulli_sample(df, "k", "w", 0.5).collect()}
    # NULL threshold comparison is NULL -> dropped; negative weight can
    # never exceed a non-negative draw -> dropped; huge weight capped at 1
    assert kept == {3}


def test_mixture_sample_null_component_gets_default_rate(spark):
    from kafka_dead_letter_analyzer_spark.operators import sampling as SA

    df = spark.createDataFrame(
        [(i, None) for i in range(500)], "k bigint, src string"
    )
    all_kept = SA.mixture_sample(
        df, "k", "src", rates={"x": 0.0}, default_rate=1.0
    ).count()
    none_kept = SA.mixture_sample(
        df, "k", "src", rates={"x": 1.0}, default_rate=0.0
    ).count()
    assert all_kept == 500 and none_kept == 0


def test_distinctive_terms_ignores_blank_and_null_docs(spark):
    from kafka_dead_letter_analyzer_spark.operators import text as TX

    df = spark.createDataFrame(
        [(1, "a", "hello world"), (2, "a", ""), (3, "a", None), (4, "a", "  ")],
        "doc_id bigint, lang string, text string",
    )
    out = TX.distinctive_terms(df, k=10).collect()
    assert {r["term"] for r in out} == {"hello", "world"}
    assert all(r["df"] == 1 for r in out)  # blank docs contribute no df


def test_key_skew_profile_single_key(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as PR

    df = spark.createDataFrame([("only",)] * 7, "k string")
    r = PR.key_skew_profile(df, "k").collect()[0]
    assert (r["distinct_keys"], r["total_rows"], r["max_cnt"]) == (1, 7, 7)
    assert r["p50_cnt"] == r["p99_cnt"] == 7
    assert r["skew_ratio_ppm"] == 1_000_000


def test_quantize_embeddings_null_and_empty_vectors(spark):
    from kafka_dead_letter_analyzer_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(1, []), (2, None), (3, [1.0])],
        "vec_id bigint, embedding array<float>",
    )
    rows = S.quantize_embeddings(df).collect()
    # empty and NULL vectors produce no rows (posexplode of empty/null)
    assert {(r["vec_id"], r["pos"], r["q"]) for r in rows} == {(3, 1, 127)}


def test_global_order_index_handles_duplicate_free_single_row(spark):
    from kafka_dead_letter_analyzer_spark.operators import sampling as SA

    df = spark.createDataFrame([(42,)], "k bigint")
    [r] = SA.global_order_index(df, "k", partitions=4).collect()
    assert r["global_idx"] == 1
    spark.catalog.clearCache()


def test_dbscan_empty_and_all_noise(spark):
    """Empty input -> empty output with the declared schema; scattered
    singleton points (no neighbors) -> all noise, cluster -1."""
    from kafka_dead_letter_analyzer_spark.operators import similarity as S

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    out = S.dbscan_grid(empty, scale=1, eps=5, min_pts=2)
    assert out.columns == ["vec_id", "x", "y", "n_neighbors", "role", "cluster"]
    assert out.count() == 0

    sparse = spark.createDataFrame(
        [(i, [float(i * 1000), float(-i * 1000)]) for i in range(4)],
        "vec_id bigint, embedding array<float>",
    )
    rows = S.dbscan_grid(sparse, scale=1, eps=5, min_pts=2).collect()
    assert len(rows) == 4
    assert all(r["role"] == "noise" and r["cluster"] == -1 for r in rows)
    spark.catalog.clearCache()


def test_bfs_hops_empty_graph_and_unreachable_seeds(spark):
    """No edges -> only the seeds at hop 0; seeds with no incident edges
    never expand."""
    from kafka_dead_letter_analyzer_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    seeds = spark.createDataFrame([(7,), (9,)], "node bigint")
    for limit in (1_000_000, None):
        got = sorted(
            (r["node"], r["hop"])
            for r in bfs_hops(
                edges, seeds, max_hops=3, driver_pair_limit=limit
            ).collect()
        )
        assert got == [(7, 0), (9, 0)], (limit, got)
    spark.catalog.clearCache()


def test_mg_summary_empty_and_all_null_keys(spark):
    """Empty input and all-NULL keys both produce an empty summary (null
    keys are excluded by contract)."""
    from kafka_dead_letter_analyzer_spark.operators.sketches import mg_summary

    empty = spark.createDataFrame([], "event_type string")
    assert mg_summary(empty, "event_type", k=4).count() == 0
    nulls = spark.createDataFrame([(None,), (None,)], "event_type string")
    assert mg_summary(nulls, "event_type", k=4).count() == 0
    spark.catalog.clearCache()


def test_decay_weighted_counts_empty_and_single_row(spark):
    """Empty input -> empty output; a single row anchors the max at
    itself -> age 0 -> full weight."""
    import datetime as dt

    from kafka_dead_letter_analyzer_spark.operators.temporal import (
        decay_weighted_counts,
    )

    empty = spark.createDataFrame([], "event_type string, ts timestamp")
    assert decay_weighted_counts(empty, ["event_type"]).count() == 0
    one = spark.createDataFrame(
        [("a", dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc))],
        "event_type string, ts timestamp",
    )
    [r] = decay_weighted_counts(one, ["event_type"]).collect()
    assert (r["n_events"], r["weighted_pressure"]) == (1, 1_000_000)
