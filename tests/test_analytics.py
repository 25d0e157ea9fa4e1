"""Unit + differential tests for operators/analytics.py: exact
percentiles (nearest-rank semantics), RANGE-frame rolling sums (gap
days), centroid partition-independence, and the sketch-vs-exact bounds
for approx_count_distinct / percentile_approx."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_dead_letter_analyzer_spark.operators import analytics as AN
from kafka_dead_letter_analyzer_spark.sources.batch import load_table

SF = "/root/testdata/sf0.001"


def test_exact_percentiles_nearest_rank_on_known_data(spark):
    # 10 values 1..10: nearest-rank p50 = ceil(0.5*10) = rank 5 -> 5.0,
    # p90 = rank 9 -> 9.0, p99 = ceil(9.9) = rank 10 -> 10.0
    rows = [("a", float(v), v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, v double, id int")
    out = AN.exact_percentiles(df, key="k", value_col="v", tiebreak="id")
    r = out.collect()[0]
    assert (r["p50"], r["p90"], r["p99"]) == (5.0, 9.0, 10.0)


def test_exact_percentiles_single_element_group(spark):
    df = spark.createDataFrame([("a", 7.0, 1)], "k string, v double, id int")
    r = AN.exact_percentiles(df, key="k", value_col="v", tiebreak="id").collect()[0]
    assert (r["p50"], r["p90"], r["p99"]) == (7.0, 7.0, 7.0)


def test_rolling_range_sum_respects_gap_days(spark):
    # days 0,1,9: day 9's 7-day window must NOT include days 0/1
    # (a ROWS frame would wrongly sum the adjacent rows)
    df = spark.createDataFrame(
        [("t", 0, 5), ("t", 1, 7), ("t", 9, 11)], "k string, d long, n long"
    )
    out = AN.rolling_range_sum(
        df, key="k", order_col="d", value_col="n", preceding=6, alias="r7"
    )
    got = {r["d"]: r["r7"] for r in out.collect()}
    assert got == {0: 5, 1: 12, 9: 11}


def test_centroid_sums_are_partition_independent(spark):
    emb = load_table(spark, SF, "embeddings").select(
        F.col("vec_id"), F.col("embedding"), (F.col("vec_id") % 3).alias("g")
    )
    a = AN.grouped_centroid_sums(emb, key="g", vec_col="embedding")
    b = AN.grouped_centroid_sums(
        emb.repartition(7), key="g", vec_col="embedding"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_approx_count_distinct_within_5pct_of_exact(spark):
    events = load_table(spark, SF, "events")
    joined = (
        events.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx"),
        )
        .collect()
    )
    assert joined
    for r in joined:
        assert abs(r["approx"] - r["exact"]) <= max(1, 0.05 * r["exact"]), r


def test_percentile_approx_lands_near_exact_rank(spark):
    """The sketch path (percentile_approx) must land within the 45th-55th
    exact-rank neighborhood of the exact nearest-rank p50."""
    events = load_table(spark, SF, "events").select(
        "event_type", "value", "event_id"
    )
    approx = {
        r["event_type"]: r["ap"]
        for r in events.groupBy("event_type")
        .agg(F.percentile_approx("value", 0.5, 10000).alias("ap"))
        .collect()
    }
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in AN.exact_percentiles(
            events,
            key="event_type",
            value_col="value",
            tiebreak="event_id",
            percentiles={"lo": (45, 100), "hi": (55, 100)},
        ).collect()
    }
    for t, ap in approx.items():
        lo, hi = bounds[t]
        assert lo <= ap <= hi, (t, lo, ap, hi)


def test_ngram_overlap_flags_planted_contamination(spark):
    from kafka_dead_letter_analyzer_spark.operators import contamination as CN

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            # contains the benchmark's first 8 tokens verbatim -> flagged
            (1, "xx " + " ".join(bench_text.split()[:8]) + " yy"),
            # shares only a 4-token span -> no 8-gram overlap -> clean
            (2, "alpha beta gamma delta nothing else here at all ok"),
            (3, "completely unrelated text with many distinct tokens here"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    got = {r["doc_id"]: r["shared_ngrams"] for r in CN.ngram_overlap(
        corpus, bench, n=8
    ).collect()}
    assert got == {1: 1}


def test_repetition_counts_on_known_doc(spark):
    from kafka_dead_letter_analyzer_spark.operators import dedup as D
    import pyspark.sql.functions as F

    # "a b a b a b" -> trigrams: "a b a","b a b","a b a","b a b" (4 total,
    # 2 distinct, max count 2)
    df = spark.createDataFrame([("a b a b a b",)], "text string")
    grams = df.select(F.explode(D.token_grams(F.col("text"), 3)).alias("g"))
    per = grams.groupBy("g").count().collect()
    assert sorted((r["g"], r["count"]) for r in per) == [
        ("a b a", 2), ("b a b", 2)
    ]


def test_exact_percentiles_ignore_nulls(spark):
    rows = [("a", None, 0)] + [("a", float(v), v) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "k string, v double, id int")
    r = AN.exact_percentiles(df, key="k", value_col="v", tiebreak="id").collect()[0]
    # same answers as the no-null fixture: nulls must not shift ranks
    assert (r["p50"], r["p90"], r["p99"]) == (5.0, 9.0, 10.0)


def test_contamination_empty_benchmark_yields_no_rows(spark):
    from kafka_dead_letter_analyzer_spark.operators import contamination as CN

    corpus = spark.createDataFrame(
        [(1, "some text with enough tokens to form an eight gram here")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([], "doc_id long, text string")
    assert CN.ngram_overlap(corpus, bench, n=8).count() == 0


def test_funnel_stages_strictly_ordered(spark):
    """A purchase BEFORE the first click must not count: stage events
    qualify only strictly after the previous stage's first event."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        # user 1: view -> click -> purchase (all advance)
        (1, "view", t0), (1, "click", t0 + dt.timedelta(minutes=1)),
        (1, "purchase", t0 + dt.timedelta(minutes=2)),
        # user 2: purchase BEFORE click: reaches click, not purchase
        (2, "view", t0), (2, "purchase", t0 + dt.timedelta(minutes=1)),
        (2, "click", t0 + dt.timedelta(minutes=2)),
        # user 3: view only
        (3, "view", t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    import kafka_dead_letter_analyzer_spark.queries as Q
    from unittest import mock

    with mock.patch.object(Q, "load_table", lambda spark, sf, name: df):
        out = {r["stage"]: r["users"] for r in Q.x_event_funnel(spark, "-").collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_spread_for_cpu_widens_narrow_and_keeps_wide(spark):
    from kafka_dead_letter_analyzer_spark.operators.io import spread_for_cpu

    narrow = spark.range(100).coalesce(1)
    assert spread_for_cpu(narrow, min_partitions=8).rdd.getNumPartitions() == 8
    wide = spark.range(100).repartition(16)
    # already at/above target: returned as-is, no extra exchange
    assert spread_for_cpu(wide, min_partitions=8) is wide


def test_write_clustered_produces_disjoint_key_ranges(spark, tmp_path):
    """Each output file must cover a disjoint doc_id range (tight footer
    min/max = file-level pruning for range predicates downstream)."""
    import glob

    import pyarrow.parquet as pq

    from kafka_dead_letter_analyzer_spark.operators.io import write_clustered
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "lang")
    out = str(tmp_path / "clustered")
    write_clustered(docs, out, cluster_by=["doc_id"], num_files=4)
    ranges = []
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f, columns=["doc_id"])
        if t.num_rows:
            ids = t.column("doc_id").to_pylist()
            assert ids == sorted(ids)  # sorted within the file
            ranges.append((min(ids), max(ids)))
    ranges.sort()
    assert len(ranges) >= 2  # actually split
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # disjoint: file-level min/max prunes


def test_dedup_against_corpus_drops_known_and_batch_dups(spark):
    from kafka_dead_letter_analyzer_spark.operators import dedup as D

    known = spark.createDataFrame(
        [("k1",)], "fingerprint string"
    )
    # compute the real fingerprint of "already seen" to plant a hit
    import pyspark.sql.functions as F
    from kafka_dead_letter_analyzer_spark.operators.text import fingerprint

    seen_fp = (
        spark.createDataFrame([("already seen",)], "text string")
        .select(fingerprint(F.col("text")).alias("f"))
        .collect()[0]["f"]
    )
    known = spark.createDataFrame([(seen_fp,)], "fingerprint string")
    batch = spark.createDataFrame(
        [
            (1, "already seen"),          # known -> dropped
            (2, "brand new text"),        # kept
            (3, "brand new text"),        # batch dup of 2 -> dropped
            (4, "another new one"),       # kept
        ],
        "doc_id long, text string",
    )
    kept, fresh = D.dedup_against_corpus(batch, known)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    assert fresh.count() == 2  # two new fingerprints to append to the index


def test_exact_percentiles_match_numpy_nearest_rank_property(spark):
    """Property: for random integer datasets, every emitted percentile
    equals the ceil(p*n)-th order statistic (nearest-rank definition)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
        )
    )
    def check(values):
        rows = [("g", float(v), i) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "k string, v double, id int")
        r = AN.exact_percentiles(
            df, key="k", value_col="v", tiebreak="id"
        ).collect()[0]
        sv = sorted(float(v) for v in values)
        n = len(sv)
        for name, (num, den) in AN.DEFAULT_PERCENTILES.items():
            rank = -(-num * n // den)  # ceil
            assert r[name] == sv[rank - 1], (name, values)

    check()


def test_max_multiplicity_matches_counter_property(spark):
    """Property: the sorted-run aggregate equals Counter max multiplicity
    for random small-alphabet token arrays (high collision rate)."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyspark.sql.functions as F
    from kafka_dead_letter_analyzer_spark.operators.text import _max_multiplicity

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from(["a", "b", "c", "d"]), max_size=30),
            min_size=1,
            max_size=8,
        )
    )
    def check(arrays):
        df = spark.createDataFrame(
            [(i, a) for i, a in enumerate(arrays)], "i int, arr array<string>"
        )
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", _max_multiplicity(F.array_sort("arr")).alias("m")
            ).collect()
        }
        for i, a in enumerate(arrays):
            expect = max(Counter(a).values()) if a else 0
            assert got[i] == expect, (a, got[i], expect)

    check()


def test_fuzzy_pairs_complete_recall_property(spark):
    """SymSpell property: EVERY pair within Levenshtein distance 2 must
    be found by the deletion-neighborhood blocking — compare against
    python-Levenshtein all-pairs on random short words."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_dead_letter_analyzer_spark.operators.fuzzy import fuzzy_key_pairs

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=2, max_size=12, unique=True,
        )
    )
    def check(words):
        df = spark.createDataFrame([(w,) for w in words], "tok string")
        got = {
            (r["tok_a"], r["tok_b"], r["dist"])
            for r in fuzzy_key_pairs(df, max_distance=2).collect()
        }
        expect = set()
        for i, a in enumerate(words):
            for b in words[i + 1:]:
                x, y = sorted((a, b))
                d = lev(x, y)
                if d <= 2:
                    expect.add((x, y, d))
        assert got == expect, (sorted(words), got ^ expect)

    check()


def test_load_table_normalizes_nanos_on_any_column(spark, tmp_path):
    """The driver regenerates testdata per round and the parquet
    timestamp physical type has changed twice; NANOS columns (read as
    bigint under the legacy conf) must normalize to TimestampType by
    FOOTER inspection, whatever the column is called."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    t = pa.table({
        "weird_ts": pa.array(
            [dt.datetime(2024, 1, 1, 12, 0, 0)], type=pa.timestamp("ns")
        ),
        "v": pa.array([1], type=pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["weird_ts"] == "timestamp"
    assert str(df.collect()[0]["weird_ts"]) == "2024-01-01 12:00:00"


def test_cooccurrence_window_semantics(spark):
    """'a b c' with ±2 window: every ordered pair once; counts symmetric."""
    from kafka_dead_letter_analyzer_spark.operators.text import (
        cooccurrence_counts,
    )

    df = spark.createDataFrame([("a b c",), ("",), (None,)], "text string")
    got = {
        (r["center"], r["context"]): r["n"]
        for r in cooccurrence_counts(df, window=2).collect()
    }
    assert got == {
        ("a", "b"): 1, ("a", "c"): 1,
        ("b", "a"): 1, ("b", "c"): 1,
        ("c", "a"): 1, ("c", "b"): 1,
    }


def test_ppmi_derives_from_cooccurrence_counts(spark):
    """Downstream contract: PPMI computed from cooccurrence_counts equals
    a direct Python computation — the embedding-training handoff works
    from the emitted integer counts alone."""
    import math
    from collections import Counter

    from kafka_dead_letter_analyzer_spark.operators.text import (
        cooccurrence_counts,
    )
    import pyspark.sql.functions as F

    corpus = ["a b a c", "b a b d", "c a a b"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    counts = {
        (r["center"], r["context"]): r["n"]
        for r in cooccurrence_counts(df, window=2).collect()
    }
    total = sum(counts.values())
    row = Counter()
    col = Counter()
    for (c, x), n in counts.items():
        row[c] += n
        col[x] += n
    # python reference PPMI
    expect = {
        k: max(0.0, math.log((n / total) / ((row[k[0]] / total) * (col[k[1]] / total))))
        for k, n in counts.items()
    }
    # same arithmetic from the Spark counts via SQL expressions
    cdf = spark.createDataFrame(
        [(c, x, n) for (c, x), n in counts.items()], "c string, x string, n long"
    )
    tot = cdf.agg(F.sum("n").alias("t"))
    rows = cdf.groupBy("c").agg(F.sum("n").alias("rn"))
    cols = cdf.groupBy("x").agg(F.sum("n").alias("cn"))
    ppmi = (
        cdf.join(rows, "c").join(cols, "x").crossJoin(F.broadcast(tot))
        .select("c", "x",
                F.greatest(F.lit(0.0),
                           F.log((F.col("n") * F.col("t")) /
                                 (F.col("rn") * F.col("cn")))).alias("p"))
    )
    got = {(r["c"], r["x"]): r["p"] for r in ppmi.collect()}
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9, k


def test_dedup_against_corpus_collapses_null_text(spark):
    """NULL-text docs must share the blank fingerprint group: one kept in
    the first batch, none in later batches (a NULL join key would never
    match the anti-join and leak one blank doc per batch)."""
    from kafka_dead_letter_analyzer_spark.operators import dedup as D

    b1 = spark.createDataFrame(
        [(1, None), (2, "real text here")], "doc_id long, text string"
    )
    kept1, fresh1 = D.dedup_against_corpus(
        b1, spark.createDataFrame([], "fingerprint string")
    )
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]
    index = fresh1
    b2 = spark.createDataFrame(
        [(5, None), (6, "")], "doc_id long, text string"
    )
    kept2, _ = D.dedup_against_corpus(b2, index)
    # both are blank-content: already in the index from batch 1
    assert kept2.count() == 0


# ---------------------------------------------------------------------------
# key_skew_profile: histogram-contraction percentiles on a known distribution
# ---------------------------------------------------------------------------


def test_key_skew_profile_known_distribution(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as PR

    # 9 keys with 1 row each + 1 key with 91 rows: distinct=10, total=100,
    # max=91, p50 = count at 5th key = 1, p90 = 9th = 1, p99 = 10th = 91,
    # mean = 10 -> skew ratio = 9.1x = 9_100_000 ppm
    rows = [(f"k{i}",) for i in range(9)] + [("hot",)] * 91
    df = spark.createDataFrame(rows, "k string")
    r = PR.key_skew_profile(df, "k").collect()[0]
    assert (r["distinct_keys"], r["total_rows"], r["max_cnt"]) == (10, 100, 91)
    assert (r["p50_cnt"], r["p90_cnt"], r["p99_cnt"]) == (1, 1, 91)
    assert r["skew_ratio_ppm"] == 9_100_000


def test_key_skew_profile_uniform(spark):
    from kafka_dead_letter_analyzer_spark.operators import profile as PR

    df = spark.range(0, 400).select((F.col("id") % 100).alias("k"))
    r = PR.key_skew_profile(df, "k").collect()[0]
    assert (r["distinct_keys"], r["total_rows"], r["max_cnt"]) == (100, 400, 4)
    assert (r["p50_cnt"], r["p90_cnt"], r["p99_cnt"]) == (4, 4, 4)
    assert r["skew_ratio_ppm"] == 1_000_000  # max == mean


# ---------------------------------------------------------------------------
# distinctive_terms: integer TF-IDF ranking
# ---------------------------------------------------------------------------


def test_distinctive_terms_ranks_rare_over_common(spark):
    from kafka_dead_letter_analyzer_spark.operators import text as TX

    # "the" appears in every doc (df=4); "espresso" only in the two docs of
    # lang a (df=2) with the same tf -> espresso must outrank the in lang a.
    rows = [
        (1, "a", "the espresso espresso"),
        (2, "a", "the espresso espresso"),
        (3, "b", "the tundra"),
        (4, "b", "the tundra"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = TX.distinctive_terms(df, group_col="lang", k=3).collect()
    by = {(r["lang"], r["term"]): r for r in out}
    a_esp, a_the = by[("a", "espresso")], by[("a", "the")]
    assert a_esp["tf"] == 4 and a_esp["df"] == 2
    assert a_the["tf"] == 2 and a_the["df"] == 4
    assert a_esp["score"] == 2_000_000 and a_the["score"] == 500_000
    assert a_esp["rnk"] < a_the["rnk"]
    b_tun = by[("b", "tundra")]
    assert b_tun["rnk"] == 1  # tf=2, df=2 -> 1e6 > the's 5e5


def test_distinctive_terms_k_limits_per_group(spark):
    from kafka_dead_letter_analyzer_spark.operators import text as TX

    rows = [(i, "x", " ".join(f"w{j}" for j in range(10))) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = TX.distinctive_terms(df, group_col="lang", k=4).collect()
    assert len(out) == 4
    assert sorted(r["rnk"] for r in out) == [1, 2, 3, 4]


# ---------------------------------------------------------------------------
# z-order interleave
# ---------------------------------------------------------------------------


def test_zorder_value_interleaves_known_bits(spark):
    from kafka_dead_letter_analyzer_spark.operators import io as IO

    # x=5 (101) at even bit positions, y=3 (011) at odd:
    # z = (1 + 16) + 2*(1 + 4) = 27
    df = spark.createDataFrame([(5, 3)], "a bigint, b bigint")
    [r] = df.select(IO.zorder_value(F.col("a"), F.col("b")).alias("z")).collect()
    assert r["z"] == 27
    # order matters: swapping dimensions gives the transposed code
    [r2] = df.select(IO.zorder_value(F.col("b"), F.col("a")).alias("z")).collect()

    def morton(x, y):
        z = 0
        for i in range(31):
            z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return z

    assert r["z"] == morton(5, 3)
    assert r2["z"] == morton(3, 5)


def test_zorder_value_max_domain_stays_positive(spark):
    from kafka_dead_letter_analyzer_spark.operators import io as IO

    m = 0x7FFFFFFF
    df = spark.createDataFrame([(m, m), (m + 5, 0)], "a bigint, b bigint")
    rows = df.select(IO.zorder_value(F.col("a"), F.col("b")).alias("z")).collect()
    assert all(r["z"] >= 0 for r in rows)
    # full-ones inputs interleave to full 62 ones
    assert rows[0]["z"] == (1 << 62) - 1


def test_zorder_locality_prunes_both_dimensions(spark, tmp_path):
    """The point of the layout: cluster on z, then a selective filter on
    EITHER dimension touches only a subset of files (parquet min/max on
    the filter column do the pruning; here we check the weaker, engine-
    independent property that z-sorted row groups have tight per-file
    ranges in both dimensions)."""
    from kafka_dead_letter_analyzer_spark.operators import io as IO

    df = spark.range(0, 4096).selectExpr(
        "CAST(id % 64 AS BIGINT) AS a", "CAST(id DIV 64 AS BIGINT) AS b"
    )
    path = str(tmp_path / "zsorted")
    IO.write_clustered(
        df.withColumn("z", IO.zorder_value(F.col("a"), F.col("b"))),
        path,
        ["z"],
        num_files=16,
    )
    import glob

    spans_a, spans_b = [], []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        pf = spark.read.parquet(f)
        row = pf.agg(
            F.min("a").alias("a0"), F.max("a").alias("a1"),
            F.min("b").alias("b0"), F.max("b").alias("b1"),
        ).collect()[0]
        spans_a.append(row["a1"] - row["a0"])
        spans_b.append(row["b1"] - row["b0"])
    # a lexicographic (a, b) sort would give full-range spans (63) in b
    # for every file; z-order keeps BOTH average spans well under range
    assert sum(spans_a) / len(spans_a) < 40
    assert sum(spans_b) / len(spans_b) < 40


# ---------------------------------------------------------------------------
# salted join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    from kafka_dead_letter_analyzer_spark.operators.joins import salted_join

    # one hot key carrying most of the facts + cold keys + an unmatched key
    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"cold{i}", i * 2) for i in range(500)]
        + [(9999, "orphan", 0)],
        "event_id bigint, k string, v bigint",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("cold10", 2), ("cold20", 3)], "k string, attr int"
    )
    plain = {(r["event_id"], r["attr"]) for r in facts.join(dim, "k").collect()}
    salted = {
        (r["event_id"], r["attr"])
        for r in salted_join(facts, dim, key="k", salt_on="event_id").collect()
    }
    assert salted == plain and len(plain) > 400

    l_plain = {
        (r["event_id"], r["attr"])
        for r in facts.join(dim, "k", "left").collect()
    }
    l_salted = {
        (r["event_id"], r["attr"])
        for r in salted_join(
            facts, dim, key="k", salt_on="event_id", how="left"
        ).collect()
    }
    assert l_salted == l_plain  # unmatched orphan survives with NULL attr


def test_salted_join_spreads_hot_key_across_salts(spark):
    from kafka_dead_letter_analyzer_spark.operators.joins import salted_join
    import pyspark.sql.functions as FF

    facts = spark.createDataFrame(
        [(i, "hot") for i in range(1000)], "event_id bigint, k string"
    )
    dim = spark.createDataFrame([("hot", 1)], "k string, attr int")
    f = facts.withColumn(
        "_salt", FF.pmod(FF.xxhash64(FF.col("event_id")), FF.lit(8)).cast("int")
    )
    n_salts = f.select("_salt").distinct().count()
    assert n_salts == 8  # the hot key's rows really spread
    with pytest.raises(ValueError):
        salted_join(facts, dim, key="k", salt_on="event_id", salt_factor=0)


def test_jsonl_round_trip_preserves_rows_and_schema(spark, tmp_path):
    from kafka_dead_letter_analyzer_spark.operators.io import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.createDataFrame(
        [(1, "hello world", "en", None), (2, 'quote " and \\ back', "de", 7)],
        "doc_id bigint, text string, lang string, score bigint",
    )
    path = str(tmp_path / "corpus_jsonl")
    write_jsonl(df, path, num_files=2)
    back = read_jsonl(
        spark, path, schema="doc_id bigint, text string, lang string, score bigint"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    import glob

    assert len(glob.glob(path + "/part-*.json.gz")) == 2  # sharded + gzip'd


def test_jsonl_read_survives_corrupt_lines(spark, tmp_path):
    from kafka_dead_letter_analyzer_spark.operators.io import read_jsonl

    p = tmp_path / "dirty"
    p.mkdir()
    (p / "a.jsonl").write_text(
        '{"doc_id": 1, "text": "ok"}\nTHIS IS NOT JSON\n{"doc_id": 2, "text": "fine"}\n'
    )
    df = read_jsonl(
        spark, str(p),
        schema="doc_id bigint, text string, _corrupt_record string",
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["doc_id"] for r in good} == {1, 2}
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt_record"]


def test_trimmed_stats_drops_outliers_exactly(spark):
    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        trimmed_stats,
    )

    # 100 values 1..100 -> keep ranks ceil(5)..floor(95) = 5..95
    rows = [(i, float(i), "t") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "event_id long, value double, event_type string")
    [r] = trimmed_stats(
        df, key="event_type", value_col="value", tiebreak="event_id"
    ).collect()
    assert r["n_kept"] == 91
    assert r["lo_scaled"] == 5_000_000 and r["hi_scaled"] == 95_000_000
    assert r["sum_scaled"] == sum(i * 1_000_000 for i in range(5, 96))
    assert r["trimmed_mean_scaled"] == r["sum_scaled"] // 91


def test_trimmed_stats_negative_values_match_duckdb_truncation(spark):
    """Round-4 advice flagged Spark DIV (truncates) vs DuckDB // as a
    floor/truncate divergence for negative trimmed sums. Probed: DuckDB
    1.0 integer // ALSO truncates toward zero (-7 // 3 == -2), so the
    engines agree with no reformulation — pinned here with an
    all-negative corpus against a live DuckDB oracle, the exact query
    shape x_trimmed_stats declares."""
    import duckdb

    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        trimmed_stats,
    )

    rows = [(i, -float(i) / 7.0, "t") for i in range(1, 30)]
    df = spark.createDataFrame(
        rows, "event_id long, value double, event_type string"
    )
    [got] = trimmed_stats(
        df, key="event_type", value_col="value", tiebreak="event_id"
    ).collect()
    assert got["sum_scaled"] < 0  # the divergence precondition
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ",".join(
            f"({i}, CAST({-i/7.0!r} AS DOUBLE), 't')" for i in range(1, 30)
        )
        + ") t(event_id, value, event_type)"
    )
    [(mean_oracle, sum_oracle)] = con.execute(
        """
        WITH r AS (
          SELECT event_type,
                 CAST(floor(value * 1000000) AS BIGINT) AS v,
                 row_number() OVER w AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events WHERE value IS NOT NULL
          WINDOW w AS (PARTITION BY event_type
                       ORDER BY CAST(floor(value * 1000000) AS BIGINT), event_id)
        )
        SELECT CAST(sum(v) // count(*) AS BIGINT),
               CAST(sum(v) AS BIGINT)
        FROM r
        WHERE rn >= (5 * n + 99) // 100 AND rn <= (95 * n) // 100
        GROUP BY event_type
        """
    ).fetchall()
    assert got["sum_scaled"] == sum_oracle
    assert got["trimmed_mean_scaled"] == mean_oracle


def test_fuzzy_ed1_recall_property(spark):
    """ED-1 blocking tier (single-deletion neighborhoods): every pair
    within Levenshtein distance 1 is found, none beyond — hypothesis
    against a from-scratch all-pairs DP, plus a directed
    one-random-edit recall check."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_dead_letter_analyzer_spark.operators.fuzzy import (
        fuzzy_key_pairs,
    )

    def lev(a, b):
        la, lb = len(a), len(b)
        prev = list(range(lb + 1))
        for i in range(1, la + 1):
            cur = [i] + [0] * lb
            for j in range(1, lb + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[lb]

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5),
            min_size=2, max_size=10, unique=True,
        ),
        st.randoms(use_true_random=False),
    )
    def check(words, rnd):
        # plant a guaranteed 1-edit neighbor of the first word
        base = words[0]
        ops = ["del", "sub", "ins"]
        op = rnd.choice(ops)
        i = rnd.randrange(len(base))
        if op == "del" and len(base) > 1:
            planted = base[:i] + base[i + 1:]
        elif op == "sub":
            planted = base[:i] + ("z" if base[i] != "z" else "y") + base[i + 1:]
        else:
            planted = base[:i] + "z" + base[i:]
        corpus = list(dict.fromkeys(words + [planted]))
        df = spark.createDataFrame([(w,) for w in corpus], "tok string")
        got = {
            (r["tok_a"], r["tok_b"], r["dist"])
            for r in fuzzy_key_pairs(df, max_distance=1).collect()
        }
        expect = set()
        for ii, a in enumerate(corpus):
            for b in corpus[ii + 1:]:
                x, y = sorted((a, b))
                dd = lev(x, y)
                if dd <= 1:
                    expect.add((x, y, dd))
        assert got == expect
        if planted != base:
            x, y = sorted((base, planted))
            assert (x, y, 1) in got  # the planted edit was recalled

    check()


def test_weighted_reservoir_partition_independent_and_monotone(spark):
    """Priority sampling (u/w, integer operands, exact-rounded divide):
    same k rows under any partitioning; inclusion frequency across salts
    rises with weight; exactly k rows; non-positive/NULL weights never
    qualify."""
    from kafka_dead_letter_analyzer_spark.operators.sampling import (
        weighted_reservoir_topk,
    )

    rows = [(i, (i % 10) + 1) for i in range(300)] + [
        (1000, None), (1001, 0), (1002, -5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w int")
    a = [tuple(r) for r in weighted_reservoir_topk(df, "doc_id", "w", 40).collect()]
    b = [
        tuple(r)
        for r in weighted_reservoir_topk(
            df.repartition(13), "doc_id", "w", 40
        ).collect()
    ]
    assert a == b and len(a) == 40
    ids = {r[0] for r in a}
    assert ids.isdisjoint({1000, 1001, 1002})
    assert [r[2] for r in a] == list(range(1, 41))  # wrs_rank 1..k

    # monotonicity: over many salts, weight-10 docs are picked far more
    # often than weight-1 docs (PPS behavior of the u/w order statistic)
    from collections import Counter

    freq = Counter()
    for s in range(30):
        sel = weighted_reservoir_topk(
            df, "doc_id", "w", 60, salt=f"s{s}"
        ).collect()
        for r in sel:
            freq[r["w"]] += 1
    heavy = sum(freq[w] for w in (9, 10))
    light = sum(freq[w] for w in (1, 2))
    assert heavy > 3 * light, (heavy, light)


def test_weighted_reservoir_plan_is_take_ordered(spark):
    """The global top-k must be TakeOrderedAndProject — no full corpus
    sort Exchange at 100 TB."""
    from kafka_dead_letter_analyzer_spark.operators.sampling import (
        weighted_reservoir_topk,
    )
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "n_chars")
    plan = (
        weighted_reservoir_topk(docs, "doc_id", "n_chars", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_mad_outliers_robust_to_planted_corruption(spark):
    """A planted extreme value must be flagged without moving the median
    or MAD materially (breakdown-point property), and the counts must
    match a from-scratch computation."""
    import statistics

    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        mad_outliers,
    )

    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 1e9]  # one corruption
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    rows += [(100 + i, "b", 5.0) for i in range(5)]  # constant group
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    got = {
        r["event_type"]: (r["med"], r["mad"], r["n_outliers"], r["n_total"])
        for r in mad_outliers(
            df, key="event_type", value_col="value", tiebreak="event_id"
        ).collect()
    }

    def scratch(vs):
        m = sorted(vs)[(len(vs) + 1) // 2 - 1]  # nearest-rank lower median
        devs = sorted(abs(v - m) for v in vs)
        mad = devs[(len(devs) + 1) // 2 - 1]
        out = sum(1 for v in vs if abs(v - m) > 3 * mad)
        return m, mad, out, len(vs)

    a_v = [int(v * 1_000_000) for v in vals]
    b_v = [5_000_000] * 5
    assert got["a"] == scratch(a_v), (got["a"], scratch(a_v))
    assert got["b"] == scratch(b_v)
    # the corruption is flagged, the median stayed in the clean range
    assert got["a"][2] >= 1 and 10_000_000 <= got["a"][0] <= 16_000_000
    # constant group: MAD 0 -> nothing flagged
    assert got["b"][1] == 0 and got["b"][2] == 0


def test_skyline_2d_matches_bruteforce_property(spark):
    """skyline_2d vs O(n^2) dominance on seeded random point sets with
    heavy coordinate ties and exact-duplicate points."""
    import random

    from kafka_dead_letter_analyzer_spark.operators.analytics import skyline_2d

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [(i, rng.randrange(8), rng.randrange(8)) for i in range(80)]
        rows += [(1000, 7, 0), (1001, 7, 0)]  # duplicated optimum
        df = spark.createDataFrame(rows, "id bigint, a bigint, b bigint")
        got = {r["id"] for r in skyline_2d(df, "id", "a", "b").collect()}
        exp = {
            r[0]
            for r in rows
            if not any(
                s[1] >= r[1] and s[2] <= r[2] and (s[1] > r[1] or s[2] < r[2])
                for s in rows
            )
        }
        assert got == exp, (seed, got ^ exp)


def test_gini_terms_and_quantile_normalize_scratch(spark):
    """x_gini_concentration's sorted-rank identity and
    x_quantile_normalize's rank mapping vs from-scratch computations on
    a hand-made frame (ties included)."""
    import kafka_dead_letter_analyzer_spark.queries as Q
    import tempfile, os

    rows = [(i, "a", v) for i, v in enumerate([1.0, 1.0, 2.0, 10.0])]
    rows += [(50, "b", 7.0)]
    df = spark.createDataFrame(rows, "event_id bigint, event_type string, value double")
    with tempfile.TemporaryDirectory() as d:
        df.withColumn("ts", F.current_timestamp()).withColumn(
            "user_id", F.lit(1)
        ).withColumn("props", F.lit("{}")).write.parquet(os.path.join(d, "events.parquet"))
        gini = {
            r["event_type"]: (r["gini_num"], r["gini_den"], r["n_rows"])
            for r in Q.x_gini_concentration(spark, d).collect()
        }
        qn = {
            r["event_id"]: r["quantile_ppm"]
            for r in Q.x_quantile_normalize(spark, d).collect()
        }
    a = [1_000_000, 1_000_000, 2_000_000, 10_000_000]
    n = len(a)
    num = sum((2 * (i + 1) - n - 1) * v for i, v in enumerate(sorted(a)))
    assert gini["a"] == (num, n * sum(a), n)
    assert gini["b"] == (0, 7_000_000, 1)
    # min-rank ties: both 1.0s map to rank 1 -> 0 ppm; 2.0 -> rank 3;
    # 10.0 -> rank 4 -> 1e6; singleton group -> 0
    assert qn[0] == 0 and qn[1] == 0
    assert qn[2] == (3 - 1) * 1_000_000 // (4 - 1)
    assert qn[3] == 1_000_000
    assert qn[50] == 0


# ---------------------------------------------------------------------------
# basket_lift


def test_basket_lift_hand_computed(spark):
    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        basket_lift,
    )

    # 4 baskets: {a,b} {a,b} {a} {b} -> support(ab)=2, c_a=3, c_b=3, N=4
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"), (2, "b"),  # duplicate item collapses
        (3, "a"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "u long, it string")
    [r] = basket_lift(df, "u", "it").collect()
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["support"], r["c_a"], r["c_b"], r["n_baskets"]) == (2, 3, 3, 4)
    # lift = 2*4/(3*3) = 8/9 -> 888888 ppm-of-1 (floored)
    assert r["lift_e6"] == 8 * 10**6 // 9
    assert r["leverage_num"] == 2 * 4 - 9  # = -1: slight repulsion


def test_basket_lift_independence_is_exactly_1e6(spark):
    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        basket_lift,
    )

    # a in baskets {1,2}, b in {1,3}: support=1, c_a=c_b=2, N=4
    rows = [(1, "a"), (1, "b"), (2, "a"), (3, "b"), (4, "z")]
    df = spark.createDataFrame(rows, "u long, it string")
    out = {(r["type_a"], r["type_b"]): r for r in
           basket_lift(df, "u", "it").collect()}
    r = out[("a", "b")]
    assert r["lift_e6"] == 1_000_000 and r["leverage_num"] == 0


def test_basket_lift_min_support_prunes(spark):
    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        basket_lift,
    )

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "u long, it string")
    out = basket_lift(df, "u", "it", min_support=2).collect()
    assert [(r["type_a"], r["type_b"]) for r in out] == [("a", "c")]


# ---------------------------------------------------------------------------
# conformal_threshold


def test_conformal_rank_correction_and_coverage(spark):
    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        conformal_threshold,
    )

    # n = 9, alpha = 0.1: k = ceil(0.9 * 10) = 9 -> the MAX (a plain
    # p90 nearest-rank would take ceil(0.9*9) = rank 9 too, but at
    # n = 19: conformal k = ceil(0.9*20) = 18, plain = ceil(17.1) = 18;
    # at n = 10: conformal k = ceil(9.9) = 10, plain = ceil(9) = 9 —
    # the (n+1) correction shows up exactly there
    vals10 = [(i, 10 * i) for i in range(1, 11)]
    df = spark.createDataFrame(vals10, "id long, v long")
    [r] = conformal_threshold(df, "v", "id").collect()
    assert (r["threshold"], r["n"], r["k"]) == (100, 10, 10)

    # empirical coverage: threshold covers >= 90% of exchangeable draws
    vals = [(i, (i * 37) % 1000) for i in range(200)]
    df = spark.createDataFrame(vals, "id long, v long")
    [r] = conformal_threshold(df, "v", "id").collect()
    covered = sum(1 for _, v in vals if v <= r["threshold"])
    assert covered >= 0.9 * len(vals)


def test_conformal_small_groups_clamp_and_guard(spark):
    import pytest as _pytest

    from kafka_dead_letter_analyzer_spark.operators.analytics import (
        conformal_threshold,
    )

    df = spark.createDataFrame(
        [("a", 1, 7), ("b", 1, 3), ("b", 2, 5)],
        "g string, id long, v long",
    )
    out = {r["g"]: r for r in conformal_threshold(
        df, "v", "id", group_cols=["g"]).collect()}
    # singleton group: k clamps to n = 1, threshold = its only value
    assert (out["a"]["threshold"], out["a"]["k"]) == (7, 1)
    assert (out["b"]["threshold"], out["b"]["k"]) == (5, 2)
    with _pytest.raises(ValueError, match="alpha"):
        conformal_threshold(df, "v", "id", alpha_num=10, alpha_den=10)


def test_script_profile_matches_codepoint_brute_force(spark):
    """Round-9: per-script counts and the dominant label against a
    pure-Python codepoint scan over the same BMP ranges, including
    ties (alphabetical winner), all-zero ('none'), and NULL text."""
    from kafka_dead_letter_analyzer_spark.operators.text import (
        _SCRIPT_RANGES,
        with_script_profile,
    )

    ranges = {
        "arabic": [(0x0600, 0x06FF)],
        "cjk": [(0x4E00, 0x9FFF), (0x3040, 0x30FF)],
        "cyrillic": [(0x0400, 0x04FF)],
        "devanagari": [(0x0900, 0x097F)],
        "greek": [(0x0370, 0x03FF)],
        "hangul": [(0xAC00, 0xD7AF)],
        "latin": [(0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)],
    }
    texts = [
        "hello world",
        "привет мир",
        "你好 世界 と ひらがな",
        "مرحبا بالعالم",
        "नमस्ते दुनिया",
        "Γειά σου Κόσμε",
        "안녕하세요 세계",
        "mixed: привет hello 你好",
        "12345 !!! ...",
        "",
        None,
        "ab вг",  # 2 vs 2 tie -> alphabetical: cyrillic
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in with_script_profile(df).collect()
    }

    def brute(t):
        t = t or ""
        counts = {
            name: sum(
                1
                for ch in t
                for lo, hi in rs
                if lo <= ord(ch) <= hi
            )
            for name, rs in ranges.items()
        }
        best = max(counts.values()) if counts else 0
        if best == 0:
            return counts, "none"
        dom = min(k for k, v in counts.items() if v == best)
        return counts, dom

    for i, t in enumerate(texts):
        counts, dom = brute(t)
        r = out[i]
        for name in _SCRIPT_RANGES:
            assert r[f"n_{name}"] == counts[name], (i, name, t)
        assert r["script"] == dom, (i, t)


def test_shuffle_partitions_robust_to_non_numeric_conf(spark):
    """ADVICE r10: platforms that set spark.sql.shuffle.partitions to a
    non-numeric sentinel (Databricks AQE auto-optimized shuffle uses
    "auto") must not crash operator construction — the helper falls
    back to defaultParallelism, then the caller default."""
    from kafka_dead_letter_analyzer_spark.operators.io import shuffle_partitions

    assert shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )

    class _FakeConf:
        def get(self, k, d=None):
            return "auto"

    class _FakeSC:
        defaultParallelism = 7

    class _FakeSpark:
        conf = _FakeConf()
        sparkContext = _FakeSC()

    assert shuffle_partitions(_FakeSpark()) == 7

    class _NoSC:  # Spark Connect: sparkContext raises client-side
        conf = _FakeConf()

        @property
        def sparkContext(self):
            raise RuntimeError("not supported in Spark Connect")

    assert shuffle_partitions(_NoSC()) == 200
