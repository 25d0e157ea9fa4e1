"""Plan-shape regression tests: the physical plans that make the engine
scale-correct, asserted so they cannot silently regress.

These inspect ``explain('formatted')`` output — cheap (no execution) and
exactly what a reviewer would check by hand (PushedFilters, ReadSchema
pruning, broadcast joins, scan counts, codegen coverage).
"""

from __future__ import annotations

import contextlib
import io

import pytest

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def Q():
    from kafka_dead_letter_analyzer_spark import queries

    return queries


def test_q1_filter_pushed_to_scan(spark, Q):
    s = plan_of(Q.tpch_q1_pricing_summary(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in s


def test_q1_column_pruning(spark, Q):
    s = plan_of(Q.tpch_q1_pricing_summary(spark, SF))
    # ReadSchema must NOT include unused wide columns like l_comment
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read_schema and all("l_comment" not in l for l in read_schema)


def test_q3_broadcasts_dimension_join(spark, Q):
    s = plan_of(Q.tpch_q3_top_orders(spark, SF))
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


def test_topology_main_is_single_scan_no_shuffle(spark, Q):
    """The full analyzer dataflow (dialect routing -> parse -> enrich ->
    main output) must be ONE scan with NO exchange — dialect branches are
    computed per-record in one pass (plans/topology.py), and nothing before
    the A1 aggregation requires a shuffle."""
    s = plan_of(Q.m1_topology_main(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Scan parquet") == 1, tree
    assert "Exchange" not in tree, tree


def test_error_stats_single_shuffle(spark, Q):
    """A1 stats: exactly one hash-partition Exchange (the reference's one
    repartition topic, R1) with partial aggregation before it."""
    s = plan_of(Q.a1_error_stats(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Exchange") == 1, tree
    assert "HashAggregate" in s


def test_first_example_uses_partial_agg_not_window(spark, Q):
    """First-per-group is min_by (partial-aggregable, one shuffle) — not a
    window sort, which would full-sort every partition at scale."""
    s = plan_of(Q.a1_first_example(spark, SF))
    assert "Window" not in s
    tree = s[: s.find("(1) ")]
    assert tree.count("Exchange") == 1, tree


def test_dedup_exact_is_one_shuffle_with_partial_agg(spark, Q):
    s = plan_of(Q.x_dedup_exact(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Exchange") == 1, tree


def test_text_stats_is_narrow(spark, Q):
    """Pure per-row projection: no exchange anywhere."""
    s = plan_of(Q.x_text_stats(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "Exchange" not in tree, tree


def test_cosine_topk_is_take_ordered(spark, Q):
    """Exact top-k compiles to TakeOrderedAndProject: per-task k-row heaps,
    no global sort, no shuffle of vector data."""
    s = plan_of(Q.x_cosine_topk(spark, SF))
    assert "TakeOrderedAndProject" in s
    tree = s[: s.find("(1) ")]
    assert "Exchange" not in tree, tree


def test_bucketed_join_is_shuffle_free(spark, tmp_path, Q):
    """Co-located join via bucketing: two tables bucketed+sorted on the
    join key join WITHOUT any Exchange — the 100 TB answer for repeated
    large-large joins (pay the shuffle once at write time)."""
    import uuid

    events = Q.load_table(spark, SF, "events")
    suffix = uuid.uuid4().hex[:8]
    for name in (f"ev_a_{suffix}", f"ev_b_{suffix}"):
        (
            events.write.bucketBy(8, "user_id")
            .sortBy("user_id")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    # disable broadcast so only bucketing can avoid the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(f"ev_a_{suffix}").join(
            spark.table(f"ev_b_{suffix}"), on="user_id"
        )
        s = plan_of(joined)
        tree = s[: s.find("(1) ")]
        assert "SortMergeJoin" in s
        assert "Exchange" not in tree, tree
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        for name in (f"ev_a_{suffix}", f"ev_b_{suffix}"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_salted_agg_two_phase_shape(spark, Q):
    """The salted A1 variant plans exactly two aggregation exchanges
    (partial over salted keys, final over real keys)."""
    from kafka_dead_letter_analyzer_spark.operators.aggregate import (
        error_statistics_salted,
    )
    from kafka_dead_letter_analyzer_spark.plans.topology import build_topology
    import kafka_dead_letter_analyzer_spark.sources.fixtures as FX

    enriched = build_topology(
        FX.raw_frame(
            spark, [FX.envelope(value_deadletter=FX.dead_letter_value())]
        )
    ).enriched
    s = plan_of(error_statistics_salted(enriched))
    tree = s[: s.find("(1) ")]
    assert tree.count("Exchange") == 2, tree


def test_minhash_candidate_shuffle_carries_no_signatures(spark, Q):
    """The minhash candidate pipeline must never shuffle shingle-hash
    arrays: every non-broadcast Exchange's input is id/band/bucket-only
    (the 12-byte-row candidate shuffle that makes LSH scale), and the
    persisted signature base means exactly ONE parquet scan.

    Needs a clean CacheManager: x_dup_graph_radius persists the SAME
    pair-table plan at this SF, and if an earlier test in the session
    built it, cache substitution collapses this whole plan into one
    InMemoryTableScan (correct engine behavior — the pin just can't
    read shuffle shapes through it)."""
    import re

    from kafka_dead_letter_analyzer_spark import cache_registry

    cache_registry.release_all()
    spark.catalog.clearCache()

    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        dedup_near_minhash,
    )

    docs = Q.load_table(spark, SF, "documents")
    s = plan_of(dedup_near_minhash(docs, num_hashes=64, bands=32))
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    # every parquet leaf is the same documents file, reached only through
    # the persisted signature base (cache node numbering varies by session)
    tree = s[: s.find("(1) ")]
    locations = set(re.findall(r"Location:.*\[([^\]]*)\]", s))
    assert len(locations) == 1 and "documents" in locations.pop(), s
    assert tree.count("InMemoryTableScan") >= 3, tree  # banding + 2 verify sides
    # detail blocks of shuffle Exchanges must not mention the signature col
    for m in re.finditer(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s):
        assert "_hashes" not in m.group(1), m.group(1)


def test_ngram_unbounded_path_has_no_nested_loop_join(spark, Q):
    """The inverted-index (unbounded) n-gram Jaccard strategy must plan as
    equi-joins on the gram/id keys — a BroadcastNestedLoopJoin or cartesian
    here would be the O(n^2) all-pairs plan the index exists to avoid."""
    from kafka_dead_letter_analyzer_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = Q.load_table(spark, SF, "documents")
    s = plan_of(ngram_jaccard_pairs(docs))  # max_id=None -> unbounded path
    assert "BroadcastNestedLoopJoin" not in s
    assert "CartesianProduct" not in s


def test_q6_all_predicates_reach_the_scan(spark, Q):
    """Scan-only filter+agg: the date range pushes into the parquet scan
    and no join of any kind appears."""
    s = plan_of(Q.tpch_q6_forecast_revenue(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in s
    assert "GreaterThanOrEqual(l_shipdate" in s and "LessThan(l_shipdate" in s
    assert "Join" not in s


def test_q5_star_join_broadcasts_dimensions(spark, Q):
    """Six-table star join: dimension sides broadcast, no nested-loop or
    cartesian fallback anywhere."""
    s = plan_of(Q.tpch_q5_local_supplier_volume(spark, SF))
    assert s.count("BroadcastHashJoin") >= 3, s
    assert "BroadcastNestedLoopJoin" not in s
    assert "CartesianProduct" not in s


def test_hash_sample_is_filter_only_no_shuffle(spark, Q):
    s = plan_of(Q.x_hash_sample(spark, SF))
    assert "Exchange" not in s  # pure scan + filter + project
    # only the sampled columns are read
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read_schema and all("text" not in l for l in read_schema)


def test_stratified_sample_is_single_shuffle(spark, Q):
    import re

    s = plan_of(Q.x_stratified_sample(spark, SF))
    # exactly one Exchange node (the rank window's hash partitioning)
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1


def test_asof_join_query_is_single_data_exchange(spark, Q):
    # union dialect: ONE hash partitioning over the unioned relation (the
    # snapshot agg side carries its own partial-agg exchange; the as-of
    # pick itself must not add more than these two)
    s = plan_of(Q.x_asof_hourly_snapshot(spark, SF))
    assert s.count("Exchange hashpartitioning") <= 2
    assert "Cartesian" not in s and "NestedLoop" not in s


def test_range_join_query_plans_hash_join(spark, Q):
    s = plan_of(Q.x_range_join(spark, SF))
    assert "NestedLoop" not in s and "Cartesian" not in s


def test_session_stats_uses_native_session_window_agg(spark, Q):
    s = plan_of(Q.x_session_stats(spark, SF))
    # native session-window aggregation, not a row-level Window sort
    assert "session_window" in s
    assert "Window" not in s.replace("session_window", "")


def test_large_message_small_path_one_python_eval(spark, Q):
    import re

    # encode + decode are each ONE Arrow-batched python stage; no shuffle
    s = plan_of(Q.x_large_message_roundtrip(spark, SF))
    assert "Exchange" not in s
    assert len(re.findall(r"\(\d+\) MapInPandas", s)) == 2


def test_session_rows_two_windows_share_one_sort_and_exchange(spark, Q):
    """x_session_rows stacks two row-level windows (gap flag -> running
    session index) over the SAME (user_id, ts) ordering: Catalyst must
    plan ONE Exchange + ONE Sort feeding both Window nodes — a second
    sort/shuffle per window would double the cost of every islands-style
    sessionization at scale."""
    import re

    s = plan_of(Q.x_session_rows(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1, s
    assert len(re.findall(r"\(\d+\) Sort", s)) == 1, s
    assert len(re.findall(r"\(\d+\) Window", s)) == 2, s


def test_corpus_pipeline_exchanges_carry_no_text_or_signatures(spark, Q):
    """End-to-end corpus pass (minhash pairs -> CC -> drop non-canonical ->
    quota sample): the final composed plan's shuffles must move only
    ids / lang / rank — never the document text or signature arrays (the
    heavy columns stay partition-local; candidate generation's own pins
    are in test_minhash_candidate_shuffle_carries_no_signatures). Also
    pins the sample's rank pushdown: a partial WindowGroupLimit BEFORE
    the final Exchange bounds what the quota shuffle moves."""
    import re

    s = plan_of(Q.x_corpus_dedup_pipeline(spark, SF))
    blocks = re.findall(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s)
    assert blocks, s
    for b in blocks:
        input_line = next(l for l in b.splitlines() if l.startswith("Input"))
        assert "text" not in input_line, b
        assert "_hashes" not in input_line and "_sig" not in input_line, b
    # rank pushdown: partial + final WindowGroupLimit around the exchange
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", s)) == 2, s


def test_token_vocab_combines_map_side_before_the_token_shuffle(spark, Q):
    """x_token_vocab_topk: the exploded token stream must partial-aggregate
    BEFORE its hash exchange (map-side combine collapses each partition's
    token stream to its local vocabulary — the property that makes a
    vocabulary pass feasible at 100 TB), and the per-lang top-k must prune
    with a partial WindowGroupLimit before the window's exchange."""
    import re

    s = plan_of(Q.x_token_vocab_topk(spark, SF))
    # explode is a narrow Generate: it appears exactly once, upstream of
    # every Exchange (plan prints top-down: Generate's node id is minimal)
    nodes = re.findall(r"\((\d+)\) (\w+)", s)
    gen = [int(i) for i, n in nodes if n == "Generate"]
    exch = [int(i) for i, n in nodes if n == "Exchange"]
    aggs = [int(i) for i, n in nodes if n == "HashAggregate"]
    assert len(gen) == 1
    assert all(g < e for g in gen for e in exch), s
    # partial agg below the first exchange, final above it
    assert min(aggs) < min(exch) < max(aggs), s
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", s)) == 2, s


def test_pii_redact_is_single_shuffle_scan_shape(spark, Q):
    """x_pii_redact_stats: regex scoring is a codegen projection over the
    scan; exactly ONE exchange (the per-lang partial agg) and the text
    column must not cross it (only counters move)."""
    import re

    s = plan_of(Q.x_pii_redact_stats(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1, s
    [block] = re.findall(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s)
    input_line = next(l for l in block.splitlines() if l.startswith("Input"))
    assert "text" not in input_line, block


def test_pack_chunks_moves_ids_not_text(spark, Q):
    """x_pack_chunks: the packing window sorts (id, lang, n_tokens) — the
    token count is projected BEFORE the exchange so document text never
    shuffles; one data exchange + the final presentation sort."""
    import re

    s = plan_of(Q.x_pack_chunks(spark, SF))
    for block in re.findall(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s):
        input_line = next(l for l in block.splitlines() if l.startswith("Input"))
        assert "text" not in input_line, block
    assert len(re.findall(r"\(\d+\) Window", s)) == 1, s


def _data_exchanges(tree: str) -> int:
    """Count shuffle Exchanges only (BroadcastExchange is not a shuffle)."""
    import re

    return len(re.findall(r"[+:]- Exchange", tree))


def test_latency_percentiles_window_and_agg_share_one_exchange(spark, Q):
    """Exact percentiles: the ordered window partitions by event_type and
    the following groupBy(event_type) must reuse that partitioning —
    exactly ONE shuffle for sort + rank-pick."""
    s = plan_of(Q.x_latency_percentiles(spark, SF))
    tree = s[: s.find("(1) ")]
    assert _data_exchanges(tree) == 1, tree
    assert "Window" in tree, tree


def test_event_type_pivot_is_single_shuffle(spark, Q):
    """The fixed-vocabulary pivot is lowered to conditional aggregation:
    one partial-agg shuffle on day (DataFrame.pivot would plan two)."""
    s = plan_of(Q.x_event_type_pivot(spark, SF))
    tree = s[: s.find("(1) ")]
    assert _data_exchanges(tree) == 1, tree


def test_lang_centroid_combines_exploded_elements_map_side(spark, Q):
    """The x64 posexplode fan-out must be combined by a partial
    HashAggregate BEFORE the shuffle — the Exchange carries at most
    |langs| x dim combined rows per task, never raw exploded elements."""
    s = plan_of(Q.x_lang_centroid(spark, SF))
    tree = s[: s.find("(1) ")]
    lines = tree.splitlines()
    gen = next(i for i, l in enumerate(lines) if "Generate" in l)
    exch = next(
        i for i, l in enumerate(lines)
        if "Exchange" in l and "Broadcast" not in l
    )
    # tree prints top-down: final agg ... Exchange ... partial agg ... Generate
    between = lines[exch + 1 : gen]
    assert any("HashAggregate" in l for l in between), tree
    assert _data_exchanges(tree) == 1, tree


def test_q13_preaggregates_orders_before_the_outer_join(spark, Q):
    """Q13 shape: the orders side is reduced to one row per custkey
    before joining customer — the join input is the aggregate, not the
    raw orders fact table."""
    s = plan_of(Q.tpch_q13_customer_distribution(spark, SF))
    tree = s[: s.find("(1) ")]
    lines = tree.splitlines()
    join = next(i for i, l in enumerate(lines) if "Join" in l)
    # below the join there must be an aggregation (the per-custkey count)
    assert any("HashAggregate" in l for l in lines[join + 1 :]), tree


def test_contamination_broadcasts_benchmark_grams(spark, Q):
    """Decontamination at 100 TB: the benchmark gram set must broadcast —
    corpus grams stream through a map-side join, and the only shuffle is
    the per-doc match-count aggregation."""
    s = plan_of(Q.x_contamination_overlap(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "BroadcastHashJoin" in tree, tree
    assert "SortMergeJoin" not in tree, tree
    # data exchanges: the per-doc count agg, the benchmark-side distinct
    # (tiny, feeding the broadcast), and possibly the small-input CPU
    # spread (round-robin, a no-op at real scale). Corpus GRAMS must
    # never hash-shuffle: no Exchange may sit between the corpus-side
    # Generate (shingle explode) and the BroadcastHashJoin above it.
    lines = tree.splitlines()
    join_i = next(i for i, l in enumerate(lines) if "BroadcastHashJoin" in l)
    gen_i = next(i for i, l in enumerate(lines[join_i:]) if "Generate" in l) + join_i
    assert not any("Exchange" in l for l in lines[join_i + 1 : gen_i]), tree


def test_repetition_ratio_is_pure_projection(spark, Q):
    """Repetition stats are computed from each row's own gram array
    (max multiplicity = longest equal-run of the sorted array): no
    Generate explosion and no data-dependent shuffle — the only Exchange
    allowed is the small-input round-robin CPU spread, which disappears
    when the scan is already wide (the at-scale case)."""
    s = plan_of(Q.x_repetition_ratio(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "Generate" not in tree, tree
    # formatted explain puts Exchange arguments in the details section,
    # not the tree — scan the WHOLE output: any hash partitioning means
    # a data-dependent shuffle crept in (only round-robin spread allowed)
    assert "hashpartitioning" not in s, s
    # and the expensive gram expression must not be duplicated by a
    # pushed-down filter below the spread (one array_sort = one tree)
    assert s.count("array_sort") == 1, s.count("array_sort")


def test_profile_is_single_scan_despite_six_distincts(spark, Q):
    """The whole profile (6 null counts + 6 exact distincts) must come
    from ONE scan of the table — Catalyst's Expand handles the multiple
    DISTINCT aggregates; per-column scans would read the table 6x."""
    s = plan_of(Q.x_profile_events(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Scan parquet") == 1, tree
    assert "Expand" in tree, tree


def test_corpus_mix_total_is_broadcast_not_global_window(spark, Q):
    """The corpus total lands on every row via a broadcast of the 1-row
    aggregate — an unpartitioned Window would single-task the table."""
    s = plan_of(Q.x_corpus_mix_table(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "Window" not in tree, tree
    assert "BroadcastNestedLoopJoin" in tree or "BroadcastExchange" in tree, tree


def test_funnel_persists_stage_frames_three_scans_only(spark, Q):
    """The funnel's union branches must reuse the persisted v/c stage
    frames: exactly three parquet scans (one per stage's type filter),
    never six re-derivations."""
    s = plan_of(Q.x_event_funnel(spark, SF))
    tree = s[: s.find("(1) ")]
    import re

    # formatted explain re-prints a cached InMemoryRelation's build plan
    # at every reference with the SAME node id — count distinct scan
    # nodes, not textual occurrences
    distinct_scans = set(re.findall(r"Scan parquet\s+\((\d+)\)", tree))
    assert len(distinct_scans) == 3, (distinct_scans, tree)
    assert "InMemoryTableScan" in tree, tree


def test_retention_reuses_user_partitioning(spark, Q):
    """Cohort retention: the first-day aggregate and the join both key on
    user_id; at most three shuffles total (user agg, offset agg, and the
    join side when the aggregate outgrows broadcast)."""
    s = plan_of(Q.x_retention_cohorts(spark, SF))
    tree = s[: s.find("(1) ")]
    assert _data_exchanges(tree) <= 3, tree


def test_partitioned_layout_prunes_whole_partitions(spark, tmp_path, Q):
    """Hive-style partition layout (lang=...) + a literal predicate must
    prune at PLANNING time: the predicate lands in PartitionFilters, so
    non-matching directories are never even listed for the scan — the
    first lever a 100 TB corpus layout pulls."""
    out = str(tmp_path / "bylang")
    Q.load_table(spark, SF, "documents").write.partitionBy("lang").mode(
        "overwrite"
    ).parquet(out)
    df = spark.read.parquet(out).filter("lang = 'en'").select("doc_id")
    s = plan_of(df)
    pf = [l for l in s.splitlines() if "PartitionFilters" in l]
    assert pf and any("lang" in l for l in pf), s
    # the partition column predicate must NOT degrade to a data filter
    dfilters = [l for l in s.splitlines() if "PushedFilters" in l]
    assert all("lang" not in l for l in dfilters), s


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path, Q):
    """DPP: joining a partitioned fact to a FILTERED dim must inject a
    runtime subquery into the fact's partition filters (the star-schema
    scan killer at scale) — visible as dynamicpruning in the plan."""
    out = str(tmp_path / "bylang2")
    Q.load_table(spark, SF, "documents").write.partitionBy("lang").mode(
        "overwrite"
    ).parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("en", 1), ("fr", 2), ("de", 3), ("es", 4), ("zh", 5)],
        "lang string, region int",
    ).filter("region = 1")
    joined = fact.join(dim, "lang").select("doc_id", "region")
    s = plan_of(joined)
    assert "dynamicpruning" in s.lower(), s


def test_weighted_sample_is_filter_only(spark, Q):
    """x_weighted_sample: the weight-proportional keep/drop decision is a
    per-row integer expression — the plan must be scan + filter with ZERO
    Exchange, and the text column must never be read (projection pruned
    to doc_id/lang/n_chars)."""
    s = plan_of(Q.x_weighted_sample(spark, SF))
    assert "Exchange" not in s, s
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read_schema and all("text" not in l for l in read_schema)


def test_key_skew_percentiles_never_sort_the_key_table(spark, Q):
    """x_key_skew: percentiles of the per-key count must come from the
    count-of-counts HISTOGRAM (tiny), never a global sort/window over the
    per-key table — the single-partition window is allowed ONLY above the
    second aggregation (histogram) contraction. Pin: exactly one Sort
    (the histogram cumsum), and both groupBy contractions partial-agg
    (map-side combine) before their exchanges."""
    import re

    s = plan_of(Q.x_key_skew(spark, SF))
    assert len(re.findall(r"\(\d+\) Sort", s)) == 1, s
    # per-key count and histogram both partial-aggregate before shuffling
    assert len(re.findall(r"\(\d+\) HashAggregate", s)) >= 4, s
    # the totals cross join must lower to BroadcastNestedLoopJoin (1-row
    # broadcast side), never a CartesianProduct shuffle
    assert "CartesianProduct" not in s, s
    # the 1-row totals side joins broadcast — never a shuffle join
    assert "SortMergeJoin" not in s, s


def test_distinctive_terms_single_token_scan_with_topk_pushdown(spark, Q):
    """x_distinctive_terms: tf and df both derive from the ONE (doc, lang,
    term) contraction of a SINGLE token scan (not two scans of the token
    stream), and the per-group top-k prunes with a partial
    WindowGroupLimit before the window's exchange."""
    import re

    s = plan_of(Q.x_distinctive_terms(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Scan parquet") == 1, tree
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", s)) == 2, s


def test_q10_pushes_filters_and_broadcasts_nation(spark, Q):
    s = plan_of(Q.tpch_q10_returned_items(spark, SF))
    assert "BroadcastHashJoin" in s
    pushed = [l for l in s.splitlines() if "PushedFilters" in l]
    assert any("l_returnflag" in l and "EqualTo" in l for l in pushed), pushed
    assert any("o_orderdate" in l for l in pushed), pushed
    assert "TakeOrderedAndProject" in s


def test_mixture_sample_is_filter_only(spark, Q):
    """x_mixture_sample: the per-component rate lookup is a literal CASE —
    the plan must stay scan + filter (zero Exchange, no join against a
    rates table) with the text column pruned from the read."""
    s = plan_of(Q.x_mixture_sample(spark, SF))
    assert "Exchange" not in s, s
    assert "Join" not in s, s
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read_schema and all("text" not in l for l in read_schema)


def test_hash_split_single_partial_agg_shuffle(spark, Q):
    """x_hash_split: split assignment is a projection; the only Exchange
    is the (split, lang) rollup's, fed by a map-side partial aggregate."""
    import re

    s = plan_of(Q.x_hash_split(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1, s
    assert "partial_count" in s, s


def test_bucketed_tables_join_and_aggregate_without_exchange(spark, tmp_path, Q):
    """write_bucketed pre-pays the shuffle: two tables bucketed the same
    way on the join key must SortMergeJoin with ZERO Exchange, and a
    groupBy on the bucket key must aggregate with ZERO Exchange — the
    layout contract that makes repeated fact-to-fact joins affordable
    at 100 TB."""
    from pyspark.sql import functions as F

    from kafka_dead_letter_analyzer_spark.operators.io import write_bucketed

    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    write_bucketed(a, "bkt_a", ["k"], num_buckets=8, sort_by=["k"])
    write_bucketed(b, "bkt_b", ["k"], num_buckets=8, sort_by=["k"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the claim under test is the
        # bucketed SMJ layout, which small test tables would hide behind
        # a broadcast join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
        joined = ta.join(tb, "k")
        s = plan_of(joined)
        assert "SortMergeJoin" in s, s
        assert "Exchange" not in s, s
        assert joined.count() == 10_000
        agg = ta.groupBy("k").agg(F.sum("va").alias("s"))
        s2 = plan_of(agg)
        assert "Exchange" not in s2, s2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_embedding_quantize_no_shuffle_no_udf(spark, Q):
    """x_embedding_quantize: per-row array math — zero Exchange, zero
    Python stages (the transform/array_max/posexplode pipeline stays
    JVM-side)."""
    s = plan_of(Q.x_embedding_quantize(spark, SF))
    assert "Exchange" not in s, s
    assert "Python" not in s and "MapInPandas" not in s, s


def test_lm_continuation_single_gram_shuffle_no_expand(spark, Q):
    """x_lm_continuation: the trigram stream shuffles ONCE into the
    distinct-trigram contraction; continuation_count comes from the
    contraction itself — no count(DISTINCT) Expand node, and only the
    (suffix) rollup's second small exchange."""
    import re

    s = plan_of(Q.x_lm_continuation(spark, SF))
    assert "Expand" not in s, s
    # two hash exchanges (trigram contraction + suffix rollup); the
    # round-robin spread_for_cpu exchange is the local-narrow-input
    # CPU fix, a no-op at scale
    assert s.count("Arguments: hashpartitioning") == 2, s


def test_quantized_topk_is_take_ordered_no_shuffle(spark, Q):
    """x_cosine_topk_quantized: same scale shape as the float baseline —
    per-row integer scoring + TakeOrderedAndProject, zero Exchange."""
    s = plan_of(Q.x_cosine_topk_quantized(spark, SF))
    assert "TakeOrderedAndProject" in s, s
    tree = s[: s.find("(1) ")]
    assert "Exchange" not in tree, tree


def test_chunk_overlap_is_pure_projection(spark, Q):
    """x_chunk_overlap: sequence+transform+explode per row — no DATA
    shuffle (the only Exchange allowed is the round-robin spread_for_cpu
    CPU fix, a no-op at scale: chunk fan-out is heavy enough per row to
    pay for it, measured 2x), no Python stage; only doc_id and text read
    from the scan."""
    s = plan_of(Q.x_chunk_overlap(spark, SF))
    assert "hashpartitioning" not in s, s
    assert "rangepartitioning" not in s, s
    assert "Python" not in s and "MapInPandas" not in s, s
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l]
    assert read_schema and all(
        "lang" not in l and "source" not in l for l in read_schema
    )


def test_q14_pushes_month_window_and_broadcasts_part(spark, Q):
    s = plan_of(Q.tpch_q14_promo_revenue(spark, SF))
    assert "BroadcastHashJoin" in s and "SortMergeJoin" not in s
    pushed = [l for l in s.splitlines() if "PushedFilters" in l]
    assert any("l_shipdate" in l for l in pushed), pushed
    # part dim pruned to join key + type
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l and "p_partkey" in l]
    assert read_schema and all("p_retailprice" not in l for l in read_schema)


def test_q18_having_contraction_broadcasts_into_the_joins(spark, Q):
    """The qualifying-orders set (post-HAVING) must drive the joins as a
    broadcast — the raw lineitem stream never reaches the order/customer
    joins."""
    s = plan_of(Q.tpch_q18_large_volume(spark, SF))
    assert "BroadcastHashJoin" in s
    assert "TakeOrderedAndProject" in s


def test_source_overlap_is_equi_join_no_nested_loop(spark, Q):
    s = plan_of(Q.x_source_overlap_matrix(spark, SF))
    assert "NestedLoop" not in s and "Cartesian" not in s, s


def test_interevent_gaps_one_exchange_per_partitioning(spark, Q):
    """x_interevent_gaps needs exactly two hash partitionings (per-user
    lag, per-type rank) — the rank window and the final type rollup must
    SHARE theirs (the exact_percentiles contract)."""
    s = plan_of(Q.x_interevent_gaps(spark, SF))
    assert s.count("Arguments: hashpartitioning") == 2, s


def test_weighted_quota_prunes_rank_before_exchange(spark, Q):
    """x_weighted_quota: the literal max-quota conjunct must trigger
    WindowGroupLimit (partial + final) — the per-stratum CASE threshold
    alone defeats the optimizer's rank<=literal pattern and would sort
    every stratum's full population through the window at scale."""
    import re

    s = plan_of(Q.x_weighted_quota(spark, SF))
    assert len(re.findall(r"\(\d+\) WindowGroupLimit", s)) == 2, s


def test_token_diversity_is_zero_shuffle_projection(spark, Q):
    """x_token_diversity: array_distinct/size run inside the scan's
    codegen — no Exchange anywhere; this must stream at any corpus
    size."""
    s = plan_of(Q.x_token_diversity(spark, SF))
    assert "Exchange" not in s, s


def test_prefix_clusters_shuffle_carries_hash_not_text(spark, Q):
    """x_prefix_clusters: exactly one partial-agg Exchange keyed on the
    32-char prefix hash; the document text must not cross it."""
    import re

    s = plan_of(Q.x_prefix_clusters(spark, SF))
    assert len(re.findall(r"\(\d+\) Exchange", s)) == 1, s
    [block] = re.findall(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s)
    input_line = next(l for l in block.splitlines() if l.startswith("Input"))
    assert "text" not in input_line, block
    # map-side combine below the exchange, final above
    nodes = re.findall(r"\((\d+)\) (\w+)", s)
    aggs = [int(i) for i, n in nodes if n == "HashAggregate"]
    exch = [int(i) for i, n in nodes if n == "Exchange"]
    assert min(aggs) < min(exch) < max(aggs), s


def test_rare_token_score_single_token_scan(spark, Q):
    """x_rare_token_score: token frequency and the per-doc counts both
    derive from ONE exploded token scan (one Generate — the window-over-
    contraction shape; a freq-join formulation duplicated the subtree
    into three scans); the 1-row corpus total is a Generate-free scalar
    scan joined broadcast. No SortMergeJoin anywhere."""
    import re

    s = plan_of(Q.x_rare_token_score(spark, SF))
    assert len(re.findall(r"\(\d+\) Generate", s)) == 1, s
    # detail-block headers count physical scans once each (the plain
    # string appears again in the tree rendering)
    assert len(re.findall(r"\(\d+\) Scan parquet", s)) == 2, s
    assert "SortMergeJoin" not in s, s
    assert "BroadcastNestedLoopJoin" in s, s  # the 1-row total cross join


def test_bigram_memorization_single_scan_window_df(spark, Q):
    """x_bigram_memorization: bigram document-frequency is a WINDOW over
    the one (doc, bigram) contraction — exactly one Generate (no
    duplicated token-scan subtree, the x_distinctive_terms lesson) and
    no join at all."""
    import re

    s = plan_of(Q.x_bigram_memorization(spark, SF))
    assert len(re.findall(r"\(\d+\) Generate", s)) == 1, s
    assert "Join" not in s, s


def test_q19_or_envelopes_push_to_both_scans(spark, Q):
    """tpch_q19: Catalyst must derive each side's OR envelope from the
    cross-side disjunction and push it INTO the scan — the lineitem scan
    carries the quantity-range Or, the part scan the brand/size Or; the
    join broadcasts and only one data Exchange (the final agg) remains."""
    s = plan_of(Q.tpch_q19_disjunctive_filter(spark, SF))
    pushed = [l for l in s.splitlines() if "PushedFilters" in l]
    assert any("l_quantity" in l and "Or(" in l for l in pushed), pushed
    assert any("p_brand" in l and "Or(" in l for l in pushed), pushed
    assert "BroadcastHashJoin" in s and "SortMergeJoin" not in s
    tree = s[: s.find("(1) ")]
    assert tree.count("Exchange") - tree.count("BroadcastExchange") == 1, tree


def test_q15_contraction_scans_lineitem_once(spark, Q):
    """tpch_q15: the revenue contraction is persisted, so the max
    subquery reads the InMemory base instead of re-scanning lineitem —
    exactly one parquet scan of lineitem; the 1-row max joins
    broadcast."""
    import re

    s = plan_of(Q.tpch_q15_top_supplier(spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*\n(?:.+\n)*?Location:[^\n]*\[([^\]]*)\]", s)
    assert sum("lineitem" in loc for loc in scans) == 1, scans
    assert "InMemoryTableScan" in s, s
    assert "SortMergeJoin" not in s, s


def test_q21_single_lineitem_scan_two_shuffles(spark, Q):
    """tpch_q21: the semi+anti correlated subqueries are replaced by ONE
    (order, supplier) contraction consumed twice from its persisted base
    — one lineitem scan, hash shuffles only on the contraction keys, and
    the top-20 is TakeOrderedAndProject."""
    import re

    s = plan_of(Q.tpch_q21_blamed_suppliers(spark, SF))
    scans = re.findall(r"\(\d+\) Scan parquet[^\n]*\n(?:.+\n)*?Location:[^\n]*\[([^\]]*)\]", s)
    assert sum("lineitem" in loc for loc in scans) == 1, scans
    assert "InMemoryTableScan" in s, s
    assert "TakeOrderedAndProject" in s, s


def test_q22_antijoin_and_integer_threshold_broadcast(spark, Q):
    """tpch_q22: dormancy is a LeftAnti hash join (no correlated probe)
    and the above-average test joins the 1-row (n_pos, sum_cents)
    threshold via a broadcast nested-loop — no float average anywhere in
    the plan."""
    s = plan_of(Q.tpch_q22_dormant_customers(spark, SF))
    assert "LeftAnti" in s, s
    assert "BroadcastNestedLoopJoin" in s, s
    assert "avg(" not in s, s


def test_q7_q8_dims_broadcast_facts_never_nested_loop(spark, Q):
    """tpch_q7/q8: every dimension (nation aliases, region, filtered
    part) broadcasts; no cartesian/nested-loop join appears between
    facts."""
    for q in (Q.tpch_q7_volume_shipping, Q.tpch_q8_market_share):
        s = plan_of(q(spark, SF))
        assert "CartesianProduct" not in s, s
        assert "BroadcastNestedLoopJoin" not in s, s
        assert "BroadcastHashJoin" in s, s


def test_series_knn_dense_no_pair_shuffle(spark, Q):
    """x_series_knn (dense strategy): pair distances evaluate inside
    MapInPandas against a task-broadcast vector table — no SortMergeJoin
    anywhere, the only join is the 1-row day-bounds broadcast
    nested-loop, and no operator above MapInPandas shuffles pair rows
    (everything downstream of it is projection-only)."""
    import re

    s = plan_of(Q.x_series_knn(spark, SF))
    assert "SortMergeJoin" not in s, s
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", s)) == 1, s
    assert "MapInPandas" in s, s
    tree = s[: s.find("(1) ")]
    above = tree.split("MapInPandas")[0]
    assert "Exchange" not in above and "Join" not in above, above


# ---------------------------------------------------------------------------
# TPC-H completion block (Q2/Q9/Q11/Q12/Q16/Q20 shapes)
# ---------------------------------------------------------------------------


def test_q2_single_lineitem_scan_feeds_offer_and_best(spark, Q):
    """The correlated-MIN decorrelation must derive the per-part minimum
    as a window over the (part, supplier) contraction — exactly ONE
    lineitem scan, no same-lineage self-join (which Spark resolves
    trivially true), every dim join broadcast."""
    s = plan_of(Q.tpch_q2_min_cost_supplier(spark, SF))
    li_scans = [
        l for l in s.splitlines() if "Location" in l and "lineitem" in l
    ]
    assert len(li_scans) == 1, s
    assert "SortMergeJoin" not in s, s
    assert "BroadcastHashJoin" in s
    assert "Window" in s


def test_q9_only_wide_shuffle_is_the_orders_join(spark, Q):
    """part/supplier/nation broadcast; the lineitem><orders join is the
    only non-broadcast join; the name prune reaches the part scan."""
    s = plan_of(Q.tpch_q9_product_profit(spark, SF))
    assert "BroadcastHashJoin" in s
    assert s.count("SortMergeJoin") <= 1, s
    pushed = [
        l for l in s.splitlines() if "PushedFilters" in l and "p_name" in l
    ]
    assert any("StringContains" in l or "IsNotNull" in l for l in pushed), s


def test_q11_total_is_derived_not_rescanned(spark, Q):
    """The global-total scalar must come from re-aggregating the per-part
    contraction (one lineitem scan total) and join back as a broadcast
    nested loop over one row — never a second pass over lineitem."""
    s = plan_of(Q.tpch_q11_important_parts(spark, SF))
    li_scans = [
        l for l in s.splitlines() if "Location" in l and "lineitem" in l
    ]
    assert len(li_scans) <= 2, s
    assert "BroadcastNestedLoopJoin" in s, s


def test_q12_year_range_pushes_into_lineitem_scan(spark, Q):
    s = plan_of(Q.tpch_q12_mode_priority(spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in s
    # lateness predicate references both sides -> post-join filter, and
    # the priority split must be ONE aggregate (no union of two branches)
    tree = s[: s.find("(1) ")]
    assert tree.count("Union") == 0, tree


def test_q16_exclusion_is_broadcast_anti_join(spark, Q):
    s = plan_of(Q.tpch_q16_supplier_counts(spark, SF))
    assert "BroadcastHashJoin" in s and "LeftAnti" in s, s
    assert "SortMergeJoin" not in s, s
    # distinct-aggregate expansion keyed on the grouping columns
    assert "HashAggregate" in s


def test_q20_supplier_side_consumes_semi_join(spark, Q):
    s = plan_of(Q.tpch_q20_excess_shippers(spark, SF))
    assert "LeftSemi" in s, s
    assert "SortMergeJoin" not in s, s
    pushed = [
        l for l in s.splitlines() if "PushedFilters" in l and "l_shipdate" in l
    ]
    assert pushed, s


# ---------------------------------------------------------------------------
# Sketches: the shuffle must carry sketch-sized state, not data-sized
# ---------------------------------------------------------------------------


def test_kmv_ships_local_topk_not_all_distincts(spark, Q):
    """partial distinct HashAggregate + TakeOrdered: each task ships at
    most k hashes; the ranking window runs after the limit."""
    s = plan_of(Q.x_kmv_distinct(spark, SF))
    assert "TakeOrderedAndProject" in s, s
    assert s.count("HashAggregate") >= 2, s  # partial + final distinct


def _hash_exchanges(s: str) -> int:
    """Count hash-partitioned exchanges in the details (the data-sized
    shuffles); the small-input spread_for_cpu RoundRobin exchange is
    exempt — it is a no-op at real scan widths."""
    import re

    return sum(
        1
        for m in re.finditer(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s)
        if "hashpartitioning" in m.group(1)
    )


def test_cms_is_one_aggregate_pair_no_join(spark, Q):
    """The depth replication must be a literal-array explode (no join)
    and the only HASH exchange carries (d, bucket) cells."""
    s = plan_of(Q.x_cms_sketch(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "Join" not in tree, tree
    assert _hash_exchanges(s) == 1, s
    assert tree.count("HashAggregate") == 2, tree


def test_hll_is_one_aggregate_pair(spark, Q):
    s = plan_of(Q.x_hll_registers(spark, SF))
    tree = s[: s.find("(1) ")]
    assert "Join" not in tree, tree
    assert _hash_exchanges(s) == 1, s
    assert tree.count("HashAggregate") == 2, tree


def test_triangle_counts_all_equi_joins_no_cartesian(spark, Q):
    """The wedge join and closing-edge probe must be equi-joins on ids —
    a nested-loop/cartesian here is the O(V^3) plan the orientation
    exists to avoid."""
    s = plan_of(Q.x_triangle_counts(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s


def test_data_quality_suite_is_one_scan_one_aggregate(spark, Q):
    """Seven constraints must fuse into a single aggregation over a
    single scan — the audit costs one pass regardless of suite size."""
    s = plan_of(Q.x_data_quality(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Scan parquet") == 1, tree
    assert "Join" not in tree and "Union" not in tree, tree


def test_dup_spans_seed_join_is_equi_join_on_hashes(spark, Q):
    """The cross-doc seed match must be an equi-join on the gram hash
    (never cartesian / nested-loop), and every HASH-partitioned exchange
    must carry hashed seeds, not text or token arrays.  (The small-input
    spread_for_cpu round-robin exchange legitimately carries raw docs —
    it is a no-op at real scan widths.)"""
    import re

    s = plan_of(Q.x_dup_spans(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s
    for m in re.finditer(r"\(\d+\) Exchange\n((?:.+\n)+?)\n", s):
        if "RoundRobinPartitioning" in m.group(1):
            continue
        assert "text" not in m.group(1) and "toks" not in m.group(1), m.group(1)


def test_setsim_join_no_cartesian_and_arrays_only_post_candidates(spark, Q):
    """Candidate generation must be an equi-join on prefix tokens; token
    ARRAYS may move only in the verification joins (never through the
    candidate-pair exchange)."""
    s = plan_of(Q.x_setsim_join(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s


def test_mad_outliers_two_rank_passes_no_cartesian(spark, Q):
    """Two ordered-window rank passes (values, deviations), each sharing
    its exchange with the following groupBy; medians rejoin broadcast."""
    s = plan_of(Q.x_mad_outliers(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Window") == 2, tree
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    assert "BroadcastHashJoin" in s, s


def test_pagerank_all_equi_joins(spark, Q):
    s = plan_of(Q.x_pagerank_int(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s


def test_pareto_window_runs_over_contraction_only(spark, Q):
    """Local-then-global frontier: TWO window passes (the partition-local
    skyline, then the exact scan over local survivors), consuming the
    distinct-value contraction (an aggregate) — never a single-task sort
    of the raw corpus; the frontier rejoins as a broadcast semi join."""
    s = plan_of(Q.x_pareto_docs(spark, SF))
    tree = s[: s.find("(1) ")]
    assert tree.count("Window") == 2, tree
    assert "LeftSemi" in s, s
    # both Windows sit above the HashAggregate contraction
    assert "HashAggregate" in tree.split("Window")[2], tree


def test_sorted_neighborhood_no_cartesian(spark, Q):
    s = plan_of(Q.x_sorted_neighborhood(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s


def test_containment_join_df_cap_reaches_the_plan(spark, Q):
    """x_containment_join's boilerplate cutoff (VERDICT r6 next-#1): the
    corpus-relative df cap ``1000*df <= 4*n_docs`` must appear in the
    physical plan as the condition of the df/universe join, the corpus
    count must arrive as a 1-row BROADCAST (the only nested-loop node
    allowed), and every other join must be an equi join — this is what
    hard-caps candidate fan-out at (0.004 n)^2 per token."""
    import re

    s = plan_of(Q.x_containment_join(spark, SF))
    assert re.search(r"\(df#\d+L? \* 1000\) <= \(n_docs#\d+L? \* 4\)", s), s
    assert "CartesianProduct" not in s, s
    # the single cross join is the 1-row corpus-count broadcast
    bnlj_ids = set(re.findall(r"BroadcastNestedLoopJoin Cross Build\w+ \((\d+)\)", s))
    assert len(bnlj_ids) == 1, s
    assert not re.search(r"BroadcastNestedLoopJoin (?!Cross)", s), s


def test_dbscan_grid_join_no_cartesian(spark, Q):
    """x_dbscan_embedding's neighbor generation is the eps-grid equi
    join (3x3 probe replication of an id+coords projection) — never a
    cartesian/nested-loop pair stage; cluster labels come from id-only
    edges."""
    s = plan_of(Q.x_dbscan_embedding(spark, SF))
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s


def test_decay_pressure_single_scan_broadcast_anchor(spark, Q):
    """x_decay_error_pressure: the max-ts anchor arrives as a 1-row
    broadcast (cross) — the only nested-loop node — and the weighted
    rollup is one map-side-combined aggregate; no per-row driver
    action, no cartesian over data."""
    import re

    s = plan_of(Q.x_decay_error_pressure(spark, SF))
    assert "CartesianProduct" not in s, s
    bnlj_ids = set(re.findall(r"BroadcastNestedLoopJoin Cross Build\w+ \((\d+)\)", s))
    assert len(bnlj_ids) == 1, s
    assert "HashAggregate" in s, s


def test_mg_summary_threshold_is_take_ordered_no_window(spark, Q):
    """x_mg_heavy_hitters: the (k+1)-th-largest threshold is a
    TakeOrdered contraction over the tasks*k partials — never a
    single-partition Window sort."""
    s = plan_of(Q.x_mg_heavy_hitters(spark, SF))
    assert "TakeOrdered" in s, s
    assert "Window" not in s, s
    assert "CartesianProduct" not in s, s


# ---------------------------------------------------------------------------
# Round-7 session-3 operators: drift, correlation, uncertainty


def test_cusum_windows_reuse_one_contraction_exchange(spark, Q):
    """The (type, bucket) count is the only full-data hash exchange;
    the group windows and final agg reuse its partitioning (no second
    full-width shuffle, no single-partition window)."""
    s = plan_of(Q.x_cusum_changepoint(spark, SF))
    assert "SinglePartition" not in s
    assert s.count("Exchange hashpartitioning") <= 2


def test_tvd_and_w1_anchor_is_broadcast(spark, Q):
    for q in (Q.x_tvd_drift, Q.x_wasserstein_drift):
        s = plan_of(q(spark, SF))
        # the 1-row midpoint anchor must arrive broadcast, never shuffled
        assert "BroadcastNestedLoopJoin" in s or "BroadcastExchange" in s
        assert "CartesianProduct" not in s


def test_spearman_maps_join_without_cartesian_or_single_partition(spark, Q):
    s = plan_of(Q.x_spearman_qty_price(spark, SF))
    assert "CartesianProduct" not in s
    assert "SinglePartition" not in s


def test_kendall_pair_join_is_contraction_sized_hash_join(spark, Q):
    """The cell-pair join keys on the group column (equi part) — a hash
    or broadcast join over contraction-sized sides, never a cartesian
    product over row-level data."""
    s = plan_of(Q.x_kendall_qty_discount(spark, SF))
    assert "CartesianProduct" not in s


def _node_headers(s: str, name: str) -> int:
    """Count plan nodes by their detail-section headers ("(3) Exchange");
    the formatted tree prints each node twice (tree + header)."""
    import re as _re

    return len(_re.findall(rf"^\(\d+\) {name}", s, _re.M))


def test_bootstrap_is_single_scan_single_shuffle(spark, Q):
    """The 16x resample explode is map-side; the only exchange is the
    (source, b) partial-aggregate shuffle; documents scans once."""
    s = plan_of(Q.x_bootstrap_doclen(spark, SF))
    assert _node_headers(s, "Scan parquet") == 1
    assert _node_headers(s, "Exchange") == 1
    assert _node_headers(s, "Generate") == 1  # the map-side explode


def test_jackknife_full_data_shuffles_once(spark, Q):
    """One full-data exchange (the (source, blk) partial agg); the
    window's exchange moves only the nb-x-groups block contraction."""
    s = plan_of(Q.x_jackknife_doclen(spark, SF))
    assert _node_headers(s, "Scan parquet") == 1
    assert _node_headers(s, "Exchange") <= 2
    assert "SinglePartition" not in s


def test_conformal_reuses_window_partitioning_for_group_size(spark, Q):
    """One hash exchange: row_number and the group count share the sort
    (same contract as exact_percentiles)."""
    s = plan_of(Q.x_conformal_threshold(spark, SF))
    assert _node_headers(s, "Scan parquet") == 1
    assert _node_headers(s, "Exchange") == 1
    assert "SinglePartition" not in s


def test_leadlag_lag_table_is_broadcast(spark, Q):
    s = plan_of(Q.x_leadlag_purchase_error(spark, SF))
    assert "BroadcastNestedLoopJoin" in s or "BroadcastExchange" in s
    assert "CartesianProduct" not in s


def test_benford_constant_table_joins_broadcast(spark, Q):
    s = plan_of(Q.x_benford_audit(spark, SF))
    assert "BroadcastExchange" in s
    assert "CartesianProduct" not in s


def test_spearman_near_continuous_column_has_no_per_group_sort(spark):
    """When the probe flags a column as near-continuous (distinct
    count past the single-task-sort threshold), spearman's plan for
    THAT column must be the grouped range-partitioned prefix — no
    window (= no single-task per-group contraction sort) ordered by
    the near-continuous value anywhere in the physical plan, while
    the bounded column keeps its cheap window."""
    import random
    import re

    import kafka_dead_letter_analyzer_spark.operators.ranking as R

    rng = random.Random(7)
    rows = [
        (f"g{i % 3}", rng.randint(1, 8), rng.randint(0, 1_000_000))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    old = R._TWO_PHASE_MIN_DISTINCT
    R._TWO_PHASE_MIN_DISTINCT = 50
    try:
        out = R.spearman_exact(df, "x", "y", group_cols=["g"])
    finally:
        R._TWO_PHASE_MIN_DISTINCT = old
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p  # the local-prefix pass engaged for y
    assert "rangepartitioning" in p  # range phase, not a group sort
    assert "SinglePartition" not in p
    # every window orders by the bounded x or the bounded pid column —
    # none by the near-continuous y attribute
    y_attr = re.findall(r"\by#\d+L", p)
    assert y_attr, "plan should still reference the y column"
    for spec in re.findall(r"windowspecdefinition\([^\)]+", p):
        assert not re.search(r"\by#\d+L ASC", spec), spec


def test_roc_curve_single_contraction_no_cartesian(spark, Q):
    s = plan_of(Q.x_roc_curve(spark, SF))
    assert "CartesianProduct" not in s
    assert "SinglePartition" not in s
    # one contraction exchange + the window regroup is the ceiling
    assert s.count("Exchange hashpartitioning") <= 2


def test_kendall_quantized_grid_windows_partition_on_group(spark, Q):
    s = plan_of(Q.x_kendall_price_quantized(spark, SF))
    assert "CartesianProduct" not in s
    # no single-task stage (the kernel parallelizes across groups)
    assert "SinglePartition" not in s
    # the bounded contraction is materialized once (persisted cells)
    assert "InMemoryTableScan" in s or "InMemoryRelation" in s
    # r13: the dominance algebra downstream of the persisted cells runs
    # in ONE grouped Arrow kernel — no densified-grid windows, none of
    # the ~20 broadcast-joined grid-sized assembly frames
    assert "FlatMapGroupsInPandas" in s
    assert "Window" not in s


def test_funnel_windows_are_unordered_single_key_exchange(spark, Q):
    s = plan_of(Q.x_funnel_conversion(spark, SF))
    assert "CartesianProduct" not in s
    # chained funnel windows share ONE user_id exchange; no sort is
    # required by an unordered frame
    assert s.count("Exchange hashpartitioning") <= 2


def test_isotonic_contraction_feeds_grouped_pandas(spark, Q):
    s = plan_of(Q.x_isotonic_calibration(spark, SF))
    assert "FlatMapGroupsInPandas" in s
    assert "HashAggregate" in s
    assert "CartesianProduct" not in s


def test_funnel_join_chain_pushes_stage_predicates(spark):
    """Round-9: the funnel's join-chain strategy must push each
    stage's type equality into its own parquet scan (the whole point
    of the strategy — k sliver scans instead of one 60% scan) and
    carry no window anywhere; the forced window strategy keeps the
    single isin-pushed scan + window chain."""
    from kafka_dead_letter_analyzer_spark.operators.temporal import (
        funnel_steps,
    )
    from kafka_dead_letter_analyzer_spark.queries import load_table

    ev = load_table(spark, SF, "events")
    j = plan_of(
        funnel_steps(
            ev, ["view", "click", "purchase"], strategy="joins"
        )
    )
    assert "EqualTo(event_type,view)" in j
    assert "EqualTo(event_type,click)" in j
    assert "EqualTo(event_type,purchase)" in j
    assert "Window" not in j
    w = plan_of(
        funnel_steps(
            ev, ["view", "click", "purchase"], strategy="window"
        )
    )
    assert "Window" in w
    assert "In(event_type" in w


def test_funnel_any_anchor_window_dp_plan(spark, Q):
    """x_funnel_any_anchor (default method='window'): ONE hash
    exchange on the funnel key, ONE sort reused by the k chained
    latest-anchor range windows, no Python, no join, no cartesian;
    the pandas reference path keeps its grouped Arrow sweep."""
    s = plan_of(Q.x_funnel_any_anchor(spark, SF))
    assert "Window" in s
    assert "FlatMapGroupsInPandas" not in s
    assert "CartesianProduct" not in s
    assert "SortMergeJoin" not in s
    assert s.count("Exchange hashpartitioning") <= 1
    # one sort feeds all k windows (formatted explain prints each sort
    # node once as '(N) Sort'; a regression to one sort per chained
    # window would show k of them)
    import re

    assert len(re.findall(r"^\(\d+\) Sort$", s, re.M)) == 1, s

    from kafka_dead_letter_analyzer_spark.operators.temporal import (
        funnel_steps_any_anchor,
    )
    from kafka_dead_letter_analyzer_spark.queries import load_table

    ev = load_table(spark, SF, "events")
    p = plan_of(
        funnel_steps_any_anchor(
            ev, ["view", "click", "purchase"], method="pandas"
        )
    )
    assert "FlatMapGroupsInPandas" in p
    assert p.count("Exchange hashpartitioning") <= 1


def test_fleiss_panel_is_single_scan_explode_not_union(spark, Q):
    """The 3-rater panel must come from ONE documents scan (array
    explode; abstention = NULL label) — a per-rater UNION re-scans
    the 100 TB fact once per rater.  Contraction discipline as the
    other agreement queries: no cartesian, no single-task stage."""
    import re

    s = plan_of(Q.x_fleiss_agreement(spark, SF))
    assert "CartesianProduct" not in s
    assert "SinglePartition" not in s
    assert "Union" not in s
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1


def test_funnel_sessionized_single_key_exchange(spark):
    """The sessionized funnel's gaps-and-islands index AND the k
    chained per-(key, session) window minima must share ONE hash
    exchange on the key — hash(k) already clusters (k, sess), so
    Catalyst needs only a local re-sort for the session-scoped
    windows, never a second full-data shuffle.  The only other
    exchange is the 1-row totals' SinglePartition."""
    import re

    from kafka_dead_letter_analyzer_spark.operators import temporal as T
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    ev = load_table(spark, SF, "events")
    s = plan_of(
        T.funnel_steps_sessionized(
            ev, ["view", "click", "purchase"], gap_us=3_600 * 1_000_000
        )
    )
    assert "CartesianProduct" not in s
    assert s.count("Arguments: hashpartitioning") == 1
    assert s.count("Arguments: SinglePartition") == 1


def test_funnel_any_anchor_dense_fixture_single_sort(spark):
    """r9 VERDICT #5: the dense-key shape (few hot keys, everything
    funnel-relevant) must still plan ONE sort shared by all k chained
    latest-anchor range windows — the k passes are per-partition
    scans over that sort, so per-key density raises scan cost
    linearly but never adds a sort or a shuffle (10x rehearsal in
    NOTES.md: 9.6M rows / 4 hot keys = 8.9 s cold on local[32])."""
    import re

    from pyspark.sql import functions as F

    from kafka_dead_letter_analyzer_spark.operators.temporal import (
        funnel_steps_any_anchor,
    )

    ev = spark.range(8_000).select(
        (F.col("id") % 4).cast("string").alias("user_id"),
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"), F.lit("purchase"),
                F.lit("x"),
            ),
            (((F.xxhash64("id") % 4 + 4) % 4) + 1).cast("int"),
        ).alias("event_type"),
        F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
    )
    s = plan_of(
        funnel_steps_any_anchor(
            ev, ["view", "click", "purchase"], within_us=3_600_000_000
        )
    )
    assert "FlatMapGroupsInPandas" not in s
    assert "CartesianProduct" not in s
    assert len(re.findall(r"^\(\d+\) Sort$", s, re.M)) == 1, s


def test_krippendorff_panel_is_single_scan_explode_not_union(spark, Q):
    """Same contraction discipline as the Fleiss pin: the 3-rater
    missing-ratings panel comes from ONE documents scan (array
    explode; abstention = NULL label), never a per-rater UNION; no
    cartesian, no single-task stage."""
    import re

    s = plan_of(Q.x_krippendorff(spark, SF))
    assert "CartesianProduct" not in s
    assert "SinglePartition" not in s
    assert "Union" not in s
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1


def test_weighted_kappa_single_scan_contraction(spark, Q):
    """Both ordinal raters are computed in ONE documents scan (a
    codegen projection), and everything past the (source, a, b)
    contraction is label-domain-sized: no cartesian product (the
    marginal grid is a per-source join of two contractions), no
    single-task stage, no re-scan."""
    import re

    s = plan_of(Q.x_weighted_kappa(spark, SF))
    assert "CartesianProduct" not in s
    assert "SinglePartition" not in s
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1


def test_bleu_pairs_single_scan_arrow_kernel_no_join(spark, Q):
    """BLEU's r13-optimization plan: the per-pair clipped counts are a
    pure per-row map, so the declared query runs the Arrow kernel —
    ONE scan, ONE MapInPandas, NO Generate (no gram explosion), no
    aggregation at all, no join between the sides, and exactly TWO
    exchanges: the source window lead, then the PINNED pre-kernel
    rebalance on the pair id (per-row cost is compute, not bytes —
    the rouge_l_stats rationale).  The expression path keeps its old
    contract in test_eval_stats_expr_path_plan_contract."""
    import re

    s = plan_of(Q.x_bleu_pairs(spark, SF))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
    assert "MapInPandas" in s
    assert "Generate" not in s
    assert "Join" not in s
    assert "HashAggregate" not in s
    assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 2
    assert "REPARTITION_BY_NUM" in s


def test_eval_stats_expr_path_plan_contract(spark):
    """The retained expression path (impl='expr' — the differential
    witness for the Arrow kernel) keeps its pinned pre-r13 shape:
    ONE scan, ONE Generate carrying both sides' grams for all n, no
    side-to-side join, two exchanges (window lead + the pinned
    pre-explosion rebalance; both contractions' exchanges are
    pid-subsumed)."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_dead_letter_analyzer_spark.operators import text as TX
    from kafka_dead_letter_analyzer_spark.sources.batch import load_table

    docs = load_table(spark, SF, "documents").filter(
        F.col("doc_id").isNotNull() & F.col("source").isNotNull()
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.col("text").alias("candidate"),
        F.lead("text").over(w).alias("reference"),
    )
    for fn in (TX.bleu_stats, TX.chrf_stats):
        s = plan_of(fn(pairs, impl="expr"))
        assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
        assert len(re.findall(r"\(\d+\) Generate", s)) == 1
        assert "Join" not in s
        assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 2
        assert "REPARTITION_BY_NUM" in s


def test_ngram_typicality_headline_is_skew_robust_join(spark, Q):
    """The HEADLINE query (and the operator default) run the
    skew-robust strategy: corpus counts reach the documents through a
    gram-keyed JOIN (AQE can split a skewed join partition; it can
    never split a window partition), fed by the (doc, gram)
    pre-contraction — so the plan has NO Window node and the join is
    present; the second scan is the documented price.  Flipped from
    'window' in round 11: a default whose single hottest n-gram bounds
    task size is not the plan you'd run at 100x."""
    import re

    s = plan_of(Q.x_ngram_typicality(spark, SF))
    assert "Window" not in s
    assert "Join" in s
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) <= 2


def test_ngram_typicality_window_optin_single_scan(spark, Q):
    """The explicit window opt-in keeps its single-scan contract:
    EXACTLY ONE parquet scan, corpus counts via the gram-key window,
    no Join node."""
    import re

    s = plan_of(Q.x_ngram_typicality_window(spark, SF))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
    assert "Window" in s
    assert "Join" not in s


def test_corpus_bleu_rollup_adds_one_exchange_only(spark, Q):
    """The corpus rollup reuses the pinned bleu_stats pass — the
    source passthrough rides the gram stream, both contraction keys
    stay pair-id-only — so the plan is bleu's (ONE scan, ONE
    Generate, no join, REPARTITION_BY_NUM pinned) plus EXACTLY ONE
    extra exchange: the tiny group-key contraction over per-pair
    rows.  A rollup that re-scanned or joined back to the pair table
    would show a second scan / a Join here."""
    import re

    s = plan_of(Q.x_corpus_bleu(spark, SF))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
    assert "MapInPandas" in s
    assert "Generate" not in s
    assert "Join" not in s
    assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 3
    assert "REPARTITION_BY_NUM" in s


def test_bm25_stats_broadcast_prune_before_contraction(spark, Q):
    """The retrieval substrate's 100 TB contract: the query vocabulary
    reaches the exploded token stream through BROADCAST joins only (a
    SortMergeJoin would shuffle the full token stream to meet a
    handful of query terms), and the semi-prune sits UPSTREAM of the
    (doc, term) contraction so unmatched tokens never shuffle.  The
    contracted doc_terms is PERSISTED (registered with cache_registry)
    because its two consumers — the output join and the df contraction
    — prune different columns, defeating ReusedExchange; unpersisted,
    the df branch re-scanned and re-exploded the whole corpus
    (measured: 3 scans -> 2).  Since r12 the declared query passes the
    memoized corpus_stats snapshot constants, so the corpus-scalar
    aggregate's second scan is gone too: the plan holds EXACTLY ONE
    distinct documents scan (the 100 TB single-scan mode, r11 verdict
    note #2), while the parameterless default keeps its documented
    two-scan shape."""
    import re

    s = plan_of(Q.x_bm25_stats(spark, SF))
    assert "SortMergeJoin" not in s
    assert "BroadcastHashJoin" in s
    # left_semi prune present as a broadcast join
    assert "LeftSemi" in s
    scans = len(set(re.findall(r"\((\d+)\) Scan parquet", s)))
    assert scans == 1, s
    assert "InMemoryTableScan" in s  # the load-bearing persist
    from kafka_dead_letter_analyzer_spark import cache_registry

    assert cache_registry.tracked_count() >= 1
    cache_registry.release_all()
    # the parameterless default pays the documented second scan — the
    # delta is what corpus_stats= buys (keeps this pin meaningful)
    from kafka_dead_letter_analyzer_spark.operators import retrieval as RV
    from kafka_dead_letter_analyzer_spark.queries import _bm25_queries_df

    s2 = plan_of(
        RV.bm25_stats(
            Q.load_table(spark, SF, "documents"), _bm25_queries_df(spark)
        )
    )
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s2))) == 2, s2
    cache_registry.release_all()


def test_retrieval_declared_windows_salted_or_bounded(spark, Q):
    """r11 verdict weak #1 closed: across ALL declared retrieval-query
    plans, every window over an UNBOUNDED candidate set (every doc
    matching any probe term — a constant corpus fraction for a common
    term) is salted (partition keys include _skt_salt, so AQE-sized
    tasks bound the work), and every unsalted window ranks a
    bounded-by-construction input: each salted phase 1 feeds exactly
    one phase-2 window over <= n_salts*k survivors, and each rrf_fuse
    window ranks the union of top-k-truncated lists.  Pinned as the
    exact pairing invariant: unsalted = salted (phase-2s) + one per
    rrf_fuse in the query; plus exactly ONE distinct corpus scan (the
    single-scan corpus_stats mode) in every plan."""
    import re

    from kafka_dead_letter_analyzer_spark import cache_registry

    # (query, rrf_fuse windows in its chain)
    cases = [
        ("x_bm25_topk", 0),
        ("x_rrf_fuse", 1),
        ("x_retrieval_metrics", 1),
        ("x_ndcg_at_k", 1),
    ]
    for name, n_rrf in cases:
        cache_registry.release_all()
        spark.catalog.clearCache()
        s = plan_of(getattr(Q, name)(spark, SF))
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", s)
        salted = sum(1 for x in specs if "_skt_salt" in x)
        unsalted = len(specs) - salted
        assert salted >= 1, (name, specs)
        assert unsalted == salted + n_rrf, (name, salted, unsalted)
        scans = len(set(re.findall(r"\((\d+)\) Scan parquet", s)))
        assert scans == 1, (name, scans)
    cache_registry.release_all()


def test_chrf_pairs_same_plan_contract_as_bleu(spark, Q):
    """chrF inherits bleu's r13 plan contract: ONE scan, ONE
    MapInPandas kernel, NO Generate/aggregation, no side-to-side
    join, two exchanges (window lead + the pinned pre-kernel
    rebalance)."""
    import re

    s = plan_of(Q.x_chrf_pairs(spark, SF))
    assert len(set(re.findall(r"\((\d+)\) Scan parquet", s))) == 1
    assert "MapInPandas" in s
    assert "Generate" not in s
    assert "Join" not in s
    assert "HashAggregate" not in s
    assert len(re.findall(r"\(\d+\) Exchange\b", s)) == 2
    assert "REPARTITION_BY_NUM" in s
