"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full execution,
no driver-side collect of bulk data).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline queries: the flagship analyzer pipeline + scan/agg/join breadth
# + (as added) the extension operators
HEADLINE = [
    "a1_error_stats",
    "a1_first_example",
    "n2_classify",
    "u1_union_filters",
    "m1_topology_main",
    "e3_feedback_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_orders",
    "x_text_stats",
    "x_dedup_exact",
    "x_dedup_minhash",
    "x_cosine_topk",
]


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from kafka_dead_letter_analyzer_spark import get_spark
    from kafka_dead_letter_analyzer_spark import queries as Q

    spark = get_spark(app_name="kdla-bench")
    qs = Q.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]
    # dev/test subset: SPARK_GRAFT_BENCH_QUERIES=a,b,c limits the sweep
    subset = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    if subset:
        wanted = {s.strip() for s in subset.split(",") if s.strip()}
        unknown = wanted - set(qs)
        if unknown:  # a typo would silently change what "value" measures
            raise SystemExit(f"unknown bench queries: {sorted(unknown)}")
        names = [n for n in names if n in wanted]

    # Warm the JVM + parquet footers WITHOUT executing any timed query:
    # running a real query here would make its first timed run (recorded
    # as cold) already-compiled, understating queries_cold for that one.
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "supplier", "nation", "region", "part"):
        try:
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).collect()
        except Exception:
            pass

    # Three tiers per query:
    # - cold: fresh plan construction + first execution (includes
    #   whole-stage-codegen compile of the expression trees);
    # - warm ("queries"/"value", the headline, comparable round-over-round):
    #   best of 2 full re-invocations — re-CONSTRUCTS the DataFrame each
    #   time, so it includes the Python/py4j plan-building cost (measured:
    #   ~85% of e3_feedback_stats' warm time is construction, not data);
    # - exec ("queries_exec"/"value_exec"): best of 2 re-executions of the
    #   cold-constructed DataFrame — the pure data-path cost, i.e. the
    #   component that scales with SF on a cluster. Queries that
    #   materialize mid-plan (persist/localCheckpoint: e3_feedback_stats,
    #   x_dup_clusters) re-read their materialization here by design —
    #   that boundary is part of their execution contract.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    execs: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        _force(df)
        cold[name] = round(time.perf_counter() - t0, 3)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(df)
            best = min(best, time.perf_counter() - t0)
        execs[name] = round(best, 3)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # drop per-invocation persisted intermediates (e3's error-topic
        # boundary, minhash signatures) so later queries aren't skewed by
        # accumulated executor-memory cache
        spark.catalog.clearCache()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_headline_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "value_cold": round(sum(cold.values()), 3),
        "queries_exec": execs,
        "value_exec": round(sum(execs.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
