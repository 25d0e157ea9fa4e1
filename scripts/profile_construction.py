"""Construction-cost profiler (optimization r13, guide §1).

Times ONLY DataFrame construction (the query fn call, no force) for the
named queries, twice each (first call pays any per-session memo fill),
and optionally cProfiles the second call. This isolates the Python/py4j
plan-building component the warm tier prices on top of exec.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_construction.py q1 q2 ...
  ... --all        times construction for every declared query
  ... --profile q  cProfile a single query's construction
"""

import cProfile
import io
import os
import pstats
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from kafka_dead_letter_analyzer_spark import get_spark
    from kafka_dead_letter_analyzer_spark import queries as Q

    spark = get_spark(app_name="kdla-construction-profile")
    qs = Q.queries()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_all = "--all" in sys.argv
    profile_target = None
    if "--profile" in sys.argv:
        profile_target = sys.argv[sys.argv.index("--profile") + 1]

    names = sorted(qs) if do_all else [a for a in args if a in qs]
    unknown = [a for a in args if a not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # Warm the session (JVM, confs, memos) outside any measurement.
    spark.range(1000).selectExpr("sum(id)").collect()

    rows = []
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR)
        first = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR)
            best = min(best, time.perf_counter() - t0)
        rows.append((best, first, name))
        from kafka_dead_letter_analyzer_spark import cache_registry

        cache_registry.release_all()
        spark.catalog.clearCache()

    rows.sort(reverse=True)
    print(f"{'best':>8} {'first':>8}  query   (construction only, no force)")
    for best, first, name in rows:
        print(f"{best:8.3f} {first:8.3f}  {name}")
    print(f"TOTAL best-of-2: {sum(r[0] for r in rows):.2f} s over {len(rows)}")

    if profile_target:
        pr = cProfile.Profile()
        pr.enable()
        qs[profile_target](spark, SF_DIR)
        pr.disable()
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(40)
        print(s.getvalue())


if __name__ == "__main__":
    main()
