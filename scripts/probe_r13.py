"""Isolated micro-probes for optimization round 13 (guide §1: measure
first, noop sink, labeled jobs).  Each probe times a candidate plan
variant against the current operator inside ONE session, interleaved
A/B/A/B, best-of-n per side, so host drift hits both variants equally.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/probe_r13.py <probe> [reps]
"""

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, label, build, reps):
    """Interleaved timing: build() returns a fresh DataFrame each rep."""
    times = []
    for _ in range(reps):
        from kafka_dead_letter_analyzer_spark import cache_registry

        cache_registry.release_all()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        _force(build())
        times.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    return times


def run_ab(spark, variants, reps=3):
    """variants: list of (label, build_fn). Interleaves A,B,A,B,... and
    prints per-rep and best times."""
    results = {label: [] for label, _ in variants}
    for r in range(reps):
        for label, build in variants:
            from kafka_dead_letter_analyzer_spark import cache_registry

            cache_registry.release_all()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{label}#{r}")
            t0 = time.perf_counter()
            _force(build())
            dt = time.perf_counter() - t0
            results[label].append(dt)
            spark.sparkContext.setJobDescription(None)
            print(f"  rep{r} {label}: {dt:.3f}s", flush=True)
    for label, ts in results.items():
        print(
            f"{label}: best {min(ts):.3f}s median {sorted(ts)[len(ts)//2]:.3f}s"
            f" all {[round(t, 3) for t in ts]}"
        )
    return results


def main():
    from kafka_dead_letter_analyzer_spark import get_spark

    probe = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name=f"kdla-probe-{probe}")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM

    import probes_r13 as P

    getattr(P, probe)(spark, SF_DIR, reps)


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root for the package
    main()
