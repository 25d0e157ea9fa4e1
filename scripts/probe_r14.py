"""Round-14 probe runner — identical harness to probe_r13.py, probe
bodies in probes_r14.py.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/probe_r14.py <probe> [reps]
"""

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from kafka_dead_letter_analyzer_spark import get_spark

    probe = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name=f"kdla-probe14-{probe}")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm JVM

    import probes_r14 as P

    getattr(P, probe)(spark, SF_DIR, reps)


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)
    sys.path.insert(0, os.path.dirname(here))  # repo root for the package
    main()
