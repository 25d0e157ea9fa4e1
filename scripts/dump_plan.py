"""Dump .explain("formatted") for named declared queries to files.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/dump_plan.py \
      [--suffix after] [--outdir plans/r13] q1 q2 ...

Writes <outdir>/<query>_<suffix>.txt for each query.
"""

import os
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from kafka_dead_letter_analyzer_spark import get_spark
    from kafka_dead_letter_analyzer_spark import queries as Q

    argv = sys.argv[1:]
    suffix = "after"
    outdir = os.path.join("plans", "r13")
    if "--suffix" in argv:
        i = argv.index("--suffix")
        suffix = argv[i + 1]
        del argv[i : i + 2]
    if "--outdir" in argv:
        i = argv.index("--outdir")
        outdir = argv[i + 1]
        del argv[i : i + 2]
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark(app_name="kdla-plan-dump")
    qs = Q.queries()
    unknown = [a for a in argv if a not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    for name in argv:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        from kafka_dead_letter_analyzer_spark import cache_registry

        cache_registry.release_all()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
