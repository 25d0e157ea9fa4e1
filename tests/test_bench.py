"""bench.py output contract: the driver records its single JSON line as
BENCH_r{N}.json — a malformed line or missing field silently drops the
round's performance record, so pin the contract here.

Runs in a subprocess (bench owns and stops its SparkSession) on a
three-query subset at sf0.001 to keep it cheap.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_valid_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="a1_error_stats,x_dedup_exact,x_hash_sample",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    json_lines = [
        l for l in out.stdout.splitlines() if l.startswith("{")
    ]
    assert len(json_lines) == 1, out.stdout[-2000:]
    d = json.loads(json_lines[0])
    assert d["metric"] == "total_headline_query_seconds"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    for tier in ("queries", "queries_cold", "queries_exec"):
        assert set(d[tier]) == {
            "a1_error_stats", "x_dedup_exact", "x_hash_sample"
        }
        assert all(v >= 0 for v in d[tier].values())
    assert d["value"] == round(sum(d["queries"].values()), 3)
    assert d["value_cold"] == round(sum(d["queries_cold"].values()), 3)
