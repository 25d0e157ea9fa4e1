"""bench.py output contract: the driver records bench output as
BENCH_r{N}.json but captures only the LAST ~2,000 chars of stdout — a
long final line loses the round's performance record (round 2:
"parsed": null from a 3,767-char line). Pin the contract here:
per-query detail on earlier lines + BENCH_DETAIL.json, compact final
JSON line < 1,900 chars even at the full declared query surface.

The subprocess test runs a three-query subset at sf0.001 to keep it
cheap; the length guarantee is tested directly against every declared
query name via bench.format_final_line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_emits_parseable_final_line_and_detail(tmp_path):
    # SPARK_GRAFT_BENCH_DETAIL points at a tmp file: the smoke run must
    # NEVER clobber the round's full BENCH_DETAIL.json artifact (observed
    # live in round 5: the 140-query detail was overwritten to 3 entries
    # mid-pytest).
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="a1_error_stats,x_dedup_exact,x_hash_sample",
        SPARK_GRAFT_BENCH_DETAIL=detail_path,
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
    lines = out.stdout.splitlines()

    # the driver's view: last line of the stdout tail must be the record
    final = lines[-1]
    assert final.startswith("{"), out.stdout[-2000:]
    assert len(final) < 1900
    d = json.loads(final)
    assert d["metric"] == "total_headline_query_seconds"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert d["value"] >= 0 and d["value_cold"] >= 0 and d["value_exec"] >= 0

    # per-query tiers live on the DETAIL line and in BENCH_DETAIL.json
    detail_lines = [l for l in lines if l.startswith("DETAIL ")]
    assert len(detail_lines) == 1
    detail = json.loads(detail_lines[0][len("DETAIL "):])
    for tier in ("queries", "queries_cold", "queries_exec"):
        assert set(detail[tier]) == {
            "a1_error_stats", "x_dedup_exact", "x_hash_sample"
        }
        assert all(v >= 0 for v in detail[tier].values())
    # the streaming tier (default-on) reports end-to-end topology rate
    st = detail["streaming"]
    assert st["records"] > 0 and st["micro_batches"] >= 1
    assert st["records_per_sec"] > 0
    assert d["streaming_rps"] == st["records_per_sec"]
    # per-stage decomposition (VERDICT r6 next-#3): four pipeline
    # prefixes, attributed deltas, and a named dominant stage
    assert set(st["stages"]) == {
        "source_sink", "plus_decode", "plus_route_parse_enrich",
        "full_with_stateful_stats", "route_one_batch",
        "plus_seasonal_baseline",
    }
    # the amortization probe (round-8): one-trigger route run + the
    # attributed per-micro-batch planning overhead
    assert st["stages"]["route_one_batch"]["micro_batches"] == 1
    assert st["route_per_batch_overhead_sec"] >= 0
    assert all(
        v["seconds"] > 0 and v["records_per_sec"] > 0
        for v in st["stages"].values()
    )
    assert set(st["deltas_sec"]) == {
        "decode", "route_parse_enrich", "stateful_stats"
    }
    assert st["dominant_stage"] in set(st["deltas_sec"]) | {"source_sink"}
    # the full prefix IS the headline measurement
    assert st["stages"]["full_with_stateful_stats"]["seconds"] == st["seconds"]
    assert d["value"] == round(sum(detail["queries"].values()), 3)
    assert d["value_cold"] == round(sum(detail["queries_cold"].values()), 3)
    with open(detail_path) as f:
        assert json.load(f) == detail
    # the measurement-environment snapshot rides along in the artifact
    for snap in ("machine_start", "machine_end"):
        assert "concurrent_java_procs" in detail[snap]
        assert "loadavg" in detail[snap]


def test_final_line_short_at_full_query_surface():
    """Even with every declared query (worst-case warm dict size), the
    final line must fit the driver's 2,000-char tail window with margin;
    format_final_line drops the per-query dict when it would not."""
    import bench
    import __spark_entry__ as entry_mod

    names = sorted(entry_mod.queries().keys())
    # worst-case float width: hundreds of seconds, 3 decimals
    t = {n: 123.456 for n in names}
    line = bench.format_final_line(t, dict(t), dict(t), "0.1")
    assert len(line) < 1900, len(line)
    d = json.loads(line)
    assert d["value"] == round(sum(t.values()), 3)

    # pathological surface (many long names) must trigger the compact form
    huge = {f"x_{'q' * 60}_{i}": 1.0 for i in range(100)}
    line = bench.format_final_line(huge, dict(huge), dict(huge), "0.1")
    assert len(line) < 1900
    assert "queries" not in json.loads(line)


def test_bench_tiers_env_var(tmp_path):
    """SPARK_GRAFT_BENCH_TIERS=exec runs the cheap tier only; the final
    line's value falls back to the exec sum."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_QUERIES="x_hash_sample",
        SPARK_GRAFT_BENCH_TIERS="exec",
        SPARK_GRAFT_BENCH_DETAIL=str(tmp_path / "BENCH_DETAIL.json"),
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
    final = out.stdout.splitlines()[-1]
    d = json.loads(final)
    detail_line = [l for l in out.stdout.splitlines() if l.startswith("DETAIL ")][0]
    detail = json.loads(detail_line[len("DETAIL "):])
    assert detail["queries"] == {} and detail["queries_cold"] == {}
    assert set(detail["queries_exec"]) == {"x_hash_sample"}
    assert d["value"] == d["value_exec"] == round(
        sum(detail["queries_exec"].values()), 3
    )
    assert d["value_cold"] == 0


def test_compare_to_reference_renormalizes_and_never_raises(tmp_path):
    """Round-9 (r8 VERDICT #4): the cross-round comparison divides the
    common-set warm total by the calib ratio, reports the one-number
    renorm_vs_ref, and returns None (never raises) for a missing or
    malformed reference."""
    import json as _json

    import bench

    ref = {
        "queries": {"q1": 1.0, "q2": 2.0, "dropped": 5.0},
        "machine_start": {"calib_md5_ms": 100.0},
        "machine_end": {"calib_md5_ms": 100.0},
        "ref_name": "fixture",
    }
    rp = tmp_path / "REF.json"
    rp.write_text(_json.dumps(ref))
    import os as _os

    _os.environ["SPARK_GRAFT_BENCH_REF"] = str(rp)
    try:
        # host ran 2x slower (calib 200 vs 100): raw 6.0 over the
        # common set renormalizes to 3.0 -> ratio vs ref's 3.0 = 1.0
        got = bench.compare_to_reference(
            {"q1": 2.0, "q2": 4.0, "brand_new": 9.0},
            {"calib_md5_ms": 200.0},
            {"calib_md5_ms": 200.0},
        )
        assert got["calib_ratio"] == 2.0
        assert got["common_queries"] == 2
        assert got["new_queries"] == ["brand_new"]
        assert got["raw_common_total_sec"] == 6.0
        # HEADLINE is the raw ratio (r11: renorm demoted to diagnostic)
        assert got["raw_vs_ref"] == 2.0
        assert got["renorm_common_total_sec"] == 3.0
        assert got["renorm_vs_ref"] == 1.0
        # no parallel probe on either side: single-thread basis, par
        # spread explicitly absent (not mislabeled single-thread data)
        assert got["calib_basis"] == "single_thread_md5"
        assert got["calib_st_cur_n_samples"] == 2
        assert got["calib_par_cur_spread_ms"] is None
        assert {r["query"] for r in got["top_renorm_regressions_sec"]} == {
            "q1", "q2"
        }
        # the compact final line carries the one-number verdict
        line = bench.format_final_line(
            {"q1": 2.0}, {}, {}, "0.1", None, got
        )
        parsed = _json.loads(line)
        assert parsed["raw_vs_ref"] == 2.0
        assert parsed["renorm_vs_ref"] == 1.0
        assert parsed["calib_ratio"] == 2.0
        # all-core probe on BOTH sides: parallel basis engages and the
        # recorded spread describes the probe the ratio actually used
        # (driver-ADVICE r11: the old fields described the
        # single-thread samples under the all-core basis)
        ref_par = dict(
            ref,
            machine_start={"calib_md5_ms": 100.0, "calib_par_ms": 150.0},
            machine_end={"calib_md5_ms": 100.0, "calib_par_ms": 150.0},
        )
        rp.write_text(_json.dumps(ref_par))
        got_par = bench.compare_to_reference(
            {"q1": 2.0, "q2": 4.0},
            {"calib_md5_ms": 200.0, "calib_par_ms": 600.0},
            {"calib_md5_ms": 200.0, "calib_par_ms": 610.0},
        )
        assert got_par["calib_basis"] == "all_core_parallel"
        assert got_par["calib_ratio"] == round(605.0 / 150.0, 4)
        assert got_par["calib_par_cur_n_samples"] == 2
        assert got_par["calib_par_cur_spread_ms"] == [600.0, 610.0]
        assert got_par["calib_st_cur_spread_ms"] == [200.0, 200.0]
        assert got_par["raw_vs_ref"] == 2.0
        # malformed / missing refs -> None, never an exception
        rp.write_text("{not json")
        assert bench.compare_to_reference(
            {"q1": 1.0}, {"calib_md5_ms": 1.0}, {"calib_md5_ms": 1.0}
        ) is None
        _os.environ["SPARK_GRAFT_BENCH_REF"] = str(tmp_path / "absent.json")
        assert bench.compare_to_reference(
            {"q1": 1.0}, {"calib_md5_ms": 1.0}, {"calib_md5_ms": 1.0}
        ) is None
    finally:
        _os.environ.pop("SPARK_GRAFT_BENCH_REF", None)
