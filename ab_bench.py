"""Interleaved A/B bench: a baseline tree vs HEAD, paired per-query ratios.

The r10 round closed with one unresolved number: renorm_vs_ref 1.3033 on
the 198 common queries vs r9's REF run, on a diff that only APPENDED
operators — with strong circumstantial evidence (6x streaming collapse on
unchanged code, loadavg 14-20, a 2x pytest wall slowdown measured by the
judge outside this harness) that the host, not the code, degraded across
the r10 session.  Endpoint calibration could not settle it (the
single-thread md5 probe is blind to multi-core contention).

This harness runs the DECISIVE experiment the r10 verdict asked for
(item #1): in ONE session, alternate the r9 working tree (git worktree at
the r9 closing commit) and HEAD, running the exec tier over the common
query set back-to-back in A-B / B-A / A-B order.  Pairing cancels host
drift by construction: whatever the host is doing during pair k hits both
trees within minutes of each other, and the order swap cancels
first-vs-second systematic bias.  The per-query statistic is the MEDIAN
over pairs of (HEAD exec sec / r9 exec sec); a query that is genuinely
slower in HEAD shows a median ratio > 1 in every pair regardless of host
state.

Usage:
    python ab_bench.py [--pairs 3] [--sf-dir /root/testdata/sf0.1]
                       [--out bench_runs/ab_r11_r9_vs_head.json]
                       [--baseline .ab_r9 --baseline-label r9]

r12 generalization: --baseline points at ANY git worktree of a past
closing commit (git worktree add .ab_rN <sha>), --baseline-label names
it in the artifact keys — the default reproduces the original r9-vs-HEAD
schema byte-for-byte.  This is now the standing cross-round performance
instrument (raw-common vs REF is the cheap every-run number; this is
the authoritative one when a delta needs attribution).

Writes one JSON artifact with per-run metadata, per-pair totals, the
paired per-query ratio table, and the flagged (>1.2x median, >0.2 s
absolute) regressions.  Exit code 0 always — this is an instrument, not
a gate; read the artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _declared_queries(tree: str) -> set[str]:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import sys; sys.path.insert(0, '.');"
            "from kafka_dead_letter_analyzer_spark import queries as Q;"
            "print('\\n'.join(sorted(Q.queries())))",
        ],
        cwd=tree,
        capture_output=True,
        text=True,
        check=True,
    )
    return {l.strip() for l in out.stdout.splitlines() if l.strip()}


def _run_exec_tier(
    tree: str, names: list[str], sf_dir: str, detail_path: str,
    tier: str = "exec",
) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_BENCH_TIERS": tier,
            "SPARK_GRAFT_BENCH_QUERIES": ",".join(names),
            "SPARK_GRAFT_BENCH_DETAIL": detail_path,
        }
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
    )
    wall = round(time.time() - t0, 1)
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench in {tree} rc={proc.returncode}:\n"
            f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
        )
    with open(detail_path) as f:
        detail = json.load(f)
    return {
        "tree": tree,
        "wall_sec": wall,
        "exec": detail["queries_exec" if tier == "exec" else "queries"],
        "machine_start": detail.get("machine_start", {}),
        "machine_end": detail.get("machine_end", {}),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--out", default=os.path.join("bench_runs", "ab_r11_r9_vs_head.json")
    )
    ap.add_argument("--baseline", default=os.path.join(HERE, ".ab_r9"))
    ap.add_argument("--baseline-label", default="r9")
    ap.add_argument(
        "--head",
        default=HERE,
        help="tree to measure as 'head' (default: this repo's working tree;"
        " point at a frozen worktree to keep editing while the A/B runs)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated query subset (default: all common queries) —"
        " the r12 verdict's single-query high-powered A/B mode",
    )
    ap.add_argument(
        "--tier",
        default="exec",
        choices=["exec", "warm"],
        help="bench tier to pair: exec (pure data path, the default) or"
        " warm (construct+force — the headline tier; needed when a change"
        " moves work that driver-bounded queries pay at construction)",
    )
    args = ap.parse_args()

    base_tree = os.path.abspath(args.baseline)
    head_tree = os.path.abspath(args.head)
    base = args.baseline_label
    if not os.path.isdir(base_tree):
        raise SystemExit(
            f"missing baseline worktree at {base_tree}: "
            "git worktree add <dir> <closing-commit>"
        )
    base_sha = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=base_tree, capture_output=True, text=True,
    ).stdout.strip()
    head_sha = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        cwd=head_tree, capture_output=True, text=True,
    ).stdout.strip()

    common = sorted(_declared_queries(base_tree) & _declared_queries(head_tree))
    if args.queries:
        want = {q.strip() for q in args.queries.split(",") if q.strip()}
        missing = want - set(common)
        if missing:
            raise SystemExit(f"--queries not in common set: {sorted(missing)}")
        common = sorted(want)
    print(f"common queries: {len(common)}", flush=True)

    tmp = "/tmp/ab_bench_detail.json"
    runs: list[dict] = []
    # order swap per pair: A-B, B-A, A-B, ... cancels first/second bias
    for k in range(args.pairs):
        order = (
            [(base, base_tree), ("head", head_tree)]
            if k % 2 == 0
            else [("head", head_tree), (base, base_tree)]
        )
        for label, tree in order:
            print(f"pair {k + 1}/{args.pairs}: running {label} ...", flush=True)
            r = _run_exec_tier(tree, common, args.sf_dir, tmp, args.tier)
            r["pair"] = k
            r["label"] = label
            runs.append(r)
            tot = round(sum(r["exec"].values()), 2)
            print(f"  {label} exec total {tot}s wall {r['wall_sec']}s", flush=True)

    # paired analysis
    pair_totals = []
    per_query_ratios: dict[str, list[float]] = {q: [] for q in common}
    for k in range(args.pairs):
        a = next(r for r in runs if r["pair"] == k and r["label"] == base)
        b = next(r for r in runs if r["pair"] == k and r["label"] == "head")
        ta = sum(a["exec"].get(q, 0.0) for q in common)
        tb = sum(b["exec"].get(q, 0.0) for q in common)
        pair_totals.append(
            {
                "pair": k,
                f"{base}_total_sec": round(ta, 3),
                "head_total_sec": round(tb, 3),
                f"head_over_{base}": round(tb / ta, 4) if ta else None,
            }
        )
        for q in common:
            qa, qb = a["exec"].get(q), b["exec"].get(q)
            if qa and qb and qa > 0:
                per_query_ratios[q].append(qb / qa)

    def med(xs: list[float]) -> float | None:
        if not xs:
            return None
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2

    table = []
    for q in common:
        ratios = per_query_ratios[q]
        mr = med(ratios)
        if mr is None:
            continue
        head_med = med(
            [r["exec"][q] for r in runs if r["label"] == "head" and q in r["exec"]]
        )
        base_med = med(
            [r["exec"][q] for r in runs if r["label"] == base and q in r["exec"]]
        )
        # a query missing from EVERY run of one label passes the
        # common-set test (common is unioned across pairs) but yields a
        # None median here — skip it rather than round(None) after all
        # the expensive runs completed
        if head_med is None or base_med is None:
            continue
        table.append(
            {
                "query": q,
                "median_ratio": round(mr, 3),
                f"{base}_median_sec": round(base_med, 3),
                "head_median_sec": round(head_med, 3),
                "delta_sec": round(head_med - base_med, 3),
                "ratios": [round(x, 3) for x in ratios],
            }
        )
    table.sort(key=lambda r: -r["median_ratio"])
    flagged = [
        r
        for r in table
        if r["median_ratio"] > 1.2 and r["delta_sec"] > 0.2
    ]
    total_ratios = [
        p[f"head_over_{base}"] for p in pair_totals if p[f"head_over_{base}"]
    ]
    artifact = {
        "what": f"interleaved A/B {args.tier}-tier bench, {base} closing"
                " tree vs HEAD (paired same-window measurements cancel"
                " host drift; the standing cross-round perf instrument)",
        "tier": args.tier,
        f"{base}_sha": base_sha,
        "head_sha": head_sha,
        "sf_dir": args.sf_dir,
        "pairs": args.pairs,
        "common_queries": len(common),
        "pair_totals": pair_totals,
        "median_total_ratio": med(total_ratios),
        "flagged_regressions": flagged,
        "top20_by_median_ratio": table[:20],
        "runs_meta": [
            {
                "pair": r["pair"],
                "label": r["label"],
                "wall_sec": r["wall_sec"],
                "exec_total_sec": round(sum(r["exec"].values()), 3),
                "loadavg_start": r["machine_start"].get("loadavg"),
                "loadavg_end": r["machine_end"].get("loadavg"),
                "calib_md5_ms": r["machine_start"].get("calib_md5_ms"),
                "calib_par_ms": r["machine_start"].get("calib_par_ms"),
            }
            for r in runs
        ],
        "per_query": table,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        json.dumps(
            {
                "median_total_ratio": artifact["median_total_ratio"],
                "pair_totals": pair_totals,
                "flagged": [r["query"] for r in flagged],
                "out": args.out,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
