#!/usr/bin/env python3
"""Interleaved cross-round A/B bench (VERDICT r5 #4).

Round-over-round per-query timings on this VM are not comparable from the
BENCH_r{N}.json artifacts alone: the host's wall swings 30-50% between
identical runs hours apart, and r5's artifact showed EVERY shared query
+13-80% slower than r4's with no plan changes. Any r(N-1)-vs-rN perf
claim therefore needs the same treatment the scaling protocol gives core
counts: alternate OLD/NEW checkouts, fresh JVM per sample, >=3 repeats,
compare per-level MEDIANS.

This script materializes the old round at a pinned ref in a git worktree
(read-only usage; removed on --cleanup), runs the shared headline bench
surface (bench_queries + bench_media + crawl wall) alternately against
old and new trees, and writes BENCH/ab_r6.md + BENCH/ab_r6.json with a
per-query verdict: faster/slower when the median ratio clears the noise
band, else noise; any slower-than-1.3x regression is flagged for a plan
diff.

Usage: python jobs/ab_bench.py [--old-ref c5655b6] [--repeats 3]
       [--label-old r5 --label-new r6] [--cleanup]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Verdict band: the protocol treats |log ratio| under this as host noise.
NOISE_RATIO = 1.15
REGRESSION_RATIO = 1.3

RUNNER = r"""
import json, os, sys
tree = {tree!r}
os.chdir(tree)
sys.path.insert(0, tree)
os.environ["PYTHONPATH"] = tree
os.environ["SPARK_GRAFT_CPUS"] = str({cpus})
import bench
from torspider_spark.session import get_spark

spark = get_spark(app_name="ab_bench", master="local[{cpus}]",
                  shuffle_partitions={cpus})
spark.range(1000).agg({{"id": "sum"}}).collect()  # steady-state warm-up
queries = bench.bench_queries(spark, {sf_dir!r})
queries.update(bench.bench_media(spark))
crawl = bench.bench_crawl(spark, {sf})
spark.stop()
print("RESULT " + json.dumps({{
    "queries": queries,
    "crawl_wall_sec": crawl["wall_sec"],
    "crawl_urls_per_sec": crawl["urls_per_sec"],
}}), flush=True)
"""


def run_once(tree: str, sf_dir: str, sf: float, cpus: int) -> dict:
    code = RUNNER.format(tree=tree, cpus=cpus, sf_dir=sf_dir, sf=sf)
    proc = subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, timeout=2400)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"A/B sample in {tree} failed:\n"
                       f"{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}")


def ensure_old_tree(ref: str) -> str:
    tree = f"/tmp/ab_bench_tree_{ref}"
    if not os.path.exists(os.path.join(tree, "bench.py")):
        subprocess.run(["git", "worktree", "add", "--detach", tree, ref],
                       cwd=REPO, check=True, capture_output=True, text=True)
    return tree


def medians(samples: list[dict]) -> dict:
    keys = set().union(*(s["queries"] for s in samples))
    out = {k: round(statistics.median(
        s["queries"][k] for s in samples if k in s["queries"]), 3)
        for k in keys}
    out["crawl_wall_sec"] = round(statistics.median(
        s["crawl_wall_sec"] for s in samples), 3)
    out["crawl_urls_per_sec"] = round(statistics.median(
        s["crawl_urls_per_sec"] for s in samples), 2)
    return out


def verdict_of(ratio: float) -> str:
    if ratio >= REGRESSION_RATIO:
        return "REGRESSION (needs plan diff)"
    if ratio >= NOISE_RATIO:
        return "slower"
    if ratio <= 1 / NOISE_RATIO:
        return "faster"
    return "noise"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-ref", default="c5655b6")
    ap.add_argument("--label-old", default="r5")
    ap.add_argument("--label-new", default="r6")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--cleanup", action="store_true",
                    help="remove the old-ref worktree afterwards")
    args = ap.parse_args()
    try:
        sf = float(args.sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1  # label only; a path like /data/sf_corpus parses as none

    old_tree = ensure_old_tree(args.old_ref)
    old_samples: list[dict] = []
    new_samples: list[dict] = []
    for i in range(args.repeats):
        # alternate which side goes first so slow drift cancels in pairs
        order = [("old", old_tree, old_samples), ("new", REPO, new_samples)]
        if i % 2 == 1:
            order.reverse()
        for label, tree, sink in order:
            print(f"[ab {i + 1}/{args.repeats}] {label} ...",
                  file=sys.stderr, flush=True)
            sink.append(run_once(tree, args.sf_dir, sf, args.cpus))
            print(f"  -> crawl {sink[-1]['crawl_wall_sec']} s",
                  file=sys.stderr, flush=True)

    med_old, med_new = medians(old_samples), medians(new_samples)
    shared = sorted(k for k in med_old if k in med_new
                    and k not in ("crawl_urls_per_sec",))
    rows = []
    for k in shared:
        o, n = med_old[k], med_new[k]
        ratio = (n / o) if o > 0 else float("inf")
        rows.append((k, o, n, round(ratio, 3), verdict_of(ratio)))

    payload = {
        "generated_at": datetime.now(timezone.utc).isoformat(),
        "old_ref": args.old_ref, "labels": [args.label_old, args.label_new],
        "repeats": args.repeats, "cpus": args.cpus, "sf_dir": args.sf_dir,
        "protocol": (f"interleaved old/new, alternating start side, fresh "
                     f"JVM per sample, medians over {args.repeats} repeats; "
                     f"noise band {NOISE_RATIO}x, regression bar "
                     f"{REGRESSION_RATIO}x"),
        "old_samples": old_samples, "new_samples": new_samples,
        "old_medians": med_old, "new_medians": med_new,
        "table": [{"query": r[0], args.label_old: r[1], args.label_new: r[2],
                   "ratio": r[3], "verdict": r[4]} for r in rows],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "ab_r6.json"), "w") as fh:
        json.dump(payload, fh, indent=1)

    lines = [
        f"# BENCH/AB_r6 — {args.label_old} vs {args.label_new}, interleaved",
        "",
        "Cross-round per-query comparison under the same interleaving the",
        "scaling protocol uses for core counts (this VM's wall swings",
        "30-50% between identical runs — single-artifact round-over-round",
        "deltas are not evidence).",
        "",
        f"- old = `{args.old_ref}` ({args.label_old} final), "
        f"new = working tree ({args.label_new})",
        f"- {payload['protocol']}",
        f"- surface: shared headline queries + media codec lines + "
        f"{''}crawl wall at {args.sf_dir}, local[{args.cpus}]",
        "",
        f"| query | {args.label_old} median s | {args.label_new} median s "
        f"| ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for k, o, n, ratio, verdict in rows:
        lines.append(f"| {k} | {o} | {n} | {ratio} | {verdict} |")
    ow = [s["crawl_wall_sec"] for s in old_samples]
    nw = [s["crawl_wall_sec"] for s in new_samples]
    lines += [
        "",
        f"Crawl-wall samples (run order) — {args.label_old}: {ow}, "
        f"{args.label_new}: {nw}; medians "
        f"{med_old['crawl_wall_sec']} -> {med_new['crawl_wall_sec']} s; "
        f"urls/s medians {med_old['crawl_urls_per_sec']} -> "
        f"{med_new['crawl_urls_per_sec']}.",
        "",
        f"Generated {payload['generated_at']} by jobs/ab_bench.py.",
    ]
    with open(os.path.join(REPO, "BENCH", "AB_r6.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(json.dumps({"rows": len(rows),
                      "regressions": [r[0] for r in rows
                                      if r[4].startswith("REGRESSION")]}))
    if args.cleanup:
        subprocess.run(["git", "worktree", "remove", "--force", old_tree],
                       cwd=REPO, capture_output=True)


if __name__ == "__main__":
    main()
