#!/usr/bin/env python3
"""Two-parallelism scaling benchmark (BASELINE.md protocol).

No real cluster exists in this sandbox, so the north_rule's N vs 4N
executor criterion is evidenced by running the SAME crawl job on the SAME
corpus snapshot at local[N] and local[4N] (fresh JVM per run via
subprocess), and reporting throughput at both plus
efficiency = (T_4N / T_N) / 4. Writes BENCH/BASELINE.md.

Protocol (round 4 — VERDICT r3 #1): INTERLEAVED A/B. Runs alternate
N, 4N, N, 4N, ... so slow host-level drift (this VM's wall swings 30-50%
between identical runs over tens of minutes) hits both levels equally;
efficiency is computed from per-level MEDIANS over >=3 repeats, with every
sample reported. Each run is CPU-affinity-pinned to its nominal core count
(taskset -c 0..N-1) — the cores-per-executor analogue: on a real cluster
an N-core executor's JVM GC/IO threads and Python workers share that
executor's cgroup CPU quota. Without pinning, the local[1] JVM's helper
threads and Python workers spill onto the host's 31 idle cores, giving
the "1-core" baseline ~2-3 effective cores and understating true scaling
(observed: java at ~240% CPU during an unpinned local[1] run).

Variants (VERDICT r3 #2/#6), each a single pinned run per level:
  * compaction — inserts forced onto the journal and mor_compact_rows
    lowered so a size-triggered compaction fires DURING the measured
    epochs; its wall counts toward epoch wall (compact_sec).
  * robots-flip — warm-up runs against the normal corpus, then the job
    rebinds to a robots-loosened corpus copy; the first measured epoch
    pays the TTL-refresh resurrection pass over the full blocked set.

Usage: python jobs/scaling_bench.py [--n 1] [--repeats 3]
       [--skip-variants] [--only-variants]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, time, tempfile
sys.path.insert(0, {repo!r})
from torspider_spark.session import get_spark
from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob
from torspider_spark.sources.corpus import BENCH, build_corpus_spark

cores = {cores}
spark = get_spark(app_name=f"scaling_{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
corpus = {corpus!r}
if not os.path.exists(os.path.join(corpus, "pages.parquet")):
    build_corpus_spark(spark, BENCH, corpus)
cfg = CrawlConfig(host_budget_per_epoch={budget}, bloom_min_frontier=0,
                  robots_ttl_epochs={robots_ttl}, shuffle_partitions=cores,
                  **{extra_cfg!r})
work = tempfile.mkdtemp(prefix="scaling_wh")
job = CrawlJob(spark, corpus, work, cfg)
history = job.run(max_epochs={warmup})          # warm-up: grow the frontier
flip = {flip_corpus!r}
if flip:
    # Rebind to the robots-loosened corpus (same warehouse): the next
    # epoch's TTL bookkeeping restarts, rebuilds the robots dimension and
    # re-evaluates the FULL robots_blocked set (resurrection pass).
    job = CrawlJob(spark, flip, work, cfg)
t0 = time.time()
measured = job.run(max_epochs={measure})        # measured epochs
total = time.time() - t0
blocked_after = None
if flip:
    # Post-measurement evidence query (outside the timed window): under
    # allow-all rules nothing may remain robots_blocked.
    from pyspark.sql import functions as F
    blocked_after = job.frontier_df().filter(
        F.col("state") == "robots_blocked").count()
# The north metric is urls/sec of EPOCH wall time. Mid-run journal
# compactions are attributed to their triggering epoch (compact_seconds)
# and COUNT toward epoch wall — hiding them would flatter the MOR path.
# run() additionally finalizes (end-of-run compaction + urls/onions
# publish) — a per-RUN cost a long crawl amortizes, reported separately.
wall = sum(h["seconds"] + h.get("compact_seconds", 0.0) for h in measured)
inserted = sum(h["inserted"] for h in measured)
candidates = sum(h["candidates"] for h in measured)
posted = sum(h["posted"] for h in measured)
print("RESULT " + json.dumps({{
    "cores": cores, "wall_sec": round(wall, 3),
    "run_wall_sec": round(total, 3),
    "finalize_sec": round(total - wall, 3),
    "urls_discovered_deduped": inserted, "candidates": candidates,
    "posted": posted,
    "revived": sum(h.get("revived", 0) for h in measured),
    "revived_total": sum(h.get("revived_total", 0) for h in measured),
    "robots_blocked_after": blocked_after,
    "throughput": round(inserted / wall, 2),
    "pages_per_sec": round(posted / wall, 2),
    "per_epoch": [{{"epoch": h["epoch"], "sec": round(h["seconds"], 2),
                    "compact_sec": round(h.get("compact_seconds", 0.0), 2),
                    "candidates": h["candidates"],
                    "revived": h.get("revived", 0),
                    "revived_total": h.get("revived_total", 0),
                    "inserted": h["inserted"]}} for h in measured],
}}))
spark.stop()
"""

FLIPPER = r"""
import os, shutil, sys
sys.path.insert(0, {repo!r})
from torspider_spark.session import get_spark
from pyspark.sql import functions as F

src, dst = {src!r}, {dst!r}
spark = get_spark(app_name="robots_flip", master="local[8]",
                  shuffle_partitions=8)
pages = spark.read.parquet(os.path.join(src, "pages.parquet"))
loosened = pages.withColumn(
    "text", F.when(F.col("url").endswith("/robots.txt"),
                   F.lit("User-agent: *\nDisallow:\n"))
    .otherwise(F.col("text"))).withColumn(
    "html", F.when(F.col("url").endswith("/robots.txt"),
                   F.encode(F.lit("User-agent: *\nDisallow:\n"), "utf-8"))
    .otherwise(F.col("html")))
os.makedirs(dst, exist_ok=True)
loosened.write.mode("overwrite").parquet(os.path.join(dst, "pages.parquet"))
for name in ("pages_meta.parquet", "seeds.parquet"):
    s, d = os.path.join(src, name), os.path.join(dst, name)
    if os.path.isdir(s):
        shutil.copytree(s, d, dirs_exist_ok=True)
    else:
        shutil.copyfile(s, d)
print("FLIPPED")
spark.stop()
"""


def run_once(cores: int, corpus: str, budget: int, warmup: int, measure: int,
             robots_ttl: int = 1000, extra_cfg: dict | None = None,
             flip_corpus: str | None = None) -> dict:
    """One fresh-JVM, CPU-pinned run; returns the RESULT payload."""
    code = RUNNER.format(repo=REPO, cores=cores, corpus=corpus, budget=budget,
                         warmup=warmup, measure=measure,
                         robots_ttl=robots_ttl, extra_cfg=extra_cfg or {},
                         flip_corpus=flip_corpus)
    pin = []
    if shutil.which("taskset"):
        pin = ["taskset", "-c", f"0-{cores - 1}" if cores > 1 else "0"]
    proc = subprocess.run(pin + [sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=3000)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"run at {cores} cores failed:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-4000:]}")


def summarize(samples: list[dict]) -> dict:
    """Per-level summary: the median-wall sample, annotated with the full
    sample spread (median/min/max over wall and throughput)."""
    walls = sorted(s["wall_sec"] for s in samples)
    med_wall = statistics.median(walls)
    # Representative run = the one closest to the median wall.
    rep = min(samples, key=lambda s: abs(s["wall_sec"] - med_wall))
    out = dict(rep)
    out["samples_wall_sec"] = walls
    # Run order preserved: index i here and in the other level's list is
    # the SAME interleave round — the designed A/B comparison.
    out["samples_wall_sec_ordered"] = [s["wall_sec"] for s in samples]
    out["samples_throughput"] = sorted(s["throughput"] for s in samples)
    out["median_wall_sec"] = round(med_wall, 3)
    out["median_throughput"] = round(
        statistics.median(s["throughput"] for s in samples), 2)
    out["wall_spread"] = [walls[0], walls[-1]]
    return out


def interleaved(n: int, corpus: str, budget: int, warmup: int, measure: int,
                repeats: int) -> tuple[dict, dict]:
    """Alternate N / 4N runs so host drift hits both levels equally."""
    small_samples, big_samples = [], []
    for i in range(repeats):
        print(f"[interleave {i + 1}/{repeats}] local[{n}] ...",
              file=sys.stderr, flush=True)
        small_samples.append(run_once(n, corpus, budget, warmup, measure))
        print(f"  -> {small_samples[-1]['wall_sec']} s", file=sys.stderr,
              flush=True)
        print(f"[interleave {i + 1}/{repeats}] local[{n * 4}] ...",
              file=sys.stderr, flush=True)
        big_samples.append(run_once(n * 4, corpus, budget, warmup, measure))
        print(f"  -> {big_samples[-1]['wall_sec']} s", file=sys.stderr,
              flush=True)
    return summarize(small_samples), summarize(big_samples)


def ensure_flipped_corpus(corpus: str) -> str:
    flipped = corpus + "_loosened"
    if not os.path.exists(os.path.join(flipped, "pages.parquet")):
        code = FLIPPER.format(repo=REPO, src=corpus, dst=flipped)
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True, timeout=1200)
        if "FLIPPED" not in proc.stdout:
            raise RuntimeError(f"corpus flip failed:\n{proc.stderr[-3000:]}")
    return flipped


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--budget", type=int, default=192)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--measure", type=int, default=2)
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--skip-variants", action="store_true")
    parser.add_argument("--only-variants", action="store_true")
    parser.add_argument("--variant-repeats", type=int, default=1,
                        help="interleaved N/4N repeats for the compaction "
                             "variant (headline-style medians)")
    parser.add_argument("--skip-flip", action="store_true",
                        help="skip the robots-flip variant (repeat the "
                             "compaction variant without re-paying it)")
    parser.add_argument("--only-flip", action="store_true",
                        help="re-run just the robots-flip variant and "
                             "refresh the artifacts")
    parser.add_argument("--report-only", action="store_true",
                        help="rewrite BENCH/BASELINE.md from the existing "
                             "BENCH/scaling.json without running anything")
    args = parser.parse_args()

    if args.report_only:
        with open(os.path.join(REPO, "BENCH", "scaling.json")) as fh:
            write_report(json.load(fh))
        return

    corpus = os.path.join(tempfile.gettempdir(), "torspider_scaling_corpus")
    out_path = os.path.join(REPO, "BENCH", "scaling.json")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    existing = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            existing = json.load(fh)

    protocol = (
        f"INTERLEAVED local[{args.n}] vs local[{args.n * 4}] (alternating "
        f"runs, fresh JVM each, {args.repeats} repeats per level), each run "
        f"CPU-pinned to its nominal cores (taskset — the cores-per-executor "
        f"analogue), same corpus snapshot, {args.warmup} warm-up + "
        f"{args.measure} measured epochs, host_budget={args.budget}; "
        f"efficiency from per-level MEDIAN throughput, all samples reported "
        f"(this VM's wall can swing 30-50% between identical runs)")

    if not args.only_variants and not args.only_flip:
        small, big = interleaved(args.n, corpus, args.budget, args.warmup,
                                 args.measure, args.repeats)
        eff = round((big["median_throughput"] / small["median_throughput"])
                    / 4, 3) if small["median_throughput"] else 0.0
        # Worst/best pairings across samples — the honesty band.
        pairs = [
            round((bt / st) / 4, 3)
            for st in small["samples_throughput"]
            for bt in big["samples_throughput"]]
        # Adjacent interleaved pairs — round i's N run vs round i's 4N run
        # (the designed comparison; wall ratio == throughput ratio because
        # both levels process the identical URL set).
        adjacent = [
            round((sw / bw) / 4, 3)
            for sw, bw in zip(small["samples_wall_sec_ordered"],
                              big["samples_wall_sec_ordered"])]
        existing["headline"] = {
            "protocol": protocol, "n": small, "four_n": big,
            "scaling_efficiency": eff,
            "efficiency_pairings_min_max": [min(pairs), max(pairs)],
            "adjacent_pair_efficiencies": adjacent,
        }
        print(json.dumps({"headline_efficiency": eff,
                          "n_samples": small["samples_wall_sec"],
                          "four_n_samples": big["samples_wall_sec"],
                          "pairings": [min(pairs), max(pairs)],
                          "adjacent_pairs": adjacent}))
    existing["generated_at"] = datetime.now(timezone.utc).isoformat()

    if not args.skip_variants and not args.only_flip:
        # Variant A (VERDICT r3 #2): force a size-triggered compaction
        # during the measured epochs — inserts ride the journal
        # (mor_insert_journal_max_rows high) and the row trigger is set
        # below one epoch's discovery volume, so the compaction cost is
        # paid (and counted) mid-run at headline scale.
        compact_cfg = {"mor_insert_journal_max_rows": 10**9,
                       "mor_compact_rows": 400_000}
        # Same interleaved-repeats protocol as the headline (r6: the r5
        # artifact held one run per level, and two extra runs had to be
        # spliced into the JSON by hand to report variance honestly).
        cs_s, cb_s = [], []
        for i in range(args.variant_repeats):
            print(f"[variant compaction {i + 1}/{args.variant_repeats}] "
                  f"local[{args.n}] ...", file=sys.stderr, flush=True)
            cs_s.append(run_once(args.n, corpus, args.budget, args.warmup,
                                 args.measure, extra_cfg=compact_cfg))
            print(f"[variant compaction {i + 1}/{args.variant_repeats}] "
                  f"local[{args.n * 4}] ...", file=sys.stderr, flush=True)
            cb_s.append(run_once(args.n * 4, corpus, args.budget,
                                 args.warmup, args.measure,
                                 extra_cfg=compact_cfg))
        cs, cb = summarize(cs_s), summarize(cb_s)
        ceff = round(
            (cb["median_throughput"] / cs["median_throughput"]) / 4, 3)
        adjacent = [round(b["throughput"] / s["throughput"] / 4, 3)
                    for s, b in zip(cs_s, cb_s)]
        prior_history = (existing.get("compaction_variant") or {}).get(
            "history", [])
        # ADVICE r6: record THIS session in the carried-forward history
        # (it previously only grew by hand-editing scaling.json).
        prior_history = prior_history + [{
            "label": f"local[{args.n}] vs local[{args.n * 4}]",
            "repeats": args.variant_repeats,
            "efficiency": ceff,
            "adjacent_pairs": adjacent,
        }]
        existing["compaction_variant"] = {
            "config": compact_cfg,
            "note": "journal-routed inserts + low row trigger: size-"
                    "triggered compactions fire during the measured "
                    "epochs; compact_sec counts toward epoch wall",
            "history": prior_history,
            "n": cs, "four_n": cb, "scaling_efficiency": ceff,
            "efficiency_samples_this_round": adjacent,
            "samples_note": f"adjacent interleaved pairs "
                            f"({args.variant_repeats} repeats); headline "
                            f"efficiency above is from per-level medians",
        }
        print(json.dumps({"compaction_variant_efficiency": ceff,
                          "adjacent_pairs": adjacent,
                          "n_compact_sec": [e["compact_sec"]
                                            for e in cs["per_epoch"]],
                          "four_n_compact_sec": [e["compact_sec"]
                                                 for e in cb["per_epoch"]]}))

    if (not args.skip_variants or args.only_flip) and not args.skip_flip:
        # Variant B (VERDICT r3 #6): robots flip mid-run — the first
        # measured epoch rebuilds the robots dimension against the
        # loosened corpus and pays the resurrection pass over the full
        # blocked set accumulated during warm-up.
        flipped = ensure_flipped_corpus(corpus)
        print("[variant robots-flip] ...", file=sys.stderr, flush=True)
        rb = run_once(args.n * 4, corpus, args.budget, args.warmup,
                      args.measure, flip_corpus=flipped)
        existing["robots_flip_variant"] = {
            "note": "warm-up on the normal corpus, measured epochs on a "
                    "robots-loosened copy (same warehouse): epoch 1 of "
                    "the measurement pays the TTL-refresh resurrection "
                    "scan over the full robots_blocked set. revived_total "
                    "counts every resurrected row (incl. ones immediately "
                    "scheduled as candidates); robots_blocked_after is "
                    "the post-run frontier count (must be 0 under "
                    "allow-all rules)",
            "four_n": rb,
            # The revived count scales with how much robots_blocked state
            # accumulated before the flip — record the warm-up depth so
            # rounds are comparable (r4 used 3 warm-ups -> 931 revived;
            # a 2-warm-up run only accumulates ~50).
            "warmup_epochs": args.warmup,
        }
        print(json.dumps({
            "robots_flip_revived_total": rb["revived_total"],
            "robots_blocked_after": rb["robots_blocked_after"],
            "robots_flip_wall": rb["wall_sec"]}))

    with open(out_path, "w") as fh:
        json.dump(existing, fh, indent=1)

    if args.only_variants:
        return

    write_report(existing)


def write_report(existing: dict) -> None:
    # -- BENCH/BASELINE.md ---------------------------------------------------
    if not existing.get("headline"):
        raise SystemExit(
            "scaling.json has no 'headline' section (produced by an "
            "--only-variants/--only-flip run or truncated?) — run the full "
            "headline protocol first, then --report-only regenerates the "
            "report.")
    report_eff = existing["headline"]["scaling_efficiency"]
    small = existing["headline"]["n"]
    big = existing["headline"]["four_n"]
    lines = [
        "# BENCH/BASELINE — crawl throughput at two parallelism levels",
        "",
        "North metric: URLs discovered+deduped per second of epoch wall time",
        "(BASELINE.json). Sandbox protocol per BASELINE.md: same job, same",
        "corpus snapshot, two local parallelism levels, fresh JVM each,",
        "INTERLEAVED so host drift hits both levels equally.",
        "",
        f"- corpus: BENCH spec (seeded, deterministic), protocol: "
        f"{existing['headline']['protocol']}",
        "",
        "| cores | median wall (s) | all samples (s) | median throughput "
        "(urls/s) | urls discovered+deduped |",
        "|---|---|---|---|---|",
    ]
    for r in (small, big):
        lines.append(
            f"| local[{r['cores']}] | {r['median_wall_sec']} | "
            f"{r['samples_wall_sec']} | {r['median_throughput']} | "
            f"{r['urls_discovered_deduped']} |")
    pmin, pmax = existing["headline"]["efficiency_pairings_min_max"]
    lines += [
        "",
        f"**Scaling efficiency (N -> 4N, from per-level medians): "
        f"{report_eff}** (target >= 0.8). Cross-pairing band over all "
        f"sample combinations: {pmin} - {pmax}.",
    ]
    adj = existing["headline"].get("adjacent_pair_efficiencies")
    if adj:
        lines += [
            "",
            f"Adjacent interleaved pairs (round i's N run vs round i's 4N "
            f"run — the designed A/B comparison; the cross-pairing band "
            f"above also mixes runs up to an hour apart): {adj}, "
            f"median {statistics.median(adj):.3f}.",
        ]
    hist = existing.get("session_history")
    if hist:
        lines += ["", "Independent interleaved sessions "
                      "(round, median efficiency each):"]
        lines += [f"- {h}" for h in hist]
    lines += [
        "",
        f"Wall above is EPOCH wall (the metric's denominator), including "
        f"any mid-run compaction. End-of-run finalization (journal "
        f"compaction + urls/onions publish — a per-run cost amortized in a "
        f"long crawl): {small.get('finalize_sec', 0)} s at N, "
        f"{big.get('finalize_sec', 0)} s at 4N (representative runs).",
        "",
        "Per-epoch detail (representative = closest-to-median run):",
        "```json",
        json.dumps({"n": small["per_epoch"], "4n": big["per_epoch"]},
                   indent=1),
        "```",
    ]
    cv = existing.get("compaction_variant")
    if cv:
        lines += [
            "",
            "## Variant: mid-run size-triggered compaction (headline scale)",
            "",
            f"Config: {cv['config']} — inserts ride the journal and the",
            "row trigger fires during the measured epochs; compact wall",
            "counts toward epoch wall (compact_sec per epoch below).",
            "",
            f"- local[{cv['n']['cores']}]: wall {cv['n']['wall_sec']} s, "
            f"compact {[e['compact_sec'] for e in cv['n']['per_epoch']]} s",
            f"- local[{cv['four_n']['cores']}]: wall "
            f"{cv['four_n']['wall_sec']} s, compact "
            f"{[e['compact_sec'] for e in cv['four_n']['per_epoch']]} s",
            f"- **efficiency with compaction in the measured window: "
            f"{cv['scaling_efficiency']}**",
        ]
        if cv.get("efficiency_samples_this_round"):
            lines += [
                f"- all samples this round: "
                f"{cv['efficiency_samples_this_round']}"
                + (f" — {cv['samples_note']}" if cv.get("samples_note")
                   else ""),
            ]
        if cv.get("history"):
            lines += ["", "Variant history (measurement sessions):"]
            lines += [f"- {h}" for h in cv["history"]]
    rv = existing.get("robots_flip_variant")
    if rv:
        r = rv["four_n"]
        lines += [
            "",
            "## Variant: robots flip mid-run (resurrection at bench scale)",
            "",
            f"{rv.get('warmup_epochs', '?')} warm-up epochs on the normal "
            "corpus (the revived count below scales with the",
            "robots_blocked state those epochs accumulate); measured "
            "epochs run against a",
            "robots-loosened copy over the same warehouse, so the first",
            "measured epoch rebuilds the robots dimension and re-evaluates",
            "the FULL robots_blocked set (plan: pushed state-filter scan,",
            "see BENCH/PLANS.md).",
            "",
            f"- local[{r['cores']}]: wall {r['wall_sec']} s, resurrected "
            f"{r.get('revived_total', r['revived'])} urls "
            f"({r['revived']} of them re-journaled as pending, the rest "
            f"immediately scheduled), robots_blocked after the run: "
            f"{r.get('robots_blocked_after')}; per-epoch (epoch, sec, "
            f"revived_total) "
            f"{[(e['epoch'], e['sec'], e.get('revived_total', 0)) for e in r['per_epoch']]}",
        ]
    lines += [
        "",
        f"Generated {existing['generated_at']} by jobs/scaling_bench.py.",
        "",
        "## Context",
        "",
        "- Protocol history: r1/r2 ran UNPINNED (the local[1] JVM's",
        "  GC/IO/python-worker threads spilled onto the host's idle cores,",
        "  inflating the 1-core baseline to ~2-3 effective cores): r1 417.9",
        "  s @1 / 110.2 s @4 (0.948, full frontier rewrite per epoch — lots",
        "  of well-parallelized redundant work); r2 334.2 / 165.2 (0.506 —",
        "  unbounded journal + forced broadcast on every epoch's read",
        "  path). r3 governed the journal and cut fixed driver actions",
        "  (165.2 -> 95.5 s @4) and switched to CPU-pinned runs, best-of-2:",
        "  0.818. Round 4 keeps the pinned protocol but replaces best-of-2",
        "  with interleaved medians-of-N — the r3 verdict's one `weak`.",
        "- Secondary 2-vs-8 protocol is capped at ~0.58 by this sandbox VM's",
        "  per-core throughput falloff beyond ~8 busy cores (a pure-Python",
        "  control shows the same falloff); 1-vs-4 is the linear region and",
        "  the faithful analogue of N vs 4N executors.",
        "- Epoch I/O vs table size: BENCH/frontier_merge.json — constant",
        "  update batch over 10x table growth: bucketed MERGE flat (0.88x)",
        "  vs full rewrite growing (1.31x), 1.9x faster at 1M rows.",
        "- Identical URL-seen set at both parallelism levels (also enforced",
        "  by tests/test_e2e_equality.py).",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
