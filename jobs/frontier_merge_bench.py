#!/usr/bin/env python3
"""Frontier MERGE scaling evidence (VERDICT r1 #3 done-criterion).

Holds the per-epoch update batch CONSTANT while growing the frontier 10x,
and measures the epoch state-merge commit under

  * bucketed  — commit_bucketed: rewrite only buckets containing updates,
    append inserts as delta dirs (the engine's path);
  * full      — the round-1 shape: merge joined against the whole frontier,
    entire table rewritten with mode='overwrite'.

If the bucketed path is right, its epoch time tracks the touched-row count
and stays near-flat across the 10x growth while the full rewrite scales
with table size. Prints one JSON line and appends BENCH/frontier_merge.json.

Usage: python jobs/frontier_merge_bench.py [small_n] [growth] [updates] [buckets]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from torspider_spark.config import CrawlConfig  # noqa: E402
from torspider_spark.operators import frontier as fr  # noqa: E402
from torspider_spark.session import get_spark  # noqa: E402
from torspider_spark.sources.warehouse import Warehouse  # noqa: E402

WORK = "/tmp/torspider_frontier_bench"


def synth_frontier(spark, n: int):
    """Deterministic synthetic frontier of n pending rows, ~n/64 hosts."""
    return (
        spark.range(n)
        .select(
            F.concat(F.lit("http://h"), (F.col("id") % (n // 64 + 1)),
                     F.lit(".onion/p"), F.col("id")).alias("url"),
            F.lit(0).alias("depth"), F.lit(0).alias("priority"))
        .transform(lambda df: fr.bootstrap(spark, df, CrawlConfig()))
    )


def epoch_updates(spark, frontier_df, k: int):
    """k deterministic update rows (the 'scanned candidates' shape) drawn
    from the frontier, plus k/4 brand-new insert rows."""
    sample = frontier_df.orderBy("url_hash").limit(k).select(
        "url_hash",
        F.lit(True).alias("u_online"),
        F.lit(None).cast("string").alias("u_fault"),
        F.sha1(F.col("url_hash")).alias("u_hash"),
        F.lit(True).alias("u_scanned"),
        F.lit(False).alias("u_blocked"))
    inserts = (
        spark.range(k // 4)
        .select(F.concat(F.lit("http://new.onion/x"), F.col("id")).alias("url"),
                F.lit(1).alias("depth"), F.lit(1).alias("priority"))
        .transform(lambda df: fr.bootstrap(spark, df, CrawlConfig()))
    )
    return sample, inserts


def run_case(spark, n: int, k: int, cfg: CrawlConfig, mode: str,
             epochs: int = 3) -> dict:
    work = os.path.join(WORK, f"{mode}-{n}")
    shutil.rmtree(work, ignore_errors=True)
    wh = Warehouse(spark, work)
    base = synth_frontier(spark, n)
    bucket = F.pmod(F.xxhash64("url_hash"), F.lit(cfg.frontier_buckets))
    wh.commit_bucketed("frontier", 0, rewrite=base.withColumn("_bucket", bucket))
    times = []
    for epoch in range(1, epochs + 1):
        frontier = wh.read_buckets("frontier")
        updates, inserts = epoch_updates(spark, frontier, k)
        updates = updates.persist()
        updates.count()  # pre-materialize the batch: time only the merge
        t0 = time.time()
        if mode == "bucketed":
            touched = [int(r["b"]) for r in updates.select(
                bucket.alias("b")).distinct().collect()]
            old_slice = wh.read_buckets("frontier", touched)
            merged = _merge(old_slice, updates, cfg, epoch)
            wh.commit_bucketed(
                "frontier", epoch,
                rewrite=merged.withColumn("_bucket", bucket),
                append=inserts.withColumn("_bucket", bucket))
        else:
            merged = _merge(frontier, updates, cfg, epoch)
            wh.commit_bucketed(  # same writer; rewrite carries ALL buckets
                "frontier", epoch,
                rewrite=merged.unionByName(inserts)
                .withColumn("_bucket", bucket))
        times.append(time.time() - t0)
        updates.unpersist()
    rows = wh.read_buckets("frontier").count()
    return {"mode": mode, "frontier_n": n, "updates_per_epoch": k,
            "rows_after": rows, "epoch_sec": [round(t, 3) for t in times],
            "median_epoch_sec": round(sorted(times)[len(times) // 2], 3)}


def _merge(frontier_slice, updates, cfg, epoch):
    joined = frontier_slice.join(F.broadcast(updates), "url_hash", "left")
    hit = F.col("u_scanned").isNotNull()
    return joined.select(
        "url", "url_hash", "host", "depth", "priority",
        F.when(hit, F.lit("done")).otherwise(F.col("state")).alias("state"),
        F.when(hit, F.col("u_hash")).otherwise(F.col("last_hash"))
        .alias("last_hash"),
        F.col("tries"),
        "added_epoch",
        F.when(hit, F.lit(epoch)).otherwise(F.col("last_scan_epoch"))
        .cast("int").alias("last_scan_epoch"),
        F.col("next_eligible_epoch"),
    )


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    growth = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    cfg = CrawlConfig(frontier_buckets=buckets)
    spark = get_spark(app_name="frontier-merge-bench")

    out = {"protocol": (
        f"constant {k}-row update batch per epoch; frontier {small:,} vs "
        f"{small * growth:,} rows; buckets={cfg.frontier_buckets}; "
        f"median of 3 epochs; merge+commit time only")}
    for n in (small, small * growth):
        out[f"bucketed_{n}"] = run_case(spark, n, k, cfg, "bucketed")
        out[f"full_{n}"] = run_case(spark, n, k, cfg, "full")
    b1 = out[f"bucketed_{small}"]["median_epoch_sec"]
    b10 = out[f"bucketed_{small * growth}"]["median_epoch_sec"]
    f1 = out[f"full_{small}"]["median_epoch_sec"]
    f10 = out[f"full_{small * growth}"]["median_epoch_sec"]
    out["bucketed_growth_ratio"] = round(b10 / b1, 3) if b1 else None
    out["full_growth_ratio"] = round(f10 / f1, 3) if f1 else None
    out["bucketed_vs_full_at_10x"] = round(f10 / b10, 3) if b10 else None
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/frontier_merge.json", "w") as fh:
        json.dump(out, fh, indent=1)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
