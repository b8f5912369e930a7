#!/usr/bin/env python3
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR plus the crawl
engine's north metric (URLs discovered+deduped per second of epoch time).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "crawl": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

HEADLINE = [
    "join_agg", "topk_per_group", "windowed_time_agg", "taxonomy_case",
    "semi_join", "anti_join", "agg_rollup", "distinct_pairs",
    "dedup_exact", "doc_quality", "token_count", "fingerprint", "ann_cosine",
    "span_dedup", "dup_clusters", "repetition",
    "stratified_sample", "pack_sequences", "export_pipeline",
    "pii_scrub",
]

CRAWL_EPOCHS = 5


def _run_noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _run_noop(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


def _media_slice(spark, kind: str, n: int):
    """n rows of REAL decodable media (weblib.mediagen payloads built
    executor-side from the row id alone — the on-cluster shape is an
    opaque parquet binary column; generation cost is tiny next to
    decode). Uses the SAME mediagen.media_batches generator as the
    driver queries, so the bench measures the shape the oracle checks."""
    from torspider_spark.operators import multimodal
    from torspider_spark.weblib import mediagen as mg

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (spark.range(n).repartition(cpus)
            .mapInPandas(mg.media_batches(kind, "id"),
                         schema=multimodal.MEDIA))


def bench_media(spark) -> dict[str, float]:
    """Codec-path timings (VERDICT r4 ask #4): the oracle queries decode
    a handful of payloads; these lines decode a slice big enough that a
    kernel regression (e.g. losing the numpy vectorization) moves the
    number. Keys mirror the operator names the driver tracks."""
    from torspider_spark.operators import multimodal

    times: dict[str, float] = {}
    t0 = time.time()
    _run_noop(multimodal.decode_image_features(
        _media_slice(spark, "image", 4096)))
    times["media_features"] = round(time.time() - t0, 3)
    t0 = time.time()
    _run_noop(multimodal.sample_video_frames(
        _media_slice(spark, "video", 1024), every_n=1, max_frames=3))
    times["frame_samples"] = round(time.time() - t0, 3)
    t0 = time.time()
    _run_noop(multimodal.decode_audio_features(
        _media_slice(spark, "audio", 4096)))
    times["audio_features"] = round(time.time() - t0, 3)
    return times


def bench_skew_guard(spark, sf_dir: str) -> dict[str, float]:
    """Stop-shingle cutoff under a PLANTED boilerplate skew (VERDICT r5 #5).

    Every document gets the same appended footer, so its 3-gram shingles
    reach df == n_docs — the exact hot key that makes the co-occurrence
    self-join emit O(df^2) rows. The capped line runs the full table with
    max_shingle_df=64 (df(footer shingles) = 5000 at sf0.1 >> 64, so the
    cutoff demonstrably fires — asserted, not assumed); the uncapped
    comparator runs the SAME planted input on a 1500-doc slice because
    the full uncapped join is quadratic by construction. Capped-full
    beating uncapped-slice (3.3x the docs) is the timing evidence that
    the guard converts the blow-up into a count-agg + filter.
    """
    from pyspark.sql import functions as F

    from torspider_spark.operators import textdedup

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text"))
    boiler = " subscribe to our newsletter for weekly onion updates"
    planted = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(boiler)))
    cap = 64
    n_docs = planted.count()
    # prove the cutoff fires: at least the fully-boilerplate shingles sit
    # above the cap (df == n_docs)
    hot = (planted.select(F.explode(F.array_distinct(
               textdedup.word_shingles("text", 3))).alias("sh"))
           .groupBy("sh").agg(F.count("*").alias("df"))
           .filter(F.col("df") > cap).count())
    assert hot >= 1 and n_docs > cap, (hot, n_docs)

    times: dict[str, float] = {}
    # true A/B on the SAME input: a ~1500-doc slice keeps the uncapped
    # quadratic comparator affordable per round
    sliced = planted.filter(F.col("doc_id") % 10 < 3).localCheckpoint()
    t0 = time.time()
    _run_noop(textdedup.ngram_jaccard_pairs(sliced, threshold=0.5))
    times["jaccard_boiler_uncapped"] = round(time.time() - t0, 3)
    t0 = time.time()
    _run_noop(textdedup.ngram_jaccard_pairs(
        sliced, threshold=0.5, max_shingle_df=cap))
    times["jaccard_boiler_capped"] = round(time.time() - t0, 3)
    # scale-path line: the capped join over the full planted table
    t0 = time.time()
    _run_noop(textdedup.ngram_jaccard_pairs(
        planted, threshold=0.5, max_shingle_df=cap))
    times["jaccard_boiler_capped_full"] = round(time.time() - t0, 3)
    return times


def bench_cc_chain(spark) -> dict:
    """CC round-count probe on the adversarial chain-heavy shape
    (VERDICT r5 #6): ~10^6 edges as 1667 disjoint 600-node paths — the
    600-deep union-find fixture shape at bench scale. Star contraction
    must converge in O(log^2 depth) rounds; a regression in the
    contraction (e.g. a lost localCheckpoint re-deriving lineage) shows
    up here as ROUNDS or per-round blow-up, not as ambient VM noise."""
    from pyspark.sql import functions as F

    from torspider_spark.operators import graphdedup

    n_chains, depth = 1667, 600
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # node id = chain*1024 + pos; edges (id, id+1) within each chain —
    # built distributed from range(), never on the driver.
    edges = (spark.range(n_chains * (depth - 1)).repartition(cpus)
             .select((F.col("id") / (depth - 1)).cast("long").alias("c"),
                     (F.col("id") % (depth - 1)).alias("p"))
             .select((F.col("c") * 1024 + F.col("p")).alias("a"),
                     (F.col("c") * 1024 + F.col("p") + 1).alias("b")))
    stats: list[dict] = []
    t0 = time.time()
    comps = graphdedup.connected_components(edges, round_stats=stats)
    n_components = comps.select("component").distinct().count()
    wall = round(time.time() - t0, 3)
    assert n_components == n_chains, (n_components, n_chains)
    return {
        "n_edges": n_chains * (depth - 1),
        "chain_depth": depth,
        "cc_rounds": len(stats),
        "round_sec": [s["seconds"] for s in stats],
        "round_edges": [s["edges"] for s in stats],
        "wall_sec": wall,
        "n_components": n_components,
    }


def bench_crawl(spark, sf: float) -> dict:
    """North metric: run the crawl engine on a seeded synthetic corpus."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob
    from torspider_spark.sources.corpus import SMALL, build_corpus_spark

    corpus = os.path.join(tempfile.gettempdir(), "torspider_bench_corpus")
    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        build_corpus_spark(spark, SMALL, corpus)
    work = tempfile.mkdtemp(prefix="torspider_bench_wh")
    cfg = CrawlConfig(host_budget_per_epoch=64, bloom_min_frontier=0,
                      robots_ttl_epochs=100)
    job = CrawlJob(spark, corpus, work, cfg)
    t0 = time.time()
    history = job.run(max_epochs=CRAWL_EPOCHS)
    wall = time.time() - t0
    inserted = sum(h["inserted"] for h in history)
    candidates = sum(h["candidates"] for h in history)
    return {
        "epochs": len(history),
        "candidates": candidates,
        "urls_discovered_deduped": inserted,
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(inserted / wall, 2) if wall > 0 else 0.0,
        "per_epoch": [
            {"epoch": h["epoch"], "sec": round(h["seconds"], 3),
             "inserted": h["inserted"]} for h in history
        ],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else 0.1

    from torspider_spark.session import get_spark

    spark = get_spark(app_name="torspider_bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    # warm the JVM/Arrow paths so per-query timings are steady-state
    spark.range(1000).agg({"id": "sum"}).collect()

    queries = bench_queries(spark, sf_dir)
    queries.update(bench_media(spark))
    queries.update(bench_skew_guard(spark, sf_dir))
    cc_chain = bench_cc_chain(spark)
    crawl = bench_crawl(spark, sf)
    total = round(sum(queries.values()) + crawl["wall_sec"], 3)
    # Scaling evidence rides as a compact summary only — the full
    # interleaved sample detail lives in BENCH/scaling.json and
    # BENCH/BASELINE.md. Keeping the RESULT line short matters: the
    # driver parses the LAST stdout line, and an r3-sized line overflowed
    # its tail capture (BENCH_r03.json parsed=null).
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            full = json.load(fh)
        head = full.get("headline", {})
        scaling = {
            "efficiency": head.get("scaling_efficiency"),
            "n_cores": head.get("n", {}).get("cores"),
            "n_median_wall_sec": head.get("n", {}).get(
                "median_wall_sec", head.get("n", {}).get("wall_sec")),
            "four_n_median_wall_sec": head.get("four_n", {}).get(
                "median_wall_sec", head.get("four_n", {}).get("wall_sec")),
            "pairings_min_max": head.get("efficiency_pairings_min_max"),
            "adjacent_pairs": head.get("adjacent_pair_efficiencies"),
            "compaction_variant_efficiency": full.get(
                "compaction_variant", {}).get("scaling_efficiency"),
            "detail": "BENCH/scaling.json + BENCH/BASELINE.md",
        }
    spark.stop()  # stop BEFORE printing: nothing may follow the JSON line
    sys.stderr.flush()
    print(json.dumps({
        "metric": "headline_queries_plus_crawl_wall",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl": crawl,
        "cc_chain": cc_chain,
        "scaling": scaling,
        "cpus": int(cpus),
    }), flush=True)


if __name__ == "__main__":
    main()
