#!/usr/bin/env python3
"""Round-7 auxiliary benchmarks (guide §1.4 noop-sink isolation).

bench.py is FROZEN for measurement; the extra lines the optimization
round needs live here:

  * per-query min-of-N for the headline set (steadier than bench.py's
    single pass — used for before/after evidence in OPTIMIZATION_r07.md)
  * crawl per-phase walls (robots / scan_agg / dedup / sinks / barrier
    from CrawlJob.run_epoch's phase marks) plus the end-of-run tail
    (final compaction + publish), attributing the crawl wall the r6
    verdict asked about
  * media pipeline split: payload generation alone vs generation+decode,
    isolating the Arrow-boundary cost from the codec cost

Usage: python bench_extra.py [--repeats N] — prints one JSON line.
Honors $SPARK_GRAFT_SF_DIR and $SPARK_GRAFT_CPUS like bench.py.
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


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from torspider_spark.session import get_spark

    spark = get_spark(app_name="torspider_bench_extra",
                      master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict = {"sf_dir": sf_dir, "repeats": repeats}

    qmin: dict[str, float] = {}
    for name in HEADLINE:
        best = None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            _noop(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        qmin[name] = round(best, 3)
    out["queries_min"] = qmin
    out["queries_min_total"] = round(sum(qmin.values()), 3)

    # media split: generation-only vs generation+decode
    from torspider_spark.operators import multimodal
    from torspider_spark.weblib import mediagen as mg

    def media_slice(kind, n):
        return (spark.range(n).repartition(int(cpus))
                .mapInPandas(mg.media_batches(kind, "id"),
                             schema=multimodal.MEDIA))

    media: dict[str, float] = {}
    spark.sparkContext.setJobDescription("bench_extra:media_gen_only")
    t0 = time.time()
    _noop(media_slice("image", 4096))
    media["image_gen_only"] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription("bench_extra:media_gen_decode")
    t0 = time.time()
    _noop(multimodal.decode_image_features(media_slice("image", 4096)))
    media["image_gen_decode"] = round(time.time() - t0, 3)
    out["media"] = media

    # crawl per-phase walls (same corpus/config as bench.py's crawl)
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob
    from torspider_spark.sources.corpus import SMALL, build_corpus_spark

    corpus = os.path.join(tempfile.gettempdir(), "torspider_bench_corpus")
    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        build_corpus_spark(spark, SMALL, corpus)
    work = tempfile.mkdtemp(prefix="torspider_bextra_wh")
    cfg = CrawlConfig(host_budget_per_epoch=64, bloom_min_frontier=0,
                      robots_ttl_epochs=100)
    job = CrawlJob(spark, corpus, work, cfg)
    t0 = time.time()
    history = job.run(max_epochs=5)
    wall = round(time.time() - t0, 3)
    epochs_wall = round(sum(h["seconds"] for h in history), 3)
    phases: dict[str, float] = {}
    for h in history:
        for k, v in (h.get("phases") or {}).items():
            phases[k] = round(phases.get(k, 0.0) + v, 3)
    out["crawl"] = {
        "wall_sec": wall,
        "epochs_wall_sec": epochs_wall,
        "tail_sec": round(wall - epochs_wall, 3),  # bootstrap+compact+publish
        "phase_totals": phases,
        "inserted": sum(h["inserted"] for h in history),
    }

    spark.stop()
    sys.stderr.flush()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
