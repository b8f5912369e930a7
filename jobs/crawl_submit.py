#!/usr/bin/env python3
"""spark-submit entry point for the crawl engine.

    spark-submit --py-files engine.zip jobs/crawl_submit.py \
        --corpus /path/to/corpus --work /path/to/warehouse \
        --epochs 10 --conf-from-spark

Builds a seeded synthetic corpus when --corpus is omitted (sandbox mode).
CrawlConfig fields are overridable via --conf spark.torfrontier.<field>=...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

# package import works both via --py-files and from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--corpus", default=None)
    parser.add_argument("--work", default=None)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--sf", default="tiny",
                        choices=["tiny", "small", "bench"])
    parser.add_argument("--master", default=None)
    args = parser.parse_args()

    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob
    from torspider_spark.session import get_spark
    from torspider_spark.sources import corpus as corpus_mod

    spark = get_spark(app_name="torspider_crawl", master=args.master)
    cfg = CrawlConfig.from_spark_conf(spark)

    corpus_dir = args.corpus
    if corpus_dir is None:
        spec = {"tiny": corpus_mod.TINY, "small": corpus_mod.SMALL,
                "bench": corpus_mod.BENCH}[args.sf]
        corpus_dir = os.path.join(tempfile.gettempdir(),
                                  f"torspider_corpus_{args.sf}")
        if not os.path.exists(os.path.join(corpus_dir, "pages.parquet")):
            print(f"building {args.sf} corpus at {corpus_dir} ...",
                  file=sys.stderr)
            corpus_mod.build_corpus_spark(spark, spec, corpus_dir)

    work = args.work or tempfile.mkdtemp(prefix="torspider_wh")
    job = CrawlJob(spark, corpus_dir, work, cfg)
    history = job.run(max_epochs=args.epochs, verbose=True)
    from torspider_spark.plans.stats import format_stats, gather_stats

    stats = gather_stats(job.frontier_df(), job.results())
    print(format_stats(stats), file=sys.stderr)
    print(json.dumps({"work_dir": work, "epochs": [
        {k: (round(v, 3) if isinstance(v, float) else v)
         for k, v in h.items()} for h in history
    ]}))
    spark.stop()


if __name__ == "__main__":
    main()
