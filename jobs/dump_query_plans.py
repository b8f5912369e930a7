#!/usr/bin/env python3
"""Dump .explain('formatted') for named driver queries to text files.

Usage: python jobs/dump_query_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each query (default: the r07
optimization-round set). Run once from the round-start checkout with
SUFFIX=before and once from the optimized tree with SUFFIX=after — the
judge checks plan claims against these files.

Also dumps the per-epoch crawl scan pipeline plan under the pseudo-query
name ``crawl_scan`` (candidates -> classify -> body join -> extract),
since the epoch pipeline is not itself a queries() entry.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "ngram_jaccard", "span_dedup", "dup_clusters", "repetition",
    "media_features", "export_pipeline", "pack_sequences", "doc_quality",
    "join_agg", "token_budget_select", "near_dup_cosine", "dedup_exact",
    "crawl_scan",
]


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def crawl_scan_df(spark):
    """The epoch scan pipeline over the tiny corpus (no crawl run needed:
    bootstrap only, then the epoch-1 dataflow as one lazy frame)."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.operators import candidate, pipeline
    from torspider_spark.plans.crawl import CrawlJob
    from torspider_spark.sources.corpus import TINY, build_corpus_local

    corpus = os.path.join(tempfile.gettempdir(), "torspider_plans_corpus")
    if not os.path.exists(os.path.join(corpus, "pages.parquet")):
        build_corpus_local(TINY, corpus)
    cfg = CrawlConfig(bloom_min_frontier=0, robots_enabled=False)
    job = CrawlJob(spark, corpus, tempfile.mkdtemp(prefix="qplans_wh"), cfg)
    job.bootstrap()
    frontier = job.frontier_df()
    cands = candidate.select_candidates(frontier, 1, cfg)
    return pipeline.run_scan(cands, job.pages_meta, job.pages, cfg)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry
    from torspider_spark.session import get_spark

    try:  # warm= only exists from r7 on; the before-checkout lacks it
        spark = get_spark(app_name="dump_query_plans", warm=False)
    except TypeError:
        spark = get_spark(app_name="dump_query_plans")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry.queries()
    for name in names:
        df = (crawl_scan_df(spark) if name == "crawl_scan"
              else qs[name](spark, sf))
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
