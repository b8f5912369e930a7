"""Structured Streaming variant: stateful dedup + change detection."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from torspider_spark.schemas import PAGES
from torspider_spark.streaming import crawl_stream


@pytest.fixture(scope="module")
def spark_pages_dir(spark, corpus_dir, tmp_path_factory):
    """Corpus pages written by Spark (directory form for the file source)."""
    corpus, _ = corpus_dir
    out = str(tmp_path_factory.mktemp("stream_src") / "pages")
    spark.read.parquet(os.path.join(corpus, "pages.parquet")) \
        .repartition(6).write.parquet(out)
    return out


def test_streaming_discovery_matches_batch(spark, spark_pages_dir,
                                           tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck1"))
    got = crawl_stream.run_discovery_to_memory(spark, spark_pages_dir, ck,
                                               "t_links")
    stream_urls = {r.url for r in got.select("url").collect()}

    # Batch reference: same extraction over the same pages.
    from torspider_spark.functions.udfs import extract_page, onion_url_filter
    pages = spark.read.parquet(spark_pages_dir)
    batch = (
        pages.withColumn("ext",
                         extract_page(F.col("text"), F.col("url"), F.lit(True)))
        .select(F.explode("ext.links").alias("url"))
        .filter(onion_url_filter(F.col("url")))
        .distinct()
    )
    batch_urls = {r.url for r in batch.collect()}
    assert stream_urls == batch_urls
    # dedup actually deduped across micro-batches
    assert got.count() == len(stream_urls)


def test_streaming_change_detection(spark, corpus_dir, tmp_path_factory):
    corpus, _ = corpus_dir
    src = tmp_path_factory.mktemp("stream_src2")
    pages_dir = str(src / "pages")
    pages = spark.read.parquet(os.path.join(corpus, "pages.parquet")).limit(200)
    # Write the SAME pages twice (two files): the second observation of each
    # URL has an identical hash and must be suppressed by the state store.
    pages.coalesce(1).write.mode("overwrite").parquet(pages_dir)
    pages.coalesce(1).write.mode("append").parquet(pages_dir)

    ck = str(tmp_path_factory.mktemp("ck2"))
    got = crawl_stream.run_change_detect_to_memory(spark, pages_dir, ck,
                                                   "t_changes")
    rows = got.collect()
    urls = [r.url for r in rows]
    assert len(urls) == len(set(urls)), "each URL must emit exactly once"
    assert {r.n_seen for r in rows} <= {1, 2}
    n_pages = pages.count()
    assert len(urls) == n_pages


def test_streaming_windowed_metrics_watermark_drops_late(
        spark, tmp_path_factory):
    """Event-time windowed rollup (G6 twin) under a watermark: a row
    arriving later than the watermark allows lands in an
    already-finalized window and is DROPPED; on-time rows aggregate
    exactly once (append mode emits each window once, closed)."""
    from datetime import datetime

    def ts(minute):
        return datetime(2026, 1, 1, 10, minute)

    def rows(*items):
        return spark.createDataFrame(
            [(url, t, b"", "", "en") for url, t in items], PAGES)

    src = str(tmp_path_factory.mktemp("stream_src3") / "pages")
    ck = str(tmp_path_factory.mktemp("ck3"))

    # batch 1: three on-time rows for host a in [10:00, 10:10), plus a
    # host b row at 10:21 that will advance the watermark to 10:16.
    rows(("http://a.onion/1", ts(1)), ("http://a.onion/2", ts(3)),
         ("http://a.onion/3", ts(5)), ("http://b.onion/1", ts(21))
         ).coalesce(1).write.mode("append").parquet(src)

    query = crawl_stream.run_windowed_metrics_to_memory(
        spark, src, ck, "t_metrics",
        window="10 minutes", watermark="5 minutes")
    try:
        query.processAllAvailable()
        # batch 2: a LATE host-a row at 10:04 — the watermark (10:16)
        # already passed its window's end (10:10) — plus a fresh row at
        # 10:35 pushing the watermark onward.
        rows(("http://a.onion/late", ts(4)),
             ("http://a.onion/4", ts(35))
             ).coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
        # batch 3: advance the watermark so [10:20, 10:30) finalizes too.
        rows(("http://c.onion/1", ts(50))
             ).coalesce(1).write.mode("append").parquet(src)
        query.processAllAvailable()
    finally:
        query.stop()

    got = {(r.window_start.minute, r.host): r.n_pages
           for r in spark.sql("SELECT * FROM t_metrics").collect()}
    # the late 10:04 row did NOT reopen or inflate the closed window
    assert got[(0, "a.onion")] == 3
    assert got[(20, "b.onion")] == 1
