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
