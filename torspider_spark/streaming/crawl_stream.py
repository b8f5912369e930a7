"""Structured Streaming variant of the crawl pipeline (SURVEY.md §2.H).

The reference's unbounded worker loop maps naturally onto micro-batches:
pages arrive as a stream (here: the file source tailing a corpus directory;
in production: Kafka/WARC drops), the extraction operators run unchanged
per batch, and two streaming-native pieces replace the BSP frontier state:

  - URL-seen dedup  -> stateful ``dropDuplicates('url_hash')`` (exact,
    unbounded state) — the streaming twin of E2;
  - change gate B4  -> ``applyInPandasWithState``: per-URL state stores the
    last content hash; a page row is emitted only when its sha1 changed
    since the previous observation (the reference's hash short-circuit,
    TorSpider.py:287-301, as a custom stateful operator).

The epoch engine remains the primary execution mode (exact cross-epoch
determinism + snapshot resume are stronger there); this module shows the
same operators composing under ``readStream``/``writeStream`` with
checkpointed state.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from torspider_spark.functions.udfs import extract_page, onion_url_filter
from torspider_spark.schemas import PAGES


def read_pages_stream(spark: SparkSession, pages_dir: str,
                      max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream over a pages directory (rate-limited reader —
    the streaming analogue of the frontier's politeness pacing)."""
    return (
        spark.readStream.schema(PAGES)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def discovered_links_stream(pages: DataFrame) -> DataFrame:
    """Stream of (url_hash, url, src) — canonicalized onion links with
    exact stateful URL-seen dedup."""
    extracted = pages.withColumn(
        "ext", extract_page(F.col("text"), F.col("url"), F.lit(True)))
    links = (
        extracted.select(F.col("url").alias("src"),
                         F.explode("ext.links").alias("url"))
        .filter(onion_url_filter(F.col("url")))
        .withColumn("url_hash", F.sha1(F.col("url")))
    )
    # Streaming twin of the E2 anti-join: state-store-backed exact dedup.
    return links.dropDuplicates(["url_hash"])


_CHANGE_SCHEMA = "url string, page_hash string, n_seen long"
_STATE_SCHEMA = "last_hash string, n_seen long"


def _change_detect(key: Any, pdf_iter: Iterator[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    """Emit one row per URL whose content hash changed vs stored state."""
    (url,) = key
    last_hash, n_seen = state.get if state.exists else ("", 0)
    out = []
    for pdf in pdf_iter:
        for page_hash in pdf["page_hash"]:
            n_seen += 1
            if page_hash != last_hash:
                last_hash = page_hash
                out.append((url, page_hash, n_seen))
    state.update((last_hash, n_seen))
    if out:
        yield pd.DataFrame(out, columns=["url", "page_hash", "n_seen"])


def changed_pages_stream(pages: DataFrame) -> DataFrame:
    """B4 as a custom stateful streaming operator: suppress pages whose
    sha1 matches the per-URL state from previous batches."""
    hashed = pages.select("url", F.sha1(F.col("html")).alias("page_hash"))
    return hashed.groupBy("url").applyInPandasWithState(
        _change_detect,
        outputStructType=_CHANGE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_host_metrics_stream(pages: DataFrame,
                                 window: str = "10 minutes",
                                 watermark: str = "5 minutes") -> DataFrame:
    """G6's per-epoch rollup as an event-time stream: page counts per
    (host, warc_ts window) with a WATERMARK bounding both the state store
    and late data — rows arriving more than ``watermark`` behind the max
    observed warc_ts fall into already-finalized windows and are dropped,
    exactly the Iceberg-ingest lateness contract a production crawl
    stream needs. Append output mode: a window emits once, when the
    watermark passes its end (closed, exact counts)."""
    hosted = pages.select(
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.col("warc_ts"))
    return (
        hosted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_pages"),
             F.max("warc_ts").alias("latest_ts"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "host", "n_pages", "latest_ts")
    )


def run_windowed_metrics_to_memory(spark: SparkSession, pages_dir: str,
                                   checkpoint_dir: str,
                                   query_name: str = "stream_metrics",
                                   **kwargs):
    """Drive the windowed-metrics stream over whatever files are present,
    leaving the query object to the caller (tests feed late batches
    between processAllAvailable() calls)."""
    stream = windowed_host_metrics_stream(
        read_pages_stream(spark, pages_dir), **kwargs)
    return (
        stream.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_discovery_to_memory(spark: SparkSession, pages_dir: str,
                            checkpoint_dir: str,
                            query_name: str = "stream_links"):
    """Drive the discovery stream to completion against a static directory
    (memory sink; processAllAvailable) — the smoke/test harness."""
    stream = discovered_links_stream(read_pages_stream(spark, pages_dir))
    query = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def run_change_detect_to_memory(spark: SparkSession, pages_dir: str,
                                checkpoint_dir: str,
                                query_name: str = "stream_changes"):
    stream = changed_pages_stream(read_pages_stream(spark, pages_dir))
    query = (
        stream.writeStream.outputMode("append")
        .format("memory").queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
