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


# ---------------------------------------------------------------------------
# The full crawl loop as ONE streaming query (SURVEY.md §2.H: "frontier
# epoch ~= micro-batch trigger; foreachBatch ... reuses every epoch
# operator unchanged")
# ---------------------------------------------------------------------------

def write_epoch_ticks(ticks_dir: str, first_epoch: int, n_epochs: int) -> None:
    """Materialize the epoch schedule as one tiny JSON file per epoch.

    The file-source stream over this directory (maxFilesPerTrigger=1) is
    the rate-limited frontier reader: one file -> one micro-batch -> one
    epoch. In production the same role is a Kafka topic of crawl ticks or
    a rate source under a processingTime trigger; a file per tick keeps
    the sandbox run deterministic and resumable."""
    import json as _json
    import os

    os.makedirs(ticks_dir, exist_ok=True)
    for epoch in range(first_epoch, first_epoch + n_epochs):
        path = os.path.join(ticks_dir, f"epoch_{epoch:07d}.json")
        if not os.path.exists(path):
            with open(path, "w") as fh:
                fh.write(_json.dumps({"epoch": epoch}) + "\n")


def crawl_stream_run(spark: SparkSession, corpus_dir: str, work_dir: str,
                     cfg, max_epochs: int, checkpoint_dir: str,
                     ticks_dir: str,
                     epoch_hook=None) -> tuple[object, list[dict]]:
    """Run the crawl engine as a Structured Streaming query.

    One micro-batch = one epoch through the UNCHANGED batch operators:
    foreachBatch hands each epoch tick to CrawlJob.run_epoch, so candidate
    selection, fetch join, taxonomy, extraction, dedup and the MOR state
    merge execute exactly as in the BSP loop — the streaming layer only
    supplies pacing (maxFilesPerTrigger=1) and restart bookkeeping.

    Exactly-once comes from BOTH layers and needs both: the streaming
    checkpoint replays an unfinished tick after a crash (same batch, same
    file), and the warehouse's idempotent epoch re-commit absorbs the
    replay (same inputs => same snapshot keys => re-commit is a no-op
    semantically) — the same property the batch loop's kill/resume tests
    prove. ``epoch_hook(epoch)``, when given, runs before each epoch
    (tests use it to inject a crash on first attempt).

    Finalization mirrors CrawlJob.run: journal compaction so direct
    readers see final state, derived-table publish, event flush. Returns
    (job, history of non-skipped epoch stats).
    """
    from torspider_spark.plans.crawl import CrawlJob

    job = CrawlJob(spark, corpus_dir, work_dir, cfg)
    job.bootstrap()
    first = job.resume_epoch()
    if first > 1:
        job._backfill_metrics()
    write_epoch_ticks(ticks_dir, 1, max_epochs)  # idempotent across resumes
    history: list[dict] = []
    done = {"empty": False}

    def _run_one_epoch(batch_df, _batch_id: int) -> None:
        # Ticks are pure pacing tokens: the epoch NUMBER comes from the
        # job's own progress (resume point + epochs run in this query),
        # never from tick contents or file order — the file source does
        # not guarantee same-mtime ordering, and warehouse epoch numbers
        # drive retry eligibility so they must be consecutive. Each tick
        # in the batch buys one epoch; the cap keeps a crash's unconsumed
        # tick from buying an extra epoch after resume (the warehouse may
        # have committed the epoch whose tick never checkpointed).
        n_ticks = batch_df.count()
        for _ in range(int(n_ticks)):
            epoch = first + len(history)
            if (epoch > max_epochs or done["empty"]
                    or job.stop_requested()):
                return
            if epoch_hook is not None:
                epoch_hook(epoch)
            stats = job.run_epoch(epoch)
            history.append(stats)
            done["empty"] = stats["empty"]
            if (cfg.events_flush_epochs
                    and epoch % cfg.events_flush_epochs == 0):
                job._flush_events()

    query = (
        spark.readStream.schema("epoch int")
        .option("maxFilesPerTrigger", 1)
        .json(ticks_dir)
        .writeStream.foreachBatch(_run_one_epoch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()

    ran = [h for h in history if not h["empty"]]
    if cfg.frontier_mor and ran:
        job.compact_frontier(ran[-1]["epoch"])
    if cfg.persist_derived and ran:
        job.publish_tables()
    job._flush_events()
    return job, history
