"""Frontier state: bootstrap, scan-result merge (E3/F5), new-URL insert (E2).

The frontier is the engine-owned replacement for the reference's backend
queue (SURVEY.md §1.2). Keys are sha1(url); state transitions implement the
backend contract documented in the reference's TODO.md ("online==True ->
tries=0 else tries+=1") plus the engine's termination policy:

  pending --scan--> done            fault is null and online
                    fault           fault is not null (incl. redirects:
                                    the reference never rescans fault-tagged
                                    URLs — TorSpider.py:158-163 — the
                                    redirect *target* gets crawled instead)
                    pending(+retry) fault null, offline (conn/timeout/
                                    no-fault status) — next_eligible_epoch
                                    pushed back, tries incremented
                    dead            tries exhausted (engine policy; the
                                    reference would retry forever)
  silent rows (chunked/notimpl, TorSpider.py:393-397,406-408) post no
  result; the reference's backend would re-serve them. In a deterministic
  corpus that loops forever, so the engine counts a try and backs off —
  the one documented deviation, needed for termination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig


def _with_key_cols(df: DataFrame) -> DataFrame:
    """url_hash (sha1 of utf-8 url — F.sha1 on a string column hashes its
    UTF-8 bytes, same value as weblib.url_sha1) + host partition key.

    Host is the exact urlsplit netloc (host_of_udf), NOT F.parse_url(url,
    'HOST'): parse_url strips ports/userinfo and NULLs malformed URLs, which
    would silently diverge politeness grouping from the simulator/reference
    and violate the non-null host invariant. The UDF is Arrow-batched and
    this path already crosses into Python for extraction, so the parity is
    free."""
    from torspider_spark.functions.udfs import host_of_udf

    return (
        df.withColumn("url_hash", F.sha1(F.col("url")))
        .withColumn("host", F.coalesce(host_of_udf(F.col("url")), F.lit("")))
    )


def bootstrap(spark, seeds: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Seed list -> frontier epoch 0 (all pending, eligible immediately)."""
    seeded = _with_key_cols(seeds.select("url", "depth", "priority"))
    return seeded.select(
        "url", "url_hash", "host",
        F.col("depth").cast("int").alias("depth"),
        F.col("priority").cast("int").alias("priority"),
        F.lit("pending").alias("state"),
        F.lit("").alias("last_hash"),
        F.lit(0).alias("tries"),
        F.lit(0).alias("added_epoch"),
        F.lit(-1).alias("last_scan_epoch"),
        F.lit(0).alias("next_eligible_epoch"),
    )


def discovered_urls(internal_results: DataFrame, cfg: CrawlConfig,
                    epoch: int) -> DataFrame:
    """Explode per-page new_urls into frontier-insert candidates.

    In-batch dedup keeps the minimum source depth per URL (deterministic:
    min over depth); the cross-frontier seen-check is operators/dedup.py.
    Depth cap (max_depth) prunes the frontier's growth; priority = depth
    (F4 — breadth-first flavored; domain-class hooks would extend it here).
    """
    exploded = (
        internal_results
        .select("depth", F.explode("new_urls").alias("url"))
        .withColumn("depth", F.col("depth") + F.lit(1))
        .filter(F.col("depth") <= cfg.max_depth)
        .groupBy("url")
        .agg(F.min("depth").cast("int").alias("depth"))
    )
    return _with_key_cols(exploded).select(
        "url", "url_hash", "host", "depth",
        F.col("depth").alias("priority"),
        F.lit("pending").alias("state"),
        F.lit("").alias("last_hash"),
        F.lit(0).alias("tries"),
        F.lit(epoch).alias("added_epoch"),
        F.lit(-1).alias("last_scan_epoch"),
        F.lit(epoch + 1).alias("next_eligible_epoch"),
    )


def merge_scan_updates(frontier: DataFrame, internal_results: DataFrame,
                       blocked: DataFrame, cfg: CrawlConfig,
                       epoch: int, update_rows: int | None = None
                       ) -> DataFrame:
    """E3 — apply one epoch's outcomes to the frontier (MERGE INTO on a real
    Iceberg deployment; expressed as update-join + union here).

    The update side is one epoch's candidates (small); with
    ``merge_broadcast`` (default) it is broadcast against the big frontier,
    so the frontier itself is neither shuffled nor sorted — each of its
    partitions streams through a broadcast-hash join. The hint is
    size-guarded: callers pass ``update_rows`` (known driver-side from the
    candidate counts — no extra job), and above
    ``cfg.mor_broadcast_max_rows`` the hint is dropped so AQE picks the
    strategy (bucketed co-location on a real deployment) instead of the
    driver materializing an unbounded build side.
    """
    updates = internal_results.select(
        "url_hash",
        # A row that posted no result (silent error / parse crash) must not
        # count as online even when the status was good — it stays retryable.
        (F.col("online") & F.col("posted")).alias("u_online"),
        F.col("fault").alias("u_fault"),
        F.col("new_hash").alias("u_hash"),
        F.lit(True).alias("u_scanned"),
        F.lit(False).alias("u_blocked"),
    )
    if blocked is not None:
        updates = updates.unionByName(blocked.select(
            "url_hash",
            F.lit(False).alias("u_online"),
            F.lit(None).cast("string").alias("u_fault"),
            F.lit(None).cast("string").alias("u_hash"),
            F.lit(False).alias("u_scanned"),
            F.lit(True).alias("u_blocked"),
        ))

    small_enough = (update_rows is None
                    or update_rows <= cfg.mor_broadcast_max_rows)
    update_side = (F.broadcast(updates)
                   if cfg.merge_broadcast and small_enough else updates)
    joined = frontier.join(update_side, "url_hash", "left")
    hit = F.col("u_scanned").isNotNull()

    new_tries = (
        F.when(~hit, F.col("tries"))
        .when(F.col("u_blocked"), F.col("tries"))
        .when(F.coalesce(F.col("u_online"), F.lit(False)), F.lit(0))  # F5
        .otherwise(F.col("tries") + 1)
    )
    retryable = (
        F.col("u_fault").isNull()
        & ~F.coalesce(F.col("u_online"), F.lit(False))
    )
    new_state = (
        F.when(~hit, F.col("state"))
        .when(F.col("u_blocked"), F.lit("robots_blocked"))
        .when(F.col("u_fault").isNotNull(), F.lit("fault"))
        .when(~retryable, F.lit("done"))
        .when(new_tries >= cfg.max_tries, F.lit("dead"))
        .otherwise(F.lit("pending"))
    )
    return joined.select(
        "url", "url_hash", "host", "depth", "priority",
        new_state.alias("state"),
        F.when(hit & F.col("u_hash").isNotNull(), F.col("u_hash"))
        .otherwise(F.col("last_hash")).alias("last_hash"),
        new_tries.cast("int").alias("tries"),
        "added_epoch",
        F.when(hit & F.col("u_scanned"), F.lit(epoch))
        .otherwise(F.col("last_scan_epoch")).cast("int").alias("last_scan_epoch"),
        F.when(hit & (new_state == "pending"),
               F.lit(epoch + cfg.retry_backoff_epochs))
        .otherwise(F.col("next_eligible_epoch")).cast("int")
        .alias("next_eligible_epoch"),
    )
