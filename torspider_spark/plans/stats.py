"""SpiderStats analytics (G1-G6) over the crawl warehouse.

The reference's SpiderStats.py queries five backend tables (urls, onions,
pages, forms, links) through a {op,name,val} filter DSL
(/root/reference/SpiderStats.py:67-146). Here the tables are *derived* from
the engine's scan_results/frontier snapshots, and each query is a DataFrame
expression (the DSL's whole algebra — eq, ne, has, and — maps onto filter /
left_semi join).

Sentinel date semantics preserved: '1900-01-01' == never scanned / never
seen online (SpiderStats.py:70-96).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from torspider_spark.schemas import FORM

SENTINEL = "1900-01-01"


# -- derived tables (SURVEY.md §1.2: links/forms/onions rollups) -------------

def urls_table(frontier: DataFrame) -> DataFrame:
    """urls: one row per known URL; date = sentinel until first scan."""
    return frontier.select(
        "url", "host", "state", "depth",
        F.when(F.col("last_scan_epoch") >= 0,
               F.col("last_scan_epoch").cast("string"))
        .otherwise(F.lit(SENTINEL)).alias("date"),
    )


def consolidated_titles(scan_results: DataFrame,
                        max_titles_per_host: int = 10_000) -> DataFrame:
    """C6 — per-host title consolidated with merge_titles semantics
    (reference: libs/functions.py:17-24 — order-preserving, duplicate-
    keeping token intersection, title1's order wins).

    The fold is inherently sequential, so titles are collected per host in
    deterministic (epoch, url) order and folded in one Arrow batch. The cap
    is applied BEFORE the aggregation (row_number window + filter): a hot
    host at 100-TB scale could report millions of titles, and capping after
    collect_list would still materialize them all in one aggregation buffer
    — the window sort spills to disk, the buffer would not. After
    ``max_titles_per_host`` observations the intersection has long since
    converged."""
    from pyspark.sql import Window

    titled = scan_results.filter(
        F.col("title").isNotNull() & (F.col("title") != ""))
    # Tie-break on title too (ADVICE r3): the fold and the simulator
    # oracle sort full (epoch, url, title) tuples, so duplicate
    # (epoch, url) observations at the cap boundary must select the same
    # rows here or the retained set becomes plan-dependent.
    w = Window.partitionBy("host").orderBy("epoch", "url", "title")
    capped = (titled.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= max_titles_per_host).drop("_rn"))
    per_host = capped.groupBy("host").agg(
        F.sort_array(F.collect_list(
            F.struct("epoch", "url", "title"))).alias("obs"))

    from torspider_spark.weblib.textutil import merge_titles

    @F.pandas_udf("string")
    def fold_titles(obs: pd.Series) -> pd.Series:
        out = []
        for items in obs:
            title = None
            for it in items:
                t = it["title"]
                if title is None:
                    title = t
                else:
                    merged = merge_titles(title, t)
                    # An empty intersection keeps the incumbent (the
                    # backend never blanks a stored title).
                    title = merged if merged else title
            out.append(title)
        return pd.Series(out, dtype="object")

    return per_host.select("host", fold_titles(F.col("obs")).alias("title"))


def onions_table(frontier: DataFrame, scan_results: DataFrame) -> DataFrame:
    """onions: per-host rollup. last_online = latest epoch the host answered
    online (sentinel when never); online = host still has non-dead URLs;
    title = merge_titles-consolidated page titles (C6)."""
    per_host_results = scan_results.groupBy("host").agg(
        F.max(F.when(F.col("online"), F.col("epoch"))).alias("last_online_epoch"))
    per_host_frontier = frontier.groupBy("host").agg(
        F.max(F.when(~F.col("state").isin("dead", "fault"), 1).otherwise(0))
        .alias("alive"))
    titles = consolidated_titles(scan_results)
    return (
        per_host_frontier.join(per_host_results, "host", "left")
        .join(titles, "host", "left")
        .select(
            "host",
            F.when(F.col("last_online_epoch").isNotNull(),
                   F.col("last_online_epoch").cast("string"))
            .otherwise(F.lit(SENTINEL)).alias("last_online"),
            (F.col("alive") == 1).alias("online"),
            F.coalesce(F.col("title"), F.lit("")).alias("title"),
        )
    )


def links_table(scan_results: DataFrame) -> DataFrame:
    """links: exploded new_urls edges (src -> dst, per epoch)."""
    return scan_results.select(
        F.col("url").alias("src"), "epoch",
        F.explode("new_urls").alias("dst"))


def forms_table(scan_results: DataFrame) -> DataFrame:
    """forms: exploded + typed form records (JSON exactness carrier ->
    FORM struct via from_json; unnamed fields surface as the "null" key)."""
    exploded = scan_results.select(
        "url", "epoch", F.explode("form_dicts").alias("form_json"))
    return exploded.withColumn("form", F.from_json("form_json", FORM)).select(
        "url", "epoch", "form_json", "form.*")


def pages_table(scan_results: DataFrame) -> DataFrame:
    """pages: stored page versions — one row per (url, hash) observation."""
    return scan_results.filter(F.col("hash").isNotNull()).select(
        "url", "host", "epoch", "hash", "title")


# -- the stats queries (SpiderStats.py:65-170) --------------------------------

def gather_stats(frontier: DataFrame, scan_results: DataFrame) -> dict:
    """G1-G6 derived on the fly from frontier + scan_results."""
    return _stats_over(
        urls_table(frontier), onions_table(frontier, scan_results),
        links_table(scan_results), forms_table(scan_results),
        pages_table(scan_results))


def gather_stats_persisted(wh) -> dict:
    """G1-G6 over the warehouse's persisted backend tables (committed by
    CrawlJob: links/forms/pages per epoch, urls/onions at publish) — the
    reference's SpiderStats reads its materialized tables the same way."""
    return _stats_over(wh.read("urls"), wh.read("onions"), wh.read("links"),
                       wh.read("forms"), wh.read("pages"))


def _stats_over(urls: DataFrame, onions: DataFrame, links: DataFrame,
                forms: DataFrame, pages: DataFrame) -> dict:
    url_count = urls.count()                                   # G1
    scanned = urls.filter(F.col("date") != SENTINEL).count()   # G2
    active_onions = onions.filter(
        (F.col("last_online") != SENTINEL) & F.col("online")).count()  # G3
    remaining_onions = onions.filter(
        (F.col("last_online") == SENTINEL) & F.col("online")).count()  # G3
    live_urls = urls.join(                                     # G4 ('has')
        onions.filter((F.col("last_online") != SENTINEL) & F.col("online")),
        "host", "left_semi").count()
    return {
        "total_urls": url_count,
        "scanned_urls": scanned,
        "scan_percentage": scanned / url_count if url_count else 0.0,  # G5
        "active_onions": active_onions,
        "remaining_onions": remaining_onions,
        "total_onions": onions.count(),
        "live_urls": live_urls,
        "total_pages": pages.count(),
        "total_forms": forms.count(),
        "total_links": links.count(),
    }


def format_stats(stats: dict) -> str:
    """The reference's report text shape (SpiderStats.py:148-170)."""
    return (
        "So far, the engine has scanned {scanned_urls:,} "
        "({scan_percentage:.2%}) of the {total_urls:,} urls it has "
        "discovered. Of the scanned urls, it found {live_urls:,} live urls "
        "on {active_onions:,} active onions. There are {remaining_onions:,} "
        "onions that are pending an initial scan.\n"
        "Table Stats:\n"
        "Total Onions: {total_onions:,}\n"
        "Total Urls: {total_urls:,}\n"
        "Total Urls (live): {live_urls:,}\n"
        "Total Pages: {total_pages:,}\n"
        "Total Forms: {total_forms:,}\n"
        "Total Links: {total_links:,}"
    ).format(**stats)
