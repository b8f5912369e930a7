"""F1 — per-epoch candidate selection: the politeness priority queue.

The reference delegates "next url" to a backend queue serving one row per
request (/root/reference/TorSpider.py:120-140); the north_rule makes the
frontier engine-owned. Per epoch we take the top ``host_budget_per_epoch``
eligible URLs per host, ordered by the canonical deterministic key
(priority asc, depth asc, url_hash asc) — same seeds + same budget => same
candidate sets (SURVEY.md §2.F).

Skew: a hot host may hold millions of pending rows; a single
Window.partitionBy('host') sort would funnel them into one task. We run a
two-phase top-k: phase 1 salts the host key into ``salt_buckets`` spill
lanes and keeps k per (host, salt); phase 2 re-ranks the <= k*salt_buckets
survivors per host exactly. Identical output, bounded per-task sort.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from torspider_spark.config import CrawlConfig

def _order():
    """Canonical deterministic scheduling key (SURVEY.md §7)."""
    return [F.col("priority").asc(), F.col("depth").asc(),
            F.col("url_hash").asc()]


def eligible(frontier: DataFrame, epoch: int,
             cfg: CrawlConfig | None = None) -> DataFrame:
    """Rows the scheduler may fetch this epoch (F3 retry gating), plus
    periodic rescans of 'done' URLs when configured — that is what makes
    the change-detection gate (B4) fire in steady state."""
    pending = (F.col("state") == "pending") & (
        F.col("next_eligible_epoch") <= epoch)
    if cfg is not None and cfg.rescan_period_epochs > 0:
        rescan = (F.col("state") == "done") & (
            F.col("last_scan_epoch") + cfg.rescan_period_epochs <= epoch)
        return frontier.filter(pending | rescan)
    return frontier.filter(pending)


def select_candidates(frontier: DataFrame, epoch: int,
                      cfg: CrawlConfig) -> DataFrame:
    """Politeness top-k per host over eligible rows (F1+F2)."""
    rows = eligible(frontier, epoch, cfg)
    k = cfg.host_budget_per_epoch
    if cfg.topk_local_prefilter and cfg.salt_buckets > 1:
        salted = rows.withColumn(
            "_salt", F.pmod(F.xxhash64("url_hash"), F.lit(cfg.salt_buckets)))
        w1 = Window.partitionBy("host", "_salt").orderBy(*_order())
        rows = (salted.withColumn("_rn", F.row_number().over(w1))
                .filter(F.col("_rn") <= k).drop("_rn", "_salt"))
    w2 = Window.partitionBy("host").orderBy(*_order())
    return (rows.withColumn("_rn", F.row_number().over(w2))
            .filter(F.col("_rn") <= k).drop("_rn"))


# Hosts without a robots.txt vastly outnumber hosts with one, so the rule
# evaluation UDF sees mostly-null rule text and short-circuits.
_ALLOWED_SCHEMA = T.BooleanType()


@F.pandas_udf(_ALLOWED_SCHEMA)
def _robots_allowed_udf(url: pd.Series, robots_txt: pd.Series) -> pd.Series:
    """can_fetch('*', url) under the host's joined robots.txt text.

    Null text => no robots.txt for the host => allowed. /robots.txt
    itself is always fetchable. Parsers are memoized per distinct rule
    text within the Arrow batch (candidates arrive grouped by host after
    the politeness top-k, so the hit rate is high)."""
    from urllib.robotparser import RobotFileParser

    parsers: dict[str, RobotFileParser] = {}
    out = []
    for u, txt in zip(url, robots_txt):
        if txt is None or u.endswith("/robots.txt"):
            out.append(True)
            continue
        parser = parsers.get(txt)
        if parser is None:
            parser = RobotFileParser()
            parser.parse(txt.splitlines())
            parsers[txt] = parser
        try:
            out.append(parser.can_fetch("*", u))
        except Exception:
            out.append(True)
    return pd.Series(out)


def flag_robots(candidates: DataFrame, robots_dim: DataFrame | None,
                cfg: CrawlConfig) -> DataFrame:
    """2.J — add an ``_allowed`` column by joining the robots rules
    dimension on host and evaluating the rule text in a vectorized UDF.
    Not in the reference (it fetches unconditionally); the north_rule adds
    it.

    Scale shape: the dimension (one row per host that serves a robots.txt)
    is broadcast into the epoch's candidate slice — rule evaluation is
    map-side, nothing is collected to the driver. If the dimension ever
    outgrows the broadcast threshold (tens of millions of robots hosts),
    drop the hint and AQE falls back to a shuffle join on host.
    """
    if not cfg.robots_enabled or robots_dim is None:
        return candidates.withColumn("_allowed", F.lit(True))
    dim = F.broadcast(robots_dim) if cfg.robots_broadcast else robots_dim
    joined = candidates.join(dim, "host", "left")
    return (joined.withColumn(
        "_allowed", _robots_allowed_udf(F.col("url"), F.col("robots_txt")))
        .drop("robots_txt"))


def split_robots(candidates: DataFrame, robots_dim,
                 cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split — see flag_robots."""
    flagged = flag_robots(candidates, robots_dim, cfg)
    return (flagged.filter(F.col("_allowed")).drop("_allowed"),
            flagged.filter(~F.col("_allowed")).drop("_allowed"))


def build_robots_dim(pages: DataFrame) -> DataFrame:
    """host -> robots.txt rule text dimension (2.J).

    A pure DataFrame over the page store: the /robots.txt filter is pushed
    into the parquet scan (StartsWith/EndsWith pushdown) and only (url,
    warc_ts, text) columns are read. No driver collect — at 10^10-URL
    scale this is a normal dim-table build; the caller persists (or
    commits) it per robots TTL. Host key = url.split('/')[2], same as the
    reference's robots fetcher and the simulator.

    The aggregate enforces ONE row per host: multi-snapshot ingestion
    (WARC/Common-Crawl) routinely carries several /robots.txt captures for
    a host, and a multi-row dimension would fan out the left join in
    flag_robots — duplicating fetches, scan_results rows, and journal rows
    (the r1 collect-to-dict build kept one parser per host implicitly; the
    distributed build must do it explicitly). Latest capture wins
    (max_by warc_ts, ties broken by text to stay deterministic).
    """
    robots = pages.filter(F.col("url").endswith("/robots.txt")).select(
        F.split(F.col("url"), "/").getItem(2).alias("host"),
        F.col("warc_ts"), F.col("text"))
    return robots.groupBy("host").agg(
        F.max_by("text", F.struct("warc_ts", "text")).alias("robots_txt"))
