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


def flag_robots(candidates: DataFrame, robots_bc,
                cfg: CrawlConfig) -> DataFrame:
    """2.J — add an ``_allowed`` column under the broadcast robots cache.
    Not in the reference (it fetches unconditionally); the north_rule adds
    it. The robots.txt URLs themselves are always allowed."""
    if not cfg.robots_enabled or robots_bc is None:
        return candidates.withColumn("_allowed", F.lit(True))

    @F.pandas_udf(T.BooleanType())
    def robots_allowed(host: pd.Series, url: pd.Series) -> pd.Series:
        rules = robots_bc.value
        out = []
        for h, u in zip(host, url):
            parser = rules.get(h)
            if parser is None:
                out.append(True)
            elif u.endswith("/robots.txt"):
                out.append(True)
            else:
                try:
                    out.append(parser.can_fetch("*", u))
                except Exception:
                    out.append(True)
        return pd.Series(out)

    return candidates.withColumn(
        "_allowed", robots_allowed(F.col("host"), F.col("url")))


def split_robots(candidates: DataFrame, robots_bc,
                 cfg: CrawlConfig) -> tuple[DataFrame, DataFrame]:
    """(allowed, blocked) split — see flag_robots."""
    flagged = flag_robots(candidates, robots_bc, cfg)
    return (flagged.filter(F.col("_allowed")).drop("_allowed"),
            flagged.filter(~F.col("_allowed")).drop("_allowed"))


def build_robots_cache(spark, pages_meta: DataFrame, pages: DataFrame,
                       cfg: CrawlConfig):
    """Broadcast host -> RobotFileParser built from /robots.txt pages.

    Collected to the driver and broadcast: robots bodies are tiny and only
    hosts that serve one appear (clamped defensively). At 10^10-URL scale
    with millions of robots hosts this becomes a map-side join against a
    small dimension table instead — same plan shape, noted here.
    """
    if not cfg.robots_enabled:
        return None
    from urllib.robotparser import RobotFileParser

    rows = (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .select("url", "text")
        .limit(1_000_000)
        .collect()
    )
    cache = {}
    for row in rows:
        host = row.url.split("/")[2]
        parser = RobotFileParser()
        parser.parse((row.text or "").splitlines())
        cache[host] = parser
    return spark.sparkContext.broadcast(cache)
