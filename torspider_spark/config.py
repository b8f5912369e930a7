"""Crawl configuration — every named input of the determinism criterion.

The reference reads spider.cfg + env overrides (/root/reference/
TorSpider.py:423-475). Here the analogue is a frozen dataclass shipped with
--py-files and overridable via ``spark.torfrontier.*`` Spark conf keys, so
"same seeds + same politeness budget => same crawl ordering + URL-seen set"
is a function of this object alone (north_rule).

Determinism ground rules (SURVEY.md §7): the scan date is config-injected
(the reference's ``date.today()`` at classes.py:10 is nondeterministic);
epoch ids replace wall-clock; every ordering ties back to
(priority, depth, url_hash).
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass(frozen=True)
class CrawlConfig:
    # -- politeness / scheduling (the equality criterion's named inputs) ----
    host_budget_per_epoch: int = 4      # max fetches per host per epoch (F2)
    max_depth: int = 6                  # drop discovered URLs deeper than this
    max_tries: int = 3                  # offline scans before state=dead (F5)
    retry_backoff_epochs: int = 1       # no-fault/offline retry delay (F3)
    max_epochs: int = 100               # BSP loop bound
    robots_enabled: bool = True         # 2.J (north_rule addition)
    robots_ttl_epochs: int = 10         # robots cache refresh period
    robots_broadcast: bool = True       # broadcast the robots dim join side
    rescan_period_epochs: int = 0       # 0 = never rescan 'done' URLs

    # -- determinism --------------------------------------------------------
    scan_date: str = "2026-01-01"       # injected; classes.py:10 analogue
    seed: int = 42

    # -- scale / physical ----------------------------------------------------
    shuffle_partitions: int = 32        # ~cores locally; 2-4x cores on a cluster
    salt_buckets: int = 8               # hot-host salting fan-out (E1/F1 skew)
    topk_local_prefilter: bool = True   # two-phase salted top-k in F1
    bloom_capacity: int = 1 << 22       # total URL-seen bloom key budget
    bloom_fpp: float = 0.03
    bloom_shards: int = 64              # bitset shards (executor-resident);
                                        # size so capacity/shards ~ a few MB
    bloom_min_frontier: int = 100_000   # below this, skip bloom (anti-join only)
    dedup_strategy: str = "auto"        # 'auto' | 'semi_anti' (huge frontier)
    merge_broadcast: bool = True        # broadcast epoch updates in E3 merge
    # Frontier storage: hash buckets (Iceberg bucket(url_hash) analogue).
    # Epoch commits rewrite only buckets containing updates and append
    # insert deltas — size B so a bucket ~ one data file at the design
    # point (10^10 rows => B ~ 64k of ~150k rows); 64 fits the test scale.
    frontier_buckets: int = 64
    compact_max_dirs: int = 8           # fold buckets with >= this many dirs
    # Compaction planning shortcut: once the journal holds at least
    # factor * frontier_buckets rows, skip the scan+distinct+collect job
    # that discovers which buckets hold journal keys and rewrite every
    # bucket. Keys are hash-distributed, so P(bucket untouched) =
    # (1 - 1/B)^rows <= e^-factor (~0.03% at 8) — the discovery job would
    # name (essentially) all buckets anyway, and its cost is pure fixed
    # overhead: a full journal pass + a driver round-trip that shrinks
    # with neither cores nor cluster size. Rewriting an untouched bucket
    # is a value-level no-op (its new slice equals its old slice), so the
    # superset is always correct. 0 forces the shortcut (tests);
    # a huge value forces discovery.
    compact_full_rewrite_factor: int = 8
    # Small-table fast path (Iceberg binpack analogue): while the frontier's
    # LIVE bytes (manifest-recorded file stats, never a store listing) stay
    # under this, delta chains fold eagerly once the average chain exceeds
    # 2 dirs/bucket — a tiny table fragmented into bucket-count files per
    # epoch pays more in per-file scan overhead than a full fold costs.
    # "Small" must mean fold-is-cheap (~a couple of seconds even on one
    # core); at scale the threshold stops matching and the amortized
    # compact_max_dirs / mor_compact_rows policies rule.
    compact_small_table_bytes: int = 64 << 20
    # Merge-on-read updates (Iceberg MOR analogue): per-epoch state
    # transitions append to a small journal table (bounded by the
    # politeness budget per epoch); inserts route by size — see
    # `mor_insert_journal_max_rows` below. Reads reconcile base-vs-journal
    # via an anti-join, broadcast only while the journal is small; the
    # journal folds into the bucketed base when it outgrows
    # `mor_compact_rows` (size-triggered — the half of the MOR design r2
    # was missing), every `mor_compact_every` epochs as a fallback, and at
    # end of run.
    # Copy-on-write per epoch (frontier_mor=False) rewrites every bucket an
    # update hashes into — O(table) once updates/epoch exceeds the bucket
    # count, which any realistic politeness budget does.
    frontier_mor: bool = True
    mor_compact_every: int = 16
    mor_compact_rows: int = 1_000_000   # journal rows triggering compaction
    mor_broadcast_max_rows: int = 1_000_000  # above: no broadcast hint (AQE)
    # Insert routing (Hudi/Iceberg-MOR small-batch shape): an epoch whose
    # insert batch is at most this many rows appends it to the journal
    # (ONE cheap commit) instead of bucketed delta dirs (one dir per
    # touched bucket — worth it only when batches are file-sized).
    # Correctness is route-independent: the reconcile window handles both
    # kinds, the seen set is base ∪ journal keys, and the size-triggered
    # compaction bounds the journal either way. r2's scaling killer was
    # NOT insert rows in the journal per se — it was the unbounded journal
    # plus the forced broadcast, both now guarded.
    mor_insert_journal_max_rows: int = 100_000
    arrow_batch_rows: int = 2048        # caps parser peak memory per batch
    # Persist the reference backend's derived tables (SpiderStats.py:69-146):
    # links/forms/pages appended per epoch (epoch-slice only — no recompute),
    # urls/onions rolled up at publish_tables() (end of run).
    persist_derived: bool = True
    # Snapshot retention (Iceberg expire_snapshots analogue): after each
    # journal compaction, drop unreferenced snapshot dirs of the frontier
    # tables, keeping the last K snapshots of history. A long crawl
    # otherwise accumulates one garbage dir per epoch (journal appends
    # superseded by truncations, rewritten bucket dirs). 0 = keep
    # everything (default — full rollback history). Expiry runs ONLY
    # right after a truncation, so the journal's newest snapshot is
    # always the overwrite and the manifest row-count walk stays exact.
    expire_keep_snapshots: int = 0
    # Durable event log cadence: buffered events flush every K epochs
    # (plus once at end of run) under unique snapshot-seq commit keys, so
    # a crash loses at most the last K epochs' events and a re-flush can
    # never replace earlier history. 0 = end-of-run flush only.
    events_flush_epochs: int = 8

    CONF_PREFIX = "spark.torfrontier."

    @classmethod
    def from_spark_conf(cls, spark) -> "CrawlConfig":
        """Build from ``spark.torfrontier.<field>`` conf keys when present."""
        kwargs = {}
        for f in fields(cls):
            try:
                raw = spark.conf.get(cls.CONF_PREFIX + f.name)
            except Exception:
                raw = None
            if raw is None:
                continue
            if f.type in ("int", int):
                kwargs[f.name] = int(raw)
            elif f.type in ("float", float):
                kwargs[f.name] = float(raw)
            elif f.type in ("bool", bool):
                kwargs[f.name] = raw.lower() in ("1", "true", "yes")
            else:
                kwargs[f.name] = raw
        return cls(**kwargs)


TINY = CrawlConfig()  # defaults == FIXTURES.md §5 politeness.json
