"""The crawl job: a BSP loop of DataFrame epochs over snapshot tables.

Reference lifecycle mapping (SURVEY.md §3.1): the reference's unbounded
``while not time_to_sleep`` worker loop (/root/reference/TorSpider.py:105-417)
becomes ``for epoch in ...`` over whole-frontier DataFrame jobs; the 'sleep'
poison-pill file (TorSpider.py:109-114) becomes a stop marker checked at
epoch boundaries; supervisord restart (deployment docs) becomes
resume-from-snapshot — every epoch ends in an atomic warehouse commit, and a
re-run of a half-finished epoch is idempotent.

Per-epoch dataflow (shuffles annotated):

    frontier (snapshot scan)
      -> F1 politeness top-k per host     [shuffle 1: by (host, salt), tiny]
      -> robots gate (2.J, broadcast cache)
      -> E1 fetch-join + taxonomy + extraction (operators/pipeline.py)
                                          [AQE: broadcast when batch small]
      -> E2 URL-seen semi/anti (operators/dedup.py)
                                          [broadcast; frontier never shuffled]
      -> E3 state merge -> merge-on-read (default): post-merge rows for the
         epoch's candidates append to a small journal, inserts append to
         the bucketed base as delta dirs, reads reconcile via a broadcast
         anti-join, compact_frontier folds the journal in amortized
         [journal commit = epoch barrier; write I/O = O(candidates+inserts)]
         (frontier_mor=False: per-epoch copy-on-write bucketed MERGE)
      -> scan_results append, metrics append

The north metric (G6) — new unique URLs discovered+deduped per second of
epoch wall time — is recorded in the metrics table per epoch.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.operators import candidate, dedup, frontier as fr
from torspider_spark.operators import pipeline
from torspider_spark.schemas import METRICS
from torspider_spark.sources.warehouse import Warehouse

STOP_MARKER = "_STOP"  # the 'sleep' file analogue (TorSpider.py:109-114)


class CrawlJob:
    def __init__(self, spark: SparkSession, corpus_dir: str, work_dir: str,
                 cfg: CrawlConfig | None = None):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.wh = Warehouse(spark, work_dir)
        self.work_dir = work_dir
        self.pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
        self.pages_meta = spark.read.parquet(
            os.path.join(corpus_dir, "pages_meta.parquet"))
        self.seeds = spark.read.parquet(os.path.join(corpus_dir, "seeds.parquet"))
        self._robots_dim = None
        self._robots_built_epoch = -(10**9)
        self._bloom = None

    # -- lifecycle -----------------------------------------------------------

    def _bucket_col(self):
        return F.pmod(F.xxhash64("url_hash"), F.lit(self.cfg.frontier_buckets))

    def bootstrap(self, force: bool = False) -> None:
        """Seeds -> bucketed frontier snapshot at epoch 0 (no-op on resume)."""
        if self.wh.exists("frontier") and not force:
            return
        frontier0 = fr.bootstrap(self.spark, self.seeds, self.cfg)
        self.wh.commit_bucketed(
            "frontier", epoch=0,
            rewrite=frontier0.withColumn("_bucket", self._bucket_col()),
            meta={"source": "seeds"})

    def resume_epoch(self) -> int:
        """First epoch to run: one past the last fully committed epoch.

        In merge-on-read mode the update journal is the LAST table an epoch
        commits, so its epoch is the completion barrier; a crash between
        the insert append and the journal commit re-runs the epoch, which
        is idempotent (the warehouse replaces that epoch's delta dirs)."""
        if self.cfg.frontier_mor:
            je = self.wh.current_epoch("frontier_journal")
            if je is not None:
                return je + 1
        current = self.wh.current_epoch("frontier")
        return 1 if current is None else current + 1

    def stop_requested(self) -> bool:
        return os.path.exists(os.path.join(self.work_dir, STOP_MARKER))

    # -- robots cache (2.J) ---------------------------------------------------

    def _robots(self, epoch: int):
        """Robots rules dimension DataFrame, rebuilt per TTL and persisted
        (2.J). No driver collect of page data — flag_robots broadcast-joins
        the dim into the epoch's candidates."""
        if not self.cfg.robots_enabled:
            return None
        if epoch - self._robots_built_epoch >= self.cfg.robots_ttl_epochs:
            if self._robots_dim is not None:
                self._robots_dim.unpersist()
            self._robots_dim = candidate.build_robots_dim(self.pages).persist()
            self._robots_built_epoch = epoch
        return self._robots_dim

    # -- one epoch -----------------------------------------------------------

    # -- merge-on-read frontier view -------------------------------------

    def _journal_df(self) -> DataFrame | None:
        m = self.wh.manifest("frontier_journal")
        if not m or not m.get("current_dirs"):
            return None
        return self.wh.read("frontier_journal")

    def frontier_df(self) -> DataFrame:
        """Current frontier state: the bucketed base reconciled with the
        update journal (last writer per url_hash wins). The base STREAMS —
        the journal is bounded by mor_compact_every epochs of updates, so
        both the anti-join and the union are broadcast-sized."""
        base = self.wh.read_buckets("frontier")
        journal = self._journal_df()
        if journal is None:
            return base
        from pyspark.sql import Window

        w = Window.partitionBy("url_hash").orderBy(F.col("_jepoch").desc())
        latest = (journal.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn", "_jepoch"))
        return (base.join(F.broadcast(latest.select("url_hash")),
                          "url_hash", "left_anti")
                .unionByName(latest))

    def compact_frontier(self, epoch: int) -> None:
        """Fold the update journal into the bucketed base (amortized COW):
        rewrite only buckets holding journal keys or over-long delta
        chains, then truncate the journal. Crash-safe: re-applying an
        already-folded journal row is a value-level no-op (last writer
        wins with identical values)."""
        journal = self._journal_df()
        cfg = self.cfg
        overfull = {b for b, n in self.wh.bucket_dir_counts("frontier").items()
                    if n >= cfg.compact_max_dirs}
        if journal is None and not overfull:
            return
        from pyspark.sql import Window

        if journal is not None:
            w = Window.partitionBy("url_hash").orderBy(F.col("_jepoch").desc())
            latest = (journal.withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") == 1).drop("_rn", "_jepoch")
                      .persist())
            touched = {int(r["b"]) for r in latest.select(
                F.pmod(F.xxhash64("url_hash"),
                       F.lit(cfg.frontier_buckets)).cast("int").alias("b"))
                .distinct().collect()}
        else:
            latest = None
            touched = set()
        rewrite_ids = sorted(touched | overfull)
        old_slice = self.wh.read_buckets("frontier", rewrite_ids)
        if latest is not None:
            new_slice = (old_slice.join(
                F.broadcast(latest.select("url_hash")),
                "url_hash", "left_anti").unionByName(latest))
        else:
            new_slice = old_slice
        self.wh.commit_bucketed(
            "frontier", epoch,
            rewrite=new_slice.withColumn("_bucket", self._bucket_col()),
            meta={"compaction": True, "buckets": len(rewrite_ids)})
        if journal is not None:
            self.wh.commit("frontier_journal", journal.limit(0), epoch,
                           mode="overwrite", meta={"truncated": True})
            latest.unpersist()

    def run_epoch(self, epoch: int) -> dict:
        t0 = time.time()
        cfg = self.cfg
        frontier = self.frontier_df()

        cands = candidate.select_candidates(frontier, epoch, cfg)
        flagged = candidate.flag_robots(cands, self._robots(epoch),
                                        cfg).persist()
        counts = {bool(r["_allowed"]): r["count"]
                  for r in flagged.groupBy("_allowed").count().collect()}
        n_candidates = counts.get(True, 0)
        n_blocked = counts.get(False, 0)
        allowed = flagged.filter(F.col("_allowed")).drop("_allowed")
        blocked = flagged.filter(~F.col("_allowed")).drop("_allowed")
        if n_candidates == 0 and n_blocked == 0:
            flagged.unpersist()
            return {"epoch": epoch, "candidates": 0, "blocked": 0,
                    "posted": 0, "discovered": 0, "inserted": 0,
                    "seconds": time.time() - t0, "empty": True}

        internal = pipeline.run_scan(allowed, self.pages_meta, self.pages,
                                     cfg).persist()
        agg = internal.agg(
            F.count("*").alias("n"),
            F.sum(F.col("posted").cast("long")).alias("posted"),
            F.sum(F.size("new_urls")).alias("discovered"),
        ).collect()[0]

        # Sink 1: the SpiderURL records (parse-queue analogue, A4), plus the
        # persisted derived tables (SpiderStats.py:69,113-116,144-146):
        # links/forms/pages are pure functions of THIS epoch's result slice
        # (cached), so the appends never re-read history (urls/onions roll
        # up at publish_tables()). The four commits are independent jobs
        # over the same cached slice — submit them concurrently so the
        # epoch pays max(job) wall, not sum(job).
        # Right-size output files: ~50k rows per file, never more parts
        # than the shuffle width (tiny epochs -> one file per sink instead
        # of one near-empty file per task; big epochs keep parallel writes).
        nparts = max(1, min(cfg.shuffle_partitions,
                            int(agg["n"] or 0) // 50_000 + 1))
        epoch_results = pipeline.to_scan_results(internal, epoch,
                                                 cfg).coalesce(nparts)
        sinks = [("scan_results", epoch_results)]
        if cfg.persist_derived:
            from torspider_spark.plans import stats as st

            sinks += [("links", st.links_table(epoch_results)),
                      ("forms", st.forms_table(epoch_results)),
                      ("pages", st.pages_table(epoch_results))]
        if len(sinks) == 1:
            self.wh.commit("scan_results", epoch_results, epoch, mode="append")
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(sinks)) as pool:
                futures = [
                    pool.submit(self.wh.commit, name, df, epoch, "append")
                    for name, df in sinks
                ]
                for fut in futures:
                    fut.result()

        # E2: dedup discovered URLs against the frontier KEY SET: the
        # bucketed base plus (in merge-on-read mode) the journal's keys —
        # inserts live in the journal until compaction folds them into the
        # base. Key-column union only; no row reconciliation is ever paid
        # on the dedup path.
        base = self.wh.read_buckets("frontier")
        journal = self._journal_df()
        seen_keys = base.select("url_hash")
        if journal is not None:
            seen_keys = seen_keys.unionByName(journal.select("url_hash"))
        discovered = fr.discovered_urls(internal, cfg, epoch).persist()
        inserts = dedup.unseen_urls(
            discovered, seen_keys, self.spark, self._maybe_bloom(seen_keys),
            strategy=cfg.dedup_strategy)
        inserts = inserts.persist()
        # One job yields both the per-bucket lineage and the insert total.
        bucket_rows = (
            inserts.groupBy(
                F.pmod(F.xxhash64("url_hash"),
                       F.lit(cfg.shuffle_partitions)).alias("b"))
            .count().collect()
        )
        n_inserted = sum(int(r["count"]) for r in bucket_rows)
        if self._bloom is not None and n_inserted:
            # The bloom must remain a SUPERSET of frontier keys (false
            # negatives would skip the exact check and corrupt the URL-seen
            # set) — fold this epoch's inserts in before the next epoch.
            # Distributed bitwise OR per shard; touches only buckets that
            # received keys, nothing on the driver.
            self._bloom = self._bloom.merged_with(inserts)

        # E3: apply this epoch's outcomes to the frontier.
        if cfg.frontier_mor:
            # Merge-on-read (Iceberg MOR analogue). At any realistic
            # politeness budget the epoch's updates hash into EVERY bucket,
            # so per-epoch copy-on-write degenerates to a full rewrite.
            # Instead BOTH the post-merge rows for updated keys (the
            # candidate rows themselves — no frontier join at all) AND the
            # inserts append to the journal in ONE commit; reads reconcile
            # via a broadcast anti-join (inserts simply union in — they
            # have no base row to mask); compact_frontier folds the journal
            # into the bucketed base amortized. The epoch touches the base
            # table ZERO times for writing, and the single journal commit
            # is the epoch's atomic completion barrier (see resume_epoch).
            updated = fr.merge_scan_updates(
                flagged.drop("_allowed"), internal, blocked, cfg, epoch)
            journal_rows = updated.unionByName(inserts).withColumn(
                "_jepoch", F.lit(epoch)).coalesce(nparts)
            self.wh.commit("frontier_journal", journal_rows, epoch,
                           mode="append",
                           meta={"candidates": n_candidates,
                                 "inserted": n_inserted})
        else:
            # Copy-on-write MERGE: rewrite ONLY buckets holding this
            # epoch's updated rows (plus any buckets due for delta
            # compaction); inserts land as append-only delta dirs.
            update_keys = internal.select("url_hash")
            if blocked is not None:
                update_keys = update_keys.unionByName(
                    blocked.select("url_hash"))
            touched = {
                int(r["b"]) for r in update_keys.select(
                    F.pmod(F.xxhash64("url_hash"),
                           F.lit(cfg.frontier_buckets)).alias("b"))
                .distinct().collect()
            }
            overfull = {
                b for b, n in self.wh.bucket_dir_counts("frontier").items()
                if n >= cfg.compact_max_dirs}
            rewrite_ids = sorted(touched | overfull)
            old_slice = self.wh.read_buckets("frontier", rewrite_ids)
            merged = fr.merge_scan_updates(old_slice, internal, blocked,
                                           cfg, epoch)
            self.wh.commit_bucketed(
                "frontier", epoch,
                rewrite=merged.withColumn("_bucket", self._bucket_col()),
                append=(inserts.withColumn("_bucket", self._bucket_col())
                        if n_inserted else None),
                meta={"candidates": n_candidates, "inserted": n_inserted,
                      "rewritten_buckets": len(rewrite_ids),
                      "compacted_buckets": len(overfull - touched)})

        stats = {
            "epoch": epoch,
            "candidates": n_candidates,
            "blocked": n_blocked,
            "posted": int(agg["posted"] or 0),
            "discovered": int(agg["discovered"] or 0),
            "inserted": n_inserted,
            "seconds": time.time() - t0,
            "empty": False,
        }
        stats["urls_per_sec"] = (
            n_inserted / stats["seconds"] if stats["seconds"] > 0 else 0.0)
        self._commit_metrics(epoch, stats, bucket_rows)

        for df in (flagged, internal, discovered, inserts):
            df.unpersist()
        return stats

    def _maybe_bloom(self, frontier: DataFrame):
        """Sharded-bloom prefilter once the frontier is large enough to
        matter (dedup.BloomShards — bitsets live on executors as a
        (bucket, words) DataFrame; nothing is collected to the driver).
        Correctness never depends on it (exact anti-join is the arbiter)."""
        cfg = self.cfg
        if cfg.bloom_min_frontier <= 0:
            return None
        if self._bloom is None:
            # Parquet count is metadata-only — a cheap size probe.
            if frontier.count() >= cfg.bloom_min_frontier:
                self._bloom = dedup.BloomShards.build(frontier, cfg)
        return self._bloom

    def _commit_metrics(self, epoch: int, stats: dict,
                        bucket_rows: list) -> None:
        """G6 — per-epoch counters + per-bucket insert lineage.

        The bucket rows are the deterministic lineage: logical bucket =
        xxhash64(url_hash) mod shuffle partitions (what an Iceberg
        bucket(url_hash) layout would record per data file)."""
        rows = [
            (epoch, -1, name, int(stats[name]))
            for name in ("candidates", "blocked", "posted", "discovered",
                         "inserted")
        ]
        rows.append((epoch, -1, "epoch_millis", int(stats["seconds"] * 1000)))
        rows.extend((epoch, int(r["b"]), "inserted_bucket_rows", int(r["count"]))
                    for r in bucket_rows)
        df = self.spark.createDataFrame(rows, schema=METRICS)
        self.wh.commit("metrics", df, epoch, mode="append")

    # -- the loop ------------------------------------------------------------

    def run(self, max_epochs: int | None = None,
            verbose: bool = False) -> list[dict]:
        self.bootstrap()
        cfg = self.cfg
        limit = max_epochs or cfg.max_epochs
        start = self.resume_epoch()
        history: list[dict] = []
        for epoch in range(start, start + limit):
            if self.stop_requested():
                break
            stats = self.run_epoch(epoch)
            history.append(stats)
            if verbose:
                print(f"[epoch {epoch}] candidates={stats['candidates']} "
                      f"posted={stats['posted']} inserted={stats['inserted']} "
                      f"({stats['seconds']:.1f}s)")
            if stats["empty"]:
                break
            if (cfg.frontier_mor and cfg.mor_compact_every
                    and epoch % cfg.mor_compact_every == 0):
                self.compact_frontier(epoch)
        ran = [h for h in history if not h["empty"]]
        if cfg.frontier_mor and ran:
            # Fold the journal into the base so post-run consumers reading
            # the bucketed table directly (wh.read) see the final state.
            self.compact_frontier(ran[-1]["epoch"])
        if cfg.persist_derived and ran:
            self.publish_tables()
        return history

    # -- derived tables (for stats / oracle queries) --------------------------

    def publish_tables(self) -> None:
        """Commit the urls/onions rollups (the other three backend tables —
        links/forms/pages — are appended per epoch). Rollups aggregate the
        full frontier / scan history, so they refresh on publish rather
        than per epoch — the Iceberg materialized-view refresh shape."""
        from torspider_spark.plans import stats as st

        epoch = self.wh.current_epoch("frontier") or 0
        frontier = self.frontier_df()
        results = self.results()
        self.wh.commit("urls", st.urls_table(frontier), epoch,
                       mode="overwrite")
        self.wh.commit("onions", st.onions_table(frontier, results), epoch,
                       mode="overwrite")

    def results(self) -> DataFrame:
        return self.wh.read("scan_results")

    def metrics_df(self) -> DataFrame:
        return self.wh.read("metrics")
