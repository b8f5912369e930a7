"""Round-4 behaviors: durable event log (periodic flush under unique
snapshot-seq keys — a crash loses at most the last K epochs' events, and a
resumed run's flush can never wipe earlier history), and the per-epoch
journal-append url_hash uniqueness invariant _journal_latest relies on
(VERDICT r3 #5), exercised with robots resurrection active — the
trickiest candidate/revived/insert overlap case."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob
from tests.test_round3 import BASE, _loosen_robots


class _Boom(RuntimeError):
    pass


def test_events_survive_crash_mid_run(spark, corpus_dir, tmp_path,
                                      monkeypatch):
    """Kill the run mid-epoch: events from epochs already flushed (every
    events_flush_epochs=2) must survive the crash (VERDICT r3 #4 — the r3
    engine buffered everything to one end-of-run flush, so a crash lost
    every event)."""
    corpus, _ = corpus_dir
    cfg = CrawlConfig(events_flush_epochs=2, **BASE)
    job = CrawlJob(spark, corpus, str(tmp_path / "wh"), cfg)

    real_run_epoch = CrawlJob.run_epoch

    def crashing(self, epoch):
        if epoch == 5:
            raise _Boom("simulated executor/driver loss")
        return real_run_epoch(self, epoch)

    monkeypatch.setattr(CrawlJob, "run_epoch", crashing)
    with pytest.raises(_Boom):
        job.run(max_epochs=8)

    # A NEW process (the crashed one's buffer is gone) still sees every
    # event of epochs 1-4 — flushed at the epoch-2 and epoch-4 boundaries.
    monkeypatch.setattr(CrawlJob, "run_epoch", real_run_epoch)
    survivor = CrawlJob(spark, corpus, str(tmp_path / "wh"), cfg)
    events = survivor.events_df().collect()
    epochs_seen = {r.epoch for r in events}
    assert {1, 2, 3, 4} <= epochs_seen
    assert any(r.component == "crawl" and "epoch 4" in r.message
               for r in events)


def test_event_history_survives_resume(spark, corpus_dir, tmp_path):
    """ADVICE r3 (medium): r3 keyed the end-of-run flush by the max
    buffered epoch; a resumed run on a finished crawl re-hit the same key
    and its mode='append' commit REPLACED the prior flush's dirs — wiping
    the whole event history. Snapshot-seq keys make every flush append
    under a fresh key."""
    corpus, _ = corpus_dir
    cfg = CrawlConfig(**BASE)
    work = str(tmp_path / "wh")
    job = CrawlJob(spark, corpus, work, cfg)
    job.run(max_epochs=3)
    before = {(r.epoch, r.component, r.message)
              for r in job.events_df().collect()}
    assert before

    # Resume twice (each run flushes at least once); nothing may vanish.
    for _ in range(2):
        resumed = CrawlJob(spark, corpus, work, cfg)
        resumed.run(max_epochs=1)
    after = {(r.epoch, r.component, r.message)
             for r in CrawlJob(spark, corpus, work, cfg)
             .events_df().collect()}
    assert before <= after
    assert len(after) > len(before)  # the resumed epochs logged too


def test_journal_append_unique_urlhash(spark, corpus_dir, tmp_path):
    """VERDICT r3 #5: _journal_latest orders by _jepoch only, relying on
    one row per url_hash within each epoch's journal append (candidates,
    revived-only and journal-routed inserts are disjoint by construction).
    Lock it as a property across MOR epochs WITH robots resurrection
    active — a revived row that is also scanned the same epoch is the
    closest near-overlap."""
    corpus_a, _ = corpus_dir
    corpus_b = str(tmp_path / "loosened")
    _loosen_robots(corpus_a, corpus_b)
    cfg = CrawlConfig(frontier_mor=True, robots_ttl_epochs=1000,
                      mor_compact_every=10_000, mor_compact_rows=10**9,
                      **BASE)
    work = str(tmp_path / "wh")

    phase1 = CrawlJob(spark, corpus_a, work, cfg)
    phase1.run(max_epochs=6)
    blocked = phase1.frontier_df().filter(
        F.col("state") == "robots_blocked").count()
    assert blocked > 0, "corpus must block something for resurrection"

    phase2 = CrawlJob(spark, corpus_b, work, cfg)
    phase2.run(max_epochs=2)
    # Resurrection fired: nothing stays robots_blocked under allow-all
    # rules (revived rows either rode the candidate slice or the
    # revived-only journal rows — both shapes exercised).
    assert phase2.frontier_df().filter(
        F.col("state") == "robots_blocked").count() == 0

    # Every journal append snapshot (both phases; end-of-run truncations
    # leave the appended dirs on disk, addressed via each snapshot's id)
    # must hold at most one row per url_hash.
    m = phase2.wh.manifest("frontier_journal")
    tdir = os.path.join(work, "frontier_journal")
    checked = 0
    for snap in m["snapshots"]:
        if snap["mode"] != "append":
            continue
        df = spark.read.parquet(os.path.join(tdir, snap["id"]))
        dupes = (df.groupBy("url_hash").count()
                 .filter(F.col("count") > 1).count())
        assert dupes == 0, (
            f"epoch {snap['epoch']} journal append carries duplicate "
            f"url_hash rows")
        checked += 1
    assert checked >= 6
