"""Snapshot expiry (Iceberg expire_snapshots analogue, round 4): with
`expire_keep_snapshots` set, each journal compaction drops unreferenced
snapshot dirs of the frontier tables. The crawl outcome must be
byte-identical to a no-expiry twin, disk garbage must actually shrink,
and resume must still work from the trimmed history."""

from __future__ import annotations

import os

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob
from tests.test_round3 import BASE


def _snap_dirs(work: str, table: str) -> int:
    tdir = os.path.join(work, table)
    if not os.path.isdir(tdir):
        return 0
    return sum(1 for e in os.listdir(tdir) if e.startswith("snap-"))


def test_expiry_bounds_disk_and_preserves_state(spark, corpus_dir,
                                                tmp_path):
    corpus, _ = corpus_dir
    # Compact often so expiry fires repeatedly mid-run.
    common = dict(frontier_mor=True, mor_compact_every=2,
                  mor_compact_rows=10**9, **BASE)
    keep = CrawlJob(spark, corpus, str(tmp_path / "keep"),
                    CrawlConfig(**common))
    keep.run(max_epochs=6)
    exp = CrawlJob(spark, corpus, str(tmp_path / "exp"),
                   CrawlConfig(expire_keep_snapshots=3, **common))
    exp.run(max_epochs=6)

    # identical crawl outcome
    a = {(r.url, r.state, r.tries, r.last_hash)
         for r in keep.frontier_df().collect()}
    b = {(r.url, r.state, r.tries, r.last_hash)
         for r in exp.frontier_df().collect()}
    assert a == b

    # expiry genuinely removed garbage dirs and trimmed history
    for table in ("frontier", "frontier_journal"):
        assert _snap_dirs(str(tmp_path / "exp"), table) < _snap_dirs(
            str(tmp_path / "keep"), table), table
        m = exp.wh.manifest(table)
        assert len(m["snapshots"]) <= 3 + 2  # retained window + post-expiry

    # the journal row-count walk stays exact after expiry (newest
    # retained snapshot is the truncation overwrite)
    assert exp._journal_rows() == 0

    # resume from the trimmed warehouse still works and matches
    resumed = CrawlJob(spark, corpus, str(tmp_path / "exp"),
                       CrawlConfig(expire_keep_snapshots=3, **common))
    keep2 = CrawlJob(spark, corpus, str(tmp_path / "keep"),
                     CrawlConfig(**common))
    assert resumed.resume_epoch() == keep2.resume_epoch() == 7
    resumed.run(max_epochs=2)
    keep2.run(max_epochs=2)
    a2 = {(r.url, r.state, r.tries) for r in keep2.frontier_df().collect()}
    b2 = {(r.url, r.state, r.tries) for r in resumed.frontier_df().collect()}
    assert a2 == b2
