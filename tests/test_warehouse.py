"""Snapshot warehouse: atomic commits, append replace-on-re-run, rollback."""

from __future__ import annotations

import pytest


@pytest.fixture()
def wh(spark, tmp_path):
    from torspider_spark.sources.warehouse import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "x int")


def test_overwrite_and_read(spark, wh):
    wh.commit("t", _df(spark, [1, 2, 3]), epoch=1)
    assert sorted(r.x for r in wh.read("t").collect()) == [1, 2, 3]
    wh.commit("t", _df(spark, [9]), epoch=2)
    assert [r.x for r in wh.read("t").collect()] == [9]
    assert wh.current_epoch("t") == 2


def test_append_accumulates(spark, wh):
    wh.commit("t", _df(spark, [1]), epoch=1, mode="append")
    wh.commit("t", _df(spark, [2]), epoch=2, mode="append")
    assert sorted(r.x for r in wh.read("t").collect()) == [1, 2]


def test_append_is_idempotent_per_epoch(spark, wh):
    """Re-running a crashed epoch must not double its appended rows."""
    wh.commit("t", _df(spark, [1]), epoch=1, mode="append")
    wh.commit("t", _df(spark, [2, 3]), epoch=2, mode="append")
    wh.commit("t", _df(spark, [2, 3]), epoch=2, mode="append")  # re-run
    assert sorted(r.x for r in wh.read("t").collect()) == [1, 2, 3]


def test_rollback(spark, wh):
    wh.commit("t", _df(spark, [1]), epoch=1)
    wh.commit("t", _df(spark, [2]), epoch=2)
    wh.commit("t", _df(spark, [3]), epoch=3)
    wh.rollback("t", 2)
    assert [r.x for r in wh.read("t").collect()] == [2]
    assert wh.current_epoch("t") == 2


def test_expire_snapshots(spark, wh, tmp_path):
    import os

    for e in range(1, 6):
        wh.commit("t", _df(spark, [e]), epoch=e)
    removed = wh.expire_snapshots("t", keep_last=2)
    assert removed == 3
    assert [r.x for r in wh.read("t").collect()] == [5]
    dirs = [d for d in os.listdir(tmp_path / "wh" / "t") if d.startswith("snap-")]
    assert len(dirs) == 2


def test_aborted_write_dir_is_cleaned_on_recommit(spark, wh, tmp_path):
    """A crash between the parquet write and the manifest publish leaves an
    unreferenced snap dir; re-running the epoch must succeed, not collide."""
    import os

    wh.commit("t", _df(spark, [1]), epoch=1)
    # Simulate the aborted write: the dir the NEXT commit will pick exists
    # on disk but is referenced by no snapshot.
    aborted = tmp_path / "wh" / "t" / "snap-000002-0001"
    os.makedirs(aborted / "leftover")
    wh.commit("t", _df(spark, [2]), epoch=2)  # must not raise
    assert [r.x for r in wh.read("t").collect()] == [2]


def test_commit_after_rollback_reuses_seq_dirs(spark, wh):
    """rollback truncates the snapshot list; the next commit reuses sequence
    numbers whose (now unreferenced) dirs still exist on disk."""
    wh.commit("t", _df(spark, [1]), epoch=1)
    wh.commit("t", _df(spark, [2]), epoch=2)
    wh.commit("t", _df(spark, [3]), epoch=3)
    wh.rollback("t", 1)
    wh.commit("t", _df(spark, [22]), epoch=2)  # seq 1 dir exists on disk
    wh.commit("t", _df(spark, [33]), epoch=3)  # seq 2 dir exists on disk
    assert [r.x for r in wh.read("t").collect()] == [33]


def test_referenced_dir_collision_raises(spark, wh):
    """A name collision with a manifest-referenced dir is corruption and
    must refuse rather than silently delete published data."""
    import json

    wh.commit("t", _df(spark, [1]), epoch=1)
    # Corrupt the manifest: pretend the next seq's dir is already published.
    path = wh._manifest_path("t")
    with open(path) as fh:
        m = json.load(fh)
    m["snapshots"][0]["dirs"].append("snap-000002-0001")
    with open(path, "w") as fh:
        json.dump(m, fh)
    import os
    os.makedirs(wh._table_dir("t") + "/snap-000002-0001", exist_ok=True)
    with pytest.raises(RuntimeError, match="manifest corruption"):
        wh.commit("t", _df(spark, [2]), epoch=2)


# -- bucketed tables (frontier MERGE INTO analogue) ---------------------------

def _bdf(spark, rows):
    """rows: list of (x, bucket)."""
    return spark.createDataFrame(rows, "x int, _bucket int")


def test_bucketed_rewrite_touches_only_named_buckets(spark, wh):
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0), (2, 1), (3, 2)]))
    m0 = wh.manifest("f")
    wh.commit_bucketed("f", 1, rewrite=_bdf(spark, [(20, 1)]))
    m1 = wh.manifest("f")
    # bucket 1 replaced; buckets 0 and 2 keep their original dir pointers
    assert m1["buckets"]["0"] == m0["buckets"]["0"]
    assert m1["buckets"]["2"] == m0["buckets"]["2"]
    assert m1["buckets"]["1"] != m0["buckets"]["1"]
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [1, 3, 20]


def test_bucketed_append_adds_delta_dirs(spark, wh):
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0)]))
    wh.commit_bucketed("f", 1, append=_bdf(spark, [(2, 0), (3, 1)]))
    m = wh.manifest("f")
    assert len(m["buckets"]["0"]) == 2  # base + delta
    assert len(m["buckets"]["1"]) == 1  # delta only (new bucket)
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [1, 2, 3]
    # plain read() also sees the union (derived-table consumers)
    assert sorted(r.x for r in wh.read("f").collect()) == [1, 2, 3]


def test_bucketed_bucket_pruning(spark, wh):
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0), (2, 1), (3, 2)]))
    assert sorted(r.x for r in wh.read_buckets("f", [0, 2]).collect()) == [1, 3]
    assert wh.read_buckets("f", [7]).count() == 0  # empty selection, schema kept


def test_bucketed_rewrite_plus_append_same_epoch(spark, wh):
    """The crawl epoch shape: merge-rewrite touched buckets AND append
    inserts, one atomic snapshot."""
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0), (2, 1)]))
    wh.commit_bucketed("f", 1, rewrite=_bdf(spark, [(10, 0)]),
                       append=_bdf(spark, [(5, 0), (6, 2)]))
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [2, 5, 6, 10]
    m = wh.manifest("f")
    assert len(m["buckets"]["0"]) == 2  # rewritten base + this epoch's delta


def test_bucketed_rollback(spark, wh):
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0)]))
    wh.commit_bucketed("f", 1, append=_bdf(spark, [(2, 0)]))
    wh.commit_bucketed("f", 2, rewrite=_bdf(spark, [(9, 0)]))
    wh.rollback("f", 1)
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [1, 2]
    # re-running epoch 2 after rollback must succeed (dir-name reuse)
    wh.commit_bucketed("f", 2, rewrite=_bdf(spark, [(8, 0)]))
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [8]


def test_bucketed_expire_keeps_live_dirs(spark, wh, tmp_path):
    import os

    for e in range(4):
        wh.commit_bucketed("f", e, append=_bdf(spark, [(e, e % 2)]))
    wh.expire_snapshots("f", keep_last=1)
    # every still-referenced delta dir must survive expiry
    assert sorted(r.x for r in wh.read_buckets("f").collect()) == [0, 1, 2, 3]


def test_manifest_file_stats_and_table_bytes(spark, wh):
    """commit_bucketed records per-dir file sizes at commit time (the
    Iceberg-manifest analogue); table_bytes sums the LIVE dirs only and
    returns None when any live dir predates size tracking."""
    wh.commit_bucketed("f", 0, rewrite=_bdf(spark, [(1, 0), (2, 1)]))
    b0 = wh.table_bytes("f")
    assert b0 and b0 > 0
    wh.commit_bucketed("f", 1, append=_bdf(spark, [(3, 0)]))
    b1 = wh.table_bytes("f")
    assert b1 > b0  # delta added bytes
    # rewriting bucket 0 drops its old base+delta from the live set
    wh.commit_bucketed("f", 2, rewrite=_bdf(spark, [(9, 0)]))
    m = wh.manifest("f")
    live = {d for dirs in m["buckets"].values() for d in dirs}
    assert set(m["dir_bytes"]) == live  # stats pruned to live dirs
    # a live dir with no recorded size -> unknown (None), never a guess
    del m["dir_bytes"][next(iter(live))]
    wh._publish("f", m)
    assert wh.table_bytes("f") is None
    # non-bucketed tables have no byte stats
    wh.commit("plain", _df(spark, [1]), epoch=1)
    assert wh.table_bytes("plain") is None
