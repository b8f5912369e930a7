"""Round-5 regressions (ADVICE r4): event-flush commit keys off the
persisted monotone counter (not len(snapshots), which repeats after
expiry), JPEG components mapped to Y/Cb/Cr by SOF id (not position),
and GIF disposal method 3 (restore-to-previous) composition."""

from __future__ import annotations

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob
from tests.test_round3 import BASE


def test_event_flush_key_unique_after_expiry(spark, corpus_dir, tmp_path):
    """ADVICE r4 (medium): r4 keyed each event flush by len(snapshots) of
    the events table — exactly the pattern Warehouse._next_seq exists to
    eliminate. Once expire_snapshots trims the events history, the length
    repeats an already-used append KEY and commit(mode='append') silently
    replaces that earlier flush's dirs. peek_seq (the persisted monotone
    counter) can never repeat, so history survives expiry + resume."""
    corpus, _ = corpus_dir
    cfg = CrawlConfig(events_flush_epochs=1, **BASE)
    work = str(tmp_path / "wh")
    job = CrawlJob(spark, corpus, work, cfg)
    job.run(max_epochs=3)
    before = {(r.epoch, r.component, r.message)
              for r in job.events_df().collect()}
    assert before

    # Trim the events snapshot history hard: len(snapshots) now collides
    # with an earlier flush's key, peek_seq does not.
    job.wh.expire_snapshots("events", keep_last=1)
    assert job.wh.peek_seq("events") > len(
        job.wh.manifest("events")["snapshots"])

    resumed = CrawlJob(spark, corpus, work, cfg)
    resumed.run(max_epochs=2)
    after = {(r.epoch, r.component, r.message)
             for r in CrawlJob(spark, corpus, work, cfg)
             .events_df().collect()}
    assert before <= after          # nothing replaced / lost
    assert len(after) > len(before)  # resumed epochs logged too


def test_warehouse_peek_seq_matches_next_commit(tmp_path):
    """peek_seq must return exactly the seq the next commit consumes,
    including on manifests whose history was trimmed."""
    from torspider_spark.schemas import events_arrow
    from torspider_spark.sources.warehouse import Warehouse

    wh = Warehouse(None, str(tmp_path / "wh"))
    assert wh.peek_seq("events") == 0
    for i in range(4):
        seq = wh.peek_seq("events")
        snap = wh.commit_local(
            "events", [(i, "t", "info", f"m{i}")], events_arrow(), seq,
            mode="append")
        assert snap["id"].endswith(f"-{seq:04d}")
    wh.expire_snapshots("events", keep_last=1)
    seq = wh.peek_seq("events")
    assert seq == 4                 # monotone across expiry
    snap = wh.commit_local(
        "events", [(9, "t", "info", "m9")], events_arrow(), seq,
        mode="append")
    assert snap["id"].endswith(f"-{seq:04d}")


def test_jpeg_component_order_by_id():
    """ADVICE r4: a legal SOF0 may list components in any order; the
    decoder must map them to Y/Cb/Cr by id (1/2/3), not position.
    Identical pixels in, identical pixels out, for every listing order —
    the entropy stream reorders with the SOS listing, so positional
    chroma mapping would swap Cb/Cr and skew every color."""
    from tests.test_jpegcodec import _gradient_rgb, encode_jpeg
    from torspider_spark.weblib.jpegcodec import decode_jpeg

    rgb = _gradient_rgb(24, 16)
    baseline = decode_jpeg(encode_jpeg(24, 16, rgb))
    assert baseline is not None
    for order in ((3, 2, 1), (2, 3, 1), (1, 3, 2)):
        got = decode_jpeg(
            encode_jpeg(24, 16, rgb, component_order=order))
        assert got is not None
        assert got[:3] == baseline[:3]
        assert bytes(got[3]) == bytes(baseline[3]), order

    # 4:2:0 moves the 2x2-sampled luma off position 0 too
    sub_base = decode_jpeg(encode_jpeg(24, 16, rgb, subsample=True))
    sub_swap = decode_jpeg(
        encode_jpeg(24, 16, rgb, subsample=True, component_order=(3, 1, 2)))
    assert sub_swap is not None
    assert bytes(sub_swap[3]) == bytes(sub_base[3])


def test_gif_disposal_restore_previous():
    """ADVICE r4: disposal 3 = restore-to-previous. The frame after a
    disposal-3 frame must composite over the canvas AS IT WAS BEFORE the
    disposal-3 frame drew — not over the drawn pixels ('leave')."""
    from tests.test_gifcodec import _checker, encode_animated_gif
    from torspider_spark.weblib.gifcodec import decode_gif_frames

    pal = [(10, 10, 10), (250, 250, 250), (200, 0, 0), (0, 200, 0)]
    base = _checker(12, 10, 2)
    frames = [
        dict(left=0, top=0, w=12, h=10, indices=base),
        # full-canvas red flash, restore-to-previous afterwards
        dict(left=0, top=0, w=12, h=10, indices=bytes([2] * 120),
             disposal=3),
        # small green block — everything else must be the frame-0 checker
        dict(left=1, top=1, w=2, h=2, indices=bytes([3] * 4)),
    ]
    got = decode_gif_frames(encode_animated_gif(12, 10, pal, frames))
    assert got is not None and len(got) == 3
    w = 12

    def px(frame, x, y):
        return tuple(frame[3][3 * (y * w + x):3 * (y * w + x) + 3])

    assert px(got[1], 5, 5) == pal[2]               # flash rendered
    assert px(got[2], 1, 1) == pal[3]               # new block drawn
    # outside the block: checker restored, NOT the red flash
    assert px(got[2], 5, 5) == pal[base[5 * w + 5]]
    assert px(got[2], 0, 0) == pal[base[0]]


# -- kill-during-compaction resume (VERDICT r4 #6) ---------------------------
#
# compact_frontier makes THREE durable changes in sequence: (1) one
# commit_bucketed publishing the folded buckets, (2) one journal
# truncation commit, (3) snapshot expiry. Rollback/resume was already
# covered at epoch barriers and mid-epoch; these tests kill INSIDE the
# compaction, in both torn windows, and require the resumed run to land
# on exactly the uninterrupted run's state. COW mode has no counterpart
# window by construction: compact_frontier is only ever invoked under
# cfg.frontier_mor (there is no journal to fold), so MOR is the entire
# surface.

class _CompactBoom(RuntimeError):
    pass


def _state(job):
    frontier = {(r.url, r.state, r.tries)
                for r in job.frontier_df().collect()}
    results = {(r.url, r.epoch, r.fault, r.hash)
               for r in job.results().collect()}
    return frontier, results


_N = 6
_CFG = dict(mor_compact_every=2, **BASE)


def _ref_state(spark, corpus, tmp_path):
    job = CrawlJob(spark, corpus, str(tmp_path / "ref"), CrawlConfig(**_CFG))
    job.run(max_epochs=_N)
    return _state(job)


def test_crash_between_fold_and_truncate_resumes_clean(
        spark, corpus_dir, tmp_path, monkeypatch):
    """Window (1)->(2): the bucket rewrite commit LANDED, the journal
    truncation did not. The journal's rows are now also in the base; the
    reconcile anti-join must keep the view single-valued, resume must not
    re-run the epoch (the journal append — the epoch barrier — already
    committed), and the next compaction re-folds the same rows as a
    value-level no-op and truncates."""
    from torspider_spark.sources.warehouse import Warehouse

    corpus, _ = corpus_dir
    want = _ref_state(spark, corpus, tmp_path)

    real_truncate = Warehouse.truncate
    fired = []

    def crashing(self, name, epoch, meta=None):
        if (name == "frontier_journal" and meta and meta.get("truncated")
                and not fired):
            fired.append(epoch)
            raise _CompactBoom("kill between bucket rewrite and truncation")
        return real_truncate(self, name, epoch, meta=meta)

    monkeypatch.setattr(Warehouse, "truncate", crashing)
    work = str(tmp_path / "crash1")
    job = CrawlJob(spark, corpus, work, CrawlConfig(**_CFG))
    try:
        job.run(max_epochs=_N)
    except _CompactBoom:
        pass
    assert fired == [2], "compaction truncation must fire (and die) at e2"
    # The torn state really is torn: folded base AND a populated journal.
    assert job.wh.current_epoch("frontier_journal") == 2

    monkeypatch.setattr(Warehouse, "truncate", real_truncate)
    resumed = CrawlJob(spark, corpus, work, CrawlConfig(**_CFG))
    assert resumed.resume_epoch() == 3  # e2's barrier (journal append) held
    resumed.run(max_epochs=_N - 2)
    assert _state(resumed) == want


def test_crash_inside_fold_publish_resumes_clean(
        spark, corpus_dir, tmp_path, monkeypatch):
    """Window inside (1): data dirs for the folded buckets are written but
    the manifest swap never happens — the table must stay at the previous
    snapshot (journal intact, nothing folded), and the resumed run's later
    compaction folds everything with no duplicates or losses."""
    from torspider_spark.sources.warehouse import Warehouse

    corpus, _ = corpus_dir
    want = _ref_state(spark, corpus, tmp_path)

    real_publish = Warehouse._publish
    fired = []

    def crashing(self, name, manifest):
        last = manifest.get("snapshots", [])[-1] if manifest.get(
            "snapshots") else {}
        if (name == "frontier" and last.get("meta", {}).get("compaction")
                and not fired):
            fired.append(last.get("epoch"))
            raise _CompactBoom("kill mid-publish of the fold commit")
        return real_publish(self, name, manifest)

    monkeypatch.setattr(Warehouse, "_publish", crashing)
    work = str(tmp_path / "crash2")
    job = CrawlJob(spark, corpus, work, CrawlConfig(**_CFG))
    try:
        job.run(max_epochs=_N)
    except _CompactBoom:
        pass
    assert fired == [2]
    # Torn write: orphan data dirs may exist, but the MANIFEST still holds
    # the pre-compaction journal (nothing truncated, nothing folded).
    assert job.wh.current_epoch("frontier_journal") == 2

    monkeypatch.setattr(Warehouse, "_publish", real_publish)
    resumed = CrawlJob(spark, corpus, work, CrawlConfig(**_CFG))
    assert resumed.resume_epoch() == 3
    resumed.run(max_epochs=_N - 2)
    assert _state(resumed) == want


def test_backfill_epoch_millis_exact_on_float_hostile_value(
        spark, corpus_dir, tmp_path):
    """Regression (flaked ~0.6% of runs): _backfill_metrics reconstructed
    epoch_millis via seconds = millis/1000.0 and _commit_metrics re-derived
    int(seconds*1000) — a float round-trip that truncates ~6 per 1000
    integers (e.g. 1001 -> 1000.9999... -> 1000). The exact integer must
    flow through. This pins a known-truncating value deterministically
    instead of waiting for the e2e timing to land on one."""
    import json
    import os

    corpus, _ = corpus_dir
    cfg = CrawlConfig(**BASE)
    work = str(tmp_path / "wh")
    job = CrawlJob(spark, corpus, work, cfg)
    job.run(max_epochs=2)

    hostile = 1001
    assert int(hostile / 1000.0 * 1000) != hostile  # the trap is real
    barrier = "frontier_journal" if cfg.frontier_mor else "frontier"
    mpath = job.wh._manifest_path(barrier)
    with open(mpath) as fh:
        manifest = json.load(fh)
    for snap in manifest["snapshots"]:
        if snap["epoch"] == 2 and "epoch_millis" in snap.get("meta", {}):
            snap["meta"]["epoch_millis"] = hostile
    tmp = mpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, mpath)

    job.wh.rollback("metrics", 1)   # lose epoch 2's metrics row
    resumed = CrawlJob(spark, corpus, work, cfg)
    assert resumed.resume_epoch() == 3
    resumed._backfill_metrics()
    got = {int(r.value) for r in resumed.metrics_df()
           .filter("epoch = 2 AND metric = 'epoch_millis'").collect()}
    assert got == {hostile}
