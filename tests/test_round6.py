"""Round-6 regression: malformed URLs must not kill an epoch.

r5 verdict item #1 — hypothesis found that ``scheme_fanout('//[')`` raised
an uncaught ValueError from stdlib urlsplit inside the Arrow UDF on the
invalid-schema slice, so ONE malformed seed/frontier URL would fail the
task deterministically (Spark retries re-fail) and kill the whole epoch at
any scale. The fix swallows the parse error per URL (weblib/urlnorm.py
scheme_fanout + host_of_safe), a deliberate divergence from the
reference's unguarded handler (/root/reference/TorSpider.py:341-353 would
crash the worker). This module proves the epoch-level behavior end to
end: engine and simulator both survive malformed seeds AND stay equal.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob
from torspider_spark.plans.simulator import simulator_from_corpus_dir

# '//[' is the pinned hypothesis counterexample (urlsplit -> ValueError:
# Invalid IPv6 URL). The second URL fails urlsplit too but has no meta row,
# exercising the conn-error branch instead of the invalid-schema branch.
BAD_SCHEMA_SEED = "//["
BAD_CONN_SEED = "http://[::bad.onion/"
# Valid seed whose redirect Location is SERVER-CONTROLLED hostile bytes:
# resolve_redirect's urlsplit would raise ValueError inside the Arrow UDF
# (the same crash class as scheme_fanout, found by the r6 self-review).
REDIR_SEED = "http://redirbad.onion/"
BAD_LOCATION = "//["
N_EPOCHS = 4


@pytest.fixture(scope="module")
def malformed_corpus(corpus_dir, tmp_path_factory):
    """Corpus copy with two malformed seeds; '//[' also gets a pages_meta
    row with error_kind='invalid_schema' so the engine routes it through
    scheme_fanout_udf — the exact slice that crashed in r5."""
    corpus, _spec = corpus_dir
    out = str(tmp_path_factory.mktemp("malformed_corpus"))
    shutil.copy(os.path.join(corpus, "pages.parquet"),
                os.path.join(out, "pages.parquet"))

    meta = pq.read_table(os.path.join(corpus, "pages_meta.parquet"))
    extra_meta = pa.Table.from_pylist(
        [{"url": BAD_SCHEMA_SEED, "status": 200, "content_type": "text/html",
          "redirect_location": None, "error_kind": "invalid_schema"},
         {"url": REDIR_SEED, "status": 301, "content_type": None,
          "redirect_location": BAD_LOCATION, "error_kind": None}],
        schema=meta.schema)
    pq.write_table(pa.concat_tables([meta, extra_meta]),
                   os.path.join(out, "pages_meta.parquet"))

    seeds = pq.read_table(os.path.join(corpus, "seeds.parquet"))
    extra_seeds = pa.Table.from_pylist(
        [{"url": BAD_SCHEMA_SEED, "depth": 0, "priority": 0},
         {"url": BAD_CONN_SEED, "depth": 0, "priority": 0},
         {"url": REDIR_SEED, "depth": 0, "priority": 0}],
        schema=seeds.schema)
    pq.write_table(pa.concat_tables([seeds, extra_seeds]),
                   os.path.join(out, "seeds.parquet"))
    return out


@pytest.fixture(scope="module")
def malformed_pair(spark, malformed_corpus, tmp_path_factory):
    cfg = CrawlConfig(bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)
    job = CrawlJob(spark, malformed_corpus,
                   str(tmp_path_factory.mktemp("wh_malformed")), cfg)
    history = job.run(max_epochs=N_EPOCHS)  # r5: this raised in epoch 1
    sim = simulator_from_corpus_dir(malformed_corpus, cfg)
    sim.run(N_EPOCHS)
    return job, sim, history


def test_epoch_survives_malformed_seeds(malformed_pair):
    job, _sim, history = malformed_pair
    assert len(history) >= 1
    states = {r.url: r.state for r in job.frontier_df().collect()}
    # invalid-schema slice ran scheme_fanout over '//[' without crashing;
    # the reference taxonomy tags it 'invalid schema' -> state fault.
    assert states[BAD_SCHEMA_SEED] == "fault"
    # no meta row at all = connection error; retried then dead.
    assert states[BAD_CONN_SEED] in ("pending", "dead")


def test_malformed_seed_engine_matches_simulator(malformed_pair):
    job, sim, _history = malformed_pair
    engine_view = {
        r.url: (r.state, r.tries, r.last_hash, r.depth, r.priority)
        for r in job.frontier_df().collect()
    }
    sim_view = sim.frontier_view()
    assert set(engine_view) == set(sim_view)
    mismatched = {u: (engine_view[u], sim_view[u])
                  for u in engine_view if engine_view[u] != sim_view[u]}
    assert not mismatched, list(mismatched.items())[:5]


def test_crawl_as_streaming_query_equals_batch(spark, corpus_dir,
                                               tmp_path_factory):
    """SURVEY §2.H realized end to end: the whole crawl loop as ONE
    Structured Streaming query (foreachBatch; one epoch tick file = one
    micro-batch = one epoch through the unchanged batch operators) must
    produce exactly the batch loop's frontier state and scan results."""
    from torspider_spark.streaming.crawl_stream import crawl_stream_run

    corpus, _ = corpus_dir
    n_epochs = 5
    cfg = CrawlConfig(bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)
    batch_job = CrawlJob(spark, corpus,
                         str(tmp_path_factory.mktemp("wh_sb")), cfg)
    batch_job.run(max_epochs=n_epochs)

    base = tmp_path_factory.mktemp("wh_ss")
    stream_job, history = crawl_stream_run(
        spark, corpus, str(base / "wh"), cfg, n_epochs,
        checkpoint_dir=str(base / "ckpt"), ticks_dir=str(base / "ticks"))
    assert len(history) == n_epochs

    def view(job):
        return {r.url: (r.state, r.tries, r.last_hash, r.depth, r.priority)
                for r in job.frontier_df().collect()}

    assert view(stream_job) == view(batch_job)
    res_s = {(r.url, r.epoch) for r in stream_job.results().collect()}
    res_b = {(r.url, r.epoch) for r in batch_job.results().collect()}
    assert res_s == res_b


def test_crawl_stream_crash_resumes_exactly_once(spark, corpus_dir,
                                                 tmp_path_factory):
    """Kill the stream INSIDE an epoch (first attempt at epoch 3 raises):
    the restarted query replays the unfinished tick from the streaming
    checkpoint, the warehouse's idempotent re-commit absorbs any partial
    epoch-3 work, and the final state equals an uninterrupted run."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from torspider_spark.streaming.crawl_stream import crawl_stream_run

    corpus, _ = corpus_dir
    n_epochs = 4
    cfg = CrawlConfig(bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)
    ref_job = CrawlJob(spark, corpus,
                       str(tmp_path_factory.mktemp("wh_ref4")), cfg)
    ref_job.run(max_epochs=n_epochs)

    base = tmp_path_factory.mktemp("wh_crash")
    tripped = {"fired": False}

    def crash_once(epoch):
        if epoch == 3 and not tripped["fired"]:
            tripped["fired"] = True
            raise RuntimeError("injected crash before epoch 3")

    with pytest.raises(StreamingQueryException):
        crawl_stream_run(
            spark, corpus, str(base / "wh"), cfg, n_epochs,
            checkpoint_dir=str(base / "ckpt"), ticks_dir=str(base / "ticks"),
            epoch_hook=crash_once)
    assert tripped["fired"]

    resumed_job, history = crawl_stream_run(
        spark, corpus, str(base / "wh"), cfg, n_epochs,
        checkpoint_dir=str(base / "ckpt"), ticks_dir=str(base / "ticks"))
    # epochs 1-2 committed before the crash are NOT re-run
    assert [h["epoch"] for h in history] == [3, 4]

    def view(job):
        return {r.url: (r.state, r.tries, r.last_hash, r.depth, r.priority)
                for r in job.frontier_df().collect()}

    assert view(resumed_job) == view(ref_job)


def test_malformed_seed_fault_is_reference_string(malformed_pair):
    job, sim, _history = malformed_pair
    engine = {(r.url, r.epoch): (r.fault, tuple(sorted(r.new_urls)))
              for r in job.results().collect()
              if r.url in (BAD_SCHEMA_SEED, BAD_CONN_SEED, REDIR_SEED)}
    simulated = {(r.url, r.epoch): (r.fault, tuple(sorted(r.new_urls)))
                 for r in sim.results
                 if r.url in (BAD_SCHEMA_SEED, BAD_CONN_SEED, REDIR_SEED)}
    assert engine == simulated
    assert engine[(BAD_SCHEMA_SEED, 1)] == ("invalid schema", ())
    # Hostile Location: redirect fault posted, target unresolvable ->
    # no discovered URL, and the epoch survived (resolve_redirect_safe).
    assert engine[(REDIR_SEED, 1)] == ("301", ())


# -- compaction fixed-cost cuts (round 6, second half) ---------------------
#
# The scaling bench's compaction-forced variant measured the compact wall
# speeding up only ~3.0x from 1 -> 4 cores: the fold carried two pure
# fixed-cost driver steps — a scan+window+distinct+collect job that
# discovers touched buckets (which a journal >= 8*B rows names ~all of
# anyway) and an empty-DataFrame Spark write for the journal truncation.
# Round 6 replaces them with an all-buckets planning shortcut
# (compact_full_rewrite_factor) and a metadata-only Warehouse.truncate.
# These tests pin the exact-equivalence of both replacements.

def test_truncate_is_metadata_only(spark, tmp_path):
    """Warehouse.truncate publishes an overwrite snapshot with zero data
    files and no Spark job; append/read/rollback semantics around it match
    the old empty-write truncation exactly."""
    from pyspark.sql import Row

    from torspider_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.commit("t", spark.createDataFrame([Row(a=1), Row(a=2)]), 1,
              mode="append", meta={"rows": 2})
    before_dirs = set(os.listdir(str(tmp_path / "wh" / "t")))

    snap = wh.truncate("t", 2, meta={"truncated": True})
    assert snap["mode"] == "overwrite" and snap["dirs"] == []
    # no new data dir appeared on disk — pure manifest publish
    after_dirs = set(os.listdir(str(tmp_path / "wh" / "t")))
    assert after_dirs - before_dirs == set()
    m = wh.manifest("t")
    assert m["current_dirs"] == []
    assert wh.current_epoch("t") == 2
    # the monotone sequence advanced (no key reuse for later appends)
    assert wh.peek_seq("t") == 2

    # a later append starts from the truncated state
    wh.commit("t", spark.createDataFrame([Row(a=3)]), 3, mode="append")
    assert [r.a for r in wh.read("t").collect()] == [3]

    # rollback to the truncation snapshot restores the empty state...
    wh.rollback("t", 2)
    assert wh.manifest("t")["current_dirs"] == []
    # ...and rollback past it restores the pre-truncation rows
    wh.rollback("t", 1)
    assert sorted(r.a for r in wh.read("t").collect()) == [1, 2]


def test_journal_skipped_entirely_after_truncation(spark, corpus_dir,
                                                   tmp_path):
    """After a fold, _journal_df() is None (current_dirs is empty), so the
    next epoch's reconcile skips the journal instead of scanning an empty
    parquet dir — and the journal row-count walk still reads zero."""
    corpus, _ = corpus_dir
    cfg = CrawlConfig(mor_compact_every=2,
                      bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)
    job = CrawlJob(spark, corpus, str(tmp_path / "wh"), cfg)
    job.run(max_epochs=2)  # epoch 2 compacts + end-of-run fold
    assert job._journal_rows() == 0
    assert job._journal_df() is None
    jm = job.wh.manifest("frontier_journal")
    assert jm["snapshots"][-1]["mode"] == "overwrite"
    assert jm["snapshots"][-1]["dirs"] == []


def test_compact_full_rewrite_equals_discovery(spark, corpus_dir,
                                               tmp_path):
    """The all-buckets planning shortcut must produce bit-identical crawl
    state to the collect-based discovery path: same frontier rows, same
    results, same post-fold journal. factor=0 forces the shortcut on every
    fold; a huge factor forces discovery on every fold."""
    corpus, _ = corpus_dir
    base = dict(mor_compact_every=2, bloom_min_frontier=0,
                host_budget_per_epoch=3, max_depth=4, max_tries=2)

    jobs = {}
    for name, factor in (("short", 0), ("disc", 1 << 60)):
        cfg = CrawlConfig(compact_full_rewrite_factor=factor, **base)
        job = CrawlJob(spark, corpus, str(tmp_path / name), cfg)
        job.run(max_epochs=4)
        jobs[name] = job
        folds = [s["meta"] for s in job.wh.manifest("frontier")["snapshots"]
                 if s["meta"].get("compaction")]
        assert folds, name
        want_flag = factor == 0
        assert all(f.get("full_rewrite") is want_flag for f in folds), name

    def state(job):
        frontier = {(r.url, r.state, r.tries, r.last_hash, r.depth,
                     r.priority) for r in job.frontier_df().collect()}
        results = {(r.url, r.epoch, r.fault, r.hash)
                   for r in job.results().collect()}
        return frontier, results

    assert state(jobs["short"]) == state(jobs["disc"])
