"""E2E invariance to physical strategy: bloom prefilter on, semi_anti dedup,
robots coverage, and mid-epoch crash recovery."""

from __future__ import annotations

import pytest

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.crawl import CrawlJob

BASE = dict(host_budget_per_epoch=3, max_depth=4, max_tries=2)
N_EPOCHS = 8  # enough for the robots gate to fire on this corpus


def _seen(job):
    return {(r.url, r.state, r.tries) for r in job.frontier_df().collect()}


@pytest.fixture(scope="module")
def reference_run(spark, corpus_dir, tmp_path_factory):
    corpus, _ = corpus_dir
    cfg = CrawlConfig(bloom_min_frontier=0, **BASE)
    job = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("ref")), cfg)
    history = job.run(max_epochs=N_EPOCHS)
    return job, history


def test_bloom_on_identical(spark, corpus_dir, tmp_path_factory,
                            reference_run):
    """Bloom prefilter must never change the URL-seen set (D2 exactness)."""
    corpus, _ = corpus_dir
    ref_job, _ = reference_run
    cfg = CrawlConfig(bloom_min_frontier=1, bloom_capacity=1 << 14,
                      bloom_fpp=0.2, **BASE)  # tiny+overloaded on purpose
    job = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("wb")), cfg)
    job.run(max_epochs=N_EPOCHS)
    assert job._bloom is not None, "bloom must actually engage"
    assert _seen(job) == _seen(ref_job)


def test_semi_anti_strategy_identical(spark, corpus_dir, tmp_path_factory,
                                      reference_run):
    corpus, _ = corpus_dir
    ref_job, _ = reference_run
    cfg = CrawlConfig(bloom_min_frontier=0, dedup_strategy="semi_anti",
                      merge_broadcast=False, **BASE)
    job = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("ws")), cfg)
    job.run(max_epochs=N_EPOCHS)
    assert _seen(job) == _seen(ref_job)


def test_robots_actually_blocks(reference_run):
    """The corpus serves robots.txt on ~30% of hosts with disallowed paths
    that pages link to — the gate must fire within a few epochs."""
    job, history = reference_run
    blocked_rows = job.frontier_df().filter("state = 'robots_blocked'").count()
    total_blocked = sum(h["blocked"] for h in history)
    assert total_blocked > 0
    assert blocked_rows == total_blocked


def test_mid_epoch_crash_is_idempotent(spark, corpus_dir, tmp_path_factory,
                                       reference_run):
    """Simulate dying AFTER the scan_results append but BEFORE the frontier
    commit: the epoch re-runs, the append replaces itself, final state
    equals the uninterrupted run (warehouse idempotent re-commit)."""
    from torspider_spark.operators import candidate, pipeline
    from pyspark.sql import functions as F

    corpus, _ = corpus_dir
    ref_job, _ = reference_run
    cfg = CrawlConfig(bloom_min_frontier=0, **BASE)
    work = str(tmp_path_factory.mktemp("wc"))
    job = CrawlJob(spark, corpus, work, cfg)
    job.run(max_epochs=2)

    # Partial epoch 3: only the scan_results append lands ("crash" before
    # the frontier barrier commit).
    frontier = job.wh.read("frontier")
    cands = candidate.select_candidates(frontier, 3, cfg)
    flagged = candidate.flag_robots(cands, job._robots(3), cfg)
    allowed = flagged.filter(F.col("_allowed")).drop("_allowed")
    internal = pipeline.run_scan(allowed, job.pages_meta, job.pages, cfg)
    job.wh.commit("scan_results", pipeline.to_scan_results(internal, 3, cfg),
                  3, mode="append")

    # Fresh process resumes: frontier says epoch 2, so epoch 3 re-runs fully.
    resumed = CrawlJob(spark, corpus, work, cfg)
    assert resumed.resume_epoch() == 3
    resumed.run(max_epochs=N_EPOCHS - 2)  # epochs 3..N

    assert _seen(resumed) == _seen(ref_job)
    ra = {(r.url, r.epoch, r.fault, r.hash)
          for r in ref_job.results().collect()}
    rb = {(r.url, r.epoch, r.fault, r.hash)
          for r in resumed.results().collect()}
    assert ra == rb  # no duplicated epoch-3 rows
