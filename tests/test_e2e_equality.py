"""End-to-end equality: Spark engine vs the single-threaded simulator.

north_rule criterion: same seed list + same politeness budget => same
per-epoch crawl ordering and same final URL-seen set. The simulator
re-implements scheduling/dedup/state independently (plans/simulator.py);
only the oracle-verified pure functions are shared.
"""

from __future__ import annotations

import pytest

from torspider_spark.config import CrawlConfig
from torspider_spark.operators import candidate
from torspider_spark.plans.crawl import CrawlJob
from torspider_spark.plans.simulator import simulator_from_corpus_dir

N_EPOCHS = 6


@pytest.fixture(scope="module")
def crawl_pair(spark, corpus_dir, tmp_path_factory):
    corpus, _spec = corpus_dir
    cfg = CrawlConfig(bloom_min_frontier=0, rescan_period_epochs=4,
                      host_budget_per_epoch=3, max_depth=5, max_tries=2)
    work = str(tmp_path_factory.mktemp("wh"))
    job = CrawlJob(spark, corpus, work, cfg)
    job.bootstrap()
    sim = simulator_from_corpus_dir(corpus, cfg)

    engine_candidates: dict[int, list[str]] = {}
    engine_stats = []
    sim_stats = []
    for epoch in range(1, N_EPOCHS + 1):
        # the reconciled view — what the engine itself schedules from
        # (wh.read('frontier') is the raw MOR base between compactions)
        frontier = job.frontier_df()
        cands = candidate.select_candidates(frontier, epoch, cfg)
        engine_candidates[epoch] = sorted(
            r.url for r in cands.select("url").collect())
        engine_stats.append(job.run_epoch(epoch))
        sim_stats.append(sim.run_epoch(epoch))
    return job, sim, engine_candidates, engine_stats, sim_stats


def test_crawl_ordering_matches(crawl_pair):
    _job, sim, engine_candidates, _es, _ss = crawl_pair
    for epoch, urls in engine_candidates.items():
        assert urls == sim.candidate_log[epoch], f"epoch {epoch} ordering"


def test_epoch_counters_match(crawl_pair):
    _job, _sim, _ec, engine_stats, sim_stats = crawl_pair
    for es, ss in zip(engine_stats, sim_stats):
        assert es["epoch"] == ss["epoch"]
        assert es["candidates"] + es["blocked"] == ss["candidates"], es["epoch"]
        assert es["posted"] == ss["posted"], es["epoch"]
        assert es["inserted"] == ss["inserted"], es["epoch"]


def test_url_seen_set_matches(crawl_pair):
    job, sim, _ec, _es, _ss = crawl_pair
    engine_seen = {r.url for r in job.frontier_df().select("url").collect()}
    assert engine_seen == sim.seen_set()


def test_frontier_state_matches(crawl_pair):
    job, sim, _ec, _es, _ss = crawl_pair
    engine_view = {
        r.url: (r.state, r.tries, r.last_hash, r.depth, r.priority)
        for r in job.frontier_df().collect()
    }
    sim_view = sim.frontier_view()
    assert set(engine_view) == set(sim_view)
    mismatched = {u: (engine_view[u], sim_view[u])
                  for u in engine_view if engine_view[u] != sim_view[u]}
    assert not mismatched, list(mismatched.items())[:5]


def test_scan_results_match(crawl_pair):
    job, sim, _ec, _es, _ss = crawl_pair
    engine_view = {
        (r.url, r.epoch): (r.fault, r.online, r.title, r.hash,
                           tuple(sorted(r.new_urls)),
                           tuple(r.form_dicts), r.redirect)
        for r in job.results().collect()
    }
    sim_view = sim.results_view()
    assert set(engine_view) == set(sim_view)
    mismatched = {k: (engine_view[k], sim_view[k])
                  for k in engine_view if engine_view[k] != sim_view[k]}
    assert not mismatched, list(mismatched.items())[:5]


def test_deterministic_rerun(spark, corpus_dir, tmp_path_factory, crawl_pair):
    """Same inputs, different parallelism settings => identical seen set."""
    corpus, _spec = corpus_dir
    job1, _sim, _ec, _es, _ss = crawl_pair
    cfg = CrawlConfig(bloom_min_frontier=0, rescan_period_epochs=4,
                      host_budget_per_epoch=3, max_depth=5, max_tries=2,
                      salt_buckets=3, shuffle_partitions=5)
    work = str(tmp_path_factory.mktemp("wh2"))
    job2 = CrawlJob(spark, corpus, work, cfg)
    job2.run(max_epochs=N_EPOCHS)
    seen1 = {r.url for r in job1.frontier_df().select("url").collect()}
    seen2 = {r.url for r in job2.frontier_df().select("url").collect()}
    assert seen1 == seen2
