"""Unit tests: candidate selection, URL-seen dedup (+bloom), state merge."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.operators import candidate, dedup
from torspider_spark.schemas import FRONTIER
from torspider_spark.weblib import url_sha1


def _frontier_df(spark, rows):
    """rows: (url, host, depth, priority, state, next_eligible)."""
    data = [
        (u, url_sha1(u), h, d, p, s, "", 0, 0, -1, ne)
        for (u, h, d, p, s, ne) in rows
    ]
    return spark.createDataFrame(data, FRONTIER)


def test_politeness_budget_and_order(spark):
    cfg = CrawlConfig(host_budget_per_epoch=2, salt_buckets=4)
    rows = [(f"http://h{i % 3}.onion/p{i}", f"h{i % 3}.onion", i % 4, i % 2,
             "pending", 0) for i in range(30)]
    frontier = _frontier_df(spark, rows)
    got = candidate.select_candidates(frontier, 1, cfg).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    assert all(len(v) <= 2 for v in by_host.values())
    # Exact expected top-k per host by (priority, depth, url_hash).
    expect = {}
    for u, h, d, p, s, ne in rows:
        expect.setdefault(h, []).append((p, d, url_sha1(u), u))
    for h, items in expect.items():
        want = [u for (_, _, _, u) in sorted(items)[:2]]
        assert sorted(r.url for r in by_host[h]) == sorted(want), h


def test_two_phase_topk_equals_single_phase(spark):
    rows = [(f"http://hot.onion/p{i}", "hot.onion", i % 5, i % 3, "pending", 0)
            for i in range(200)]
    frontier = _frontier_df(spark, rows)
    salted = candidate.select_candidates(
        frontier, 1, CrawlConfig(host_budget_per_epoch=7, salt_buckets=8))
    plain = candidate.select_candidates(
        frontier, 1,
        CrawlConfig(host_budget_per_epoch=7, topk_local_prefilter=False))
    assert sorted(r.url for r in salted.collect()) == \
        sorted(r.url for r in plain.collect())


def test_eligibility_gating(spark):
    cfg = CrawlConfig()
    rows = [
        ("http://a.onion/1", "a.onion", 0, 0, "pending", 0),
        ("http://a.onion/2", "a.onion", 0, 0, "pending", 5),   # backoff
        ("http://a.onion/3", "a.onion", 0, 0, "done", 0),
        ("http://a.onion/4", "a.onion", 0, 0, "fault", 0),
        ("http://a.onion/5", "a.onion", 0, 0, "dead", 0),
    ]
    frontier = _frontier_df(spark, rows)
    got = {r.url for r in candidate.eligible(frontier, 1, cfg).collect()}
    assert got == {"http://a.onion/1"}
    # rescan of done rows when configured (last_scan_epoch=-1 + 2 <= 3)
    cfg2 = CrawlConfig(rescan_period_epochs=2)
    got2 = {r.url for r in candidate.eligible(frontier, 3, cfg2).collect()}
    assert got2 == {"http://a.onion/1", "http://a.onion/3"}


def test_unseen_urls_exact(spark):
    frontier = _frontier_df(
        spark, [(f"http://x.onion/{i}", "x.onion", 0, 0, "done", 0)
                for i in range(50)])
    new = spark.createDataFrame(
        [(f"http://x.onion/{i}", url_sha1(f"http://x.onion/{i}"))
         for i in range(40, 60)], "url string, url_hash string")
    got = sorted(r.url for r in
                 dedup.unseen_urls(new, frontier).select("url").collect())
    assert got == [f"http://x.onion/{i}" for i in range(50, 60)]


def test_unseen_urls_with_bloom_identical(spark):
    cfg = CrawlConfig(bloom_capacity=1 << 12, bloom_fpp=0.2, bloom_shards=8)
    frontier = _frontier_df(
        spark, [(f"http://x.onion/{i}", "x.onion", 0, 0, "done", 0)
                for i in range(500)])
    bloom = dedup.BloomShards.build(frontier, cfg)
    new = spark.createDataFrame(
        [(f"http://x.onion/{i}", url_sha1(f"http://x.onion/{i}"))
         for i in range(400, 900)], "url string, url_hash string")
    plain = sorted(r.url for r in
                   dedup.unseen_urls(new, frontier).select("url").collect())
    semi = sorted(r.url for r in
                  dedup.unseen_urls(new, frontier, strategy="semi_anti")
                  .select("url").collect())
    assert plain == semi
    with_bloom = sorted(
        r.url for r in dedup.unseen_urls(new, frontier, spark, bloom)
        .select("url").collect())
    assert plain == with_bloom
    assert len(plain) == 400


def test_bloom_no_false_negatives():
    cfg = CrawlConfig(bloom_capacity=1 << 10, bloom_fpp=0.05)
    bloom = dedup.UrlBloom(cfg.bloom_capacity, cfg.bloom_fpp)
    keys = pd.Series([url_sha1(f"u{i}") for i in range(5000)])  # overloaded
    bloom.add_series(keys)
    assert bool(bloom.contains_series(keys).all())


def test_crawl_resume_equals_uninterrupted(spark, corpus_dir,
                                           tmp_path_factory):
    """Kill after epoch j, resume => identical final state (SURVEY.md §5)."""
    from torspider_spark.plans.crawl import CrawlJob

    corpus, _spec = corpus_dir
    cfg = CrawlConfig(bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)

    solid = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("wa")), cfg)
    solid.run(max_epochs=4)

    broken_dir = str(tmp_path_factory.mktemp("wb"))
    broken = CrawlJob(spark, corpus, broken_dir, cfg)
    broken.run(max_epochs=2)  # "crash" here
    resumed = CrawlJob(spark, corpus, broken_dir, cfg)  # fresh process
    assert resumed.resume_epoch() == 3
    resumed.run(max_epochs=2)

    a = {(r.url, r.state, r.tries, r.last_hash)
         for r in solid.frontier_df().collect()}
    b = {(r.url, r.state, r.tries, r.last_hash)
         for r in resumed.frontier_df().collect()}
    assert a == b
    ra = {(r.url, r.epoch, r.fault, r.hash) for r in solid.results().collect()}
    rb = {(r.url, r.epoch, r.fault, r.hash) for r in resumed.results().collect()}
    assert ra == rb


def test_frontier_host_key_matches_urlsplit_netloc(spark):
    """Host partition key must equal the simulator/reference urlsplit netloc
    even for URLs with ports or userinfo (parse_url would strip them) and
    must never be null (ADVICE r1)."""
    from torspider_spark.operators import frontier as fr
    from torspider_spark.weblib import host_of

    urls = [
        "http://plainhost.onion/page",
        "http://host.onion:8080/page",
        "http://user:pw@auth.onion/x",
        "http://user@host.onion:443/",
        "notaurl",
    ]
    df = spark.createDataFrame(
        [(u, 0, 0) for u in urls], "url string, depth int, priority int")
    got = {r["url"]: r["host"]
           for r in fr.bootstrap(spark, df, __import__(
               "torspider_spark.config", fromlist=["CrawlConfig"])
               .CrawlConfig()).collect()}
    for u in urls:
        assert got[u] == host_of(u), u
        assert got[u] is not None


def test_bloom_shards_distributed_invariants(spark):
    """BloomShards: per-shard bitsets are O(capacity/shards); a merged
    delta keeps the superset invariant; probing flags every present key."""
    from torspider_spark.weblib import url_sha1

    # Many shards + many keys: every bucket must cogroup with ITS shard
    # (regression: a long-vs-int key-type mismatch paired buckets with
    # empty shard groups and produced false negatives at e2e scale).
    cfg = CrawlConfig(bloom_capacity=1 << 16, bloom_fpp=0.1, bloom_shards=64)
    base = spark.createDataFrame(
        [(url_sha1(f"a{i}"),) for i in range(5000)], "url_hash string")
    shards = dedup.BloomShards.build(base, cfg)
    rows = shards.shards.collect()
    full_bits = dedup.UrlBloom(cfg.bloom_capacity, cfg.bloom_fpp).n_bits
    shard_bits = dedup.UrlBloom(shards.shard_capacity, cfg.bloom_fpp).n_bits
    assert all(len(r.words) * 8 == shard_bits for r in rows)
    assert shard_bits * cfg.bloom_shards <= 2 * full_bits  # O(capacity/P) each
    # every base key probes maybe-seen (no false negatives)
    probed = shards.probe(base)
    assert probed.filter("NOT _maybe").count() == 0
    # fold a delta in; delta keys must then probe maybe-seen too
    delta = spark.createDataFrame(
        [(url_sha1(f"b{i}"),) for i in range(500)], "url_hash string")
    merged = shards.merged_with(delta)
    assert merged.probe(delta).filter("NOT _maybe").count() == 0
    assert merged.probe(base).filter("NOT _maybe").count() == 0
    merged.unpersist()


def test_host_rank_matches_reference(spark):
    """F4 hook: Spark host_rank equals the independent dict-based PageRank
    (plans/expected._host_rank_reference) to 6 decimals."""
    from torspider_spark.operators.hostrank import host_rank, priority_expr
    from torspider_spark.plans.expected import _host_rank_reference

    links = []
    # hub h0 linked by everyone; chain h1->h2->h3; h3 links back to h0
    for i in range(1, 4):
        links.append((f"http://h{i}.onion/p", 1, "http://h0.onion/"))
        links.append((f"http://h{i}.onion/p", 1, f"http://h{(i % 3) + 1}.onion/x"))
    links.append(("http://h3.onion/q", 2, "http://h0.onion/deep"))
    df = spark.createDataFrame(links, "src string, epoch int, dst string")
    got = {r.host: r.rank for r in host_rank(df, iterations=5).collect()}
    want = _host_rank_reference(links, iterations=5)
    assert set(got) == set(want)
    for h in want:
        assert abs(got[h] - want[h]) < 1e-6, h
    assert got["h0.onion"] == max(got.values())  # the hub ranks highest

    # priority_expr: higher rank -> earlier (smaller) priority per depth band
    ranked = spark.createDataFrame(
        [(0, 2.0), (0, 0.2)], "depth int, rank double")
    pr = [r[0] for r in ranked.select(priority_expr()).collect()]
    assert pr[0] < pr[1]
