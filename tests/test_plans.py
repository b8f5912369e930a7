"""Physical-plan shape assertions (SURVEY.md §4): pushdown, pruning,
broadcast selection, codegen — the plans we designed for, not just plans
that happen to pass."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.operators import candidate, pipeline
from torspider_spark.plans.crawl import CrawlJob


def _explain(df, mode="formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def crawl_setup(spark, corpus_dir, tmp_path_factory):
    corpus, _ = corpus_dir
    cfg = CrawlConfig(bloom_min_frontier=0)
    job = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("whp")), cfg)
    job.bootstrap()
    job.run_epoch(1)  # produce a real parquet frontier snapshot
    return job, cfg


def test_eligibility_filter_pushed_to_parquet(crawl_setup):
    """The frontier scan must push the state/epoch predicates into the
    parquet reader (partition-level pruning at Iceberg scale)."""
    job, cfg = crawl_setup
    frontier = job.wh.read("frontier")
    plan = _explain(candidate.eligible(frontier, 2, cfg))
    assert "PushedFilters:" in plan
    assert "state" in plan.split("PushedFilters:")[1][:300]


def test_header_branch_never_reads_body_columns(crawl_setup):
    """HEAD-before-GET discipline (B6): the non-body branch's scans must not
    include html/text in any ReadSchema."""
    job, cfg = crawl_setup
    frontier = job.wh.read("frontier")
    cands = candidate.select_candidates(frontier, 2, cfg)
    classified = pipeline.classify(cands, job.pages_meta)
    plan = _explain(pipeline.scan_rest(classified))
    for chunk in plan.split("ReadSchema: ")[1:]:
        schema_line = chunk.splitlines()[0]
        assert "html" not in schema_line, schema_line
    # while the body branch does read them (once)
    body_plan = _explain(pipeline.scan_good_pages(classified, job.pages))
    assert "html" in body_plan


def test_fetch_join_goes_broadcast_under_aqe(crawl_setup):
    """Per-epoch candidate sets are small vs the corpus: AQE must pick a
    broadcast join for the fetch join at this scale."""
    job, cfg = crawl_setup
    frontier = job.wh.read("frontier")
    cands = candidate.select_candidates(frontier, 2, cfg)
    internal = pipeline.run_scan(cands, job.pages_meta, job.pages, cfg)
    internal.collect()  # let AQE finalize
    plan = _explain(internal)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan


def test_taxonomy_is_whole_stage_codegen(spark, crawl_setup):
    """The status cascade must live inside WholeStageCodegen (no Python)."""
    job, _ = crawl_setup
    meta = job.pages_meta
    from torspider_spark.functions import taxonomy as tax
    classified = meta.withColumn(
        "status_class", tax.status_class(F.col("status"), F.col("error_kind")))
    agg = classified.groupBy("status_class").count()
    agg.collect()  # finalize AQE so codegen stages are visible
    plan = _explain(agg, "simple")
    # codegen'd operators carry the '*(' star marker in the simple plan
    assert "*(" in plan, plan


def test_column_pruning_on_pages_scan(crawl_setup):
    """Selecting only url from pages must prune html/text at the reader."""
    job, _ = crawl_setup
    plan = _explain(job.pages.select("url").filter(F.col("url").contains("p1")))
    schema_line = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "html" not in schema_line and "text" not in schema_line


def test_frontier_commits_touch_only_updated_buckets(spark, corpus_dir,
                                                     tmp_path):
    """Bucketed MERGE: an epoch's frontier commit rewrites only buckets
    holding that epoch's updates; untouched buckets keep their dir pointers
    (epoch I/O ~ touched rows, not frontier size)."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob

    cfg = CrawlConfig(bloom_min_frontier=0, frontier_buckets=64,
                      frontier_mor=False)
    job = CrawlJob(spark, corpus_dir[0], str(tmp_path / "wh"), cfg)
    job.run(max_epochs=3)
    m = job.wh.manifest("frontier")
    snaps = [s for s in m["snapshots"] if s["epoch"] >= 2]
    assert snaps, "expected at least one post-growth epoch"
    for snap in snaps:
        meta = snap["meta"]
        # updates touch at most one bucket per updated row
        assert meta["rewritten_buckets"] <= max(
            meta["candidates"] + 8, 1), meta
    # at least one bucket pointer must survive across the last two epochs
    s_prev, s_last = m["snapshots"][-2], m["snapshots"][-1]
    shared = [
        b for b in s_prev["buckets"]
        if b in s_last["buckets"]
        and s_prev["buckets"][b] and s_last["buckets"][b]
        and s_prev["buckets"][b][0] == s_last["buckets"][b][0]
    ]
    assert shared, "every bucket was rewritten every epoch"


def test_persisted_derived_tables_match_views(spark, corpus_dir, tmp_path):
    """links/forms/pages (per-epoch appends) and urls/onions (publish
    rollups) must equal the on-the-fly derivations, and the persisted
    stats must equal the derived stats (VERDICT r1 #8)."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans import stats as st
    from torspider_spark.plans.crawl import CrawlJob

    cfg = CrawlConfig(bloom_min_frontier=0, persist_derived=True)
    job = CrawlJob(spark, corpus_dir[0], str(tmp_path / "wh"), cfg)
    job.run(max_epochs=3)

    results, frontier = job.results(), job.frontier_df()
    persisted_links = {tuple(r) for r in job.wh.read("links").collect()}
    derived_links = {tuple(r) for r in st.links_table(results).collect()}
    assert persisted_links == derived_links
    assert job.wh.read("forms").count() == st.forms_table(results).count()
    assert job.wh.read("pages").count() == st.pages_table(results).count()
    persisted_urls = {tuple(r) for r in job.wh.read("urls").collect()}
    derived_urls = {tuple(r) for r in st.urls_table(frontier).collect()}
    assert persisted_urls == derived_urls
    p_onions = {r.host: (r.last_online, r.online, r.title)
                for r in job.wh.read("onions").collect()}
    d_onions = {r.host: (r.last_online, r.online, r.title)
                for r in st.onions_table(frontier, results).collect()}
    assert p_onions == d_onions
    assert st.gather_stats_persisted(job.wh) == st.gather_stats(
        frontier, results)
    # C6: at least one host consolidated a real title
    assert any(t for (_, _, t) in p_onions.values())


def test_consolidated_titles_merge_semantics(spark):
    """C6 fold: merge_titles intersection in (epoch, url) order; empty
    intersections keep the incumbent (reference functions.py:17-24)."""
    from torspider_spark.plans.stats import consolidated_titles

    rows = [
        # host A: 'Deep Web Index' ∩ 'Index of the Deep Web' -> 'Deep Web Index'
        ("h-a.onion", 1, "http://h-a.onion/1", "Deep Web Index"),
        ("h-a.onion", 2, "http://h-a.onion/2", "Index of the Deep Web"),
        # host B: disjoint titles keep the first
        ("h-b.onion", 1, "http://h-b.onion/1", "Alpha Beta"),
        ("h-b.onion", 2, "http://h-b.onion/2", "Gamma Delta"),
        # host C: null/empty titles are skipped entirely
        ("h-c.onion", 1, "http://h-c.onion/1", None),
        ("h-c.onion", 2, "http://h-c.onion/2", ""),
    ]
    df = spark.createDataFrame(
        rows, "host string, epoch int, url string, title string")
    got = {r.host: r.title for r in consolidated_titles(df).collect()}
    assert got["h-a.onion"] == "Deep Web Index"
    assert got["h-b.onion"] == "Alpha Beta"
    assert "h-c.onion" not in got


def test_merge_titles_matches_reference():
    """weblib.merge_titles byte-equality vs the reference implementation."""
    from tests.oracle import ref_functions

    from torspider_spark.weblib.textutil import merge_titles

    ref_merge = ref_functions.merge_titles

    cases = [
        ("Deep Web Index", "Index of the Deep Web"),
        ("a b a c", "a c d"),
        ("", "anything"),
        ("one two", "three four"),
        ("Tor   Hidden  Service", "Hidden Tor Service"),
    ]
    for t1, t2 in cases:
        assert merge_titles(t1, t2) == ref_merge(t1, t2), (t1, t2)


def test_mor_equals_cow_frontier_state(spark, corpus_dir, tmp_path):
    """Merge-on-read (journal + reconciling view + compaction) must produce
    the exact same frontier state as per-epoch copy-on-write, and the
    epoch path must never rewrite base buckets between compactions."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob

    base_cfg = dict(bloom_min_frontier=0, host_budget_per_epoch=3,
                    max_depth=4, max_tries=2)
    cow = CrawlJob(spark, corpus_dir[0], str(tmp_path / "cow"),
                   CrawlConfig(frontier_mor=False, **base_cfg))
    cow.run(max_epochs=5)
    mor = CrawlJob(spark, corpus_dir[0], str(tmp_path / "mor"),
                   CrawlConfig(frontier_mor=True, mor_compact_every=3,
                               **base_cfg))
    mor.run(max_epochs=5)

    def state(job):
        return {(r.url, r.state, r.tries, r.last_hash, r.depth,
                 r.last_scan_epoch, r.next_eligible_epoch)
                for r in job.frontier_df().collect()}

    assert state(mor) == state(cow)
    # after the end-of-run compaction the raw base equals the view
    raw = {(r.url, r.state, r.tries) for r in
           mor.wh.read("frontier").collect()}
    view = {(r.url, r.state, r.tries) for r in
            mor.frontier_df().collect()}
    assert raw == view
    # epoch commits between compactions are append/journal only: every
    # non-compaction frontier snapshot carries no 'base' rewrite dirs
    m = mor.wh.manifest("frontier")
    for snap in m["snapshots"]:
        if snap["epoch"] == 0 or snap["meta"].get("compaction"):
            continue
        assert not any("_kind=base" in d
                       for dirs in [snap["dirs"]] for d in dirs
                       if os.path.isdir(os.path.join(
                           mor.wh._table_dir("frontier"), d, "_kind=base"))), snap


def test_mor_resume_mid_epoch(spark, corpus_dir, tmp_path_factory):
    """The journal is the epoch barrier: a run killed between the insert
    append and the journal commit re-runs that epoch idempotently."""
    from torspider_spark.config import CrawlConfig
    from torspider_spark.plans.crawl import CrawlJob

    cfg = CrawlConfig(bloom_min_frontier=0, host_budget_per_epoch=3,
                      max_depth=4, max_tries=2)
    corpus, _ = corpus_dir
    solid = CrawlJob(spark, corpus, str(tmp_path_factory.mktemp("ms")), cfg)
    solid.run(max_epochs=4)

    broken_dir = str(tmp_path_factory.mktemp("mb"))
    broken = CrawlJob(spark, corpus, broken_dir, cfg)
    broken.run(max_epochs=2)
    # simulate the crash window: epoch 3's insert append published, journal
    # commit lost — roll the journal back while the frontier keeps epoch 3
    broken2 = CrawlJob(spark, corpus, broken_dir, cfg)
    e3 = broken2.run_epoch(3)
    assert e3["inserted"] >= 0
    broken2.wh.rollback("frontier_journal", 2)
    resumed = CrawlJob(spark, corpus, broken_dir, cfg)
    assert resumed.resume_epoch() == 3  # journal says epoch 3 incomplete
    resumed.run(max_epochs=2)

    a = {(r.url, r.state, r.tries, r.last_hash)
         for r in solid.frontier_df().collect()}
    b = {(r.url, r.state, r.tries, r.last_hash)
         for r in resumed.frontier_df().collect()}
    assert a == b


def test_consolidated_titles_cap_before_aggregation(spark):
    """ADVICE r2: the per-host cap must bound what reaches the aggregation
    buffer (row_number window filter BEFORE collect_list), and the capped
    fold must equal the uncapped fold once the intersection has converged."""
    from torspider_spark.plans.stats import consolidated_titles

    rows = [("h.onion", e, f"http://h.onion/{e:03d}",
             "Common Words Here" if e % 2 else "Here Common Words Extra")
            for e in range(1, 41)]
    df = spark.createDataFrame(
        rows, "host string, epoch int, url string, title string")
    capped = {r.host: r.title
              for r in consolidated_titles(df, max_titles_per_host=5).collect()}
    full = {r.host: r.title for r in consolidated_titles(df).collect()}
    assert capped == full  # converged long before the cap
    # and the capped plan aggregates at most max_titles_per_host rows
    plan_df = consolidated_titles(df, max_titles_per_host=5)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "Window" in plan  # cap applied via window BEFORE the aggregate
