"""Lifecycle pieces: stop marker, config-from-conf, title merge UDF."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from torspider_spark.config import CrawlConfig
from torspider_spark.functions.udfs import merge_titles_udf
from torspider_spark.plans.crawl import STOP_MARKER, CrawlJob


def test_stop_marker_halts_loop(spark, corpus_dir, tmp_path):
    """A8 — the 'sleep' poison-pill analogue: loop exits at the boundary."""
    corpus, _ = corpus_dir
    work = str(tmp_path / "wh")
    job = CrawlJob(spark, corpus, work, CrawlConfig(bloom_min_frontier=0))
    job.bootstrap()
    open(os.path.join(work, STOP_MARKER), "w").close()
    history = job.run(max_epochs=5)
    assert history == []  # no epoch ran
    os.unlink(os.path.join(work, STOP_MARKER))
    history = job.run(max_epochs=1)
    assert len(history) == 1


def test_config_from_spark_conf(spark):
    """A7 — spark.torfrontier.* conf overrides (the --conf surface)."""
    spark.conf.set("spark.torfrontier.host_budget_per_epoch", "9")
    spark.conf.set("spark.torfrontier.robots_enabled", "false")
    spark.conf.set("spark.torfrontier.scan_date", "2030-05-05")
    try:
        cfg = CrawlConfig.from_spark_conf(spark)
        assert cfg.host_budget_per_epoch == 9
        assert cfg.robots_enabled is False
        assert cfg.scan_date == "2030-05-05"
        assert cfg.max_depth == CrawlConfig().max_depth  # untouched default
    finally:
        for key in ("host_budget_per_epoch", "robots_enabled", "scan_date"):
            spark.conf.unset(f"spark.torfrontier.{key}")


def test_merge_titles_udf_matches_reference(spark):
    from tests.oracle import ref_functions

    pairs = [
        ("one two one three", "one three four"),
        ("Hidden Wiki Fresh 2026", "Hidden Wiki Fresh 2027"),
        ("", "anything"),
        ("same same", "same"),
    ]
    df = spark.createDataFrame(pairs, "t1 string, t2 string")
    got = {(r.t1, r.t2): r.merged for r in df.withColumn(
        "merged", merge_titles_udf(F.col("t1"), F.col("t2"))).collect()}
    for t1, t2 in pairs:
        assert got[(t1, t2)] == ref_functions.merge_titles(t1, t2)
