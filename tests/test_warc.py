"""WARC source: pure-Python codec round-trip + Spark ingestion parity."""

from __future__ import annotations

from datetime import datetime, timezone

from torspider_spark.weblib.warcio import (
    WarcPage,
    gunzip_all,
    parse_warc_pages,
    write_warc,
)


def _pages():
    ts = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    return [
        WarcPage("http://abc.onion/", ts, 200, "text/html; charset=utf-8",
                 "<html><title>A &amp; B</title><a href='/x'>x</a></html>"
                 .encode()),
        WarcPage("http://abc.onion/img", ts, 200, "image/png",
                 b"\x89PNG\r\n\x1a\nnotreallyapng"),
        WarcPage("http://def.onion/err", ts, 404, "text/html", b"nope"),
        WarcPage("http://uni.onion/u", ts, 200, "text/html; charset=utf-8",
                 "тест ünïcode ⚡".encode()),
    ]


def test_warc_roundtrip_plain(tmp_path):
    path = str(tmp_path / "t.warc")
    write_warc(_pages(), path)
    got = parse_warc_pages(open(path, "rb").read())
    assert [(p.url, p.status, p.body) for p in got] == \
        [(p.url, p.status, p.body) for p in _pages()]
    assert all(g.warc_ts == p.warc_ts for g, p in zip(got, _pages()))


def test_warc_roundtrip_gzip_members(tmp_path):
    """Common-Crawl layout: one gzip member per record."""
    path = str(tmp_path / "t.warc.gz")
    write_warc(_pages(), path, gzip_members=True)
    raw = open(path, "rb").read()
    assert raw.startswith(b"\x1f\x8b")
    got = parse_warc_pages(raw)
    assert len(got) == len(_pages())
    assert got[0].body == _pages()[0].body


def test_gunzip_all_passthrough():
    assert gunzip_all(b"WARC/1.0\r\n") == b"WARC/1.0\r\n"


def test_spark_warc_source_matches_codec(spark, tmp_path):
    """read_warc_pages must yield exactly the good text records with the
    reference's response.text decoding; read_warc_meta sees every record."""
    from torspider_spark.sources.warc import read_warc_meta, read_warc_pages

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    write_warc(_pages()[:2], str(wdir / "a.warc"))
    write_warc(_pages()[2:], str(wdir / "b.warc.gz"), gzip_members=True)

    pages = read_warc_pages(spark, str(wdir)).collect()
    by_url = {r.url: r for r in pages}
    # only 2xx text records become pages (the PNG and the 404 are dropped)
    assert set(by_url) == {"http://abc.onion/", "http://uni.onion/u"}
    assert bytes(by_url["http://abc.onion/"].html) == _pages()[0].body
    assert by_url["http://uni.onion/u"].text == "тест ünïcode ⚡"
    # Spark collects timestamps as naive datetimes in the session tz (UTC)
    assert by_url["http://abc.onion/"].warc_ts == \
        _pages()[0].warc_ts.replace(tzinfo=None)

    meta = read_warc_meta(spark, str(wdir)).collect()
    assert {(r.url, r.status) for r in meta} == {
        ("http://abc.onion/", 200), ("http://abc.onion/img", 200),
        ("http://def.onion/err", 404), ("http://uni.onion/u", 200)}


def test_crawl_extraction_over_warc_source(spark, tmp_path):
    """The scan pipeline runs unchanged over WARC-ingested pages: links and
    titles extracted from a WARC-backed pages table match the codec input."""
    from pyspark.sql import functions as F

    from torspider_spark.config import CrawlConfig
    from torspider_spark.operators import pipeline
    from torspider_spark.sources.warc import read_warc_meta, read_warc_pages

    ts = datetime(2026, 1, 2, tzinfo=timezone.utc)
    docs = [
        WarcPage("http://h1.onion/", ts, 200, "text/html",
                 b"<html><title>Hub</title>"
                 b"<a href='http://h2.onion/a'>a</a>"
                 b"<a href='/local'>l</a></html>"),
        WarcPage("http://h2.onion/a", ts, 200, "text/html",
                 b"<html><title>Leaf</title></html>"),
    ]
    wdir = tmp_path / "w"
    wdir.mkdir()
    write_warc(docs, str(wdir / "seg.warc"))

    pages = read_warc_pages(spark, str(wdir))
    meta = read_warc_meta(spark, str(wdir))
    cands = pages.select(
        "url",
        F.sha1("url").alias("url_hash"),
        F.split("url", "/").getItem(2).alias("host"),
        F.lit(0).alias("depth"), F.lit(0).alias("tries"),
        F.lit("").alias("last_hash"))
    internal = pipeline.run_scan(cands, meta, pages, CrawlConfig())
    rows = {r.url: r for r in internal.collect()}
    assert rows["http://h1.onion/"].title == "Hub"
    assert set(rows["http://h1.onion/"].new_urls) == {
        "http://h2.onion/a", "http://h1.onion/local"}
    assert rows["http://h2.onion/a"].title == "Leaf"
