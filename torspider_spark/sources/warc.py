"""WARC → pages DataFrame source (Common-Crawl-style ingestion).

The engine's input table is (url, warc_ts, html binary, text, lang) — the
BASELINE input_hint. Common Crawl ships that data as WARC files, so this
source turns a directory of .warc/.warc.gz files into exactly that table:

    spark.read.format('binaryFile') -> one row per WARC file
      -> mapInPandas: weblib.warcio record parser per file (pure Python,
         Arrow-batched; one task per file, so a 1000-file crawl segment
         fans out across the cluster with zero shuffle)
      -> (url, warc_ts, html, text, lang)

text is the HTML body decoded as the reference's ``response.text`` would
(charset from Content-Type, utf-8 fallback, errors replaced); lang is left
null for the language-ID operator (operators/quality.py) to fill.

Scale notes: binaryFile delivers a whole file per row, so executor memory
bounds the WARC size (Common Crawl's ~1 GB segments fit standard 4-8 GB
executors). Non-page records (warcinfo/request/metadata) are skipped inside
the parser. Only good text responses become page rows; every record still
yields a pages_meta row so fetch faults stay observable downstream.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from torspider_spark.weblib.warcio import parse_warc_pages

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")
META_SCHEMA = ("url string, status int, content_type string, "
               "redirect_location string, error_kind string")

_CHARSET_RE = re.compile(r"charset=([\w.-]+)", re.I)


def _decode(body: bytes, content_type: str | None) -> str:
    match = _CHARSET_RE.search(content_type or "")
    enc = match.group(1) if match else "utf-8"
    try:
        return body.decode(enc, errors="replace")
    except LookupError:
        return body.decode("utf-8", errors="replace")


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of WARC files -> the pages table."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for page in parse_warc_pages(bytes(content)):
                    main = (page.content_type or "text/html").split(";")[0]
                    if not (200 <= page.status < 300
                            and main.startswith("text")):
                        continue
                    rows.append((page.url, page.warc_ts, page.body,
                                 _decode(page.body, page.content_type), None))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return (files.select("content")
            .mapInPandas(parse, schema=PAGES_SCHEMA))


def read_warc_meta(spark: SparkSession, path: str) -> DataFrame:
    """Directory of WARC files -> the pages_meta table (fetch metadata for
    the HEAD-classification join, incl. non-text and error statuses)."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                for page in parse_warc_pages(bytes(content)):
                    rows.append((page.url, page.status, page.content_type,
                                 None, None))
            yield pd.DataFrame(rows, columns=[
                "url", "status", "content_type", "redirect_location",
                "error_kind"])

    return (files.select("content")
            .mapInPandas(parse, schema=META_SCHEMA))
