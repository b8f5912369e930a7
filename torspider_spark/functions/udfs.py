"""Vectorized pandas/Arrow UDFs — the only Python in the hot path.

Each UDF applies a pure weblib function per cell of an Arrow batch
(input_hint mandate: pandas/Arrow UDFs only, no per-row Python UDFs).
Batch size is capped by spark.sql.execution.arrow.maxRecordsPerBatch so the
HTML parser's peak memory stays bounded (the reference's MemoryError
analogue, TorSpider.py:399-404).

The page extractor runs ONE tokenizer pass per page and honors the
change-detection short-circuit (B4, TorSpider.py:287-301) *inside* the batch:
unchanged rows get a title-only parse result (the reference also re-parses
the title on every scan — TorSpider.py:272-283 — but skips links/forms).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from torspider_spark.schemas import EXTRACTED
from torspider_spark.weblib import (
    extract_links,
    host_of_safe,
    is_onion_url,
    resolve_redirect_safe,
    scan_page,
    title_of,
)

# Extractor output incl. the parse-crash marker (a page whose parse raises
# is never reported — the reference worker would die mid-page and post
# nothing, TorSpider.py:410-413; SURVEY.md §2.I).
EXTRACTED_FULL = T.StructType(
    list(EXTRACTED.fields) + [T.StructField("crashed", T.BooleanType(), False)]
)


@F.pandas_udf(EXTRACTED_FULL)
def extract_page(text: pd.Series, url: pd.Series,
                 changed: pd.Series) -> pd.DataFrame:
    """title/links/forms per page; links/forms only where ``changed``.

    Links are canonicalized against the page URL and netloc-gated exactly as
    get_links does (weblib.extract_links); the crawl-loop's whole-string
    onion gate is applied JVM-side afterwards (operators/pipeline.py)."""
    titles: list[str | None] = []
    links: list[list[str] | None] = []
    forms: list[list[str] | None] = []
    crashed: list[bool] = []
    import json as _json

    for body, page_url, want_full in zip(text, url, changed):
        body = body if isinstance(body, str) else ("" if body is None else str(body))
        if want_full:
            try:
                hrefs, title, form_dicts = scan_page(body)
                titles.append(title)
                links.append(extract_links(hrefs, page_url))
                forms.append([_json.dumps(f) for f in form_dicts])
                crashed.append(False)
            except Exception:
                titles.append(None)
                links.append(None)
                forms.append(None)
                crashed.append(True)
        else:
            try:
                titles.append(title_of(body))
            except Exception:
                # Parity: get_title is exception-wrapped to 'Unknown'
                # (TorSpider.py:272-275).
                titles.append("Unknown")
            links.append(None)
            forms.append(None)
            crashed.append(False)
    return pd.DataFrame(
        {"title": titles, "links": links, "forms": forms, "crashed": crashed})


@F.pandas_udf(T.StringType())
def merge_redirect(location: pd.Series, base_url: pd.Series) -> pd.Series:
    """Redirect Location resolution (weblib.resolve_redirect; parity with
    merge_urls, functions.py:27-68). Null location -> null (the reference's
    missing-Location KeyError path, TorSpider.py:188-202); unparseable
    location/base -> null via resolve_redirect_safe (a hostile Location
    header must not kill the task — deliberate divergence, see
    urlmerge.py)."""
    out = [
        None if loc is None else resolve_redirect_safe(loc, base)
        for loc, base in zip(location, base_url)
    ]
    return pd.Series(out, dtype="object")


@F.pandas_udf(T.ArrayType(T.StringType(), False))
def scheme_fanout_udf(url: pd.Series) -> pd.Series:
    """http/https re-emission for invalid-schema URLs (TorSpider.py:341-353)."""
    from torspider_spark.weblib import scheme_fanout

    return pd.Series([scheme_fanout(u) for u in url])


@F.pandas_udf(T.StringType())
def host_of_udf(url: pd.Series) -> pd.Series:
    """Exact Python-urlsplit netloc. Used where value-level parity with the
    reference matters; plain partitioning keys use F.parse_url(url,'HOST')
    (JVM-side) instead. Malformed URLs (urlsplit ValueError) map to '' via
    host_of_safe — one bad seed must not kill the task."""
    return pd.Series(
        [host_of_safe(u) if u is not None else None for u in url],
        dtype="object")


@F.pandas_udf(T.StringType())
def merge_titles_udf(title1: pd.Series, title2: pd.Series) -> pd.Series:
    """Order-preserving, duplicate-keeping token intersection of two titles
    (C6; parity: merge_titles, functions.py:17-24). Used by the derived
    onions rollup when consolidating titles across scans. Deliberately NOT
    F.array_intersect — that dedups."""
    from torspider_spark.weblib import merge_titles

    out = [
        None if a is None or b is None else merge_titles(a, b)
        for a, b in zip(title1, title2)
    ]
    return pd.Series(out, dtype="object")


def onion_url_filter(col):
    """Whole-string onion gate as a codegen'd column predicate
    (TorSpider.py:194-196,312-314): keeps URLs containing '.onion' but not
    '.onion.' anywhere in the string."""
    return col.contains(".onion") & ~col.contains(".onion.")


__all__ = [
    "EXTRACTED_FULL",
    "extract_page",
    "merge_redirect",
    "scheme_fanout_udf",
    "host_of_udf",
    "onion_url_filter",
    "is_onion_url",
]
