"""Deterministic synthetic web corpus (FIXTURES.md §§1-6).

Everything is a pure function of (spec.seed, host index, page index):
``host_pages(spec, i)`` returns the same rows in the same order on every
machine, so the corpus can be generated single-process (tiny scale, pyarrow)
or distributed (bench scale: Spark parallelizes host indices and each task
generates its slice deterministically — no data is shuffled to build data).

The simulated web:
  - N onion hosts (56-char base32 names, derived from sha256 digests);
  - the first ``n_hot_hosts`` get ``hot_multiplier``x pages (skew: exercises
    salting + AQE skew handling, SURVEY.md §4);
  - each page's HTML embeds links of every flavor the reference canonicalizer
    handles (relative ./x ../x, rooted, bare, absolute onion, clearnet,
    .onion.-gateway, href-less anchors) plus forms covering every input type
    of /root/reference/libs/parsers.py:96-146;
  - per-URL fetch outcomes (pages_meta) drive the status/fault taxonomy of
    TorSpider.py:156-234,334-413, weighted ~80% good;
  - a seeded subset of hosts serves /robots.txt with Disallow rules.

"fetching" a URL = joining the frontier batch against these tables on url;
a URL with no meta row is a connection error (SURVEY.md §1.2).
"""

from __future__ import annotations

import hashlib
import os
import random
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

_BASE32 = "abcdefghijklmnopqrstuvwxyz234567"
_WARC_EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)
_LANGS = ["en", "ru", "de", "es", "zz"]
_CLEARNET = "http://www.example.com/outside.html"

# Status draws: (status, weight). ~80% good per FIXTURES.md §2.
_STATUS_POOL = [
    (200, 76), (201, 4),
    (301, 2), (302, 2), (303, 1), (307, 1), (308, 1),
    (404, 3), (403, 2), (500, 2), (451, 1),
    (503, 1), (429, 1),
    (418, 1),  # unknown-status branch (TorSpider.py:224-234)
    (206, 1),  # another unknown
]
_ERROR_KINDS = [
    "invalid_url", "invalid_schema", "ssl", "conn", "timeout",
    "too_many_redirects", "chunked", "memory", "notimpl",
]
_NONTEXT_TYPES = ["image/png", "application/octet-stream", "audio/mpeg"]


@dataclass(frozen=True)
class CorpusSpec:
    seed: int = 42
    n_hosts: int = 50
    pages_per_host: int = 30
    n_hot_hosts: int = 2
    hot_multiplier: int = 40
    n_seeds: int = 5
    robots_fraction: float = 0.3
    p_error: float = 0.04        # rows with a simulated transport error
    p_nontext: float = 0.03      # rows with a non-text content type
    p_null_ctype: float = 0.02   # rows with a missing Content-Type
    links_per_page: int = 7
    p_form: float = 0.35
    p_cross_host: float = 0.25   # link goes to another host
    p_dead_link: float = 0.06    # link target has no meta row (conn error)
    filler_words_min: int = 1    # body text volume (real pages are tens of
    filler_words_max: int = 30   # KB — bench uses realistic weights)


TINY = CorpusSpec()
SMALL = CorpusSpec(n_hosts=200, pages_per_host=40, n_hot_hosts=4, n_seeds=20)
BENCH = CorpusSpec(
    n_hosts=2000, pages_per_host=200, n_hot_hosts=6, hot_multiplier=40,
    n_seeds=120, links_per_page=80, p_form=0.9, p_dead_link=0.005,
    filler_words_min=300, filler_words_max=900,
)


def host_name(spec: CorpusSpec, i: int) -> str:
    """56-char base32 onion host, pure function of (seed, i)."""
    digest = hashlib.sha256(f"{spec.seed}:host:{i}".encode()).digest()
    bits = int.from_bytes(digest + digest[:4], "big")
    return "".join(
        _BASE32[(bits >> (5 * k)) & 31] for k in range(56)
    ) + ".onion"


def host_page_count(spec: CorpusSpec, i: int) -> int:
    mult = spec.hot_multiplier if i < spec.n_hot_hosts else 1
    return spec.pages_per_host * mult


def _page_path(rng: random.Random, j: int) -> str:
    """Mostly clean paths; a seasoning of pathological ones."""
    roll = rng.random()
    if j == 0:
        return "/"
    if roll < 0.70:
        return f"/p{j}.html"
    if roll < 0.85:
        return f"/d{j % 7}/p{j}.html"
    if roll < 0.90:
        return f"/d{j % 7}/sub/p{j}.html"
    if roll < 0.94:
        return f"/p{j}.html?session={j * 13 % 97}&view=full"
    if roll < 0.97:
        return f"/d{j % 7}/x.onion.mirror/p{j}.html"  # onion-in-path trap
    return f"/dotted/p{j}.html"


def _has_robots(spec: CorpusSpec, i: int) -> bool:
    r = random.Random(f"{spec.seed}:robots:{i}")
    return r.random() < spec.robots_fraction


def _link_flavors(rng: random.Random, spec: CorpusSpec, host: str,
                  n_pages: int, host_idx: int) -> list[str]:
    """One page's outgoing hrefs, covering every canonicalizer branch."""
    out: list[str] = []
    for _ in range(spec.links_per_page):
        roll = rng.random()
        target_j = rng.randrange(n_pages)
        if rng.random() < spec.p_dead_link:
            target_path = f"/ghost/p{rng.randrange(100)}.html"
        else:
            target_path = _page_path(random.Random(
                f"{spec.seed}:path:{host_idx}:{target_j}"), target_j)
        if roll < 0.30:
            out.append(target_path)                       # rooted
        elif roll < 0.45:
            out.append(target_path.lstrip("/"))           # bare relative
        elif roll < 0.55:
            out.append("./" + target_path.lstrip("/"))    # dot-relative
        elif roll < 0.62:
            out.append("../" + target_path.lstrip("/"))   # parent-relative
        elif roll < 0.62 + spec.p_cross_host:
            other = host_name(spec, rng.randrange(spec.n_hosts))
            if rng.random() < 0.2:
                out.append(other + target_path)           # schemeless promo
            else:
                out.append(f"http://{other}{target_path}")
        elif roll < 0.95:
            out.append(f"http://{host}{target_path}")     # absolute same-host
        elif roll < 0.97:
            out.append(_CLEARNET)                         # clearnet (dropped)
        else:
            out.append(f"http://{host}.gw.example.com/x")  # gateway (dropped)
    return out


def _form_html(rng: random.Random, j: int) -> str:
    """A form exercising every input branch of parsers.py:96-146."""
    n = rng.randrange(4)
    bits = [f'<form action="/post{j}.cgi" method="post" target="_top">']
    bits.append(f'<input type="text" name="user{n}" value="anon{n}">')
    if rng.random() < 0.5:
        bits.append('<input type="password" name="pw">')
    if rng.random() < 0.4:
        bits.append(f'<input type="checkbox" name="opts" value="a{n}">'
                    f'<input type="checkbox" name="opts" value="b{n}">')
    if rng.random() < 0.4:
        bits.append('<input type="radio" name="pick" value="yes">'
                    '<input type="radio" name="pick" value="no">')
    for kind in ("date", "datetime-local", "month", "number", "range",
                 "time", "week", "email", "search", "tel", "url"):
        if rng.random() < 0.15:
            bits.append(f'<input type="{kind}" name="{kind[:2]}{n}">')
    if rng.random() < 0.35:
        bits.append(f'<select name="sel{n}"><option value="o1">One</option>'
                    '<option value="o2">Two</option></select>')
    if rng.random() < 0.3:
        bits.append(f'<textarea name="ta{n}"> note {n} </textarea>')
    bits.append('<input type="submit" name="go" value="Send"></form>')
    return "".join(bits)


def _page_html(spec: CorpusSpec, host: str, host_idx: int, j: int,
               n_pages: int) -> str:
    rng = random.Random(f"{spec.seed}:html:{host_idx}:{j}")
    bits = ["<html><head>"]
    title_roll = rng.random()
    if title_roll < 0.80:
        bits.append(f"<title>Site {host_idx} &amp; page {j}</title>")
    elif title_roll < 0.86:
        bits.append("<title></title>")
    elif title_roll < 0.90:
        bits.append(f"<title>First {j}</title><title>Second {j}</title>")
    # else: no title at all
    bits.append("</head><body>")
    if rng.random() < 0.05:
        bits.append(f'<input type="text" name="preform{j}" value="stray">')
    for href in _link_flavors(rng, spec, host, n_pages, host_idx):
        bits.append(f'<a href="{href}">link</a>')
    if rng.random() < 0.04:
        bits.append("<a>anchor without href</a>")
    if rng.random() < spec.p_form:
        bits.append(_form_html(rng, j))
    n_filler = rng.randrange(spec.filler_words_min, spec.filler_words_max + 1)
    words = [f"w{rng.randrange(4096):x}" for _ in range(min(n_filler, 64))]
    body_text = " ".join(words[i % len(words)] for i in range(n_filler))
    bits.append(f"<p>content {host_idx}/{j} {body_text}")
    bits.append("</p></body></html>")
    return "".join(bits)


def _robots_body(spec: CorpusSpec, host_idx: int) -> str:
    return "User-agent: *\nDisallow: /blocked/\nDisallow: /d3/\n"


def _meta_for(spec: CorpusSpec, url: str, host: str, path: str) -> dict:
    """Fetch-outcome row for one URL — pure function of (seed, url)."""
    rng = random.Random(f"{spec.seed}:meta:{url}")
    row = {"url": url, "status": 200, "content_type": "text/html",
           "redirect_location": None, "error_kind": None}
    if path == "/robots.txt":
        row["content_type"] = "text/plain"
        return row
    roll = rng.random()
    if roll < spec.p_error:
        row["error_kind"] = rng.choice(_ERROR_KINDS)
        return row
    total = sum(w for _, w in _STATUS_POOL)
    pick = rng.randrange(total)
    acc = 0
    for status, weight in _STATUS_POOL:
        acc += weight
        if pick < acc:
            row["status"] = status
            break
    if row["status"] in (301, 302, 303, 307, 308):
        kind = rng.random()
        target = f"/moved/p{rng.randrange(1000)}.html"
        if kind < 0.5:
            row["redirect_location"] = f"http://{host}{target}"
        elif kind < 0.7:
            row["redirect_location"] = target.lstrip("/")    # relative
        elif kind < 0.85:
            row["redirect_location"] = "../" + target.lstrip("/")
        elif kind < 0.95:
            row["redirect_location"] = f"//{host}{target}"   # schemeless
        # else: no Location header (reference: redirect without target,
        # TorSpider.py:199-202)
    elif row["status"] in (200, 201):
        ctype_roll = rng.random()
        if ctype_roll < spec.p_nontext:
            row["content_type"] = rng.choice(_NONTEXT_TYPES)
        elif ctype_roll < spec.p_nontext + spec.p_null_ctype:
            row["content_type"] = None
    return row


def host_pages(spec: CorpusSpec, i: int) -> tuple[list[dict], list[dict]]:
    """All (pages, pages_meta) rows for host i. Pure and order-stable."""
    host = host_name(spec, i)
    n_pages = host_page_count(spec, i)
    pages: list[dict] = []
    metas: list[dict] = []

    def add(path: str, body: str) -> None:
        url = f"http://{host}{path}"
        text = body
        lang_rng = random.Random(f"{spec.seed}:lang:{url}")
        ts = _WARC_EPOCH + timedelta(
            seconds=random.Random(f"{spec.seed}:ts:{url}").randrange(86400 * 90))
        pages.append({
            "url": url,
            "warc_ts": ts,
            "html": text.encode("utf-8"),
            "text": text,
            "lang": lang_rng.choice(_LANGS),
        })
        metas.append(_meta_for(spec, url, host, path))

    if _has_robots(spec, i):
        add("/robots.txt", _robots_body(spec, i))
    for j in range(n_pages):
        path_rng = random.Random(f"{spec.seed}:path:{i}:{j}")
        path = _page_path(path_rng, j)
        add(path, _page_html(spec, host, i, j, n_pages))
        # A few pages under robots-disallowed prefixes so 2.J matters.
        if j % 11 == 5:
            add(f"/blocked/p{j}.html", _page_html(spec, host, i, j + 100_000,
                                                  n_pages))
    return pages, metas


def seed_rows(spec: CorpusSpec) -> list[dict]:
    """Seed list: root URLs of the first n_seeds hosts (depth 0)."""
    return [
        {"url": f"http://{host_name(spec, i)}/", "depth": 0, "priority": 0}
        for i in range(min(spec.n_seeds, spec.n_hosts))
    ]


# --------------------------------------------------------------------------
# Writers
# --------------------------------------------------------------------------

def build_corpus_local(spec: CorpusSpec, out_dir: str) -> dict:
    """Single-process parquet writer (tiny/test scale)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    all_pages: list[dict] = []
    all_meta: list[dict] = []
    for i in range(spec.n_hosts):
        pages, metas = host_pages(spec, i)
        all_pages.extend(pages)
        all_meta.extend(metas)
    pq.write_table(pa.Table.from_pylist(all_pages),
                   os.path.join(out_dir, "pages.parquet"))
    pq.write_table(pa.Table.from_pylist(all_meta),
                   os.path.join(out_dir, "pages_meta.parquet"))
    pq.write_table(pa.Table.from_pylist(seed_rows(spec)),
                   os.path.join(out_dir, "seeds.parquet"))
    return {"pages": len(all_pages), "hosts": spec.n_hosts,
            "seeds": min(spec.n_seeds, spec.n_hosts)}


def build_corpus_spark(spark, spec: CorpusSpec, out_dir: str,
                       parallelism: int | None = None) -> dict:
    """Distributed corpus build: parallelize host indices, generate each
    slice deterministically on executors (no driver-side materialization —
    this is how the corpus scales to bench size and beyond)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from torspider_spark.schemas import PAGES, PAGES_META

    parallelism = parallelism or spark.sparkContext.defaultParallelism
    hosts_df = spark.range(spec.n_hosts).repartition(parallelism)

    PAGE_COLS = ["url", "warc_ts", "html", "text", "lang"]
    META_COLS = ["url", "status", "content_type", "redirect_location",
                 "error_kind"]
    CHUNK = 2000  # rows per Arrow batch — keeps binary columns well under
    #               Arrow's 2 GB per-array limit even for heavy pages

    def gen_pages(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"].tolist():
                pages, _ = host_pages(spec, int(i))
                rows.extend(pages)
                while len(rows) >= CHUNK:
                    yield pd.DataFrame(rows[:CHUNK], columns=PAGE_COLS)
                    rows = rows[CHUNK:]
            if rows:
                yield pd.DataFrame(rows, columns=PAGE_COLS)

    def gen_meta(iterator):
        for pdf in iterator:
            rows = []
            for i in pdf["id"].tolist():
                _, metas = host_pages(spec, int(i))
                rows.extend(metas)
                while len(rows) >= CHUNK:
                    yield pd.DataFrame(rows[:CHUNK], columns=META_COLS)
                    rows = rows[CHUNK:]
            if rows:
                yield pd.DataFrame(rows, columns=META_COLS)

    pages_df = hosts_df.mapInPandas(gen_pages, schema=PAGES)
    meta_df = (hosts_df.mapInPandas(gen_meta, schema=PAGES_META)
               .withColumn("status", F.col("status").cast("int")))
    # Hot hosts concentrate 50x-80x pages into their generator partition;
    # rebalance BY ROW before writing so no data file becomes a straggler
    # for every downstream scan (row set unchanged — layout only).
    n_files = max(2 * parallelism, 64)
    # Corpus stays snappy regardless of the session codec: it is re-read
    # (and re-decompressed) every epoch in the same stage that feeds the
    # Python extraction workers — cheap decompression keeps the JVM from
    # starving them.
    (pages_df.repartition(n_files, "url").write.mode("overwrite")
     .option("compression", "snappy")
     .parquet(os.path.join(out_dir, "pages.parquet")))
    (meta_df.repartition(n_files, "url").write.mode("overwrite")
     .option("compression", "snappy")
     .parquet(os.path.join(out_dir, "pages_meta.parquet")))
    seeds = spark.createDataFrame(seed_rows(spec))
    seeds.write.mode("overwrite").parquet(os.path.join(out_dir, "seeds.parquet"))
    n_pages = spark.read.parquet(os.path.join(out_dir, "pages.parquet")).count()
    return {"pages": n_pages, "hosts": spec.n_hosts,
            "seeds": min(spec.n_seeds, spec.n_hosts)}
