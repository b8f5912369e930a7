"""URL canonicalization — the exactness core of the URL-seen set.

Reproduces the link-canonicalization pipeline of the reference's
``get_links`` loop body (/root/reference/libs/parsers.py:214-257) and the
crawl-loop onion predicates (/root/reference/TorSpider.py:194-196,312-314,
341-353). The quirks are load-bearing and reproduced bugs-and-all:

* the ``'./'`` strip is a *substring* replace applied repeatedly anywhere in
  the URL (also mid-URL, also inside ``'../'`` which degrades to ``'..'`` ->
  ``'.'`` remnants) — parsers.py:227-228;
* a schemeless host-only link like ``abc…onion/x`` is mis-split by
  ``urlsplit`` into a path, and the first path segment is promoted to the
  netloc — parsers.py:235-241;
* the parser-side onion gate tests the **netloc only** (parsers.py:245-248),
  while the crawl-loop gate re-tests the **whole URL string**
  (TorSpider.py:312-314) — both predicates exist here, distinctly.

Determinism note: the reference dedups per page with ``list(set(...))``
(libs/functions.py:131-133) whose order is hash-seed dependent; we return a
*sorted* unique list. Result equality with the reference is set-level, which
the oracle tests assert.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit


def host_of(url: str) -> str:
    """Netloc of a URL (reference: ``urlsplit(url)[1]``, parsers.py:220)."""
    return urlsplit(url)[1]


def host_of_safe(url: str) -> str:
    """Netloc of a URL, or ``''`` when ``urlsplit`` rejects it.

    Frontier keying must tolerate malformed seed/discovered URLs (e.g.
    ``'//['`` -> ValueError: Invalid IPv6 URL): one bad URL may not crash
    an Arrow UDF task or the simulator. Malformed URLs group under the
    empty host for politeness budgeting — identically in the engine
    (functions/udfs.py host_of_udf) and the simulator — then fail their
    fetch join and age out through the retry/dead path.
    """
    try:
        return urlsplit(url)[1]
    except ValueError:
        return ""


def is_onion_url(url: str) -> bool:
    """Whole-string onion gate used on candidate new_urls.

    Parity: ``'.onion' in u and '.onion.' not in u`` applied to the FULL url
    string (TorSpider.py:194-196,312-314,348-350). Note this can reject a URL
    whose netloc is a valid onion but whose path contains ``'.onion.'``.
    """
    return ".onion" in url and ".onion." not in url


def _netloc_is_onion(netloc: str) -> bool:
    # Parser-side gate: netloc only (parsers.py:245-248).
    return ".onion" in netloc and ".onion." not in netloc


def canonicalize_href(href: str | None, base_netloc: str) -> str | None:
    """Canonicalize one extracted href against the page's netloc.

    Returns the canonical absolute URL, or None when the link must be
    dropped (empty href, non-onion target, onion-gateway netloc, or any
    parse error — the reference swallows all exceptions per link,
    parsers.py:251-252).
    """
    if href is None:
        return None
    try:
        link = href
        # Substring-level current-directory strip, applied to fixpoint
        # (parsers.py:227-228). Intentionally NOT path-aware.
        while "./" in link:
            link = link.replace("./", "")
        scheme, netloc, path, query, _frag = urlsplit(link)
        if scheme == "":
            scheme = "http"
        if path == "":
            path = "/"
        if netloc == "" and ".onion" in path.split("/")[0]:
            # urlsplit read a bare domain as the head of the path; promote it
            # (parsers.py:235-241).
            segments = path.split("/")
            netloc = segments[0]
            path = "/".join(segments[1:])
        if netloc == "":
            netloc = base_netloc
        if not _netloc_is_onion(netloc):
            return None
        return urlunsplit((scheme, netloc, path, query, ""))
    except Exception:
        return None


def extract_links(hrefs: list[str | None], page_url: str) -> list[str]:
    """Canonicalize + dedup a page's raw hrefs.

    Parity with get_links' post-parse loop (parsers.py:219-257): None hrefs
    skipped, per-link exceptions swallowed, unique output. Ordering is made
    deterministic by sorting (see module docstring).
    """
    base = host_of(page_url)
    seen: set[str] = set()
    for href in hrefs:
        canon = canonicalize_href(href, base)
        if canon is not None:
            seen.add(canon)
    return sorted(seen)


def scheme_fanout(url: str) -> list[str]:
    """http/https re-emission for an unfetchable scheme.

    Parity: the InvalidSchema handler (TorSpider.py:341-353) re-splits the
    URL and appends both scheme variants that pass the whole-string onion
    gate, in http-then-https order.

    Deliberate divergence: malformed URLs that ``urlsplit`` rejects (e.g.
    ``'//['`` -> ValueError: Invalid IPv6 URL) yield ``[]`` instead of
    raising. The reference's handler is unguarded (TorSpider.py:344 would
    crash the worker); here the function runs per-row inside an Arrow UDF,
    so one bad frontier URL must not fail the task. This mirrors
    :func:`canonicalize_href`'s per-link exception swallow.
    """
    try:
        _s, netloc, path, query, frag = urlsplit(url)
    except ValueError:
        return []
    out: list[str] = []
    for scheme in ("http", "https"):
        candidate = urlunsplit((scheme, netloc, path, query, frag))
        if is_onion_url(candidate):
            out.append(candidate)
    return out
