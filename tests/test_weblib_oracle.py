"""Byte-equality of the weblib exactness core vs the reference implementation.

The reference modules are imported in place from /root/reference (see
tests/oracle/__init__.py). Every assertion here is value-level equality on
the same inputs — SURVEY.md §5 layer 1.
"""

from __future__ import annotations

import json
import random

import pytest

from tests.oracle import ref_functions, ref_parsers
from tests.oracle.cases import (
    CANON_PAGE_URLS,
    FANOUT_CASES,
    HTML_CASES,
    MERGE_CASES,
    PAGE_URL,
)
from torspider_spark import weblib

HTML_IDS = sorted(HTML_CASES)


@pytest.mark.parametrize("case", HTML_IDS)
def test_title_matches_reference(case):
    html = HTML_CASES[case]
    assert weblib.title_of(html) == ref_parsers.get_title(html)


@pytest.mark.parametrize("case", HTML_IDS)
def test_hrefs_match_reference(case):
    html = HTML_CASES[case]
    ref = ref_parsers.ParseLinks()
    ref.feed(html)
    assert weblib.hrefs_of(html) == ref.output_list


@pytest.mark.parametrize("case", HTML_IDS)
def test_links_match_reference_as_set(case):
    html = HTML_CASES[case]
    ours = weblib.extract_links(weblib.hrefs_of(html), PAGE_URL)
    ref = ref_parsers.get_links(html, PAGE_URL)
    assert set(ours) == set(ref)
    assert ours == sorted(set(ours)), "engine ordering must be canonical"


@pytest.mark.parametrize("case", HTML_IDS)
def test_forms_match_reference_json(case):
    html = HTML_CASES[case]
    if case == "dangling_textarea_close":
        # </textarea> before any <textarea>: reference swallows via
        # AttributeError (parsers.py:170-177); ours must too.
        pass
    ref = [dict(form) for form in ref_parsers.get_forms(html)]
    ours = weblib.forms_of(html)
    assert json.dumps(ours) == json.dumps(ref)


@pytest.mark.parametrize("loc,base", MERGE_CASES)
def test_merge_urls_byte_identical(loc, base):
    assert weblib.resolve_redirect(loc, base) == ref_functions.merge_urls(loc, base)


@pytest.mark.parametrize("url", FANOUT_CASES)
def test_scheme_fanout_matches_reference_branch(url):
    # Mirror of the InvalidSchema handler (TorSpider.py:341-353).
    from urllib.parse import urlsplit, urlunsplit

    (s, n, p, q, f) = urlsplit(url)
    expected = []
    for scheme in ["http", "https"]:
        s = scheme
        new_url = urlunsplit((s, n, p, q, f))
        if ".onion" in new_url and ".onion." not in new_url:
            expected.append(new_url)
    assert weblib.scheme_fanout(url) == expected


def test_sha1_matches_reference():
    for payload in [b"", b"hello", "unicode ☃".encode(), b"\x00\xff" * 999]:
        assert weblib.sha1_hex(payload) == ref_functions.get_hash(payload)


def test_content_type_class_matches_get_type():
    for ct in ["text/html", "text/plain; charset=utf-8", "image/png",
               "application/octet-stream", "weird", ""]:
        assert weblib.content_type_class(ct) == ref_functions.get_type(
            {"Content-Type": ct})
    assert weblib.content_type_class(None) == ref_functions.get_type({})


def test_list_ops_match_reference():
    a = ["x", "y", "x", "z", "w"]
    b = ["z", "x", "q"]
    assert weblib.common_tokens(a, b) == ref_functions.extract_exact(a, b)
    assert weblib.without_items(a, b) == ref_functions.prune_exact(a, b)
    assert weblib.merge_titles("one two one three", "one three four") == \
        ref_functions.merge_titles("one two one three", "one three four")


def test_unique_set_equivalence():
    items = ["b", "a", "b", "c", "a"]
    assert set(weblib.distinct_sorted(items)) == set(ref_functions.unique(items))
    assert weblib.distinct_sorted(items) == ["a", "b", "c"]


def test_canonicalizer_href_grid():
    """Cross product of adversarial hrefs x page urls vs reference get_links."""
    hrefs = [
        "./a.html", "../a.html", "/a.html", "a.html", "",
        "http://short.onion/x", "dir/./mid.html", "././doubled.html",
        "..//odd.html", "#frag", "?q=1", "//host.onion/proto-rel",
        "http://x.onion.y/gateway", "sub.onion/promoted/path",
        "sub.onion", "http://clearnet.example.com/x",
        "/path/with.onion.inside/x", "JAVASCRIPT:void(0)",
    ]
    for page_url in CANON_PAGE_URLS:
        html = "".join(f'<a href="{h}">t</a>' for h in hrefs)
        ours = weblib.extract_links(hrefs, page_url)
        ref = ref_parsers.get_links(html, page_url)
        assert set(ours) == set(ref), f"page_url={page_url}"


def _random_html(rng: random.Random) -> str:
    """Seeded fuzz HTML touching every machine."""
    bits = []
    tags = ["a", "form", "input", "select", "option", "textarea", "title",
            "div", "p", "b"]
    types = ["text", "password", "checkbox", "radio", "date", "number",
             "submit", "hidden", None, "range", "week", "email"]
    hrefs = ["./x", "../y", "/z", "w", None, "http://abcdef.onion/p",
             "site.onion/q", "", "#f", "http://ex.com/c", "a/./b"]
    for _ in range(rng.randint(1, 60)):
        tag = rng.choice(tags)
        if tag == "a":
            href = rng.choice(hrefs)
            bits.append(f'<a href="{href}">t</a>' if href is not None else "<a>t</a>")
        elif tag == "input":
            t = rng.choice(types)
            nm = rng.choice(["n1", "n2", None])
            parts = ["<input"]
            if t is not None:
                parts.append(f' type="{t}"')
            if nm is not None:
                parts.append(f' name="{nm}"')
            if rng.random() < 0.5:
                parts.append(f' value="v{rng.randint(0, 9)}"')
            parts.append(">")
            bits.append("".join(parts))
        elif tag == "form":
            bits.append(f'<form action="/f{rng.randint(0, 5)}" method="get">')
            if rng.random() < 0.8:
                bits.append("</form>")
        elif tag == "select":
            bits.append(f'<select name="s{rng.randint(0, 3)}">')
            for _ in range(rng.randint(0, 3)):
                bits.append(f'<option value="o{rng.randint(0, 9)}">x</option>')
            bits.append("</select>")
        elif tag == "option":
            bits.append(f'<option value="stray{rng.randint(0, 9)}">x</option>')
        elif tag == "textarea":
            bits.append(f'<textarea name="ta{rng.randint(0, 3)}"> body {rng.randint(0, 99)} </textarea>')
        elif tag == "title":
            bits.append(f"<title>T{rng.randint(0, 99)} &amp; more</title>")
        else:
            bits.append(f"<{tag}>text {rng.randint(0, 99)}</{tag}>")
    return "".join(bits)


def test_fuzz_parity_seeded():
    rng = random.Random(42)
    for i in range(200):
        html = _random_html(rng)
        assert weblib.title_of(html) == ref_parsers.get_title(html), i
        ref_links = ref_parsers.get_links(html, PAGE_URL)
        ours = weblib.extract_links(weblib.hrefs_of(html), PAGE_URL)
        assert set(ours) == set(ref_links), i
        ref_forms = [dict(f) for f in ref_parsers.get_forms(html)]
        assert json.dumps(weblib.forms_of(html)) == json.dumps(ref_forms), i


def test_fuzz_merge_urls_seeded():
    rng = random.Random(7)
    schemes = ["http://", "https://", ""]
    hostpool = ["abcd1234.onion", "www.example.com", "x.onion.gw"]
    paths = ["", "/", "/a", "/a/", "/a/b.html", "/a/b/c"]
    rels = ["x.html", "./x.html", "../x.html", "../../x", "/abs", "",
            "?q=1", "#f", "..", ".", "a/b", "../a/../b"]
    for i in range(300):
        base = rng.choice(schemes) + rng.choice(hostpool) + rng.choice(paths)
        loc = rng.choice(rels + [rng.choice(schemes) + rng.choice(hostpool) + rng.choice(paths)])
        assert weblib.resolve_redirect(loc, base) == \
            ref_functions.merge_urls(loc, base), (i, loc, base)
