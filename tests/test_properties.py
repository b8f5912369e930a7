"""Property-based tests (SURVEY.md §5.3) — hypothesis over the pure core."""

from __future__ import annotations

from hypothesis import example, given, settings
from hypothesis import strategies as st

from tests.oracle import ref_functions, ref_parsers
from torspider_spark import weblib

URL_ALPHABET = "abcdefgz0127./:?#&=%_-~ \t[]@!$'()*+,;"

hrefs = st.text(alphabet=URL_ALPHABET, min_size=0, max_size=80)
onion_hosts = st.sampled_from([
    "aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmmnn.onion",
    "zz.onion", "x.onion.gw", "www.example.com",
])
base_paths = st.sampled_from(["/", "/a/b.html", "/deep/er/page", ""])


@settings(max_examples=300, deadline=None)
@given(href=hrefs, host=onion_hosts, path=base_paths)
def test_canonicalizer_idempotent(href, host, path):
    base_url = f"http://{host}{path}"
    base_netloc = weblib.host_of(base_url)
    once = weblib.canonicalize_href(href, base_netloc)
    if once is not None:
        assert weblib.canonicalize_href(once, base_netloc) == once


@settings(max_examples=300, deadline=None)
@given(href=hrefs, host=onion_hosts, path=base_paths)
def test_canonicalizer_matches_reference_loop(href, host, path):
    """Every random href agrees with the reference get_links body."""
    base_url = f"http://{host}{path}"
    html = f'<a href="{href.replace(chr(34), "")}">x</a>'
    ref = ref_parsers.get_links(html, base_url)
    ours = weblib.extract_links(weblib.hrefs_of(html), base_url)
    assert set(ours) == set(ref)


@settings(max_examples=300, deadline=None)
@given(loc=st.one_of(st.none(), hrefs), host=onion_hosts, path=base_paths)
@example(loc="//[", host="zz.onion", path="/a/b.html").via("r6 review")
def test_merge_matches_reference(loc, host, path):
    """Byte-parity with the reference — INCLUDING parity in raising: on
    a Location urlsplit cannot parse, merge_urls raises ValueError and so
    must the raw resolve_redirect (the guarded production entry is
    resolve_redirect_safe, tested below)."""
    base_url = f"http://{host}{path}"
    try:
        want = ref_functions.merge_urls(loc, base_url)
    except ValueError:
        try:
            weblib.resolve_redirect(loc, base_url)
            raise AssertionError("reference raised, ours did not")
        except ValueError:
            assert weblib.resolve_redirect_safe(loc, base_url) is None
            return
    assert weblib.resolve_redirect(loc, base_url) == want
    assert weblib.resolve_redirect_safe(loc, base_url) == want


@settings(max_examples=300, deadline=None)
@given(loc=st.one_of(st.none(), hrefs), base=hrefs)
@example(loc="//[", base="http://x.onion/a").via("r6 review")
@example(loc="http://a.onion/x", base="//[").via("r6 review")
def test_resolve_redirect_safe_never_raises(loc, base):
    """The production redirect path (merge_redirect Arrow UDF + the
    simulator) must survive ANY location/base bytes — a hostile
    server-controlled Location header cannot kill a task."""
    out = weblib.resolve_redirect_safe(loc, base)
    assert out is None or isinstance(out, str)


@settings(max_examples=200, deadline=None)
@given(items=st.lists(st.text(max_size=8), max_size=30))
def test_distinct_sorted_is_set_equal_and_stable(items):
    out = weblib.distinct_sorted(items)
    assert set(out) == set(items)
    assert out == sorted(set(items))


@settings(max_examples=200, deadline=None)
@given(url=hrefs)
@example(url="//[").via("discovered failure")
def test_scheme_fanout_always_onion(url):
    for candidate in weblib.scheme_fanout(url):
        assert weblib.is_onion_url(candidate)
        assert candidate.startswith(("http://", "https://"))


def test_scheme_fanout_malformed_url_yields_empty():
    """Pinned r5 hypothesis counterexample: urlsplit('//[') raises
    ValueError (Invalid IPv6 URL). scheme_fanout must swallow it and
    return [] — one malformed frontier URL must not kill the Arrow UDF
    task (deliberate divergence from the reference's unguarded handler,
    TorSpider.py:344)."""
    assert weblib.scheme_fanout("//[") == []
    assert weblib.scheme_fanout("http://[::1x/.onion") == []
    # well-formed input still fans out both schemes
    assert weblib.scheme_fanout("ftp://zz.onion/a?b#c") == [
        "http://zz.onion/a?b#c", "https://zz.onion/a?b#c"]
