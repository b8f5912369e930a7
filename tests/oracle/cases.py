"""Adversarial HTML / URL cases for byte-equality oracle tests.

Pure data, no I/O. Every quirk called out in SURVEY.md §2.C gets at least one
case here (FIXTURES.md §8).
"""

PAGE_URL = "http://aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmmnn.onion/dir/page.html"
PAGE_URL_ROOT = "http://aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmmnn.onion/"
PAGE_URL_NOSLASH = "http://aaaabbbbccccddddeeeeffffgggghhhhiiiijjjjkkkkllllmmmmnn.onion"

OTHER_ONION = "zzzzyyyyxxxxwwwwvvvvuuuuttttssssrrrrqqqqppppoooonnnnmmmmll.onion"

HTML_CASES = {
    "basic": (
        "<html><head><title>Hello World</title></head><body>"
        f'<a href="http://{OTHER_ONION}/x">link</a>'
        '<a href="/local/page.html">local</a></body></html>'
    ),
    "no_title": "<html><body><p>nothing here</p></body></html>",
    "empty_title": "<html><head><title></title></head><body></body></html>",
    "whitespace_title": "<html><head><title>  padded \t </title></head></html>",
    "multiple_titles": (
        "<html><head><title>First</title><title>Second</title></head></html>"
    ),
    "title_nested_tag": "<html><title><b>bold</b>after</title></html>",
    "title_entities": "<html><title>A &amp; B &lt;C&gt;</title></html>",
    "title_then_tag_no_data": "<html><title><meta x='1'>later</title></html>",
    "links_kitchen_sink": (
        "<html><body>"
        '<a href="./relative.html">a</a>'
        '<a href="../up.html">b</a>'
        '<a href="/rooted.html">c</a>'
        '<a href="bare.html">d</a>'
        f'<a href="http://{OTHER_ONION}/abs.html">e</a>'
        '<a href="http://www.example.com/clearnet.html">f</a>'
        f'<a href="http://{OTHER_ONION}.gateway.com/x">g</a>'
        "<a>no href at all</a>"
        '<a href="/rooted.html">duplicate</a>'
        '<a href="/mid/./dotted/path.html">h</a>'
        '<a href="/with?q=1&amp;r=2">i</a>'
        '<a href="/frag.html#section">j</a>'
        f'<a href="{OTHER_ONION}/schemeless/path">k</a>'
        f'<a href="{OTHER_ONION}">l</a>'
        '<a href="http://[bad-ipv6/oops">m</a>'
        '<a href="mailto:admin@example.onion">n</a>'
        '<a href="ftp://fileserver.onion/pub">o</a>'
        '<a href="HTTPS://UPPER.ONION/PATH">p</a>'
        '<a href="">empty href</a>'
        '<a href="#">hash only</a>'
        '<a href="?query=only">query only</a>'
        "</body></html>"
    ),
    "link_dup_attr": '<a href="/first.html" href="/second.html">dup attr</a>',
    "forms_kitchen_sink": (
        "<html><body>"
        '<input type="text" name="preform" value="captured-then-wiped">'
        '<form action="/submit.cgi" method="post" target="_blank">'
        '<input type="text" name="user" value="anon">'
        '<input type="password" name="pw">'
        '<input type="email" name="mail" value="a@b.c">'
        '<input type="search" name="q">'
        '<input type="tel" name="phone">'
        '<input type="url" name="site">'
        '<input type="date" name="d1">'
        '<input type="datetime-local" name="dt1">'
        '<input type="month" name="m1">'
        '<input type="number" name="n1">'
        '<input type="range" name="r1">'
        '<input type="time" name="t1">'
        '<input type="week" name="w1">'
        '<input type="checkbox" name="c1" value="red">'
        '<input type="checkbox" name="c1" value="blue">'
        '<input type="checkbox" name="c2" value="solo">'
        '<input type="radio" name="g1" value="yes">'
        '<input type="radio" name="g1" value="no">'
        '<input type="hidden" name="token" value="sneaky">'
        '<input type="submit" name="go" value="Go">'
        "<input name='typeless' value='x'>"
        '<select name="country"><option value="us">US</option>'
        '<option value="de">DE</option><option>bare</option></select>'
        '<textarea name="bio">  default bio  </textarea>'
        "</form></body></html>"
    ),
    "two_forms": (
        '<form action="/a" method="get"><input type="text" name="x" value="1">'
        '</form><p>between</p><input type="text" name="between" value="lost">'
        '<form action="/b"><input type="text" name="y"></form>'
    ),
    "form_no_attrs": "<form><input type='text' name='only'></form>",
    "unnamed_inputs": (
        "<form action='/u'><input type='text' value='noname'>"
        "<input type='checkbox' value='cb-noname'>"
        "<input type='radio' value='r-noname'>"
        "<select><option value='o1'></option></select>"
        "<textarea>anon area</textarea></form>"
    ),
    "textarea_nested_data": (
        "<form action='/t'><textarea name='multi'>first\nsecond</textarea>"
        "</form>"
    ),
    "dangling_textarea_close": "<form action='/x'></textarea><input type='text' name='a'></form>",
    "select_after_form_close": (
        "<form action='/alias'><input type='text' name='in'></form>"
        "<select name='late'><option value='v'></option></select>"
    ),
    "endform_without_form": "<p>hi</p><input type='text' name='orphan' value='1'></form>",
    "double_endform": "<form action='/d'><input type='text' name='k'></form></form>",
    "empty": "",
    "not_html": "just some plain text, no tags at all",
    "broken_nesting": "<form action='/z'><div><input type='text' name='deep'></form></div>",
}

# (location, base_url) pairs for the redirect resolver.
MERGE_CASES = [
    (f"http://{OTHER_ONION}/new/loc.html", PAGE_URL),
    ("/absolute/target.html", PAGE_URL),
    ("page2.html", PAGE_URL),
    ("./sibling.html", PAGE_URL),
    ("../parent.html", PAGE_URL),
    ("../../grand.html", PAGE_URL),
    ("../../../overflow.html", PAGE_URL),
    ("../../../../way-overflow.html", PAGE_URL),
    ("", PAGE_URL),
    (None, PAGE_URL),
    ("page.html?q=1", PAGE_URL),
    ("page.html#frag", PAGE_URL),
    ("/abs.html?keep=q#dropfrag", PAGE_URL),
    (f"//{OTHER_ONION}/schemeless.html", PAGE_URL),
    ("..", PAGE_URL),
    (".", PAGE_URL),
    ("..nodots/x.html", PAGE_URL),
    (".hidden/x.html", PAGE_URL),
    ("../mix/./x.html", PAGE_URL),
    ("page2.html", PAGE_URL_NOSLASH),
    ("./x.html", PAGE_URL_NOSLASH),
    ("../x.html", PAGE_URL_NOSLASH),
    ("rel.html", PAGE_URL_ROOT),
    ("../rel.html", PAGE_URL_ROOT),
    ("https://secure.example.com/clearnet", PAGE_URL),
    ("?only=query", PAGE_URL),
    ("#onlyfrag", PAGE_URL),
]

# URLs for the http/https fan-out of the invalid-schema branch.
FANOUT_CASES = [
    f"ftp://{OTHER_ONION}/pub/file",
    f"weird-scheme://{OTHER_ONION}/x?q=1#f",
    "ftp://www.example.com/not-onion",
    f"gopher://{OTHER_ONION}.gateway.com/blocked",
    f"ftp://{OTHER_ONION}/a.onion.b",
]

# Raw href lists for direct canonicalizer checks (href, page_url).
CANON_PAGE_URLS = [PAGE_URL, PAGE_URL_ROOT, PAGE_URL_NOSLASH]
