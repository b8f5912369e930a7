"""Pure-Python exactness core — importable without Spark.

Every function here reproduces, value-for-value, the extraction semantics of
the reference crawler's pure functions (see docstrings for file:line parity
citations). They are deliberately dependency-free so the pandas/Arrow UDFs in
``torspider_spark.functions`` can apply them per Arrow batch, and so the test
suite can compare them byte-for-byte against the reference implementation
imported as an oracle.
"""

from torspider_spark.weblib.hashing import sha1_hex, url_sha1
from torspider_spark.weblib.htmlparse import (
    forms_of,
    forms_of_json,
    hrefs_of,
    scan_page,
    title_of,
)
from torspider_spark.weblib.urlmerge import (resolve_redirect,
                                             resolve_redirect_safe)
from torspider_spark.weblib.urlnorm import (
    canonicalize_href,
    extract_links,
    host_of,
    host_of_safe,
    is_onion_url,
    scheme_fanout,
)
from torspider_spark.weblib.textutil import (
    common_tokens,
    content_type_class,
    distinct_sorted,
    merge_titles,
    without_items,
)

__all__ = [
    "sha1_hex",
    "url_sha1",
    "scan_page",
    "title_of",
    "hrefs_of",
    "forms_of",
    "forms_of_json",
    "resolve_redirect",
    "resolve_redirect_safe",
    "canonicalize_href",
    "extract_links",
    "host_of",
    "host_of_safe",
    "is_onion_url",
    "scheme_fanout",
    "content_type_class",
    "merge_titles",
    "common_tokens",
    "without_items",
    "distinct_sorted",
]
