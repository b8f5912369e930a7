"""Redirect-location resolution against the page that issued it.

Reproduces the reference's idiosyncratic relative-URL resolver ``merge_urls``
(/root/reference/libs/functions.py:27-68), used on HTTP redirect Location
headers (TorSpider.py:193). It is intentionally NOT ``urllib.parse.urljoin``:
its ``..`` arithmetic over-counts by design (the ``traverse`` counter starts
at -2 for the first ``..`` and the stem slice uses a *trailing-slash*-bearing
prefix), its query always comes from the location and the fragment is always
dropped, and any failure in path arithmetic falls back to the base page's
path verbatim. All of that is part of the URL-seen set and reproduced here,
verified byte-for-byte against the reference in tests.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit


def resolve_redirect(location: str | None, base_url: str) -> str:
    """Resolve a redirect ``location`` relative to ``base_url``.

    Parity map (functions.py line -> behavior):
      28      None location treated as ''
      30-33   scheme/netloc from location when non-empty, else from base
      35-37   root-absolute path taken verbatim
      38-58   dot-relative path: stem = base path up to and including the
              last '/'; leading '.' drops one stem segment; leading '..'
              walks the ``traverse`` counter (-2, then -1 per extra '../')
              and slices the stem by it
      59-62   bare page name: stem = base path up to (excluding) last '/'
      63-64   any exception (empty location path -> IndexError; base path
              without '/' -> ValueError from rindex) -> keep base path
      65-67   query from location, fragment dropped
    """
    loc = "" if location is None else location
    l_scheme, l_netloc, l_path, l_query, _ = urlsplit(loc)
    b_scheme, b_netloc, b_path, _, _ = urlsplit(base_url)

    scheme = l_scheme if l_scheme != "" else b_scheme
    netloc = l_netloc if l_netloc != "" else b_netloc

    try:
        lead = l_path[0]  # IndexError on empty location path -> fallback
        if lead == "/":
            path = l_path
        elif lead == ".":
            # Base-path prefix INCLUDING the trailing slash.
            stem = b_path[: b_path.rindex("/") + 1]
            segments = l_path.split("/")
            rest = "/".join(segments[1:])
            if segments[0] == ".":
                # './x' — drop the stem's empty trailing segment.
                stem = "/".join(stem.split("/")[:-1])
            elif segments[0] == "..":
                climb = -2
                while rest[0:3] == "../":
                    rest = "/".join(rest.split("/")[1:])
                    climb -= 1
                stem = "/".join(stem.split("/")[:climb])
            path = "/".join([stem, rest])
        else:
            # Bare page name: stem EXCLUDES the trailing slash.
            stem = b_path[: b_path.rindex("/")]
            path = "/".join([stem, l_path])
    except Exception:
        path = b_path

    return urlunsplit((scheme, netloc, path, l_query, ""))


def resolve_redirect_safe(location: str | None, base_url: str) -> str | None:
    """Per-row guarded resolve_redirect: None when either URL does not
    parse (stdlib urlsplit raises ValueError on e.g. an unbalanced '['
    — and a redirect Location is SERVER-CONTROLLED bytes). Deliberate
    divergence from the reference, whose merge_urls calls urlsplit
    unguarded (functions.py:29-33) and would crash the worker on the
    same input: in the engine this runs inside the Arrow UDF over the
    redirect slice, where one hostile Location must not fail the task
    (the same policy as scheme_fanout / host_of_safe, r5 verdict #1).
    Consumers already handle None: the engine's new_urls/redirect
    expressions are null-gated, the simulator skips the onion check."""
    try:
        return resolve_redirect(location, base_url)
    except ValueError:
        return None
