"""Content and URL hashing.

Parity: the reference hashes the *binary* response body with sha1 hexdigest
(/root/reference/libs/functions.py:71-73, used at TorSpider.py:287). On the
Spark side the same value comes from the built-in ``F.sha1(html)`` (JVM-side,
lowercase hex, identical to hashlib) — these pure versions exist for the
simulator and the oracle tests.
"""

from __future__ import annotations

from hashlib import sha1


def sha1_hex(data: bytes) -> str:
    """sha1 hexdigest of a binary page body (functions.py:71-73)."""
    return sha1(data).hexdigest()


def url_sha1(url: str) -> str:
    """Stable URL key: sha1 hexdigest of the utf-8 URL bytes.

    Engine-owned (the reference's frontier keys live server-side). sha1 is
    chosen over xxhash so the same key is computable in Spark (``F.sha1``),
    DuckDB (``sha1``? via hash extension) and plain Python — xxhash64 is used
    only for partitioning/salting, never as an identity.
    """
    return sha1(url.encode("utf-8")).hexdigest()
