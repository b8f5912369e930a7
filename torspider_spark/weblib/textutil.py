"""Small scalar/list helpers mirrored from the reference's utility module."""

from __future__ import annotations


def content_type_class(content_type: str | None) -> str | None:
    """Media-type main class: the part before '/'.

    Parity: ``get_type`` (/root/reference/libs/functions.py:87-92) reads
    ``headers['Content-Type'].split('/')[0]`` and returns None on any
    failure (missing header). Here the header is already a column value.
    """
    try:
        return content_type.split("/")[0]  # type: ignore[union-attr]
    except Exception:
        return None


def common_tokens(first: list, second: list) -> list:
    """Items of ``first`` (order and duplicates preserved) that also occur in
    ``second`` (parity: extract_exact, functions.py:120-122)."""
    pool = set(second)
    return [item for item in first if item in pool]


def without_items(items: list, scan_list: list) -> list:
    """Items of ``items`` not present in ``scan_list`` (parity: prune_exact,
    functions.py:125-128)."""
    pool = set(scan_list)
    return [item for item in items if item not in pool]


def merge_titles(title1: str, title2: str) -> str:
    """Whitespace-token intersection of two titles, order and duplicates of
    ``title1`` preserved (parity: merge_titles, functions.py:17-24).

    NOT ``F.array_intersect`` on the Spark side — that dedups; the reference
    keeps duplicates from title1.
    """
    return " ".join(common_tokens(title1.split(), title2.split()))


def distinct_sorted(items: list[str]) -> list[str]:
    """Deterministic unique: the reference's ``unique`` is ``list(set(x))``
    (functions.py:131-133) whose order is hash-seed dependent; the engine
    pins sorted order (set-equal, order-canonical)."""
    return sorted(set(items))
