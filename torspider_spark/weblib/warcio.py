"""Minimal WARC 1.0 record codec (ISO 28500, public spec) — pure Python.

Parses the subset a Common-Crawl-style page pipeline needs: ``response``
(and ``resource``) records with an HTTP payload, yielding
(target_uri, warc_date, http_status, content_type, body_bytes). The writer
emits spec-conformant records so the Spark source can be round-trip tested
without external fixtures. Gzip handling: whole-file gzip AND the
Common-Crawl convention of one gzip member per record both decompress
transparently through zlib's multi-member loop.

No code here derives from the reference repo (it has no WARC support);
format details follow the public WARC/HTTP specifications.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from datetime import datetime, timezone

CRLF = b"\r\n"


@dataclass
class WarcPage:
    url: str
    warc_ts: datetime
    status: int
    content_type: str | None
    body: bytes


def gunzip_all(data: bytes) -> bytes:
    """Decompress concatenated gzip members (CC writes one per record);
    plain data passes through."""
    if not data.startswith(b"\x1f\x8b"):
        return data
    out = []
    while data:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
    return b"".join(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(CRLF)[1:]:  # [0] is the version / status line
        if b":" in line:
            name, _, value = line.partition(b":")
            headers[name.strip().decode("latin-1").lower()] = \
                value.strip().decode("latin-1")
    return headers


def iter_warc_records(data: bytes):
    """Yield (warc_headers: dict, payload: bytes) per record."""
    data = gunzip_all(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end]
        if not head.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        headers = _parse_headers(head)
        length = int(headers.get("content-length", "0"))
        payload_start = head_end + 4
        yield headers, data[payload_start:payload_start + length]
        pos = payload_start + length


def _parse_http_payload(payload: bytes) -> tuple[int, str | None, bytes]:
    head_end = payload.find(CRLF + CRLF)
    if head_end < 0 or not payload.startswith(b"HTTP/"):
        return 200, None, payload  # resource record: raw body
    status_line = payload[:payload.find(CRLF)]
    try:
        status = int(status_line.split()[1])
    except (IndexError, ValueError):
        status = 200
    headers = _parse_headers(payload[:head_end])
    return status, headers.get("content-type"), payload[head_end + 4:]


def parse_warc_pages(data: bytes) -> list[WarcPage]:
    """All response/resource records of one WARC file as WarcPage rows."""
    pages = []
    for headers, payload in iter_warc_records(data):
        rtype = headers.get("warc-type", "")
        if rtype not in ("response", "resource"):
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        raw_date = headers.get("warc-date", "1970-01-01T00:00:00Z")
        ts = datetime.fromisoformat(raw_date.replace("Z", "+00:00"))
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        status, ctype, body = (_parse_http_payload(payload)
                               if rtype == "response"
                               else (200, headers.get("content-type"), payload))
        pages.append(WarcPage(url=url, warc_ts=ts, status=status,
                              content_type=ctype, body=body))
    return pages


def write_warc(pages: list[WarcPage], path: str, gzip_members: bool = False,
               record_id_prefix: str = "urn:torspider:warc") -> None:
    """Write response records (HTTP payload) — the round-trip fixture
    writer. With ``gzip_members`` each record is its own gzip member (the
    Common-Crawl layout)."""
    import gzip as _gzip

    chunks = []
    for i, page in enumerate(pages):
        ctype = page.content_type or "text/html"
        http = (f"HTTP/1.1 {page.status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(page.body)}\r\n\r\n"
                ).encode("latin-1") + page.body
        head = (
            f"WARC/1.0\r\n"
            f"WARC-Type: response\r\n"
            f"WARC-Record-ID: <{record_id_prefix}:{i}>\r\n"
            f"WARC-Target-URI: {page.url}\r\n"
            f"WARC-Date: "
            f"{page.warc_ts.astimezone(timezone.utc).strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("latin-1")
        record = head + http + CRLF + CRLF
        chunks.append(_gzip.compress(record) if gzip_members else record)
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))
