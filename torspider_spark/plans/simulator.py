"""Single-threaded reference-semantics crawl simulator.

Implements the same crawl semantics as the Spark engine — the reference's
per-URL control flow (/root/reference/TorSpider.py:105-417) plus the
engine-owned frontier policy — as plain Python over in-memory dicts. It
shares only the pure weblib functions with the engine (those are separately
oracle-verified byte-for-byte against the reference); every scheduling,
dedup, and state decision is re-implemented independently here.

Used by the end-to-end equality tests (SURVEY.md §5): same seed list + same
politeness budget => the Spark engine and this simulator must produce the
same per-epoch crawl ordering, the same final URL-seen set, and the same
scan results.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.robotparser import RobotFileParser

from torspider_spark.config import CrawlConfig
from torspider_spark.functions.taxonomy import (
    ERROR_FAULTS,
    FAULT_CODES,
    GOOD_CODES,
    NO_FAULT_CODES,
    REDIRECT_CODES,
    SILENT_ERRORS,
)
from torspider_spark.weblib import (
    content_type_class,
    extract_links,
    forms_of_json,
    host_of_safe,
    is_onion_url,
    resolve_redirect_safe,
    scan_page,
    scheme_fanout,
    sha1_hex,
    title_of,
    url_sha1,
)


@dataclass
class SimRecord:
    url: str
    url_hash: str
    host: str
    depth: int
    priority: int
    state: str = "pending"
    last_hash: str = ""
    tries: int = 0
    added_epoch: int = 0
    last_scan_epoch: int = -1
    next_eligible_epoch: int = 0


@dataclass
class SimResult:
    url: str
    epoch: int
    fault: str | None = None
    online: bool = False
    title: str | None = None
    hash: str | None = None
    new_urls: list[str] = field(default_factory=list)
    form_dicts: list[str] = field(default_factory=list)
    redirect: str | None = None
    posted: bool = True


class CrawlSimulator:
    def __init__(self, pages: dict[str, tuple[bytes, str]],
                 meta: dict[str, dict], seeds: list[dict], cfg: CrawlConfig):
        self.pages = pages
        self.meta = meta
        self.cfg = cfg
        self.frontier: dict[str, SimRecord] = {}
        for seed in seeds:
            self._insert(seed["url"], seed["depth"], seed["priority"], 0, 0)
        self.results: list[SimResult] = []
        self.candidate_log: dict[int, list[str]] = {}
        self.robots = self._build_robots() if cfg.robots_enabled else {}

    # -- frontier helpers -----------------------------------------------------

    def _insert(self, url: str, depth: int, priority: int, epoch: int,
                next_eligible: int) -> None:
        key = url_sha1(url)
        if key in self.frontier:
            return
        # host_of_safe: a malformed seed URL keys under host '' instead of
        # crashing (same policy as the engine's host_of_udf).
        self.frontier[key] = SimRecord(
            url=url, url_hash=key, host=host_of_safe(url), depth=depth,
            priority=priority, added_epoch=epoch,
            next_eligible_epoch=next_eligible)

    def _build_robots(self) -> dict[str, RobotFileParser]:
        cache = {}
        for url, (_html, text) in self.pages.items():
            if url.endswith("/robots.txt"):
                parser = RobotFileParser()
                parser.parse((text or "").splitlines())
                cache[url.split("/")[2]] = parser
        return cache

    def refresh_corpus(self, pages: dict[str, tuple[bytes, str]],
                       meta: dict[str, dict], epoch: int) -> int:
        """Corpus swap + robots TTL refresh (2.J resurrection analogue).

        Mirrors the engine's policy (plans/crawl.py _revived_view): when the
        robots rules are rebuilt, every robots_blocked record is re-evaluated
        against the new rules and newly-allowed ones return to pending,
        eligible this very epoch. Returns the number resurrected."""
        self.pages = pages
        self.meta = meta
        self.robots = self._build_robots() if self.cfg.robots_enabled else {}
        revived = 0
        for rec in self.frontier.values():
            if rec.state == "robots_blocked" and self._allowed(rec):
                rec.state = "pending"
                rec.next_eligible_epoch = epoch
                revived += 1
        return revived

    def _allowed(self, rec: SimRecord) -> bool:
        parser = self.robots.get(rec.host)
        if parser is None or rec.url.endswith("/robots.txt"):
            return True
        try:
            return parser.can_fetch("*", rec.url)
        except Exception:
            return True

    # -- one URL (the reference's crawl-iteration semantics) ------------------

    def scan_url(self, rec: SimRecord, epoch: int) -> SimResult:
        res = SimResult(url=rec.url, epoch=epoch)
        m = self.meta.get(rec.url)
        error_kind = m["error_kind"] if m is not None else "conn"
        if error_kind is not None:
            if error_kind in SILENT_ERRORS:
                res.posted = False
            elif error_kind == "invalid_schema":
                res.fault = ERROR_FAULTS[error_kind]
                res.new_urls = scheme_fanout(rec.url)
            elif error_kind in ERROR_FAULTS:
                res.fault = ERROR_FAULTS[error_kind]
            # conn / timeout: posted with nothing set
            return res

        status = m["status"]
        if status in REDIRECT_CODES:
            res.fault = str(status)
            loc = m["redirect_location"]
            if loc is not None:
                # _safe: None on unparseable Location/base — the engine's
                # merge_redirect UDF applies the same per-row swallow, so
                # the two sides stay equal on hostile redirects.
                merged = resolve_redirect_safe(loc, rec.url)
                if merged is not None and is_onion_url(merged):
                    res.new_urls = [merged]
                res.redirect = merged
            return res
        if status in FAULT_CODES:
            res.fault = str(status)
            return res
        if status in NO_FAULT_CODES:
            return res
        if status not in GOOD_CODES:
            res.fault = str(status)
            return res

        res.online = True
        ctype = content_type_class(m["content_type"])
        if ctype is not None and ctype != "text":
            res.fault = f"type: {ctype}"
            return res

        if rec.url not in self.pages:
            # Body row absent for a good-status URL: mirror the engine's
            # bodyless anti-join path (online=True, no fault, nothing
            # extracted) — the reference's GET-connection-error shape
            # (TorSpider.py:362-373).
            return res
        html, text = self.pages[rec.url]
        page_hash = sha1_hex(html)
        changed = rec.last_hash != page_hash
        if not changed:
            try:
                res.title = title_of(text)
            except Exception:
                res.title = "Unknown"
            return res
        try:
            hrefs, title, _forms = scan_page(text)
        except Exception:
            res.posted = False  # parse crash: nothing reported
            return res
        res.title = title
        res.hash = page_hash
        links = extract_links(hrefs, rec.url)
        res.new_urls = [u for u in links if is_onion_url(u)]
        res.form_dicts = forms_of_json(text)
        return res

    # -- one epoch -------------------------------------------------------------

    def run_epoch(self, epoch: int) -> dict:
        cfg = self.cfg
        eligible = [
            r for r in self.frontier.values()
            if (r.state == "pending" and r.next_eligible_epoch <= epoch)
            or (cfg.rescan_period_epochs > 0 and r.state == "done"
                and r.last_scan_epoch + cfg.rescan_period_epochs <= epoch)
        ]
        by_host: dict[str, list[SimRecord]] = {}
        for rec in eligible:
            by_host.setdefault(rec.host, []).append(rec)
        candidates: list[SimRecord] = []
        for host in by_host:
            ranked = sorted(by_host[host],
                            key=lambda r: (r.priority, r.depth, r.url_hash))
            candidates.extend(ranked[: cfg.host_budget_per_epoch])
        candidates.sort(key=lambda r: r.url)
        self.candidate_log[epoch] = [r.url for r in candidates]

        discovered: dict[str, int] = {}  # url -> min depth
        n_posted = 0
        for rec in candidates:
            if cfg.robots_enabled and not self._allowed(rec):
                rec.state = "robots_blocked"
                continue
            res = self.scan_url(rec, epoch)
            if res.posted:
                self.results.append(res)
                n_posted += 1
            # E3/F5 state transition (same policy as operators/frontier.py)
            online_eff = res.online and res.posted
            rec.tries = 0 if online_eff else rec.tries + 1
            rec.last_scan_epoch = epoch
            if res.hash is not None:
                rec.last_hash = res.hash
            fault_eff = res.fault if res.posted else None
            if fault_eff is not None:
                rec.state = "fault"
            elif online_eff:
                rec.state = "done"
            elif rec.tries >= cfg.max_tries:
                rec.state = "dead"
            else:
                rec.state = "pending"
                rec.next_eligible_epoch = epoch + cfg.retry_backoff_epochs
            for url in res.new_urls:
                depth = rec.depth + 1
                if depth <= cfg.max_depth:
                    if url not in discovered or depth < discovered[url]:
                        discovered[url] = depth

        inserted = 0
        for url, depth in discovered.items():
            if url_sha1(url) not in self.frontier:
                self._insert(url, depth, depth, epoch, epoch + 1)
                inserted += 1
        return {"epoch": epoch, "candidates": len(candidates),
                "posted": n_posted, "inserted": inserted,
                "empty": len(candidates) == 0}

    def run(self, max_epochs: int) -> list[dict]:
        history = []
        for epoch in range(1, max_epochs + 1):
            stats = self.run_epoch(epoch)
            history.append(stats)
            if stats["empty"]:
                break
        return history

    # -- comparison views -------------------------------------------------------

    def seen_set(self) -> set[str]:
        return {r.url for r in self.frontier.values()}

    def frontier_view(self) -> dict[str, tuple]:
        return {
            r.url: (r.state, r.tries, r.last_hash, r.depth, r.priority)
            for r in self.frontier.values()
        }

    def results_view(self) -> dict[tuple, tuple]:
        return {
            (r.url, r.epoch): (r.fault, r.online, r.title, r.hash,
                               tuple(sorted(r.new_urls)),
                               tuple(r.form_dicts), r.redirect)
            for r in self.results
        }


def simulator_from_corpus_dir(corpus_dir: str,
                              cfg: CrawlConfig) -> CrawlSimulator:
    """Load the generated parquet corpus into plain dicts (test scale)."""
    import os

    import pyarrow.parquet as pq

    pages_tbl = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    meta_tbl = pq.read_table(os.path.join(corpus_dir, "pages_meta.parquet"))
    seeds_tbl = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    pages = {
        r["url"]: (r["html"], r["text"]) for r in pages_tbl.to_pylist()
    }
    meta = {r["url"]: r for r in meta_tbl.to_pylist()}
    return CrawlSimulator(pages, meta, seeds_tbl.to_pylist(), cfg)
