"""Expected-output parquet for the crawl oracle queries.

The driver's correctness gate runs each `queries()` entry on Spark and its
`oracle_sql()` text on DuckDB. The crawl-engine queries are not expressible
over the TPC-H-ish input tables, so their oracle is generated here from two
INDEPENDENT implementations:

  * the single-threaded `CrawlSimulator` (plans/simulator.py) — a separate
    realization of the crawl semantics over plain dicts (no Spark, no
    DataFrames), already equality-tested against the engine;
  * a pure-Python minhash/LSH reference built on `weblib.xxh64` — a
    from-spec XXH64 reimplementation verified against `F.xxhash64`.

`write_expected` materializes their outputs as parquet; `oracle_sql()`
points DuckDB at those files, so rows/schema/value-hash checks are real and
non-circular (the engine never touches these files).
"""

from __future__ import annotations

import os
import re
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from torspider_spark.config import CrawlConfig
from torspider_spark.plans.simulator import simulator_from_corpus_dir
from torspider_spark.weblib import host_of
from torspider_spark.weblib.xxh64 import I32, spark_xxhash64

SENTINEL = "1900-01-01"


def _write(out_dir: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), os.path.join(out_dir, name))


def _sim_stats(sim) -> dict[str, float]:
    """Independent re-statement of plans/stats.gather_stats over the
    simulator's dict state (SpiderStats.py:65-170 semantics)."""
    recs = list(sim.frontier.values())
    total_urls = len(recs)
    scanned = sum(1 for r in recs if r.last_scan_epoch >= 0)

    host_alive: dict[str, bool] = defaultdict(bool)
    for r in recs:
        host_alive[r.host] |= r.state not in ("dead", "fault")
    host_last_online: dict[str, int] = {}
    for res in sim.results:
        if res.online:
            h = host_of(res.url)
            host_last_online[h] = max(host_last_online.get(h, -1), res.epoch)

    active = {h for h, alive in host_alive.items()
              if alive and h in host_last_online}
    remaining = {h for h, alive in host_alive.items()
                 if alive and h not in host_last_online}
    live_urls = sum(1 for r in recs if r.host in active)
    return {
        "total_urls": float(total_urls),
        "scanned_urls": float(scanned),
        "scan_percentage": scanned / total_urls if total_urls else 0.0,
        "active_onions": float(len(active)),
        "remaining_onions": float(len(remaining)),
        "total_onions": float(len(host_alive)),
        "live_urls": float(live_urls),
        "total_pages": float(sum(1 for r in sim.results if r.hash is not None)),
        "total_forms": float(sum(len(r.form_dicts) for r in sim.results)),
        "total_links": float(sum(len(r.new_urls) for r in sim.results)),
    }


def _minhash_pairs(corpus_dir: str, num_hashes: int = 16,
                   bands: int = 4, shingle_n: int = 3) -> set:
    """Pure-Python reference of minhash_signatures + lsh_candidate_pairs
    over the corpus pages (doc_id = xxhash64(url)): the candidate-pair
    SET (a < b)."""
    pages = pq.read_table(os.path.join(corpus_dir, "pages.parquet"),
                          columns=["url", "text"]).to_pylist()
    rows_per_band = num_hashes // bands
    buckets: dict[tuple[int, int], set[int]] = defaultdict(set)
    for row in pages:
        doc_id = spark_xxhash64(row["url"])
        words = re.split(r"\s+", (row["text"] or "").strip())
        count = max(len(words) - (shingle_n - 1), 1)
        shingles = [" ".join(words[i:i + shingle_n]) for i in range(count)]
        sig = [
            min(spark_xxhash64(I32(i), s) for s in shingles)
            for i in range(num_hashes)
        ]
        for b in range(bands):
            band_hash = spark_xxhash64(
                *sig[b * rows_per_band:(b + 1) * rows_per_band])
            buckets[(b, band_hash)].add(doc_id)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ordered = sorted(members)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1:]:
                pairs.add((a, b))
    return pairs


def _minhash_pair_count(corpus_dir: str, num_hashes: int = 16,
                        bands: int = 4, shingle_n: int = 3) -> int:
    return len(_minhash_pairs(corpus_dir, num_hashes, bands, shingle_n))


def _minhash_clusters_reference(corpus_dir: str) -> list[tuple]:
    """Independent resolution of the minhash candidate-pair graph into
    duplicate clusters via union-find (vs the engine's large-star/
    small-star contraction): sorted (doc_id, cluster_id, cluster_size,
    is_keeper) rows, cluster_id = min doc_id reachable."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _minhash_pairs(corpus_dir):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {n: find(n) for n in parent}
    sizes = defaultdict(int)
    for root in comp.values():
        sizes[root] += 1
    return sorted((n, root, sizes[root], n == root)
                  for n, root in comp.items())


def _simhash_pairs_reference(corpus_dir: str,
                             max_hamming: int = 16) -> list[tuple]:
    """Pure-Python reference of operators/textdedup.simhash64 +
    simhash_near_duplicates over the corpus pages (doc_id =
    xxhash64(url)): whitespace tokens vote +/-1 per bit of their
    xxhash64, candidate pairs share one of the four 16-bit chunks, exact
    Hamming filter last. Signed 64-bit semantics mirror Spark's LongType
    (bit 63 via arithmetic shifts; chunk extraction masks low bits)."""
    pages = pq.read_table(os.path.join(corpus_dir, "pages.parquet"),
                          columns=["url", "text"]).to_pylist()
    mask64 = (1 << 64) - 1
    sims: dict[int, int] = {}
    for row in pages:
        doc_id = spark_xxhash64(row["url"])
        toks = re.split(r"\s+", (row["text"] or "").strip())
        votes = [0] * 64
        for tok in toks:
            h = spark_xxhash64(tok)
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sh = sum(1 << i for i in range(64) if votes[i] > 0)
        if sh >= 1 << 63:
            sh -= 1 << 64               # Spark LongType wrap
        sims[doc_id] = sh
    buckets: dict[tuple[int, int], set[int]] = defaultdict(set)
    for doc_id, sh in sims.items():
        for c in range(4):
            buckets[(c, (sh >> (c * 16)) & 0xFFFF)].add(doc_id)
    pairs: set[tuple[int, int]] = set()
    for members in buckets.values():
        ordered = sorted(members)
        for i, a in enumerate(ordered):
            for b in ordered[i + 1:]:
                pairs.add((a, b))
    out = []
    for a, b in sorted(pairs):
        ham = bin((sims[a] ^ sims[b]) & mask64).count("1")
        if ham <= max_hamming:
            out.append((a, b, ham))
    return out


def _host_rank_reference(links: list[tuple[str, int, str]],
                         iterations: int = 5,
                         damping: float = 0.85) -> dict[str, float]:
    """Dict-based PageRank over host edges — the independent reference for
    operators/hostrank.host_rank (same simplified formulation:
    rank' = (1-d) + d * weighted inflow; no normalization either side)."""
    def host(u: str) -> str:
        return u.split("/")[2]

    weights: dict[tuple[str, str], int] = defaultdict(int)
    for src, _epoch, dst in links:
        a, b = host(src), host(dst)
        if a != b:
            weights[(a, b)] += 1
    hosts = {a for a, _ in weights} | {b for _, b in weights}
    out_w: dict[str, int] = defaultdict(int)
    for (a, _b), wt in weights.items():
        out_w[a] += wt
    rank = {h: 1.0 for h in hosts}
    for _ in range(iterations):
        inflow: dict[str, float] = defaultdict(float)
        for (a, b), wt in weights.items():
            inflow[b] += rank[a] * wt / out_w[a]
        rank = {h: (1.0 - damping) + damping * inflow.get(h, 0.0)
                for h in hosts}
    return rank


def _consolidated_titles(results) -> dict[str, str]:
    """Per-host merge_titles fold in (epoch, url) order — the independent
    reference for plans/stats.consolidated_titles. Uses weblib.merge_titles
    (a pure function separately byte-verified against the reference's
    libs/functions.py:17-24); the fold/ordering/empty-intersection policy
    is restated here, not shared."""
    from torspider_spark.weblib.textutil import merge_titles

    by_host: dict[str, list[tuple[int, str, str]]] = defaultdict(list)
    for r in results:
        if r.title:
            by_host[host_of(r.url)].append((r.epoch, r.url, r.title))
    out: dict[str, str] = {}
    for host, obs in by_host.items():
        title = None
        for _e, _u, t in sorted(obs):
            if title is None:
                title = t
            else:
                merged = merge_titles(title, t)
                title = merged if merged else title
        out[host] = title
    return out


def write_expected(corpus_dir: str, out_dir: str,
                   cfg: CrawlConfig | None = None, epochs: int = 2) -> str:
    """Run the simulator + minhash reference and write the expected tables.
    Idempotent: skips when the marker file for this epoch count exists."""
    cfg = cfg or CrawlConfig(bloom_min_frontier=0)
    # marker is versioned: bump when the expected-table set changes so
    # stale caches from earlier builds regenerate.
    marker = os.path.join(out_dir, f"_done_e{epochs}_v5")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    sim = simulator_from_corpus_dir(corpus_dir, cfg)
    sim.run(max_epochs=epochs)

    recs = list(sim.frontier.values())
    _write(out_dir, "frontier_sim.parquet", {
        "url": [r.url for r in recs],
        "host": [r.host for r in recs],
        "depth": pa.array([r.depth for r in recs], pa.int32()),
        "state": [r.state for r in recs],
        "added_epoch": pa.array([r.added_epoch for r in recs], pa.int32()),
        "last_scan_epoch": pa.array([r.last_scan_epoch for r in recs],
                                    pa.int32()),
    })
    _write(out_dir, "results_sim.parquet", {
        "url": [r.url for r in sim.results],
        "epoch": pa.array([r.epoch for r in sim.results], pa.int32()),
        "fault": [r.fault for r in sim.results],
        "online": [r.online for r in sim.results],
        "hash": [r.hash for r in sim.results],
    })
    links = [(r.url, r.epoch, dst) for r in sim.results for dst in r.new_urls]
    _write(out_dir, "links_sim.parquet", {
        "src": [x[0] for x in links],
        "epoch": pa.array([x[1] for x in links], pa.int32()),
        "dst": [x[2] for x in links],
    })
    # Persisted-backend-table references (VERDICT r2 #5): the engine
    # commits urls/onions/links/forms/pages to the warehouse; these are the
    # simulator's independent statements of the same tables.
    _write(out_dir, "urls_sim.parquet", {
        "url": [r.url for r in recs],
        "host": [r.host for r in recs],
        "state": [r.state for r in recs],
        "depth": pa.array([r.depth for r in recs], pa.int32()),
        "date": [str(r.last_scan_epoch) if r.last_scan_epoch >= 0
                 else SENTINEL for r in recs],
    })
    host_alive: dict[str, bool] = defaultdict(bool)
    for r in recs:
        host_alive[r.host] |= r.state not in ("dead", "fault")
    last_online: dict[str, int] = {}
    for res in sim.results:
        if res.online:
            h = host_of(res.url)
            last_online[h] = max(last_online.get(h, -1), res.epoch)
    titles = _consolidated_titles(sim.results)
    hosts = sorted(host_alive)
    _write(out_dir, "onions_sim.parquet", {
        "host": hosts,
        "last_online": [str(last_online[h]) if h in last_online else SENTINEL
                        for h in hosts],
        "online": [host_alive[h] for h in hosts],
        "title": [titles.get(h) or "" for h in hosts],
    })
    paged = [r for r in sim.results if r.hash is not None]
    _write(out_dir, "pages_sim.parquet", {
        "url": [r.url for r in paged],
        "host": [host_of(r.url) for r in paged],
        "epoch": pa.array([r.epoch for r in paged], pa.int32()),
        "hash": [r.hash for r in paged],
        "title": [r.title for r in paged],
    })
    formed = [(r.url, r.epoch, fj) for r in sim.results
              for fj in r.form_dicts]
    _write(out_dir, "forms_sim.parquet", {
        "url": [x[0] for x in formed],
        "epoch": pa.array([x[1] for x in formed], pa.int32()),
        "form_json": [x[2] for x in formed],
    })
    stats = _sim_stats(sim)
    _write(out_dir, "stats_sim.parquet", {
        "stat": sorted(stats),
        "value": pa.array([stats[k] for k in sorted(stats)], pa.float64()),
    })
    ranks = _host_rank_reference(links)
    _write(out_dir, "hostrank_sim.parquet", {
        "host": sorted(ranks),
        "rank": pa.array([ranks[h] for h in sorted(ranks)], pa.float64()),
    })
    _write(out_dir, "minhash_sim.parquet", {
        "n_candidate_pairs": pa.array([_minhash_pair_count(corpus_dir)],
                                      pa.int64()),
    })
    clusters = _minhash_clusters_reference(corpus_dir)
    _write(out_dir, "minhash_clusters_sim.parquet", {
        "doc_id": pa.array([c[0] for c in clusters], pa.int64()),
        "cluster_id": pa.array([c[1] for c in clusters], pa.int64()),
        "cluster_size": pa.array([c[2] for c in clusters], pa.int64()),
        "is_keeper": pa.array([c[3] for c in clusters], pa.bool_()),
    })
    sim_pairs = _simhash_pairs_reference(corpus_dir)
    _write(out_dir, "simhash_sim.parquet", {
        "a": pa.array([p[0] for p in sim_pairs], pa.int64()),
        "b": pa.array([p[1] for p in sim_pairs], pa.int64()),
        "hamming": pa.array([p[2] for p in sim_pairs], pa.int32()),
    })
    with open(marker, "w") as fh:
        fh.write("ok")
    return out_dir
