"""URL-seen deduplication (E2/D2): exact arbiter + bloom prefilter.

Exactness rule (SURVEY.md §2.D): the URL-seen set must match the reference
run exactly, so a probabilistic structure may only *prefilter* — an exact
anti-join is always the arbiter (a bloom false positive must not drop a URL;
it may only send it through the exact check).

Join shape, chosen for 10^10-row frontiers: a naive
``new.join(frontier, 'url_hash', 'left_anti')`` shuffles the ENTIRE frontier
every epoch. Instead we do broadcast semi-then-anti:

    seen   = frontier ⋈_left_semi broadcast(new_hashes)   -- frontier only
                                                             STREAMS, map-side
    unseen = new      ⋈_left_anti broadcast(seen)

Both broadcasts are bounded by the epoch's discovery batch (<< frontier).
The frontier is never shuffled, never sorted. When an epoch's batch is too
large to broadcast, AQE falls back to a shuffle join on url_hash — on a real
deployment the frontier table is bucketed by url_hash so even that join is
co-located (storage-partitioned join; noted for the Iceberg layout).

The bloom prefilter routes "definitely unseen" URLs around both joins: with
the frontier's keys folded into ``UrlBloom`` (built distributed, merged
bitwise on the driver, broadcast next epoch), only the maybe-seen fraction
(true hits + fpp) pays the semi-join probe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from torspider_spark.config import CrawlConfig


class UrlBloom:
    """Double-hashed bloom over sha1-hex url_hash keys (numpy bitset)."""

    def __init__(self, capacity: int, fpp: float):
        n_bits = int(-capacity * np.log(fpp) / (np.log(2) ** 2))
        self.n_bits = max(1024, (n_bits + 63) // 64 * 64)
        self.k = max(1, int(round((self.n_bits / capacity) * np.log(2))))
        self.words = np.zeros(self.n_bits // 64, dtype=np.uint64)

    @staticmethod
    def _h1_h2(url_hashes: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        # sha1 hex -> two independent 64-bit lanes.
        h1 = np.array([int(h[:16], 16) for h in url_hashes], dtype=np.uint64)
        h2 = np.array([int(h[16:32], 16) | 1 for h in url_hashes],
                      dtype=np.uint64)
        return h1, h2

    def add_series(self, url_hashes: pd.Series) -> None:
        if len(url_hashes) == 0:
            return
        h1, h2 = self._h1_h2(url_hashes)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_series(self, url_hashes: pd.Series) -> np.ndarray:
        if len(url_hashes) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._h1_h2(url_hashes)
        hit = np.ones(len(url_hashes), dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.n_bits)
            word = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            hit &= (word & (np.uint64(1) << (pos & np.uint64(63)))) != 0
        return hit

    def merge(self, other: "UrlBloom") -> None:
        assert other.n_bits == self.n_bits
        np.bitwise_or(self.words, other.words, out=self.words)


def build_bloom(df_with_hash: DataFrame, cfg: CrawlConfig) -> UrlBloom:
    """Distributed bloom build: per-partition bitsets on executors, merged
    bitwise on the driver (a few MB each — a classic partial-aggregate)."""
    capacity, fpp = cfg.bloom_capacity, cfg.bloom_fpp
    n_bits = UrlBloom(capacity, fpp).n_bits

    def partial(iterator):
        bloom = UrlBloom(capacity, fpp)
        for pdf in iterator:
            bloom.add_series(pdf["url_hash"])
        yield pd.DataFrame({"words": [bloom.words.tobytes()]})

    parts = (df_with_hash.select("url_hash")
             .mapInPandas(partial, schema="words binary").collect())
    merged = UrlBloom(capacity, fpp)
    for row in parts:
        other = UrlBloom(capacity, fpp)
        other.words = np.frombuffer(row.words, dtype=np.uint64).copy()
        assert other.n_bits == n_bits
        merged.merge(other)
    return merged


def bloom_maybe_seen_col(spark, bloom: UrlBloom):
    """Column function: True when url_hash is possibly in the bloom."""
    bc = spark.sparkContext.broadcast((bloom.n_bits, bloom.k,
                                       bloom.words.tobytes()))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(url_hash: pd.Series) -> pd.Series:
        n_bits, k, raw = bc.value
        bloom_local = UrlBloom.__new__(UrlBloom)
        bloom_local.n_bits = n_bits
        bloom_local.k = k
        bloom_local.words = np.frombuffer(raw, dtype=np.uint64)
        return pd.Series(bloom_local.contains_series(url_hash))

    return maybe_seen


def unseen_urls(new_urls: DataFrame, frontier: DataFrame,
                spark=None, bloom: UrlBloom | None = None,
                strategy: str = "auto") -> DataFrame:
    """Exact URL-seen check: rows of ``new_urls`` absent from ``frontier``.

    strategy='auto' — one left_anti join; AQE broadcasts the frontier's key
    column while it fits and falls back to a shuffle join beyond that
    (which a bucketed frontier layout co-locates). One job, lowest latency.

    strategy='semi_anti' — the 10^10-frontier shape: broadcast the epoch's
    batch INTO the frontier scan (left_semi), then anti-join against the
    tiny 'seen' set. The frontier is never shuffled and never broadcast,
    at the cost of two broadcast barriers — wins only when the frontier
    key column is too big to broadcast.

    ``new_urls`` should be persisted by the caller (it is probed twice).
    """
    candidates = new_urls
    definitely_new = None
    if bloom is not None and spark is not None:
        flag = bloom_maybe_seen_col(spark, bloom)
        flagged = new_urls.withColumn("_maybe", flag(F.col("url_hash")))
        definitely_new = flagged.filter(~F.col("_maybe")).drop("_maybe")
        candidates = flagged.filter(F.col("_maybe")).drop("_maybe")

    if strategy == "semi_anti":
        seen = frontier.join(
            F.broadcast(candidates.select("url_hash")), "url_hash",
            "left_semi").select("url_hash")
        confirmed_new = candidates.join(F.broadcast(seen), "url_hash",
                                        "left_anti")
    else:
        confirmed_new = candidates.join(frontier.select("url_hash"),
                                        "url_hash", "left_anti")
    if definitely_new is not None:
        return confirmed_new.unionByName(definitely_new)
    return confirmed_new
