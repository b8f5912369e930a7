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

The bloom prefilter routes "definitely unseen" URLs around both joins: the
frontier's keys live in ``BloomShards`` — per-bucket ``UrlBloom`` bitsets
held as a distributed (bucket, words) DataFrame, built via map-side partial
aggregation, probed via a bucket cogroup, and merged with each epoch's
inserts by per-bucket bitwise OR. No bitset ever lands on the driver, and
each executor task holds one shard (total_bits / n_shards), so the
structure reaches the 10^10-key design point. Only the maybe-seen fraction
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


class BloomShards:
    """Distributed URL-seen bloom: one `UrlBloom` shard per hash bucket,
    held as a (bucket int, words binary) DataFrame — never on the driver.

    SURVEY §2.D's design point is ~10^10 keys: a single bitset is ~9 GB,
    so neither a driver merge nor a broadcast can carry it. Sharding by
    bucket = pmod(xxhash64(url_hash), n_shards) keeps every piece
    executor-sized (total_bits / n_shards) and co-locates probe rows with
    their shard:

      build  — groupBy(bucket) + applyInPandas partial bitset (map-side
               combine; each task materializes ONE shard of
               capacity/n_shards, not a full-size bitset);
      probe  — cogroup(new_urls by bucket, shards by bucket): membership
               evaluated where the shard lives; a missing shard means the
               bucket holds no keys => definitely unseen;
      merge  — union + groupBy(bucket) bitwise OR (folds an epoch's insert
               deltas in without touching other shards).

    The superset invariant (bloom ⊇ frontier keys) is the caller's
    responsibility — a false negative would skip the exact anti-join and
    corrupt the URL-seen set, so inserts must be merged before reuse.
    """

    def __init__(self, shards: DataFrame, capacity: int, fpp: float,
                 n_shards: int):
        self.shards = shards
        self.capacity = capacity
        self.fpp = fpp
        self.n_shards = n_shards
        self.shard_capacity = max(1024, capacity // n_shards)

    @staticmethod
    def _bucket_col(n_shards: int):
        # Cast to int so BOTH cogroup sides key on the same type: pmod of
        # xxhash64 is a LONG, the shard table's bucket is an INT, and
        # mismatched key types hash to different shuffle partitions
        # (hashLong(5) != hashInt(5)) — the cogroup then pairs a bucket's
        # probe rows with an EMPTY shard group and reports false negatives.
        return F.pmod(F.xxhash64("url_hash"), F.lit(n_shards)).cast("int")

    @classmethod
    def build(cls, df_with_hash: DataFrame, cfg: CrawlConfig) -> "BloomShards":
        capacity, fpp = cfg.bloom_capacity, cfg.bloom_fpp
        n_shards = cfg.bloom_shards
        shard_capacity = max(1024, capacity // n_shards)

        def make(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bloom = UrlBloom(shard_capacity, fpp)
            bloom.add_series(pdf["url_hash"])
            return pd.DataFrame({"bucket": [int(key[0])],
                                 "words": [bloom.words.tobytes()]})

        shards = (
            df_with_hash.select("url_hash")
            .withColumn("bucket", cls._bucket_col(n_shards))
            .groupBy("bucket")
            .applyInPandas(make, schema="bucket int, words binary")
        )
        out = cls(shards, capacity, fpp, n_shards)
        out.materialize()
        return out

    def materialize(self) -> None:
        """Eagerly localCheckpoint the shard table: stores the bitset rows
        as executor blocks and SEVERS the lineage. Plain persist() is not
        enough here — each epoch's shards depend on the previous epoch's
        shards AND on that epoch's probe output; once those upstream caches
        are released (cascading uncache), a lazily-recomputed shard table
        would replay the whole epoch history (observed: merge cost growing
        1s -> 197s over four epochs). On a real cluster, checkpoint to the
        warehouse instead for executor-loss resilience; the bloom is an
        optimization, so a lost block only costs a rebuild from the
        frontier."""
        self.shards = self.shards.localCheckpoint(eager=True)

    def unpersist(self) -> None:
        self.shards.unpersist()

    def _local(self, raw: bytes) -> UrlBloom:
        bloom = UrlBloom(self.shard_capacity, self.fpp)
        bloom.words = np.frombuffer(raw, dtype=np.uint64).copy()
        return bloom

    def probe(self, df_with_hash: DataFrame) -> DataFrame:
        """df + `_maybe` boolean: True when url_hash may be in the set."""
        cols = df_with_hash.columns
        # Fresh StructType: .add() would MUTATE the frame's cached schema,
        # breaking a second probe of the same DataFrame.
        schema = T.StructType(
            list(df_with_hash.schema.fields)
            + [T.StructField("_maybe", T.BooleanType())])
        shard_cap, fpp = self.shard_capacity, self.fpp

        def eval_group(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            left = left.drop(columns=["_pb"])
            if len(left) == 0:
                return left.assign(_maybe=pd.Series([], dtype=bool))
            if len(right) == 0:  # no shard: bucket has no keys
                return left.assign(_maybe=False)
            bloom = UrlBloom(shard_cap, fpp)
            bloom.words = np.frombuffer(right["words"].iloc[0],
                                        dtype=np.uint64).copy()
            return left.assign(_maybe=bloom.contains_series(left["url_hash"]))

        probed = (
            df_with_hash.withColumn("_pb", self._bucket_col(self.n_shards))
            .groupBy("_pb")
            .cogroup(self.shards.groupBy("bucket"))
            .applyInPandas(eval_group, schema=schema)
        )
        return probed.select(*cols, "_maybe")

    def merged_with(self, df_with_hash: DataFrame) -> "BloomShards":
        """New BloomShards with ``df_with_hash``'s keys folded in (bitwise
        OR per bucket), using THIS instance's sizing so bitsets stay
        compatible. Only buckets receiving keys shuffle any data."""
        shard_cap, fpp, n_shards = self.shard_capacity, self.fpp, self.n_shards

        def make(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bloom = UrlBloom(shard_cap, fpp)
            bloom.add_series(pdf["url_hash"])
            return pd.DataFrame({"bucket": [int(key[0])],
                                 "words": [bloom.words.tobytes()]})

        delta_shards = (
            df_with_hash.select("url_hash")
            .withColumn("bucket", self._bucket_col(n_shards))
            .groupBy("bucket")
            .applyInPandas(make, schema="bucket int, words binary")
        )

        def fold(key, pdf: pd.DataFrame) -> pd.DataFrame:
            acc = UrlBloom(shard_cap, fpp)
            for raw in pdf["words"]:
                acc.words |= np.frombuffer(raw, dtype=np.uint64)
            return pd.DataFrame({"bucket": [int(key[0])],
                                 "words": [acc.words.tobytes()]})

        merged = (
            self.shards.unionByName(delta_shards)
            .groupBy("bucket")
            .applyInPandas(fold, schema="bucket int, words binary")
        )
        out = BloomShards(merged, self.capacity, self.fpp, self.n_shards)
        out.materialize()
        self.unpersist()
        return out


def unseen_urls(new_urls: DataFrame, frontier: DataFrame,
                spark=None, bloom: BloomShards | None = None,
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
    if bloom is not None:
        flagged = bloom.probe(new_urls)
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
