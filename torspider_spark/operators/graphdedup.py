"""Duplicate-cluster resolution: connected components over near-dup pairs.

The LSH / SimHash / Jaccard stages (operators/textdedup.py) emit near-dup
PAIRS; a corpus-curation pipeline then needs each *transitive* duplicate
cluster collapsed to one representative — pairwise drops alone leave
chains half-deduped (a~b, b~c with a!~c keeps either {a,c} or {a} depending
on scan order). This module closes that gap with the alternating
large-star / small-star connected-components algorithm (the published
MapReduce star-contraction scheme — Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC 2014 — also what GraphFrames
ships as its default CC): per-node min aggregations + co-partitioned
joins only, O(log^2 n) rounds even on path-shaped clusters (the
adversarial case for plain min-label propagation, which needs
O(diameter) rounds). Per-round cost is a fixed handful of shuffles over
the shrinking edge set, so small-graph wall time is round-latency-bound
while 100-TB wall time is bandwidth-bound — the right trade for a
cluster job.

Scale shape, per round: one symmetrize (map-side union), one groupBy-min
per phase (partial aggregation combines before the shuffle), one join per
phase on the same node key the aggregate just shuffled on (exchange
reuse), one distinct. Hot roots — a boilerplate cluster with millions of
members — are exactly the skew AQE's skew-join splitting handles, and the
per-node min aggregate itself never skews (combiner collapses each
partition to one row per key). Iteration state is localCheckpointed so
lineage doesn't replay from round 0 (same trap as operators/hostrank.py).
Convergence costs ONE driver action per round: a 3-scalar aggregate
(edge count + two independent 64-bit hash sums) compared to the previous
round's signature — no edge set collect, no subtract-join.

Reference parity: TorSpider has no dedup-cluster stage; this backs the
training-data dedup suite the build adds (SURVEY.md training-data
section) and is the standard final stage of MinHash corpus dedup.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as canonical (u < v) rows, self-loops dropped."""
    return (edges.select(F.least("u", "v").alias("u"),
                         F.greatest("u", "v").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct())


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m = min(neighborhood(u) + {u})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (sym.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least("minv", F.col("u")).alias("m")))
    return (sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges toward the larger endpoint; connect that node and all
    its smaller neighbors to their minimum."""
    oriented = edges.select(F.greatest("u", "v").alias("u"),
                            F.least("u", "v").alias("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    members = (oriented.join(mins, "u")
               .select(F.col("v").alias("u"), F.col("m").alias("v"))
               .filter(F.col("u") != F.col("v")))
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return members.unionByName(centers)


def _signature(edges: DataFrame) -> tuple:
    """(count, hash_xor_a, hash_xor_b) — an order-independent edge-set
    fingerprint (XOR aggregates cannot overflow under ANSI mode); two
    independent 64-bit folds make a cross-round collision on BOTH (at
    equal count) astronomically unlikely. Edges are distinct rows, so
    XOR's pair-cancellation property is safe here."""
    row = edges.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("u", "v")).alias("ha"),
        F.bit_xor(F.xxhash64("v", "u", F.lit(7))).alias("hb")).first()
    return (row["n"], row["ha"], row["hb"])


def connected_components(pairs: DataFrame, id_a: str = "a",
                         id_b: str = "b",
                         max_rounds: int = 25,
                         round_stats: list | None = None) -> DataFrame:
    """pairs -> (node, component) with component = min node id reachable.

    Alternating large-star/small-star until the canonical edge set is
    stable (idempotent fixpoint = a star forest, every member linked
    straight to its component minimum). max_rounds bounds the loop far
    above the O(log^2 n) theory for any realistic graph; hitting it is a
    bug, not a data property, so it raises instead of returning a
    half-contracted labeling.

    ``round_stats``, when a list, receives one dict per contraction round
    — {"round", "seconds", "edges"} (seconds covers the round's single
    materializing action: the signature aggregate computes the round's
    edge set into its lazy localCheckpoint; edges is the canonical
    edge count after the round). The bench uses it to catch round-count
    regressions (e.g. a lost localCheckpoint re-deriving the whole chain
    each round) as ROUNDS, not as wall-clock noise.

    Node ids MUST be integral (long or losslessly castable to long —
    xxhash64 output is the usual source). A non-numeric id would
    try_cast to NULL and silently corrupt the graph (or, under ANSI,
    fail with a generic CAST_INVALID_INPUT pointing nowhere useful), so
    the cast is guarded: any row whose id is non-null before the cast
    and null after raises a named error in the first scan (no extra
    job). Fractional/decimal id columns get a second guard — try_cast
    silently TRUNCATES (1.2 and 1.7 both cast to 1, collapsing distinct
    nodes), so any value that does not round-trip exactly raises too.
    String-keyed callers should pre-hash with F.xxhash64.
    """
    from pyspark.sql.types import DecimalType, FractionalType

    def _as_long(name: str, alias: str):
        raw, cast = F.col(name), F.col(name).try_cast("long")
        bad = raw.isNotNull() & cast.isNull()
        dtype = pairs.schema[name].dataType
        if isinstance(dtype, (FractionalType, DecimalType)):
            # Lossy-cast guard: a fractional id that truncates would
            # silently merge/split components. Round-trip through the
            # source type and require exact equality.
            bad = bad | (cast.cast(dtype) != raw)
        return (F.when(bad, F.raise_error(
            F.concat(F.lit(f"connected_components: id column '{name}' is "
                           "not losslessly castable to long (got '"),
                     raw.cast("string"), F.lit("'); pre-hash string ids "
                     "with xxhash64"))))
                .otherwise(cast).alias(alias))

    # Lazy localCheckpoints throughout: the signature aggregate is the
    # action that materializes each round's edge set INTO the checkpoint
    # cache (one Spark job per round, not checkpoint-job + signature-job —
    # the loop is round-latency-bound on small graphs, so halving the
    # actions halves the fixed wall; measured in BENCH the cc_chain
    # per-round wall dropped accordingly). Lineage still truncates at
    # every round: later rounds scan the cached blocks, never the chain.
    edges = _canonical(
        pairs.select(_as_long(id_a, "u"), _as_long(id_b, "v"))
    ).localCheckpoint(eager=False)
    nodes = (edges.select(F.col("u").alias("node"))
             .unionByName(edges.select(F.col("v").alias("node")))
             .distinct().localCheckpoint(eager=False))
    sig = _signature(edges)
    for round_idx in range(max_rounds):
        t0 = time.monotonic()
        edges = _canonical(
            _small_star(_large_star(edges))).localCheckpoint(eager=False)
        new_sig = _signature(edges)
        if round_stats is not None:
            round_stats.append({
                "round": round_idx + 1,
                "seconds": round(time.monotonic() - t0, 3),
                "edges": new_sig[0],
            })
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")
    # Star forest in canonical (u < v) form: u is the component minimum,
    # v the member. groupBy-min is insurance, not semantics — at the
    # verified fixpoint each member already has exactly one root edge.
    labels = edges.groupBy(F.col("v").alias("node")).agg(
        F.min("u").alias("root"))
    return (nodes.join(labels, "node", "left")
            .select("node", F.coalesce("root", "node").alias("component")))


def duplicate_clusters(pairs: DataFrame, id_a: str = "a",
                       id_b: str = "b") -> DataFrame:
    """Near-dup pairs -> (doc_id, cluster_id, cluster_size, is_keeper).

    cluster_id is the cluster's minimum doc id — the conventional "keep
    first" representative; cluster_size lets curation audits find the
    boilerplate monsters.
    """
    # comps feeds BOTH the size aggregate and the final join — cut it so
    # the label/node joins run once (same lazy-checkpoint discipline as
    # the contraction loop).
    comps = connected_components(pairs, id_a, id_b).localCheckpoint(
        eager=False)
    sizes = comps.groupBy("component").agg(
        F.count("*").alias("cluster_size"))
    return (comps.join(sizes, "component")
            .select(F.col("node").alias("doc_id"),
                    F.col("component").alias("cluster_id"),
                    "cluster_size",
                    (F.col("node") == F.col("component"))
                    .alias("is_keeper")))


def drop_near_duplicates(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id", id_a: str = "a",
                         id_b: str = "b") -> DataFrame:
    """Keep one representative (min id) per transitive duplicate cluster.

    Docs never mentioned in a pair pass through untouched — the drop list
    (cluster members minus keepers) is the only thing joined against the
    full corpus, as a broadcast-eligible anti-join side far smaller than
    the corpus itself.
    """
    losers = (duplicate_clusters(pairs, id_a, id_b)
              .filter(~F.col("is_keeper"))
              .select(F.col("doc_id").alias(id_col)))
    return docs.join(losers, id_col, "left_anti")
