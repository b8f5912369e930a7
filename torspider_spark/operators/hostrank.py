"""F4 domain-priority hook: host-level PageRank over the crawl link graph.

SURVEY §2.F F4 names a depth/domain priority; the engine's default priority
is depth (breadth-first, matching the simulator-verified ordering). This
module supplies the documented domain-class extension: a rank score per
host computed from the links table, and a priority expression that folds it
in. It is NOT wired into the default schedule — enabling it changes crawl
ordering by design, so deployments opt in via `priority_expr`.

Scale shape: the edge list aggregates to (src_host, dst_host, weight) —
one shuffle; each PageRank iteration is contribution-explode + groupBy sum
(two shuffles over the HOST graph, orders of magnitude smaller than the
URL table). Iteration state is localCheckpointed: iterative DataFrames
otherwise replay the whole lineage per step (see BloomShards.materialize
for the same trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def host_edges(links: DataFrame) -> DataFrame:
    """links(src, dst[, epoch]) -> weighted host-level edge list."""
    host_of = (lambda c: F.split(F.col(c), "/").getItem(2))
    return (
        links.select(host_of("src").alias("src_host"),
                     host_of("dst").alias("dst_host"))
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


def host_rank(links: DataFrame, iterations: int = 5,
              damping: float = 0.85) -> DataFrame:
    """(host, rank) — weighted PageRank over the host link graph.

    Deterministic: fixed iteration count, no sampling. Dangling hosts
    (no out-edges) contribute their rank uniformly via the (1-d) term only
    — the standard simplified formulation rank' = (1-d) + d * inflow. No
    normalization is applied (dangling mass loss means the mean rank is
    generally a bit below 1); the independent dict-PageRank oracle
    (plans/expected.py) implements the identical formulation.
    """
    edges = host_edges(links).persist()
    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    hosts = (edges.select(F.col("src_host").alias("host"))
             .unionByName(edges.select(F.col("dst_host").alias("host")))
             .distinct().persist())
    ranks = hosts.select("host", F.lit(1.0).alias("rank"))
    for _ in range(iterations):
        contrib = (
            edges.join(out_w, "src_host")
            .join(ranks.withColumnRenamed("host", "src_host"), "src_host")
            .select(
                F.col("dst_host").alias("host"),
                (F.col("rank") * F.col("weight") / F.col("out_w"))
                .alias("contrib"))
            .groupBy("host").agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (F.lit(1.0 - damping)
                 + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0)))
                .alias("rank"))
        ).localCheckpoint(eager=True)  # sever per-iteration lineage
    edges.unpersist()
    hosts.unpersist()
    return ranks


def priority_expr(rank_col="rank", depth_col="depth", rank_weight: int = 2):
    """The F4 hook: depth-first priority refined by host rank — higher-rank
    hosts sort earlier within a depth band. priority = depth * (rank_weight
    + 1) - clamp(rank, 0..rank_weight); deterministic, integer-typed like
    the default priority."""
    clamped = F.least(F.greatest(F.round(F.col(rank_col)).cast("int"),
                                 F.lit(0)), F.lit(rank_weight))
    return (F.col(depth_col) * (rank_weight + 1) - clamped).cast("int")
