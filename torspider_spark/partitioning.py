"""Scale-adaptive input parallelism (guide §2/§6).

A parquet input whose live byte size is below one row group cannot be
split by the reader: ``maxPartitionBytes`` splitting assigns row groups
by midpoint, so a single-row-group file is ONE scan partition no matter
the cluster width — and every map-heavy operator downstream (shingle
explode, regexp chains, Arrow batches) serializes on one core while the
other 31 idle. Measured on the sf0.1 fixtures (single ~0.5-15 MB files):
the 2-gram repetition explode alone ran 2.9 s single-threaded, ~0.3 s
spread.

``ensure_min_partitions`` is the size-derived fix the optimization brief
asks for instead of a constant: inputs already wider than the target
parallelism pass through untouched (a 100-TB table has thousands of
splits — the round-robin shuffle below would be a catastrophic full-copy
there, so the guard is the point, not a nicety), while a
narrower-than-cluster input pays one trivial shuffle of its few MB to
unlock every core. Row-to-partition assignment of ``repartition(n)`` is
deterministic (sort-before-repartition is on by default, SPARK-23207),
and every operator in this engine is partition-invariant by construction
(verified by the N-vs-4N equality criterion), so results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame,
                          target: int | None = None) -> DataFrame:
    """Round-robin-spread ``df`` when its plan yields fewer partitions
    than ``target`` (default: the cluster's defaultParallelism); no-op —
    and no added exchange — otherwise."""
    try:
        sc = df.sparkSession.sparkContext
        want = int(target or sc.defaultParallelism)
        have = df.rdd.getNumPartitions()
    except Exception:
        return df
    if want <= 1 or have >= want:
        return df
    return df.repartition(want)
