"""Similarity search over embedding columns (array<float>).

Two paths over `embeddings(vec_id, embedding, label)`:

  brute-force cosine top-k — the exact baseline: dot products via
    F.zip_with + F.aggregate (JVM-side, codegen'd), one pass, one global
    top-k (orderBy+limit is optimized to TakeOrderedAndProject — no full
    sort at scale).

  LSH (random hyperplane) top-k — the scale path: sign-bit signatures
    against a seeded, broadcast set of hyperplanes bucket the corpus; the
    query probes only its own bucket (and optionally multi-probe neighbor
    buckets), then re-ranks exactly within the probed set. Recall is
    tunable by (n_planes, n_probes); correctness of the re-rank is exact.

  IVF-style variant — k-means-lite: seeded sample centroids (no iteration
    at this stage — deterministic), assign by best centroid, probe nearest
    n_probe centroids.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_to_query(embeddings: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding") -> DataFrame:
    """Add a `cos_sim` column: cosine similarity to a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = math.sqrt(sum(float(v) * float(v) for v in query_vec)) or 1.0
    cos = _dot(F.col(vec_col).cast("array<double>"), q) / (
        _norm(F.col(vec_col).cast("array<double>")) * F.lit(qnorm))
    return embeddings.withColumn("cos_sim", cos)


def brute_force_topk(embeddings: DataFrame, query_vec: list[float],
                     k: int = 10, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k (TakeOrderedAndProject — no global sort)."""
    return (
        cosine_to_query(embeddings, query_vec, vec_col)
        .select(id_col, "cos_sim")
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Seeded Gaussian hyperplanes (pure function — same on every run)."""
    rng = random.Random(f"{seed}:hyperplanes")
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-bit bucket id of a vector column under the given hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec_col.cast("array<double>"), p) >= 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, i)
    return bucket


def lsh_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_planes: int = 8, n_probes: int = 3, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: probe the query's bucket plus its n_probes-1
    nearest single-bit-flip neighbors, exact re-rank inside."""
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.withColumn(
        "_bucket", lsh_bucket_col(F.col(vec_col), planes))

    qbits = 0
    margins = []  # |dot| per plane — flip the least-confident bits first
    for i, plane in enumerate(planes):
        dot = sum(float(a) * float(b) for a, b in zip(query_vec, plane))
        if dot >= 0:
            qbits |= 1 << i
        margins.append((abs(dot), i))
    probes = [qbits]
    for _m, i in sorted(margins)[: max(0, n_probes - 1)]:
        probes.append(qbits ^ (1 << i))

    probed = bucketed.filter(F.col("_bucket").isin(probes))
    return brute_force_topk(probed, query_vec, k, vec_col, id_col)


def near_duplicates_by_cosine(embeddings: DataFrame, threshold: float = 0.95,
                              n_planes: int = 12, seed: int = 42,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              dim: int | None = None) -> DataFrame:
    """Embedding-space near-duplicate pairs: LSH-bucket self-join, exact
    cosine inside buckets only (never a full cross join).

    Pass ``dim`` when known (callers of a fixed embedding table always
    know it) — the ``first()`` fallback costs a driver job per
    invocation just to read one row's length."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    bucketed = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        lsh_bucket_col(F.col(vec_col), planes).alias("_bucket"),
    )
    left = bucketed.select(F.col("id").alias("a"), F.col("v").alias("va"),
                           "_bucket")
    right = bucketed.select(F.col("id").alias("b"), F.col("v").alias("vb"),
                            "_bucket")
    pairs = left.join(right, "_bucket").filter(F.col("a") < F.col("b"))
    va = F.col("va").cast("array<double>")
    vb = F.col("vb").cast("array<double>")
    cos = _dot(va, vb) / (_norm(va) * _norm(vb))
    return (pairs.select("a", "b", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold).distinct())


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16, seed: int = 42,
               vec_col: str = "embedding", id_col: str = "vec_id"):
    """IVF-lite: seeded deterministic sample as centroids, nearest-centroid
    assignment (broadcast centroid array, one pass).

    The sample orders by md5 of "<id>:<seed>" rather than xxhash64 for the
    same reason operators/sampling.py keys its thresholds off md5: every
    engine (DuckDB included) computes the identical digest, so the centroid
    CHOICE — the only "approximate" part of IVF search — is bit-replayable
    by the SQL oracle and the whole ivf_topk path is value-checkable."""
    sample = (embeddings
              .withColumn("_r", F.md5(F.concat(
                  F.col(id_col).cast("string"), F.lit(f":{seed}"))))
              .orderBy("_r").limit(n_centroids)
              .select(vec_col).collect())
    centroids = [list(map(float, r[0])) for r in sample]
    best = None
    for ci, c in enumerate(centroids):
        carr = F.array(*[F.lit(v) for v in c])
        cnorm = math.sqrt(sum(v * v for v in c)) or 1.0
        sim = _dot(F.col(vec_col).cast("array<double>"), carr) / (
            _norm(F.col(vec_col).cast("array<double>")) * F.lit(cnorm))
        entry = F.struct(sim.alias("sim"), F.lit(ci).alias("cid"))
        best = entry if best is None else F.greatest(best, entry)
    assigned = embeddings.withColumn("_centroid", best["cid"])
    return assigned, centroids


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 16, n_probe: int = 4, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF search: score the query against the centroid table (driver-side,
    tiny), probe the ``n_probe`` nearest inverted lists, exact re-rank
    inside. At scale the assignment is precomputed/bucketed storage; the
    probe is a partition-pruned scan."""
    assigned, centroids = ivf_assign(embeddings, n_centroids, seed,
                                     vec_col, id_col)
    qnorm = math.sqrt(sum(v * v for v in query_vec)) or 1.0
    scored = []
    for ci, c in enumerate(centroids):
        cnorm = math.sqrt(sum(v * v for v in c)) or 1.0
        dot = sum(a * b for a, b in zip(query_vec, c))
        scored.append((dot / (cnorm * qnorm), ci))
    probe = [ci for _s, ci in sorted(scored, reverse=True)[:n_probe]]
    probed = assigned.filter(F.col("_centroid").isin(probe))
    return brute_force_topk(probed, query_vec, k, vec_col, id_col)


def quantize_embeddings(embeddings: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4x storage
    cut for embedding columns at corpus scale: scale = 127/max|x| (0 for
    an all-zero vector), q8[i] = floor(x*scale + 0.5) in [-127, 127].
    Dequantization is q8/scale with absolute error <= 0.5/scale.

    Everything is codegen'd array expressions — one narrow projection,
    no shuffle, no UDF — so it composes with any downstream op (the
    bucket joins in lsh_topk / near_duplicates_by_cosine work unchanged
    on dequantized vectors). floor(x + 0.5) instead of round() so the
    SQL oracle mirrors the identical IEEE double expression.
    """
    amax = F.array_max(F.transform(F.col(vec_col), F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q8 = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        scale.alias("scale"),
        q8.alias("q8"))
