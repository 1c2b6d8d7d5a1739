"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small)
  query set against the corpus, one shuffle for the per-query top-k
  window. The correctness baseline.
- ``lsh_topk``: random-hyperplane LSH — deterministic seeded planes,
  sign-bit bucket, candidates share a bucket (multi-probe over bit
  flips), exact re-rank inside buckets. The scale path: bucket join
  replaces the full cross product, so corpus x queries never
  materializes.

At 100 TB the corpus side stays partitioned; only signatures shuffle.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two equal-length double arrays (native
    zip_with/aggregate — no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).
    Returns (query_id, neighbor_id, cos_sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    # corpus stays partitioned; the query set broadcasts.
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn("cos_sim", cosine(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "spark-graft") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bits (no
    RNG state, reproducible across runs/engines)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            u = int(h[:8], 16) / 0xFFFFFFFF
            vals.append(2.0 * u - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / norm for v in vals])
    return planes


def lsh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector under the given hyperplanes."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
        )
        sig = sig + F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: standard multi-table random-hyperplane LSH —
    ``n_tables`` independent tables of ``n_planes`` sign bits each; a
    corpus vector is a candidate when it shares ANY table's bucket with
    the query (single-bit probes included), then exact cosine re-ranks.

    Recall ≈ 1-(1-p^k)^T for per-plane agreement p — tunable without
    touching the data layout. Property-tested against the brute-force
    baseline.
    """
    tables = [
        _hyperplanes(dim, n_planes, seed=f"spark-graft-t{t}") for t in range(n_tables)
    ]

    def bucket_array(vec: Column, with_probes: bool) -> Column:
        buckets = []
        for t, planes in enumerate(tables):
            sig = lsh_signature(vec, planes) + F.lit(t << 16)
            buckets.append(sig)
            if with_probes and multiprobe_bits >= 1:
                buckets += [sig.bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
        return F.array(*buckets)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    ).withColumn("__bucket", F.explode(bucket_array(F.col("__cv"), False)))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    ).withColumn("__bucket", F.explode(bucket_array(F.col("__qv"), True)))

    cand = c.join(F.broadcast(q), "__bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cos_sim", cosine(F.col("__qv"), F.col("__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )
