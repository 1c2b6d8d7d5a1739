"""Link-analysis centrality (PageRank) as an iterative DataFrame loop.

Web-corpus pipelines weight crawl domains by link centrality before
sampling (Common Crawl publishes harmonic-centrality / PageRank-style
host rankings exactly for this; OpenWebText filtered by inbound-link
karma).  This module ships the distributed part: fixed-iteration
PageRank over an edge list, written the idiomatic Spark way — a
driver-side loop over LAZY DataFrame plans with a lineage-truncating
``localCheckpoint`` per iteration, so plan depth (and Catalyst
re-analysis cost) stays O(1) in the iteration count instead of the
O(iterations)-deep tree a naive loop builds.

Arithmetic is INTEGER-SCALED (the catalog's margin_pairs micro-cosine
precedent): ranks live as longs at ``scale``, per-edge contributions
use integer division by out-degree, and the damping mix is integer
``div`` — so every sum is exact whatever partition order executes it,
and a SQL oracle reproduces the result bit-for-bit.  Float PageRank
would hash-diverge on summation order alone.

Dangling nodes (no out-edges) simply leak their mass — the common
simplification; the rule is part of the operator contract and the
oracle transcribes it.

Scale shape per iteration: one equi-join of ranks to edges on the
source key, one aggregate on the destination key, one left join back
to the node set — all key-partitioned shuffles, nothing quadratic.
At cluster scale, pre-partition (or bucket) the edge list by source
once and persist it; the per-iteration join then co-locates against
the (much smaller) rank frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    scale: int = 10_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration integer-scaled PageRank.

    ``edges``: a directed edge list (duplicates allowed; they weight
    the edge, matching the multigraph reading of repeated links).
    Returns (node, rank): every node appearing as source or
    destination, with its rank after ``iterations`` rounds, as longs
    at ``scale`` (initial rank = ``scale``; base term =
    ``scale - scale*damping_pct div 100``).
    """
    e = edges.select(
        F.col(src).cast("long").alias("__src"),
        F.col(dst).cast("long").alias("__dst"),
    )
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    out_deg = e.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg"))
    base = scale - (scale * damping_pct) // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "__src"), "__src")
            .join(out_deg, "__src")
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank div __deg").alias("__c"),
            )
        )
        mass = contrib.groupBy("node").agg(F.sum("__c").alias("__m"))
        ranks = (
            nodes.join(mass, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_pct} * coalesce(__m, 0L)) div 100"
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            # truncate lineage: each iteration's plan starts from a
            # materialized-on-first-action snapshot, not the whole
            # unrolled join tree.
            .localCheckpoint(eager=False)
        )
    return ranks
