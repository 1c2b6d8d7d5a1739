"""Physical-layout sinks: the write-path optimizations that buy back
shuffles and scan bytes at 100 TB.

- ``write_bucketed`` / ``bucketed_join_ready``: hash-bucketed +
  sorted-in-bucket tables (``DataFrameWriter.bucketBy``). Two tables
  bucketed the same way on the join key join with NO exchange and NO
  sort — the shuffle is paid once at write time and amortized over
  every subsequent join/aggregation on that key. This is the
  "co-located join" lever for fact-fact joins too big to broadcast
  (e.g. orders x lineitem on orderkey every night).
- ``write_range_sorted``: range-partition + sort-within-partition
  parquet export. Each output file covers a disjoint key range and is
  internally sorted, so parquet row-group min/max statistics prune
  scans for ANY downstream reader filtering on the sort key (Spark,
  DuckDB, Trino alike), and range scans touch O(files-in-range), not
  O(all files).

Bucketed tables require the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes cannot carry bucket metadata.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed, optionally sorted managed
    table. ``n_buckets`` should match (a divisor of) the downstream
    shuffle partition count so bucket-to-partition mapping is 1:1."""
    bucket_cols = list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> tuple[DataFrame, DataFrame]:
    """Read two bucketed tables for a co-located join. Callers join the
    returned frames on the bucket key; the physical plan must contain
    no Exchange (asserted in tests/test_layout.py)."""
    return spark.table(left), spark.table(right)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int = 32,
) -> None:
    """Range-partition on ``sort_cols`` into ``n_files`` output files,
    each internally sorted — the clustered-export layout whose parquet
    min/max stats make downstream predicate pushdown actually skip IO.

    ``repartitionByRange`` samples the key distribution, so files are
    balanced even under key skew (unlike fixed-width manual ranges)."""
    sort_cols = list(sort_cols)
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits_per_col: int = 10,
) -> None:
    """Z-order (Morton-curve) clustered export: interleave the bits of
    each column's rank bucket into one clustering key, then range-
    partition + sort on it. Each output file then covers a SMALL range
    of EVERY clustering column — parquet min/max stats prune scans for
    filters on any of them, where a plain sort only prunes its leading
    column.

    Rank buckets come from ``percent_rank`` (value-distribution
    quantiles, so skewed columns still spread over the full 2^bits
    range); the rank windows are per-column global sorts of just
    (value) pairs — at 100 TB swap in ``approxQuantile`` breakpoints
    computed on a sample, the curve only needs monotone bucketing.

    The z-value is built natively (shift/OR folds — no UDF)."""
    from pyspark.sql import Window

    cols = list(cols)
    # one 64-bit z-value: shiftleft wraps its amount mod 64, so bits
    # past position 62 would silently collide across columns
    if bits_per_col * len(cols) > 62:
        bits_per_col = 62 // len(cols)
        if bits_per_col < 1:
            raise ValueError(f"too many z-order columns ({len(cols)}) for one long")
    zdf = df
    for c in cols:
        r = F.percent_rank().over(Window.orderBy(F.col(c)))
        bucket = F.least(
            (r * (1 << bits_per_col)).cast("long"), F.lit((1 << bits_per_col) - 1)
        )
        zdf = zdf.withColumn(f"__b_{c}", bucket)
    # interleave: output bit (i * n_cols + j) = bit i of column j's bucket
    z = F.lit(0).cast("long")
    for i in range(bits_per_col):
        for j, c in enumerate(cols):
            bit = F.shiftrightunsigned(F.col(f"__b_{c}"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    zdf = zdf.withColumn("__z", z).drop(*[f"__b_{c}" for c in cols])
    (
        zdf.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
