"""Physical-layout sinks: bucketed co-located joins (no exchange) and
range-sorted export (row-group stats enable pruning)."""

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.sinks.layout import (
    bucketed_join_ready,
    write_bucketed,
    write_range_sorted,
)


@pytest.fixture(scope="module")
def warehouse_spark(spark):
    # saveAsTable needs a writable warehouse; point the existing session
    # at a temp dir via the catalog's default database location.
    yield spark


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 11).alias("b")
    )
    spark.sql("DROP TABLE IF EXISTS bjl")
    spark.sql("DROP TABLE IF EXISTS bjr")
    write_bucketed(left, "bjl", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(right, "bjr", ["k"], n_buckets=8, sort_cols=["k"])
    l, r = bucketed_join_ready(spark, "bjl", "bjr")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = l.join(r, "k")
        assert joined.count() == 10_000
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan
        # bucket pruning metadata present; at most the SMJ's two
        # in-partition sorts remain (no shuffle-and-sort of either side;
        # Spark re-sorts when a bucket spans multiple files, so sortBy
        # only elides these when each bucket is a single file)
        import re

        assert len(re.findall(r"\bSort \[", plan)) <= 2
        assert "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bjl")
        spark.sql("DROP TABLE IF EXISTS bjr")


def test_bucketed_aggregation_has_no_exchange(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    spark.sql("DROP TABLE IF EXISTS bagg")
    write_bucketed(df, "bagg", ["k"], n_buckets=8)
    try:
        agg = spark.table("bagg").groupBy("k").agg(F.sum("v").alias("s"))
        assert agg.count() == 10_000
        assert "Exchange" not in _physical_plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS bagg")


def test_range_sorted_export_stats_prune(spark, tmp_path):
    import pyarrow.parquet as pq

    df = spark.range(0, 50_000).select(
        (F.xxhash64("id") % 1_000_000).alias("key"), F.col("id").alias("payload")
    )
    out = str(tmp_path / "sorted")
    write_range_sorted(df, out, ["key"], n_files=8)
    files = sorted(glob.glob(os.path.join(out, "part-*.parquet")))
    assert len(files) == 8
    ranges = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        col_mins, col_maxs = [], []
        prev_max = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            assert st is not None and st.has_min_max
            # row groups within a file are ordered (file is sorted)
            if prev_max is not None:
                assert st.min >= prev_max
            prev_max = st.max
            col_mins.append(st.min)
            col_maxs.append(st.max)
        ranges.append((min(col_mins), max(col_maxs)))
    # files cover pairwise-disjoint key ranges -> a point/range predicate
    # prunes to O(matching files)
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    # and the data inside each file is truly sorted
    first = spark.read.parquet(files[0]).select("key").collect()
    vals = [r.key for r in first]
    assert vals == sorted(vals)
