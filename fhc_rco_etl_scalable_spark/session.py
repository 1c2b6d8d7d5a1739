"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the same config block is what we'd
ship to a 1000-executor cluster (AQE on, skew-join handling on,
shuffle partitions sized explicitly, UTC session time so results are
reproducible against the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """~1/3 of physical RAM in whole GiB, clamped to [2g, 48g]."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    gb = int(line.split()[1]) // (1024 * 1024)
                    return f"{max(2, min(48, gb // 3))}g"
    except OSError:
        pass
    return "2g"


def get_spark(
    app_name: str = "fhc_rco_etl_scalable_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Env overrides: ``SPARK_GRAFT_CPUS`` sets local parallelism,
    ``SPARK_GRAFT_SHUFFLE`` the shuffle partition count.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local[N] runs all N task slots inside the driver JVM, and
        # Spark's default driver heap is 1g — 32 concurrent gram-
        # explode/signature tasks OOM at a few hundred thousand docs
        # (found by tools/scale_probe.py at 40x sf0.1). Size the heap
        # like the single multi-core executor this process actually is:
        # ~1/3 of physical RAM, capped at 48g (so a small laptop/CI box
        # gets a modest heap instead of an overcommitted 48g that the
        # OOM killer would reap mid-job). Only effective before the JVM
        # launches; a caller-provided session keeps its own setting.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        # AQE: runtime coalescing, skew-join splitting, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Sized for the test harness; on a real cluster this is
        # ~2-3x total executor cores.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamps vs the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for the few pandas-UDF escape hatches.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python DataSource filter pushdown (sources/rest_datasource.py
        # prunes whole site partitions from pushed EqualTo/In filters)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        # The harness events.parquet stores TIMESTAMP(NANOS); Spark has
        # no nanos type — read as long, loader converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Untagged TIMESTAMP(MICROS) parquet must load as TIMESTAMP (ltz,
        # UTC-pinned above), not TIMESTAMP_NTZ — the engine's ingestion
        # contract; load_table also enforces this at runtime.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Keep scans well-sized: 128m default is fine at 100 TB, the
        # harness files are tiny so AQE coalesces them anyway.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def fast_planning(df):
    """Context manager: disable Catalyst constraint propagation while
    CONSTRUCTING a deep pipeline plan (the lazy-checkpoint subtree
    planning inside mes_etl/gantt). On those window-heavy trees the
    rule's cost is quadratic in predicate count and adds ~1 s of pure
    driver CPU per pipeline build at ANY data scale; its benefit —
    inferred isnotnull pushdowns — is redundant there because the
    pipelines filter their join/partition keys explicitly. Scoped to
    construction only: optimization at action time runs with the
    session default."""
    import contextlib

    spark = df.sparkSession

    @contextlib.contextmanager
    def cm():
        key = "spark.sql.constraintPropagation.enabled"
        prev = spark.conf.get(key, None)
        spark.conf.set(key, "false")
        try:
            yield
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    return cm()
