"""Scale probe: run the whole-site pipeline on N-times-replicated
input and report how wall time scales.

Replication unions N copies of the harness event log with disjoint
key spaces (user_id + k*10^7, event_id + k*10^9) — N times the rows
AND N times the lines, i.e. the realistic growth axis for the RCO
workload (more production lines, not longer per-line history). Every
shuffle key space grows proportionally, so near-linear wall time here
is evidence the plan has no all-pairs / driver-side bottleneck hiding
at test scale.

Usage: python tools/scale_probe.py [sf_dir] [N ...]
Prints one line per N plus a JSON summary.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def scaled_events(spark, sf_dir: str, n: int):
    from fhc_rco_etl_scalable_spark.sources.parquet import load_table

    base = load_table(spark, "events", sf_dir)
    parts = [
        base.select(
            (F.col("event_id") + F.lit(k * 1_000_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * 10_000_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        for k in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_pipeline(spark, ev) -> dict[str, int]:
    from fhc_rco_etl_scalable_spark.plans.harness_queries import (
        downtime_log_from_events,
    )
    from fhc_rco_etl_scalable_spark.plans.rco_pipeline import SiteParams
    from fhc_rco_etl_scalable_spark.plans.site_etl import site_etl

    downtime = downtime_log_from_events(ev)
    line_config = (
        downtime.select("LINE")
        .distinct()
        .select(
            F.col("LINE").alias("MDC_Line_Name"),
            F.lit("CM").alias("Constraint_Machine_String"),
        )
    )
    outs = site_etl(downtime, None, SiteParams(server="SCALE"), line_config=line_config)
    return {k: df.count() for k, df in sorted(outs.items())}


def main() -> None:
    from fhc_rco_etl_scalable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ns = [int(a) for a in sys.argv[2:]] or [1, 2, 4, 8]
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().collect()

    results = []
    for n in ns:
        ev = scaled_events(spark, sf_dir, n)
        t0 = time.time()
        counts = run_pipeline(spark, ev)
        dt = time.time() - t0
        results.append({"n": n, "wall_sec": round(dt, 2), "rows": counts})
        print(
            f"# N={n}: {dt:.2f}s  "
            + " ".join(f"{k}={v}" for k, v in counts.items()),
            file=sys.stderr,
        )
    base = results[0]["wall_sec"]
    for r in results:
        r["speedup_vs_linear"] = round(
            (base * r["n"]) / r["wall_sec"], 2
        )  # >1 = better than linear
    print(json.dumps({"metric": "site_etl_scale_probe", "sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
