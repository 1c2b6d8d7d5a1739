"""Benchmark runner: times every harness query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

Each query is fully executed via a count-collapsing action that still
materializes the result (``collect`` on the aggregated output —
results are small aggregates; inputs never hit the driver).

Sampling: each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3)
back-to-back. ``queries`` reports the per-query MIN (the JIT-warm,
load-free estimate — single samples at sf0.1 drift +-20-50% with
machine load and JIT state, which made round-2 regressions unprovable);
``queries_cold`` keeps each query's first sample (plan-compile +
first-touch cost) and ``queries_spread`` the max/min ratio, so a real
regression (min moves) is distinguishable from noise (spread moves).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm the JVM/JIT + parquet reader path so the first measured query
    # isn't charged for session startup.
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    # ... and the Arrow/Python worker pool (one worker per core forks on
    # first Pandas-UDF use — a one-time cost that would otherwise land
    # on whichever measured query hits a UDF first).
    # Exercising numpy + the Arrow array path matters: workers import
    # numpy/pandas lazily on first UDF unpickle, which would otherwise
    # bill ~100ms x 32 contending forks to the first LSH query.
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def _warm(s):
        arr = np.stack([s.to_numpy(), s.to_numpy()], axis=1)
        return pd.Series(list(arr))

    spark.range(10_000).repartition(64).select(_warm(F.col("id"))).count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    queries = entry_mod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    total = 0.0
    for name, fn in queries.items():
        samples: list[float] = []
        n = -1
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
        best = min(samples)
        timings[name] = round(best, 3)
        cold[name] = round(samples[0], 3)
        spread[name] = round(max(samples) / best, 2)
        total += best
        print(
            f"# {name}: {n} rows; min {best:.2f}s cold {samples[0]:.2f}s "
            f"spread x{spread[name]:.2f} over {repeats} runs",
            file=sys.stderr,
        )

    # The driver captures only the tail (~2000 chars) of stdout, so the FINAL
    # line must stay well under 1 KB (round-4 lesson: a 70-query dict made
    # BENCH_r04.json "parsed": null).  Full per-query detail goes to a sidecar
    # file + an earlier stdout line; the final line carries the totals plus
    # only the slowest queries.
    detail = {
        "metric": "harness_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "queries_spread": spread,
        "repeats": repeats,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
            "w",
        ) as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(detail), file=sys.stderr)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    summary = {
        "metric": "harness_queries_total_wall",
        "value": round(total, 3),
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "queries_note": "10 slowest shown; full per-query detail in bench_detail.json",
        "repeats": repeats,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(summary)
    if len(line) > 1000:  # hard guard: never hand the driver an unparseable tail
        summary.pop("queries")
        line = json.dumps(summary)
    print(line)


if __name__ == "__main__":
    main()
