"""Scan-audit review-queue A/B: measure each flagged entry's
checkpoint variant INTERLEAVED against the shipped form (VERDICT r13
#6). The r13 rule under test: a localCheckpoint pays off only when the
duplicated subtree is shuffle/window-heavy; scan-only duplication is
below the barrier's break-even at test scale (but IS the cost at
100 TB — each operator exposes the knob either way).

Runs A, B, A, B, ... (n repeats each) so co-tenant load hits both
variants equally; reports per-variant min. Exit 0 always (evidence,
not a gate).

Usage: python tools/scanq_ab.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

_BOILER = None  # filled from harness_queries at runtime


def _cases(spark, sf_dir: str):
    from fhc_rco_etl_scalable_spark.operators.dedup import (
        domain_mixture,
        substring_dedup,
    )
    from fhc_rco_etl_scalable_spark.operators.retrieval import bm25_topk
    from fhc_rco_etl_scalable_spark.operators.timeseries import lttb_downsample
    from fhc_rco_etl_scalable_spark.plans.harness_queries import (
        _BM25_QUERY_TERMS,
        _BOILER,
    )
    from fhc_rco_etl_scalable_spark.sources.parquet import load_table

    docs = load_table(spark, "documents", sf_dir)
    boiler_docs = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" " + _BOILER)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    ev = load_table(spark, "events", sf_dir).filter(F.col("user_id") < 40)
    q = " ".join(_BM25_QUERY_TERMS)

    # name -> (build(flag) -> DataFrame) with flag False=A (shipped),
    # True=B (checkpoint variant); same inputs as the catalog entries.
    return {
        "bm25_search": lambda flag: bm25_topk(
            docs, "doc_id", "text", q, k=10, materialize_tf=flag
        ),
        "domain_mixture": lambda flag: domain_mixture(
            docs, "source", "doc_id", total_budget=200,
            materialize_counts=flag,
        ),
        "substring_dedup": lambda flag: substring_dedup(
            boiler_docs, "doc_id", "text", min_tokens=8,
            materialize_grams=flag,
        ),
        "lttb_downsample": lambda flag: lttb_downsample(
            ev, keys=["user_id"], ts_col="ts", value_col="value",
            id_col="event_id", n_out=12, materialize_pts=flag,
        ),
    }


def main() -> int:
    import os

    from fhc_rco_etl_scalable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("scanq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).count().collect()

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0

    results: dict[str, dict] = {}
    for name, build in _cases(spark, sf_dir).items():
        times: dict[bool, list[float]] = {False: [], True: []}
        rows: dict[bool, int] = {}
        build(False).count()  # warm plan/JIT once, untimed
        for _ in range(repeats):
            for flag in (False, True):  # interleaved
                t0 = time.time()
                rows[flag] = build(flag).count()
                times[flag].append(time.time() - t0)
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist(False)
        a, b = min(times[False]), min(times[True])
        results[name] = {
            "shipped_min_sec": round(a, 3),
            "checkpoint_min_sec": round(b, 3),
            "ratio_b_over_a": round(b / a, 2),
            "rows_equal": rows[False] == rows[True],
            "rows": rows[False],
        }
        print(
            f"# {name}: shipped {a:.2f}s vs checkpoint {b:.2f}s "
            f"(x{b / a:.2f}), rows {rows[False]} == {rows[True]}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "scanq_ab",
                "sf_dir": sf_dir,
                "repeats": repeats,
                "loadavg_1m_before": load1,
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
