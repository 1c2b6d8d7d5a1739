"""Streaming-group floor profile (VERDICT r13 #5): per entry, how many
micro-batches run and where each batch's milliseconds go — the
evidence for (or against) the claimed ~1.7 s/entry state-store +
micro-batch machinery floor behind the group's 20.44 s quiet-window
total vs the retired-or-not 17 s target.

A StreamingQueryListener captures every progress event while each
catalog entry runs exactly as the driver runs it (its own staged file
stream, its own clamped shuffle confs). Per entry: wall, n batches,
summed durationMs buckets (addBatch = actual work; triggerExecution -
addBatch ~= machinery: offset WAL, planning, commits), and state-store
commit ms. Exit 0 always (evidence, not a gate).

Usage: python tools/stream_profile.py [sf_dir] [repeats]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

STREAM_ENTRIES = [
    "streaming_sessionize_harness",
    "streaming_tumbling_harness",
    "streaming_hopping_harness",
    "streaming_state_inspect",
    "streaming_unique_visitors",
    "streaming_unique_visitors_wm",
    "streaming_dedup",
    "streaming_interval_join",
    "streaming_interval_join_full",
    "streaming_interval_join_outer",
    "streaming_enrich_join",
    "streaming_ewma_harness",
    "streaming_incremental_dedup",
]

_BUCKETS = (
    "addBatch",
    "queryPlanning",
    "getBatch",
    "latestOffset",
    "walCommit",
    "commitOffsets",
    "triggerExecution",
)


def main() -> int:
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.streaming import StreamingQueryListener

    from fhc_rco_etl_scalable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    spark = get_spark("stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()

    events: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):  # noqa: N802
            pass

        def onQueryProgress(self, e):  # noqa: N802
            p = e.progress
            events.append(
                {
                    "batchId": p.batchId,
                    "numInputRows": p.numInputRows,
                    "durationMs": dict(p.durationMs or {}),
                    "state_commit_ms": sum(
                        (s.commitTimeMs or 0) for s in (p.stateOperators or [])
                    ),
                    "state_rows_total": sum(
                        (s.numRowsTotal or 0) for s in (p.stateOperators or [])
                    ),
                }
            )

        def onQueryTerminated(self, e):  # noqa: N802
            pass

        def onQueryIdle(self, e):  # noqa: N802
            pass

    spark.streams.addListener(Capture())
    # one warm pass: state-store provider classloading, streaming
    # codegen, checkpoint plumbing — the bench warms these too, so the
    # floor in question is what REMAINS after warmup.
    qs[STREAM_ENTRIES[0]](spark, sf_dir).count()

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = -1.0

    results: dict[str, dict] = {}
    for name in STREAM_ENTRIES:
        best = None
        for _ in range(repeats):
            events.clear()
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            wall = time.time() - t0
            # listener events arrive on a separate thread; give the
            # final batch's event a beat to land
            time.sleep(0.3)
            snap = list(events)
            if best is None or wall < best["wall_sec"]:
                sums = {
                    b: round(
                        sum(ev["durationMs"].get(b, 0) for ev in snap) / 1000.0,
                        3,
                    )
                    for b in _BUCKETS
                }
                best = {
                    "wall_sec": round(wall, 3),
                    "n_batches": len(snap),
                    "input_rows": sum(ev["numInputRows"] for ev in snap),
                    "state_commit_sec": round(
                        sum(ev["state_commit_ms"] for ev in snap) / 1000.0, 3
                    ),
                    **{f"{b}_sec": v for b, v in sums.items()},
                    "machinery_sec": round(
                        sums["triggerExecution"] - sums["addBatch"], 3
                    ),
                    "outside_trigger_sec": round(
                        wall - sums["triggerExecution"], 3
                    ),
                }
            # bench.py's guard: never unpersist the session-lifetime
            # input-scaffolding checkpoints (their truncated lineage
            # cannot recompute once the storage level is stripped).
            try:
                from fhc_rco_etl_scalable_spark.plans.harness_queries import (
                    PINNED_RDD_IDS,
                )
            except Exception:
                PINNED_RDD_IDS = set()
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                if rdd.id() not in PINNED_RDD_IDS:
                    rdd.unpersist(False)
        results[name] = best
        print(
            f"# {name}: wall {best['wall_sec']:.2f}s = "
            f"{best['n_batches']} batches x addBatch {best['addBatch_sec']:.2f}s "
            f"+ machinery {best['machinery_sec']:.2f}s "
            f"+ outside-trigger {best['outside_trigger_sec']:.2f}s "
            f"(state commit {best['state_commit_sec']:.2f}s)",
            file=sys.stderr,
        )

    total = round(sum(r["wall_sec"] for r in results.values()), 2)
    print(
        json.dumps(
            {
                "metric": "stream_profile",
                "sf_dir": sf_dir,
                "repeats": repeats,
                "loadavg_1m_before": load1,
                "group_total_sec": total,
                "results": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
