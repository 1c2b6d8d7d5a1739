"""Scan-count audit: how many times does each catalog entry's plan
read the same parquet table?

The r13 lesson behind this tool: a derive-small-then-join-back pattern
quietly re-scans the big input once per derived consumer (Catalyst
pushes aggregates past rollups and breaks subtree reuse), and nothing
in the exchange-count audit catches it — `bigram_logprob_score` was
scanning the corpus 5x. At 100 TB, scans ARE the cost. This tool
builds every catalog entry's plan against a fixture dir and reports
per-table FileScan multiplicity, flagging entries above a threshold.

Multiplicity is not automatically a bug: model-building passes
(unigram + bigram = 2 train scans), self-joins on different column
subsets, and union-of-variants shapes legitimately re-read. The
output is a review queue, not a gate — pair each flag with an
.explain before changing anything (see the semantic_dedup revert:
the "fix" was 1.9x slower).

Usage: python tools/scan_audit.py [sf_dir] [threshold]
Prints one line per flagged entry + a JSON summary; exit 0 always
(review queue, not a gate).
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def table_scans(plan: str) -> dict[str, int]:
    scans = re.findall(
        r"FileScan \w+ \[[^\]]*\].*?file:([^\]\s,]+)", plan
    )
    return dict(Counter(p.rsplit("/", 1)[-1] for p in scans))


def main() -> int:
    from fhc_rco_etl_scalable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    threshold = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    flagged: dict[str, dict[str, int]] = {}
    errors: dict[str, str] = {}
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # plan build only; runtime errors differ
            errors[name] = str(e)[:200]
            continue
        counts = table_scans(plan)
        hot = {t: n for t, n in counts.items() if n >= threshold}
        if hot:
            flagged[name] = hot
            print(f"SCAN {name}: {hot}")
    print(
        json.dumps(
            {
                "metric": "scan_audit",
                "sf_dir": sf_dir,
                "threshold": threshold,
                "flagged": flagged,
                "errors": errors,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
