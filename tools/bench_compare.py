"""Compare two bench_detail.json records: flag per-query regressions.

    python tools/bench_compare.py old_bench_detail.json bench_detail.json [ratio]

Prints added/removed queries and any whose best-of-N time regressed by
more than ``ratio`` (default 1.3x) with at least 0.2s absolute delta
(sub-200ms noise is not a regression at sf0.1).

Load-aware (VERDICT r7 #3): each bench record carries loadavg markers
sampled before/after the run (``load_before``/``load_after``). The
pre-run 1-min loadavg approximates AMBIENT (co-tenant) load — this
process is idle at that sample. When either record's ambient marker
exceeds the threshold (default 1.5), per-query slowdowns are reported
as LOAD-SUSPECT instead of REGRESSED and the exit code stays 0: a
dirty window cannot certify a regression (it CAN still certify an
improvement — slower ambient only understates those).
"""

from __future__ import annotations

import json
import sys

#: pre-run 1-min loadavg above this marks the window dirty.
LOAD_THRESHOLD = 1.5


def ambient_load(record: dict) -> float | None:
    """The record's pre-run 1-min loadavg, or None for legacy records
    without markers."""
    la = record.get("load_before", {}).get("loadavg_1m")
    return None if la is None or la < 0 else float(la)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_rec = json.load(open(sys.argv[1]))
    new_rec = json.load(open(sys.argv[2]))
    old, new = old_rec["queries"], new_rec["queries"]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    dirty = []
    for tag, rec in (("old", old_rec), ("new", new_rec)):
        la = ambient_load(rec)
        if la is None:
            print(f"note: {tag} record has no load marker (pre-r8 bench)")
        elif la > LOAD_THRESHOLD:
            dirty.append(tag)
            print(
                f"DIRTY WINDOW: {tag} record ran with ambient loadavg_1m="
                f"{la} (> {LOAD_THRESHOLD}) — slowdowns below are "
                f"load-suspect, not certified regressions"
            )

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")

    regressions = []
    improvements = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n > o * ratio and n - o > 0.2:
            regressions.append((name, o, n))
        elif o > n * ratio and o - n > 0.2:
            improvements.append((name, o, n))
    label = "LOAD-SUSPECT" if dirty else "REGRESSED"
    for name, o, n in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"{label} {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    for name, o, n in sorted(improvements, key=lambda t: t[2] - t[1]):
        print(f"improved  {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    print(
        f"{len(regressions)} slowdowns ({label.lower()}) / "
        f"{len(improvements)} improvements "
        f"over {len(set(old) & set(new))} shared queries"
    )
    return 1 if regressions and not dirty else 0


if __name__ == "__main__":
    raise SystemExit(main())
