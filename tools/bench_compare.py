"""Compare two bench_detail.json records: flag per-query regressions.

    python tools/bench_compare.py old_bench_detail.json bench_detail.json [ratio]

Prints added/removed queries and any whose best-of-N time regressed by
more than ``ratio`` (default 1.3x) with at least 0.2s absolute delta
(sub-200ms noise is not a regression at sf0.1).

Load-aware (VERDICT r7 #3, hardened per ADVICE r8 #1): each bench
record carries loadavg markers sampled before/after the run
(``load_before``/``load_after``) and a mid-run 1-min series sampled
every 20 queries (``load_series_1m``).

* The pre-run 1-min loadavg approximates AMBIENT (co-tenant) load —
  this process is idle at that sample.  Above ``LOAD_THRESHOLD`` the
  window is dirty.
* The mid-run series and the after-marker include OUR OWN load (a
  32-thread local bench legitimately drives loadavg to ~4-8), so they
  cannot be thresholded absolutely.  They CAN be compared between the
  two records: the same bench at the same sf produces roughly the same
  self-load, so a series/after peak in one record that exceeds the
  other's by more than ``MID_RUN_DELTA`` runnable procs marks a
  co-tenant arriving (or leaving) MID-RUN — also a dirty window.

Exit codes (callers MUST branch on these, not just zero/nonzero):

* 0 — no regressions (improvements allowed; a dirty window can still
  certify improvements, since extra ambient load only understates them).
* 1 — certified regressions in a clean window.
* 2 — usage error.
* 3 — LOAD-SUSPECT: slowdowns detected but the window is dirty.  This
  is NOT a pass: rerun the bench in a quiet window and compare again.
"""

from __future__ import annotations

import json
import sys

#: pre-run 1-min loadavg above this marks the window dirty (ambient).
LOAD_THRESHOLD = 1.5

#: mid-run peak (series/after, self-load included) exceeding the other
#: record's peak by more than this marks a mid-run co-tenant change.
MID_RUN_DELTA = 4.0


def ambient_load(record: dict) -> float | None:
    """The record's pre-run 1-min loadavg, or None for legacy records
    without markers."""
    la = record.get("load_before", {}).get("loadavg_1m")
    return None if la is None or la < 0 else float(la)


def mid_run_peak(record: dict) -> float | None:
    """Max 1-min loadavg observed DURING the run: the sampled series
    plus the after-marker (the series' de-facto final sample).  None
    when the record predates the markers."""
    samples = list(record.get("load_series_1m") or [])
    la_after = record.get("load_after", {}).get("loadavg_1m")
    if la_after is not None and la_after >= 0:
        samples.append(float(la_after))
    return max(samples) if samples else None


def classify_windows(old_rec: dict, new_rec: dict) -> list[str]:
    """Return human-readable dirty-window reasons (empty = clean)."""
    reasons = []
    for tag, rec in (("old", old_rec), ("new", new_rec)):
        la = ambient_load(rec)
        if la is None:
            print(f"note: {tag} record has no load marker (pre-r8 bench)")
        elif la > LOAD_THRESHOLD:
            reasons.append(
                f"{tag} record ran with ambient loadavg_1m={la}"
                f" (> {LOAD_THRESHOLD})"
            )
    old_peak, new_peak = mid_run_peak(old_rec), mid_run_peak(new_rec)
    if old_peak is not None and new_peak is not None:
        if abs(new_peak - old_peak) > MID_RUN_DELTA:
            hi = "new" if new_peak > old_peak else "old"
            reasons.append(
                f"mid-run load peaks diverge: old={old_peak} new={new_peak}"
                f" (|delta| > {MID_RUN_DELTA}; a co-tenant changed during"
                f" the {hi} run)"
            )
    return reasons


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old_rec = json.load(open(sys.argv[1]))
    new_rec = json.load(open(sys.argv[2]))
    old, new = old_rec["queries"], new_rec["queries"]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    dirty = classify_windows(old_rec, new_rec)
    for r in dirty:
        print(f"DIRTY WINDOW: {r}")

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
    # r12: per-entry load samples (queries_load_1m) — a flag whose
    # pre-entry 1m loadavg in the NEW record exceeds the OLD record's
    # sample for the same entry by > BURST_DELTA runnable procs is
    # annotated burst-coincident: the slowdown coincides with a
    # co-tenant burst at that point of the run.  Annotation only —
    # adjudication still requires the isolated-rerun / old-code
    # control protocol (PERFORMANCE.md §r12).
    BURST_DELTA = 2.0
    old_ql = old_rec.get("queries_load_1m") or {}
    new_ql = new_rec.get("queries_load_1m") or {}
    n_burst = 0
    for name, o, n in sorted(regressions, key=lambda t: t[1] - t[2]):
        burst = ""
        lo, ln = old_ql.get(name), new_ql.get(name)
        if lo is not None and ln is not None and ln - lo > BURST_DELTA:
            burst = f"  [burst-coincident: load {lo} -> {ln}]"
            n_burst += 1
        print(f"{label} {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x){burst}")
    if n_burst:
        print(
            f"note: {n_burst}/{len(regressions)} flags coincide with a"
            " per-entry load burst (see queries_load_1m)"
        )
    for name, o, n in sorted(improvements, key=lambda t: t[2] - t[1]):
        print(f"improved  {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    print(
        f"{len(regressions)} slowdowns ({label.lower()}) / "
        f"{len(improvements)} improvements "
        f"over {len(set(old) & set(new))} shared queries"
    )
    if not regressions:
        return 0
    if dirty:
        print("exit 3: RERUN REQUIRED — slowdowns in a dirty window are"
              " unadjudicated, not passed")
        return 3
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
