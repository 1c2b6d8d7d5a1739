"""Compare two bench_detail.json records: flag per-query regressions.

    python tools/bench_compare.py old_bench_detail.json bench_detail.json [ratio]

Prints added/removed queries and any whose best-of-N time regressed by
more than ``ratio`` (default 1.3x) with at least 0.2s absolute delta
(sub-200ms noise is not a regression at sf0.1).
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old = json.load(open(sys.argv[1]))["queries"]
    new = json.load(open(sys.argv[2]))["queries"]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

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
    for name, o, n in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"REGRESSED {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    for name, o, n in sorted(improvements, key=lambda t: t[2] - t[1]):
        print(f"improved  {name}: {o:.2f}s -> {n:.2f}s ({n / o:.2f}x)")
    print(
        f"{len(regressions)} regressions / {len(improvements)} improvements "
        f"over {len(set(old) & set(new))} shared queries"
    )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
