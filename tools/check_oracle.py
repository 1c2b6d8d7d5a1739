"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash
(values canonicalized: floats rounded, timestamps to ISO strings,
nulls to a sentinel). Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def canon_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        if math.isinf(v):
            # int(v) would raise OverflowError and kill the whole gate
            # run instead of flagging the one entry that emitted inf.
            return repr(v)
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full-precision repr: the driver's gate hashes floats finer than
        # 6 significant digits, and the old f"{v:.6g}" here let two
        # cent-level wrong answers ship as "green" in round 5
        # (VERDICT.md round 5, "What's wrong" #1/#2).  The replica must
        # be at least as strict as the real gate.
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        try:
            s = v.isoformat(sep=" ")
        except TypeError:  # datetime.date
            s = v.isoformat()
        return s[:-7] if s.endswith(".000000") else s
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from fhc_rco_etl_scalable_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(s_rows)} (no oracle, rows-only check)"
                  f" [{time.time()-t0:.1f}s]")
            if len(s_rows) == 0:
                print(f"WARN {name}: zero rows")
            continue
        try:
            res = con.execute(sql)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(s_cols) != sorted(d_cols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
        elif len(s_rows) != len(d_rows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
        else:
            cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
            if cs != cd:
                ok = False
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs:")
                for a, b in diff:
                    print(f"  spark: {a[:250]}")
                    print(f"  duck : {b[:250]}")
        if ok:
            print(f"OK   {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
        else:
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
